#!/usr/bin/env python
"""Assemble assets/3_8b_latency_coeffs_v5e.json from fit_latency_coeffs
log output (possibly several partial runs).

Parses lines of the form
    {group}_{qstr}: 27.3 us (231 GB/s)
    {group}_{qstr} [xla]: 107.4 us
drops physically-impossible samples (< bytes/850GB/s), refits the
per-family affine latency model from the survivors, and emits the full
solver-schema table (measured entries verbatim, everything else from the
fit).  Usage: assemble_lat_table.py LOG [LOG...]
"""
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")


STALE_OLD_LOG_QS = ("tcq1_3", "tcq1_5")  # odd-KV tcq1: measured under the
# pre-round-5 ALIGNED layout (4 b/w at KV=3); the dense odd-KV layout
# changed the stream, so pre-r5 samples for them are upper bounds only.
OLD_LOGS = ("/tmp/fit_lat.log", "/tmp/fit_lat2.log", "/tmp/fit_lat3.log")


def main():
    logs = sys.argv[1:] or ["/tmp/fit_lat_d_r5.log", "/tmp/fit_lat3.log",
                            "/tmp/fit_lat2.log", "/tmp/fit_lat.log"]
    from qpalette_tpu.runtime.loader import CONFIGS
    from qpalette_tpu.msq.latmodel import (fit_family_model, family_of,
                                           packed_bytes, build_lat_table)
    from qpalette_tpu.msq.solver import MERGE_GROUPS, QDICT_LAT

    cfg = CONFIGS["3_8b"]()
    groups = sorted(list("qkvougd") + list(MERGE_GROUPS), key=len,
                    reverse=True)
    pat = re.compile(
        r"^(\w+?)_((?:tcq|tcomb|comb|ldlq|sq|vq2)\S*?)( \[xla\])?: "
        r"\s*(-?[\d.]+) us")

    measured, measured_alt = {}, {}
    for lg in logs:  # earlier logs in argv win (newest first)
        try:
            text = open(lg).read()
        except OSError:
            continue
        stale = STALE_OLD_LOG_QS if lg in OLD_LOGS else ()
        for line in text.splitlines():
            m = pat.match(line.strip())
            if not m:
                continue
            g, q, alt, us = m.group(1), m.group(2), m.group(3), \
                float(m.group(4))
            if g not in groups:
                continue
            if any(q.startswith(s) for s in stale):
                print(f"skip stale (pre-dense-odd layout) {g}_{q} in {lg}")
                continue
            dt = us * 1e-6
            floor = packed_bytes(cfg, g, q) / 850e9
            if dt < floor:
                print(f"drop glitch {g}_{q}{alt or ''}: {us:.1f} us "
                      f"(< roofline {floor * 1e6:.1f})")
                continue
            d = measured_alt if alt else measured
            d.setdefault(f"{g}_{q}", dt)

    samples = [(family_of(q_g.split("_", 1)[1]),
                packed_bytes(cfg, q_g.split("_", 1)[0],
                             q_g.split("_", 1)[1]), dt)
               for q_g, dt in measured.items()]
    fams = fit_family_model(samples)
    print(f"{len(measured)} measured (+{len(measured_alt)} xla), "
          f"{len(fams)} family fits:")
    for f, (a, b) in sorted(fams.items()):
        print(f"  {f}: launch {a * 1e6:.1f} us, {1 / b / 1e9:.0f} GB/s")

    # constant = non-projection per-token time (attention + norms +
    # rotations + lm_head + sampling + scan tax).  Preserve the existing
    # asset's bench-calibrated constant (+note) when present; override
    # with QPT_LAT_CONSTANT.
    out = "assets/3_8b_latency_coeffs_v5e.json"
    constant, note = 1.6e-3, None
    try:
        old = json.load(open(out))
        constant = old.get("constant", constant)
        note = old.get("__constant_note__")
    except OSError:
        pass
    env_c = os.environ.get("QPT_LAT_CONSTANT")
    if env_c:
        constant = float(env_c)
        note = os.environ.get("QPT_LAT_CONSTANT_NOTE", note)
    table = build_lat_table(cfg, list(QDICT_LAT), fams, constant=constant)
    # per-entry provenance (round-4 VERDICT #4): consumers can tell which
    # coefficients are direct measurements vs family-fit interpolations
    prov = {}
    for k in list(table):
        if not k.startswith("__") and k != "constant":
            prov[k] = "fitted"
    for k, dt in measured.items():
        table[f"{k}_False"] = dt
        prov[f"{k}_False"] = "measured"
    for k, dt in measured_alt.items():
        table[f"{k}_True"] = dt
        prov[f"{k}_True"] = "measured"
    table["__source__"] = "measured-sample-fit (assembled from logs)"
    table["__impl__"] = "pallas_a8"
    table["__nodename__"] = "v5e"
    if note:
        table["__constant_note__"] = note
    table["__provenance__"] = prov
    json.dump(table, open(out, "w"), indent=1)
    nm = sum(1 for v in prov.values() if v == "measured")
    print(f"saved {len(table)} keys to {out} "
          f"({nm} measured / {len(prov) - nm} fitted)")


if __name__ == "__main__":
    main()
