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
import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    logs = sys.argv[1:] or ["/tmp/fit_lat2.log", "/tmp/fit_lat.log"]
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
    for lg in logs:
        try:
            text = open(lg).read()
        except OSError:
            continue
        for line in text.splitlines():
            m = pat.match(line.strip())
            if not m:
                continue
            g, q, alt, us = m.group(1), m.group(2), m.group(3), \
                float(m.group(4))
            if g not in groups:
                continue
            dt = us * 1e-6
            floor = packed_bytes(cfg, g, q) / 850e9
            if dt < floor:
                print(f"drop glitch {g}_{q}{alt or ''}: {us:.1f} us "
                      f"(< roofline {floor * 1e6:.1f})")
                continue
            (measured_alt if alt else measured)[f"{g}_{q}"] = dt

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
    # rotations + lm_head + sampling + scan tax), from the round-4 diag
    # breakdown: fixed 705 us + 32 * ~30 us non-linear remainder
    constant = 1.6e-3
    table = build_lat_table(cfg, list(QDICT_LAT), fams, constant=constant)
    for k, dt in measured.items():
        table[f"{k}_False"] = dt
    for k, dt in measured_alt.items():
        table[f"{k}_True"] = dt
    table["__source__"] = "measured-sample-fit (assembled from logs)"
    table["__impl__"] = "pallas_a8"
    table["__nodename__"] = "v5e"
    out = "assets/3_8b_latency_coeffs_v5e.json"
    json.dump(table, open(out, "w"), indent=1)
    print(f"saved {len(table)} keys to {out}")


if __name__ == "__main__":
    main()
