#!/usr/bin/env python
"""Sanitize a measured latency-coefficient table.

Tunnel-RTT jitter can corrupt individual slope-timed samples (values
below the physical HBM roofline, or absurdly above the family trend).
This drops every entry faster than bytes/850GB/s, refits the per-family
affine model from the surviving measurements, and rewrites the dropped +
never-measured keys from the fit.  Idempotent; run after
fit_latency_coeffs.py.
"""
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "assets/3_8b_latency_coeffs_v5e.json"
    from qpalette_tpu.runtime.loader import CONFIGS
    from qpalette_tpu.msq.latmodel import (fit_family_model, family_of,
                                           packed_bytes, kernel_calls)
    from qpalette_tpu.msq.solver import MERGE_GROUPS

    cfg = CONFIGS["3_8b"]()
    table = json.load(open(path))
    groups = list("qkvougd") + list(MERGE_GROUPS)

    def parse_key(k):
        for g in sorted(groups, key=len, reverse=True):
            if k.startswith(g + "_"):
                rest = k[len(g) + 1:]
                for fl in ("_False", "_True"):
                    if rest.endswith(fl):
                        return g, rest[: -len(fl)], fl[1:]
        return None

    clean, dropped = {}, []
    samples = []
    for k, v in table.items():
        if k.startswith("__") or k == "constant":
            continue
        p = parse_key(k)
        if p is None:
            continue
        g, q, fl = p
        byts = packed_bytes(cfg, g, q)
        floor = byts / 850e9
        if isinstance(v, (int, float)) and v >= floor:
            clean[(g, q, fl)] = float(v)
            if fl == "False":
                samples.append((family_of(q), byts, float(v)))
        else:
            dropped.append((k, v, floor))

    fams = fit_family_model(samples)
    print(f"{len(clean)} clean, {len(dropped)} dropped; family fits:")
    for f, (a, b) in fams.items():
        print(f"  {f}: launch {a * 1e6:.1f} us, {1 / b / 1e9:.0f} GB/s")

    def fit_val(g, q):
        fam = family_of(q)
        if fam not in fams:
            for fb in ("tcq1", "tcq", "vq"):
                if fb in fams:
                    fam = fb
                    break
            else:
                fam = next(iter(fams))
        a, b = fams[fam]
        return kernel_calls(g, q) * a + packed_bytes(cfg, g, q) * b

    fixed = 0
    for k, v, floor in dropped:
        g, q, fl = parse_key(k)
        table[k] = fit_val(g, q)
        fixed += 1
        print(f"  fixed {k}: {v * 1e6:.1f} -> {table[k] * 1e6:.1f} us")
    table["__sanitized__"] = True
    json.dump(table, open(path, "w"), indent=1)
    print(f"rewrote {fixed} entries -> {path}")


if __name__ == "__main__":
    main()
