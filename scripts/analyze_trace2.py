#!/usr/bin/env python
"""Classed aggregation of the decode-burst trace: kernels by duration
class, XLA fusions, and true leaf duty cycle."""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qpt_trace"
    fs = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))
    with gzip.open(fs[-1], "rt") as f:
        events = json.load(f)["traceEvents"]
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items() if "TPU" in n}

    leaves = []
    env = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if e["name"].startswith("jit_") or e["name"].startswith("while"):
            env.append(e)
            continue
        leaves.append(e)
    span = max(e["ts"] + e["dur"] for e in env) - min(e["ts"] for e in env)
    busy = sum(e["dur"] for e in leaves)
    ntok = 64
    print(f"span {span / 1e3:.2f} ms ({span / ntok:.1f} us/tok), "
          f"leaf busy {busy / 1e3:.2f} ms ({busy / ntok:.1f} us/tok), "
          f"gaps {(span - busy) / ntok:.1f} us/tok")

    # cluster: base name + rounded avg-dur bucket
    agg = defaultdict(lambda: [0.0, 0, set()])
    for e in leaves:
        base = e["name"].split(".")[0]
        agg[base][0] += e["dur"]
        agg[base][1] += 1
        agg[base][2].add(e["name"])
    for base, (t, n, names) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"{t / 1e3:9.2f} ms  {t / ntok:7.1f} us/tok  n={n:6d} "
              f"insts={len(names):3d}  {base[:70]}")

    # for the decode kernels: histogram by per-instance avg
    inst = defaultdict(lambda: [0.0, 0])
    for e in leaves:
        if "decode_matmul" in e["name"] or "gemv" in e["name"]:
            inst[e["name"]][0] += e["dur"]
            inst[e["name"]][1] += 1
    buckets = defaultdict(lambda: [0, 0.0])
    for name, (t, n) in inst.items():
        avg = t / n
        b = round(avg / 5) * 5
        buckets[b][0] += 1
        buckets[b][1] += t
    print("\nkernel duration classes (avg-us bucket: instances, total):")
    for b in sorted(buckets):
        c, t = buckets[b]
        print(f"  ~{b:6.0f} us: {c:3d} insts, {t / 1e3:8.2f} ms total "
              f"({t / ntok:6.1f} us/tok)")


if __name__ == "__main__":
    main()
