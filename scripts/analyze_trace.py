#!/usr/bin/env python
"""Aggregate device op times from a jax.profiler Chrome trace
(trace.json.gz).  Usage: analyze_trace.py [trace_dir] [top_n]"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qpt_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    fs = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))
    if not fs:
        sys.exit(f"no trace.json.gz under {d}")
    with gzip.open(fs[-1], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # identify TPU device pids (process names containing TPU or device)
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if re.search(r"TPU|/device|XLA", n, re.I)}
    print("processes:", {p: n for p, n in pid_name.items()})

    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    tmin, tmax = 1e30, 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e6  # us -> s
        name = e["name"]
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
        ts = e.get("ts", 0)
        tmin = min(tmin, ts)
        tmax = max(tmax, ts + e.get("dur", 0))
    span = (tmax - tmin) / 1e6
    print(f"device busy {total:.4f}s of span {span:.4f}s "
          f"({100 * total / max(span, 1e-9):.1f}% duty)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]
    for name, (t, n) in rows:
        print(f"{t * 1e3:9.3f} ms  n={n:6d}  avg {t / n * 1e6:8.1f} us  "
              f"{name[:90]}")


if __name__ == "__main__":
    main()
