#!/usr/bin/env python
"""Continuous-batching throughput (the serving engine's number).

Measures aggregate decode tokens/s of runtime/serving.ContinuousBatcher on
the benched 8B quantized config with n_slots concurrent requests, plus the
chunked-prefill admission cost.  Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--prompt_len", type=int, default=128)
    ap.add_argument("--new_tokens", type=int, default=64)
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--prefill_chunk", type=int, default=256)
    args = ap.parse_args()

    import jax
    cache_dir = os.environ.get("QPT_COMPILE_CACHE", "/tmp/qpt_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from qpalette_tpu.models.llama import LlamaConfig
    from qpalette_tpu.runtime.loader import build_quantized_model
    from qpalette_tpu.runtime.serving import ContinuousBatcher

    cfg = LlamaConfig.llama31_8b()
    # the bench-mix scheme family (tcq2s sum2 decode, merged projections)
    from qpalette_tpu.runtime.loader import LAYER_KEYS
    qd = {}
    for i in range(args.layers):
        for key in LAYER_KEYS:
            qd[f"{i}_{key}"] = ("tcq2s_8_none_0.9"
                                if key == "mlp.down_proj"
                                else "tcq2s_6_none_0.9")
    spec, params = build_quantized_model(
        cfg, qd, merge_info=[["merge_qkv", "merge_ug"]] * args.layers,
        model_key="serve_8b", save_dir="/tmp/qpt_bench", dummy=True,
        impl="pallas_a8", num_layers=args.layers, lm_head_bits=8)

    rng = np.random.default_rng(0)
    b = ContinuousBatcher(spec, params, n_slots=args.slots,
                          max_seq=args.prompt_len + args.new_tokens + 8,
                          prefill_chunk=args.prefill_chunk)
    # warm compile: a FULL slot pool of requests end-to-end (the burst
    # scan is jitted per static burst length and batched admission per
    # (batch, chunk) shape — warming with fewer would leave steady-state
    # compiles inside the timed loop)
    for _ in range(args.slots):
        b.submit(list(rng.integers(0, 1000, args.prompt_len)),
                 args.new_tokens)
    b.run()
    b.finished.clear()

    for _ in range(args.requests):
        b.submit(list(rng.integers(0, 1000, args.prompt_len)),
                 args.new_tokens)
    # phase instrumentation: time admission (prefill) vs decode bursts
    admit_t = [0.0]
    _admit0 = b._admit

    def timed_admit():
        # only sync/time when something was actually admitted — an
        # unconditional device sync here costs one ~35 ms tunnel RTT per
        # scheduler loop iteration and bills it all to "admission"
        if not b.queue:
            _admit0()
            return
        t = time.perf_counter()
        _admit0()
        np.asarray(b.caches[0][0][0, 0, 0, :1])
        admit_t[0] += time.perf_counter() - t
    b._admit = timed_admit
    t0 = time.perf_counter()
    b.run()
    dt = time.perf_counter() - t0
    print(f"admission (prefill) time: {admit_t[0]:.2f}s of {dt:.2f}s",
          flush=True)
    toks = sum(len(r.output) for r in b.finished.values())
    scale = 32 / args.layers  # extrapolate to the full model
    print(json.dumps({
        "metric": f"continuous-batching decode tokens/s "
                  f"({args.slots} slots, {args.layers}-layer 8B, "
                  f"extrapolated x{scale:.0f})",
        "value": round(toks / dt / scale, 2),
        "unit": "tokens/s",
        "raw_tokens": toks, "seconds": round(dt, 2),
        "admission_s": round(admit_t[0], 2),
        "prefill_chunk": args.prefill_chunk,
    }))


if __name__ == "__main__":
    main()
