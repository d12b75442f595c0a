#!/usr/bin/env python
"""Capture a jax.profiler trace of the decode burst (round-4 VERDICT #1c).

Writes a TensorBoard-format trace of one generate_scan burst on the
benched solver config to --out (default /tmp/qpt_trace), then prints the
top self-time ops from the trace's .xplane.pb if the tensorflow profiler
import is available, else just the trace path.
"""
import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

cache_dir = os.environ.get("QPT_COMPILE_CACHE", "/tmp/qpt_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qpalette_tpu.models.llama import LlamaConfig, init_kv_caches
from qpalette_tpu.runtime.loader import build_quantized_model
from qpalette_tpu.runtime.decode import generate_scan, prefill


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/qpt_trace")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--tag", default="215.0thp_cc")
    args = ap.parse_args()

    qdir = "msq_results/3_8b/lat_constrained/v5e/default_err"
    qd = {k: tuple(v) if isinstance(v, list) else v
          for k, v in json.load(
              open(f"{qdir}/{args.tag}.json")).items()}
    qd = {k: v for k, v in qd.items()
          if int(k.split("_", 1)[0]) < args.layers}
    mi = json.load(open(f"{qdir}/{args.tag}_merge_info.json"))

    cfg = LlamaConfig.llama31_8b()
    spec, params = build_quantized_model(
        cfg, qd, merge_info=mi[:args.layers], model_key="bench_8b_solved",
        save_dir="/tmp/qpt_bench", dummy=True, impl="pallas_a8",
        num_layers=args.layers, lm_head_bits=4)

    caches = init_kv_caches(spec, 1, 512)
    tokens = jnp.zeros((1, 1), jnp.int32)
    _, caches = prefill(spec, params, tokens, caches)
    key = jax.random.PRNGKey(0)

    # warm compile
    toks, _ = generate_scan(spec, params, tokens, caches, jnp.int32(1),
                            key, args.tokens, 0.6, 5)
    np.asarray(toks)

    with jax.profiler.trace(args.out):
        toks, _ = generate_scan(spec, params, tokens, caches, jnp.int32(1),
                                key, args.tokens, 0.6, 5)
        np.asarray(toks)
    print(f"trace written to {args.out}", flush=True)
    for f in sorted(glob.glob(args.out + "/**/*", recursive=True)):
        if os.path.isfile(f):
            print(f"  {os.path.getsize(f):>10d}  {f}", flush=True)


if __name__ == "__main__":
    main()
