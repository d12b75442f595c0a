#!/usr/bin/env python
"""Isolate the decode scan's per-token overhead beyond tail+layers.

Times generate_scan per-token at 1 and 2 layers (slope gives per-layer;
intercept gives fixed), then variants: argmax sampling (no PRNG),
lm_head_bits=16 skip (return hidden), burst lengths.
"""
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
from qpalette_tpu.models import llama
from qpalette_tpu.runtime.loader import build_quantized_model, LAYER_KEYS
from qpalette_tpu.runtime.decode import generate_scan, prefill, sample_logits


def time_burst(spec, params, n_lo=64, n_hi=256, temperature=0.6,
               max_seq=512):
    caches = init_kv_caches(spec, 1, max_seq)
    tokens = jnp.zeros((1, 1), jnp.int32)
    _, caches = prefill(spec, params, tokens, caches)
    key = jax.random.PRNGKey(0)
    ts = {}
    for n in (n_lo, n_hi):
        toks, _ = generate_scan(spec, params, tokens, caches, jnp.int32(1),
                                key, n, temperature, 5)
        np.asarray(toks)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            toks, _ = generate_scan(spec, params, tokens, caches,
                                    jnp.int32(1), key, n, temperature, 5)
            np.asarray(toks)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo)


def main():
    cfg = LlamaConfig.llama31_8b()

    def build(nl, lmb=4):
        qd = {f"{i}_{k}": "tcq2s_6_none_0.9"
              for i in range(nl) for k in LAYER_KEYS}
        return build_quantized_model(
            cfg, qd, model_key=f"probe_st{nl}_{lmb}",
            save_dir="/tmp/qpt_bench", dummy=True, impl="pallas_a8",
            num_layers=nl, lm_head_bits=lmb)

    import sys as _sys
    nls = ([int(a) for a in _sys.argv[1:]] if len(_sys.argv) > 1
           else [1, 2, 4, 8, 16, 32])
    prev = None
    for nl in nls:
        s, p = build(nl)
        t = time_burst(s, p)
        d = f"  (+{(t - prev[1]) / (nl - prev[0]) * 1e6:.1f}/layer)" \
            if prev else ""
        print(f"{nl:3d}L {t*1e6:8.1f} us/tok{d}", flush=True)
        prev = (nl, t)


if __name__ == "__main__":
    main()
