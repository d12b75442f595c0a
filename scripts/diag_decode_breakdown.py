#!/usr/bin/env python
"""Decompose the bs=1 decode step: per-layer linears vs everything else.

Slope-timed (in-jit scan at two lengths) so tunnel dispatch cost cancels:
  * full model per-token time at 32 and 8 layers -> per-layer + fixed
  * each bench-mix linear group in isolation (the same qlinear_apply the
    model runs) -> expected linear time per layer
  * lm_head int8 GEMV
  * remainder = per-layer - sum(linears) = attention + norms + rotations
    + dispatch overhead; fixed - lm_head = embed + sampling + scan tax
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

from qpalette_tpu.models.llama import LlamaConfig
from qpalette_tpu.runtime.loader import (build_quantized_model, LAYER_KEYS,
                                         dummy_artifact, _spec_from_meta,
                                         _params_from_artifact)
from qpalette_tpu.runtime.qlinear import qlinear_apply
from qpalette_tpu.runtime.decode import generate_scan, prefill
from qpalette_tpu.models import llama

IMPL = os.environ.get("QPT_BENCH_IMPL", "pallas_a8")


def sync(x):
    np.asarray(jax.device_get(x))


def time_scan(fn, *arrs, lo=64, hi=256):
    """fn(x, *rest) -> y; returns seconds per call via slope."""
    def mkloop(reps):
        def loop(x, *rest):
            def it(carry, _):
                xx, acc = carry
                y = fn(xx, *rest)
                xx = (xx * 0.999 + jnp.sum(y).astype(xx.dtype) * 1e-20
                      ).astype(xx.dtype)
                return (xx, acc + jnp.sum(y).astype(jnp.float32)), None
            (xf, acc), _ = jax.lax.scan(it, (x, jnp.float32(0)), None,
                                        length=reps)
            return acc
        return jax.jit(loop)

    ts = {}
    for reps in (lo, hi):
        f = mkloop(reps)
        sync(f(*arrs))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(*arrs))
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def bench_qdict(nl, scheme="sum2mix"):
    qd = {}
    for i in range(nl):
        for key in LAYER_KEYS:
            if key == "mlp.down_proj":
                qd[f"{i}_{key}"] = "tcq2s_8_none_0.9"
            else:
                qd[f"{i}_{key}"] = "tcq2s_6_none_0.9"
    return qd


def model_tok_time(nl, n_tokens=32):
    cfg = LlamaConfig.llama31_8b()
    mi = [["merge_qkv", "merge_ug"]] * nl
    spec, params = build_quantized_model(
        cfg, bench_qdict(nl), merge_info=mi, model_key=f"diag_{nl}",
        save_dir="/tmp/qpt_bench", dummy=True, impl=IMPL, num_layers=nl,
        lm_head_bits=8)
    caches = llama.init_kv_caches(spec, 1, 2 * n_tokens)
    tokens = jnp.asarray([[1]], jnp.int32)
    logits, caches = prefill(spec, params, tokens, caches)
    key = jax.random.PRNGKey(0)
    cur = jnp.asarray([[2]], jnp.int32)

    ts = {}
    for n in (n_tokens, 2 * n_tokens):
        toks, _ = generate_scan(spec, params, cur, caches, jnp.int32(1), key,
                                n, 0.6, 5)
        sync(toks)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            toks, _ = generate_scan(spec, params, cur, caches, jnp.int32(1),
                                    key, n, 0.6, 5)
            sync(toks)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[2 * n_tokens] - ts[n_tokens]) / n_tokens


def linear_time(qstr, m, n):
    art = dummy_artifact(qstr, (m, n), seed=0)
    spec = _spec_from_meta(art["meta"], IMPL)
    params = _params_from_artifact(art, jnp.bfloat16, IMPL)
    x = jnp.zeros((1, n), jnp.bfloat16)
    return time_scan(lambda xx: qlinear_apply(spec, params, xx), x)


def main():
    print("== linear groups (bench mix shapes) ==")
    lins = [("qkv tcq2s_6", "tcq2s_6_none_0.9", 6144, 4096),
            ("o   tcq2s_6", "tcq2s_6_none_0.9", 4096, 4096),
            ("ug  tcq2s_6", "tcq2s_6_none_0.9", 28672, 4096),
            ("down tcq2s_8", "tcq2s_8_none_0.9", 4096, 14336)]
    tot_lin = 0.0
    for name, qstr, m, n in lins:
        t = linear_time(qstr, m, n)
        tot_lin += t
        print(f"  {name}: {t * 1e6:8.1f} us  ({m * n / t / 1e9:.0f} Gw/s)")
    print(f"  sum per layer: {tot_lin * 1e6:.1f} us")

    print("== lm_head int8 GEMV (a8, rotated) ==")
    from qpalette_tpu.kernels.fused import int8_gemv_a8
    # vocab PADDED to a 2048 multiple exactly as the loader packs it —
    # the unpadded 128256 forces bm=256 (501x8 grid steps, ~2.6 ms!)
    # while the loader's padded 129024 gets bm=2048 (63x8 steps)
    V, Hd = 129024, 4096  # loader's padded vocab: 128256 -> next 2048-multiple
    wq = jnp.zeros((Hd, V), jnp.int8)
    sc = jnp.ones((1, V), jnp.float32)
    x = jnp.zeros((1, Hd), jnp.bfloat16)
    t_lm = time_scan(lambda xx: int8_gemv_a8(xx, wq, sc, V, Hd), x)
    print(f"  lm_head: {t_lm * 1e6:.1f} us  ({V * Hd / t_lm / 1e9:.0f} GB/s)")

    print("== rotation (1,4096) / (1,14336) ==")
    from qpalette_tpu.models.llama import _rotate_in
    for n in (4096, 14336):
        su = jnp.ones((n,), jnp.float32)
        x = jnp.zeros((1, n), jnp.bfloat16)
        t = time_scan(lambda xx: _rotate_in(xx, su), x)
        print(f"  rot {n}: {t * 1e6:8.1f} us")

    print("== full model per-token (slope over burst) ==")
    t32 = model_tok_time(32)
    print(f"  32L: {t32 * 1e3:.3f} ms/token ({1 / t32:.1f} tok/s)")
    t8 = model_tok_time(8)
    print(f"   8L: {t8 * 1e3:.3f} ms/token")
    per_layer = (t32 - t8) / 24
    fixed = t8 - 8 * per_layer
    print(f"  per-layer: {per_layer * 1e6:.1f} us   fixed: "
          f"{fixed * 1e6:.1f} us")
    print(f"  remainder/layer (non-linear): "
          f"{(per_layer - tot_lin) * 1e6:.1f} us")
    print(f"  fixed minus lm_head: {(fixed - t_lm) * 1e6:.1f} us")


if __name__ == "__main__":
    main()
