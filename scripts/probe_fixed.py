#!/usr/bin/env python
"""Decompose the decode step's FIXED (non-per-layer) cost.

diag_decode_breakdown measures fixed ~820 us; this times the actual
tail ops the model runs (real 4-bit lm_head params from the loader, the
real sampler) in isolation, each slope-timed in-scan:

  * embed gather + ln_f
  * lm_head (4-bit tcq2s qlinear, f32 logits) on (1, 4096)
  * sampling (approx_max_k top-5 + gumbel) on (1, 128256)
  * combined tail (all of the above chained)

scan/dispatch tax = fixed(model) - combined.
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

from qpalette_tpu.models.llama import LlamaConfig, rms_norm
from qpalette_tpu.runtime.loader import build_quantized_model, LAYER_KEYS
from qpalette_tpu.runtime.qlinear import qlinear_apply
from qpalette_tpu.runtime.decode import sample_logits


def slope_time(fn, args, reps=100, n_outer=3):
    def mkloop(r):
        def loop(x, *rest):
            def it(carry, _):
                xx, acc = carry
                y = fn(xx, *rest)
                xx = (xx * 0.999 + jnp.sum(y).astype(xx.dtype) * 1e-20
                      ).astype(xx.dtype)
                return (xx, acc + jnp.sum(y).astype(jnp.float32)), None
            (xf, acc), _ = jax.lax.scan(it, (x, jnp.float32(0)), None,
                                        length=r)
            return acc
        return jax.jit(loop)
    ts = {}
    for r in (reps, 4 * reps):
        f = mkloop(r)
        res = f(*args)
        np.asarray(jax.device_get(res))
        best = 1e9
        for _ in range(n_outer):
            t0 = time.perf_counter()
            res = f(*args)
            np.asarray(jax.device_get(res))
            best = min(best, time.perf_counter() - t0)
        ts[r] = best
    return (ts[4 * reps] - ts[reps]) / (3 * reps)


def main():
    cfg = LlamaConfig.llama31_8b()
    qd = {f"0_{k}": "tcq2s_6_none_0.9" for k in LAYER_KEYS}
    spec, params = build_quantized_model(
        cfg, qd, model_key="probe_fixed", save_dir="/tmp/qpt_bench",
        dummy=True, impl="pallas_a8", num_layers=1, lm_head_bits=4)
    luts = params.get("luts", {})
    H, V = cfg.hidden_size, cfg.vocab_size

    embed = params["embed"]
    ln_f = params["ln_f"]
    lmq = params["lm_head_q4"]
    lmsu = params["lm_head_su"]
    lspec = spec.lm_head_spec

    tok = jnp.zeros((1, 1), jnp.int32)
    xh = jnp.ones((1, H), jnp.bfloat16) * 0.01
    key = jax.random.PRNGKey(0)
    logits0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, V)), jnp.float32)

    def t_embed(x, emb, w):
        h = jnp.take(emb, tok, axis=0).astype(jnp.bfloat16)[:, 0]
        h = h + x * 1e-6
        return rms_norm(h, w, cfg.rms_eps)

    def t_lmhead(x, q4, su):
        lg = qlinear_apply(lspec, q4, x, luts, pre_rot=(su, 1),
                           out_dtype=jnp.float32)
        return lg[:, :V]

    def t_sample(x, k):
        return sample_logits(x, k, 0.6, 5).astype(jnp.float32)

    def t_tail(x, emb, w, q4, su, k):
        h = t_embed(x, emb, w)
        lg = t_lmhead(h, q4, su)
        return t_sample(lg, k).astype(jnp.float32)

    for name, fn, args, reps in (
            ("embed+ln_f", t_embed, (xh, embed, ln_f), 200),
            ("lm_head q4", t_lmhead, (xh, lmq, lmsu), 100),
            ("sample top5", t_sample, (logits0, key), 200),
            ("tail all", t_tail, (xh, embed, ln_f, lmq, lmsu, key), 100)):
        dt = slope_time(fn, args, reps=reps)
        print(f"{name:12s}: {dt * 1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
