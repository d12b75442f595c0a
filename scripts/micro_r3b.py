#!/usr/bin/env python
"""Micro-bench the round-3b fixes on chip: k-chunked wide-M a8 lm_head GEMV
and the 2-factor Hadamard rotation."""
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


def sync(x):
    np.asarray(jax.device_get(x))


def time_scan(fn, *arrs, lo=16, hi=64):
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
        for _ in range(5):
            t0 = time.perf_counter()
            sync(f(*arrs))
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    return (ts[hi] - ts[lo]) / (hi - lo)


def main():
    from qpalette_tpu.kernels.fused import int8_gemv_a8
    V, Hd = 129024, 4096  # padded vocab
    rng = np.random.default_rng(0)
    wq = jnp.asarray(rng.integers(-127, 128, (Hd, V)), jnp.int8)
    sc = jnp.ones((1, V), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, Hd)), jnp.bfloat16)
    # wq passed as a scan-loop argument, NOT closed over (525 MB closure
    # blows the tunnel's compile-request size limit, docs/TPU_NOTES.md)
    t = time_scan(lambda xx, w, s: int8_gemv_a8(xx, w, s, V, Hd), x, wq, sc)
    print(f"lm_head a8 chunked: {t * 1e6:.1f} us ({V * Hd / t / 1e9:.0f} "
          f"GB/s)", flush=True)

    from qpalette_tpu.models.llama import _rotate_in
    for n in (4096, 14336):
        su = jnp.ones((n,), jnp.float32)
        xr = jnp.asarray(rng.standard_normal((1, n)), jnp.bfloat16)
        t = time_scan(lambda xx: _rotate_in(xx, su), xr)
        print(f"rot {n} (2-factor): {t * 1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
