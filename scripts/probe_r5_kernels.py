#!/usr/bin/env python
"""Round-5 TPU probes: dense odd-KV fused decode + reworked dequant path.

1. tcq2s_5 (dense odd-KV double-tile layout) fused decode at the bench
   shapes — does odd KV now stream its nominal 2.5 b/w?
2. dequant-to-HBM: kernel-order output (no relayout) vs the old
   natural-order path; Gw/s at the ug shape (round-4 VERDICT #2 target:
   >=300 Gw/s, was ~2.7).
3. dequant_matmul end-to-end at large rows (serving admission / ctx-8192
   prefill path): single-layer ug+down timing at N=8192.

All timings slope-based (two in-jit scan lengths) with np.asarray host
sync (docs/TPU_NOTES.md).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def slope_time(fn, args, reps=50, n_outer=3):
    """Median slope seconds/iter of fn(*args) via scan-length pairs."""
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


def probe_fused_odd():
    from qpalette_tpu.kernels import formats as kf
    from qpalette_tpu.kernels import fused
    print("== fused decode: tcq2s_5 (dense odd) vs tcq2s_6 ==", flush=True)
    shapes = [("qkv", 6144, 4096), ("o", 4096, 4096),
              ("ug", 28672, 4096), ("d", 4096, 14336)]
    key = jax.random.PRNGKey(0)
    for KV in (5, 6):
        for name, m, k in shapes:
            tr = jax.random.bits(key, ((m // 16) * (k // 16), 4 * KV),
                                 jnp.uint32)
            trpl = kf.tcq2_planar_weights(tr, m, k, KV)
            x = jnp.zeros((1, k), jnp.bfloat16)
            fn = lambda xx, tp: fused.tcq2_decode_matmul(
                xx, tp, KV, m, k, a8=True, mode="sum2")
            dt = slope_time(fn, (x, trpl), reps=100)
            gw = m * k / dt / 1e9
            gb = trpl.size * 4 / dt / 1e9
            print(f"tcq2s_{KV} {name} ({m}x{k}): {dt * 1e6:7.1f} us "
                  f"{gw:7.0f} Gw/s {gb:6.0f} GB/s "
                  f"[{trpl.size * 4 * 8 / (m * k):.2f} b/w stored]",
                  flush=True)


def probe_dequant():
    from qpalette_tpu.kernels import formats as kf
    from qpalette_tpu.kernels import fused
    print("== dequant-to-HBM: kernel-order vs natural (ug shape) ==",
          flush=True)
    m, k, KV = 28672, 4096, 8
    key = jax.random.PRNGKey(1)
    tr = jax.random.bits(key, ((m // 16) * (k // 16), 4 * KV), jnp.uint32)
    trpl = kf.tcq2_planar_weights(tr, m, k, KV)

    for label, ko in (("kernel-order", True), ("natural", False)):
        fn = lambda tp, _ko=ko: fused.tcq2_dequant(
            tp, KV, m, k, mode="sum2", kernel_order=_ko)
        # scan over dequant: feed trellis through (uint32) — tweak loop fn
        def loop_fn(x, tp):
            w = fn(tp)
            return jnp.sum(w[:1, :8].astype(jnp.float32)) + x[0, 0] * 0
        dt = slope_time(lambda x, tp: loop_fn(x, tp),
                        (jnp.zeros((1, 8), jnp.float32), trpl), reps=20)
        gw = m * k / dt / 1e9
        print(f"tcq2s_8 dequant {label}: {dt * 1e6:8.1f} us {gw:7.0f} Gw/s "
              f"(write {m * k * 2 / dt / 1e9:.0f} GB/s)", flush=True)


def probe_large_rows():
    from qpalette_tpu.kernels import formats as kf
    from qpalette_tpu.kernels import fused
    from qpalette_tpu.runtime.qlinear import LinearSpec
    print("== large-row dequant_matmul (prefill path) ==", flush=True)
    key = jax.random.PRNGKey(2)
    for (name, m, k, KV) in (("ug", 28672, 4096, 6), ("d", 4096, 14336, 8)):
        tr = jax.random.bits(key, ((m // 16) * (k // 16), 4 * KV),
                             jnp.uint32)
        trpl = kf.tcq2_planar_weights(tr, m, k, KV)
        spec = LinearSpec("tcq2", in_features=k, out_features=m, KV=(KV,),
                          mode="sum2", impl="pallas")
        for N in (256, 8192):
            x = jnp.zeros((N, k), jnp.bfloat16)
            fn = lambda xx, tp: fused.dequant_matmul(
                spec, {"trellis_pl": tp}, xx, {})
            dt = slope_time(fn, (x, trpl), reps=6, n_outer=2)
            fl = 2.0 * N * m * k
            print(f"tcq2s_{KV} {name} N={N}: {dt * 1e3:8.2f} ms "
                  f"{fl / dt / 1e12:6.1f} TFLOP/s", flush=True)


def probe_fused_rows():
    """Fused decode at larger row counts (serving prefill chunks)."""
    from qpalette_tpu.kernels import formats as kf
    from qpalette_tpu.kernels import fused
    print("== fused decode vs rows (ug tcq2s_6, a8) ==", flush=True)
    m, k, KV = 28672, 4096, 6
    key = jax.random.PRNGKey(3)
    tr = jax.random.bits(key, ((m // 16) * (k // 16), 4 * KV), jnp.uint32)
    trpl = kf.tcq2_planar_weights(tr, m, k, KV)
    for N in (1, 8, 64, 128, 256):
        x = jnp.zeros((N, k), jnp.bfloat16)
        fn = lambda xx, tp: fused.tcq2_decode_matmul(
            xx, tp, KV, m, k, a8=True, mode="sum2")
        dt = slope_time(fn, (x, trpl), reps=30)
        print(f"N={N:4d}: {dt * 1e6:8.1f} us  "
              f"{N * m * k * 2 / dt / 1e12:6.1f} TOP/s  "
              f"({m * k * 3 / 8 / dt / 1e9:.0f} GB/s stream)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fused"):
        probe_fused_odd()
    if which in ("all", "dequant"):
        probe_dequant()
    if which in ("all", "rows"):
        probe_large_rows()
    if which in ("all", "frows"):
        probe_fused_rows()
