#!/usr/bin/env python
"""Sweep int8_gemv_a8 block params at the padded lm_head shape
(4096 x 129024, the loader's padded vocab).  Current fixed choice bm=2048/bk=512 = 63x8 = 504 grid
steps; wider bk halves the step count."""
import itertools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
import functools
from qpalette_tpu.kernels import fused
from qpalette_tpu.kernels.fused import _i8gemv_a8_kernel, _cparams, \
    _interpret, ACC
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import proto_fold
proto_fold.REPS_LO, proto_fold.REPS_HI = 100, 400
from proto_fold import timeit

V, Hd = 129024, 4096  # loader's padded vocab: 128256 -> next 2048-multiple


@functools.partial(jax.jit, static_argnames=("bm", "bk"))
def gemv(x, wq_t, scales, bm, bk):
    N = x.shape[0]
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf)) / 127.0 + 1e-30
    xq = jnp.round(xf / sx).astype(jnp.int8)
    out = pl.pallas_call(
        _i8gemv_a8_kernel,
        out_shape=jax.ShapeDtypeStruct((N, V), jnp.int32),
        grid=(V // bm, Hd // bk),
        in_specs=[
            pl.BlockSpec((N, bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, bm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(xq, wq_t)
    return out.astype(ACC) * (scales * sx)


def main():
    key = jax.random.PRNGKey(0)
    wq = jax.random.randint(key, (Hd, V), -127, 127, jnp.int8)
    sc = jnp.ones((1, V), jnp.float32)
    x = jax.random.normal(key, (1, Hd), jnp.float32).astype(jnp.bfloat16)
    best = (1e18, None)
    for bm, bk in itertools.product((2048, 1024, 4096), (512, 1024, 2048)):
        if V % bm or Hd % bk or bk * bm * 2 > 14 << 20:
            continue
        try:
            t = timeit(lambda xx, ww: gemv(xx, ww, sc, bm, bk), x, wq)
        except Exception as e:
            print(f"bm{bm} bk{bk}: FAIL {type(e).__name__} {str(e)[:60]}",
                  flush=True)
            continue
        gb = V * Hd / t / 1e3
        mark = ""
        if 0 < t < best[0]:
            best = (t, (bm, bk))
            mark = " *"
        print(f"bm{bm} bk{bk} ({V // bm * (Hd // bk)} steps): {t:8.1f} us "
              f"{gb:7.1f} GB/s{mark}", flush=True)
    print("BEST", best)


if __name__ == "__main__":
    main()
