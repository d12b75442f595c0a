#!/usr/bin/env python
"""Ablate the tcq1 fused kernel on the real chip to find the binding cost.

Variants (same grid/blocking, pieces removed):
  full        complete kernel
  noextract   skip the bit-window select chain (state := word 0)
  nodecode    skip the 1mad arithmetic (val := state cast)
  decodeonly  decode all tiles, single tiny dot
  dotonly     decode only tile 0, full dot over scratch
  stream      only read the packed words (sum) — bandwidth ceiling
  empty       timing-loop tax (subtract from the rest)
Plus `dense`: XLA bf16 matvec of the same logical shape.

Each timed with an in-jit scan (REPS iterations) with scalar feedback so
nothing hoists; reports µs/call after subtracting `empty`.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpalette_tpu.kernels.fused import (_cparams, _pick_width, DDT, ACC,
                                        _MAD1_A, _MAD1_B, _MAD_INV)

REPS = 50


def _kernel(x_ref, tr_ref, o_ref, d_ref, *, KV, tk, wm, variant):
    j = pl.program_id(1)
    W = 8 * KV
    tv = jax.lax.broadcasted_iota(jnp.int32, (16, wm), 0)
    phases = {}
    for v2 in range(16):
        ph = (16 * v2 * KV) % 32
        if ph not in phases:
            bitoff = tv * KV + ph
            relv = bitoff >> 5
            shv = (bitoff & 31).astype(jnp.uint32)
            rmax = (ph + 15 * KV) >> 5
            masks = [relv >= r for r in range(1, rmax + 1)]
            phases[ph] = (masks, shv, jnp.uint32(31) - shv, rmax)
    M16 = jnp.uint32(0xFFFF)
    MPAIR = jnp.uint32(0x00FF00FF)

    if variant == "stream":
        s = jnp.zeros((16, wm), jnp.uint32)
        for kt in range(tk):
            for r in range(0, 8 * KV, 16):
                rr = min(16, 8 * KV - r)
                blk = tr_ref[kt, r:r + rr, :]
                if rr < 16:
                    blk = jnp.pad(blk, ((0, 16 - rr), (0, 0)))
                s = s + blk
        acc = (jnp.zeros(o_ref.shape, jnp.float32)
               + jnp.sum(s.astype(jnp.int32)).astype(jnp.float32) * 1e-30)

        @pl.when(j == 0)
        def _():
            o_ref[:] = acc

        @pl.when(j != 0)
        def _():
            o_ref[:] = o_ref[:] + acc
        return

    def decode_tile(kt):
        tile_words = tr_ref[kt]
        for v2 in range(16):
            base_bits = 16 * v2 * KV
            wbase = base_bits // 32
            masks, shv, lsh, rmax = phases[base_bits % 32]
            nrows = rmax + 2
            if wbase + nrows <= W:
                win = tile_words[wbase:wbase + nrows, :]
            else:
                win = jnp.concatenate([tile_words[wbase:, :],
                                       tile_words[:wbase + nrows - W, :]],
                                      axis=0)
            if variant == "noextract":
                state = jnp.broadcast_to(win[0:1, :], (16, wm))
            else:
                lo = jnp.broadcast_to(win[0:1, :], (16, wm))
                hi = jnp.broadcast_to(win[1:2, :], (16, wm))
                for r in range(1, rmax + 1):
                    lo = jnp.where(masks[r - 1], win[r:r + 1, :], lo)
                    hi = jnp.where(masks[r - 1], win[r + 1:r + 2, :], hi)
                state = (lo >> shv) | ((hi << lsh) << jnp.uint32(1))
            if variant == "nodecode":
                val = (state & M16).astype(jnp.int32).astype(
                    jnp.float32) * _MAD_INV
            else:
                h = (state & M16) * jnp.uint32(_MAD1_A) + jnp.uint32(_MAD1_B)
                t2 = (h & MPAIR) + ((h >> jnp.uint32(8)) & MPAIR)
                s4 = (t2 + (t2 >> jnp.uint32(16))) & jnp.uint32(0x7FF)
                val = ((s4.astype(jnp.int32) - 510).astype(jnp.float32)
                       * _MAD_INV)
            d_ref[kt * 16:(kt + 1) * 16, v2 * wm:(v2 + 1) * wm] = \
                val.astype(DDT)

    xb = x_ref[0]
    if variant == "dotonly":
        decode_tile(0)
        acc = jax.lax.dot_general(xb, d_ref[:],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=ACC)
    elif variant == "decodeonly":
        for kt in range(tk):
            decode_tile(kt)
        acc = jax.lax.dot_general(xb[:, :16], d_ref[:16],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=ACC)
    else:
        cc = 8 if tk % 8 == 0 else tk
        acc = None
        for c0 in range(0, tk, cc):
            for kt in range(c0, c0 + cc):
                decode_tile(kt)
            part = jax.lax.dot_general(
                xb[:, c0 * 16:(c0 + cc) * 16],
                d_ref[c0 * 16:(c0 + cc) * 16, :],
                (((1,), (0,)), ((), ())), preferred_element_type=ACC)
            acc = part if acc is None else acc + part

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit,
                   static_argnames=("KV", "m", "k", "variant"))
def run_variant(x, tr_kt, KV, m, k, variant):
    N = x.shape[0]
    kt_total = k // 16
    tk = next(c for c in (32, 16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(256, 128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    xp = x.astype(DDT).reshape(N, gk, tk * 16).transpose(1, 0, 2)
    out = pl.pallas_call(
        functools.partial(_kernel, KV=KV, tk=tk, wm=wm, variant=variant),
        out_shape=jax.ShapeDtypeStruct((N, m), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((1, N, tk * 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 8 * KV, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tk * 16, 16 * wm), DDT)],
        compiler_params=_cparams(),
    )(xp, tr_kt)
    return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2).reshape(N, m))


REPS_LO, REPS_HI = 40, 240


def timeit(fn, x, *arrs):
    """us/call via the slope between two in-jit scan lengths — cancels the
    axon dispatch fixed cost AND the constant part of the scan tax."""
    def mkloop(reps):
        def loop(x, *arrs):
            def it(carry, _):
                xx, acc = carry
                y = fn(xx, *arrs)
                xx = (xx * 0.999
                      + jnp.sum(y).astype(xx.dtype) * 1e-20).astype(xx.dtype)
                return (xx, acc + jnp.sum(y)), None
            (xf, acc), _ = jax.lax.scan(it, (x, jnp.float32(0)), None,
                                        length=reps)
            return acc
        return jax.jit(loop)

    ts = {}
    for reps in (REPS_LO, REPS_HI):
        f = mkloop(reps)
        r = f(x, *arrs)
        np.asarray(jax.device_get(r))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(x, *arrs)
            np.asarray(jax.device_get(r))
            best = min(best, time.perf_counter() - t0)
        ts[reps] = best
    return (ts[REPS_HI] - ts[REPS_LO]) / (REPS_HI - REPS_LO) * 1e6


def main():
    shapes = [(4096, 4096), (28672, 4096)]
    KV = 3
    key = jax.random.PRNGKey(0)
    for (m, k) in shapes:
        tr = jax.random.randint(key, (k // 16, 8 * KV, m // 16),
                                0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
        x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(key, (k, m), jnp.float32).astype(jnp.bfloat16)

        tax = timeit(lambda xx: (xx.astype(jnp.float32) * 2.0), x)
        dense = timeit(lambda xx: jax.lax.dot_general(
            xx, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), x)
        print(f"== m={m} k={k} KV={KV} "
              f"(packed {k*m*KV/16/2**20:.2f} MiB, "
              f"dense bf16 {k*m*2/2**20:.0f} MiB) ==")
        print(f"  loop-tax {tax:8.1f} us   dense-xla {dense:8.1f} us "
              f"({k*m*2/ (dense-tax) / 1e3:.0f} GB/s)")
        for variant in ("empty", "stream", "dotonly", "decodeonly",
                        "noextract", "nodecode", "full"):
            if variant == "empty":
                continue
            t = timeit(lambda xx, tt: run_variant(xx, tt, KV, m, k,
                                                  variant), x, tr)
            eff = k * m * KV / 16 / (t - tax) / 1e3  # GB/s on packed bytes
            gw = k * m / (t - tax) / 1e3  # Gweights/s
            print(f"  {variant:11s} {t:8.1f} us  (-tax {t-tax:8.1f})  "
                  f"{eff:7.1f} GB/s-packed  {gw:7.1f} Gw/s")


if __name__ == "__main__":
    main()
