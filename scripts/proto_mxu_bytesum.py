#!/usr/bin/env python
"""Prototype: tcq1 kernel with the byte-sum moved onto the MXU.

Decode math is unchanged (1mad: w = (sum of 4 bytes of h) - 510, scaled),
but instead of folding bytes on the VPU we store h (uint32, XOR 0x80808080)
and bitcast to int8 so the MXU matmul against repeat(x, 4) performs the byte
sum:  w = (sum int8 + 2) * INV  =>  y = INV * (x4 @ bytes + 2 * sum(x)).

Verifies bit-level agreement with the production kernel, then slope-times
old vs new at the model's projection shapes.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpalette_tpu.kernels.fused import (_cparams, _pick_width, DDT, ACC,
                                        _MAD1_A, _MAD1_B, _MAD_INV,
                                        tcq1_decode_matmul)

LANES = 128


def _tcq1_mxu_kernel(x_ref, x4_ref, tr_ref, o_ref, d_ref, *, KV, tk, wm,
                     cc):
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
    XOR = jnp.uint32(0x80808080)

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
            lo = jnp.broadcast_to(win[0:1, :], (16, wm))
            hi = jnp.broadcast_to(win[1:2, :], (16, wm))
            for r in range(1, rmax + 1):
                lo = jnp.where(masks[r - 1], win[r:r + 1, :], lo)
                hi = jnp.where(masks[r - 1], win[r + 1:r + 2, :], hi)
            state = (lo >> shv) | ((hi << lsh) << jnp.uint32(1))
            h = (state & M16) * jnp.uint32(_MAD1_A) + jnp.uint32(_MAD1_B)
            d_ref[kt * 16:(kt + 1) * 16, v2 * wm:(v2 + 1) * wm] = h ^ XOR

    xb = x_ref[0]       # (N, tk*16)
    x4 = x4_ref[0]      # (N, 4*tk*16)
    acc = None
    for c0 in range(0, tk, cc):
        for kt in range(c0, c0 + cc):
            decode_tile(kt)
        h8 = pltpu.bitcast(d_ref[c0 * 16:(c0 + cc) * 16, :], jnp.int8)
        part = jax.lax.dot_general(
            x4[:, c0 * 64:(c0 + cc) * 64],
            h8.astype(DDT),
            (((1,), (0,)), ((), ())), preferred_element_type=ACC)
        acc = part if acc is None else acc + part
    sumx = jnp.sum(xb.astype(ACC), axis=1, keepdims=True)  # (N, 1)
    acc = (acc + 2.0 * sumx) * _MAD_INV

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("KV", "m", "k"))
def tcq1_mxu_decode_matmul(x, tr_kt, KV: int, m: int, k: int):
    N = x.shape[0]
    kt_total = k // 16
    tk = next(c for c in (16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(256, 128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    cc = next(c for c in (4, 2, 1) if tk % c == 0)
    xp = x.astype(DDT).reshape(N, gk, tk * 16).transpose(1, 0, 2)
    x4 = jnp.repeat(xp, 4, axis=2)  # (gk, N, 4*tk*16), elem-repeat
    out = pl.pallas_call(
        functools.partial(_tcq1_mxu_kernel, KV=KV, tk=tk, wm=wm, cc=cc),
        out_shape=jax.ShapeDtypeStruct((N, m), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((1, N, tk * 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 4 * tk * 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 8 * KV, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tk * 16, 16 * wm), jnp.uint32)],
        compiler_params=_cparams(),
    )(xp, x4, tr_kt)
    return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2).reshape(N, m))


REPS_LO, REPS_HI = 40, 240


def timeit(fn, x, *arrs):
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


def exact_reference(x, tr_kt, KV, m, k):
    """f32 ground truth: decode states with numpy bit ops, f32 dot."""
    tr = np.asarray(tr_kt)            # (k/16, 8KV, m/16) uint32
    kt_n, W, mt_n = tr.shape
    # bitstream per (kt, mt): words little-endian; state p at bits
    # [KV*p, KV*p+16) circular over 32*W bits, p = 16*v2 + t
    p = np.arange(256)
    bitoff = (KV * p) % (32 * W)
    w0 = bitoff // 32
    sh = (bitoff % 32).astype(np.uint64)
    words = tr.astype(np.uint64)      # (kt, W, mt)
    lo = words[:, w0, :]              # (kt, 256, mt)
    hi = words[:, (w0 + 1) % W, :]
    state = (lo >> sh[None, :, None]) | (hi << (32 - sh[None, :, None]))
    u = (state & 0xFFFF).astype(np.uint32)
    h = (u * np.uint32(_MAD1_A) + np.uint32(_MAD1_B)).astype(np.uint32)
    ssum = ((h & 255) + ((h >> 8) & 255) + ((h >> 16) & 255)
            + ((h >> 24) & 255))
    val = (ssum.astype(np.float32) - 510.0) * _MAD_INV  # (kt, 256, mt)
    # weight row = mt*16 + v2, col = kt*16 + t, p = 16*v2 + t
    val = val.reshape(kt_n, 16, 16, mt_n)               # (kt, v2, t, mt)
    Wmat = val.transpose(3, 1, 0, 2).reshape(m, k)       # (mt,v2 -> m), (kt,t -> k)
    xf = np.asarray(x.astype(jnp.float32))
    return xf @ Wmat.T


def main():
    KV = 3
    key = jax.random.PRNGKey(0)
    for (m, k) in [(1024, 2048), (4096, 4096)]:
        tr = jax.random.randint(key, (k // 16, 8 * KV, m // 16),
                                0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
        x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
        y_ref = exact_reference(x, tr, KV, m, k)
        y_old = np.asarray(tcq1_decode_matmul(x, tr, KV, "1mad", m, k))
        y_new = np.asarray(tcq1_mxu_decode_matmul(x, tr, KV, m, k))
        s = np.std(y_ref) + 1e-9
        e_old = np.max(np.abs(y_old - y_ref)) / s
        e_new = np.max(np.abs(y_new - y_ref)) / s
        print(f"m={m} k={k}: err-vs-f32  old(bf16 weights) {e_old:.3e}  "
              f"mxu-bytes {e_new:.3e} "
              f"{'OK' if e_new <= max(e_old, 1e-5) else 'MISMATCH'}")
        if e_new > max(e_old, 1e-5):
            print("ref", y_ref[0, :6])
            print("new", y_new[0, :6])
            return

    # -- speed --
    for (m, k) in [(4096, 4096), (28672, 4096), (4096, 14336),
                   (6144, 4096)]:
        tr = jax.random.randint(key, (k // 16, 8 * KV, m // 16),
                                0, 2**31 - 1, jnp.int32).astype(jnp.uint32)
        x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
        t_old = timeit(lambda xx, tt: tcq1_decode_matmul(
            xx, tt, KV, "1mad", m, k), x, tr)
        t_new = timeit(lambda xx, tt: tcq1_mxu_decode_matmul(
            xx, tt, KV, m, k), x, tr)
        gw_o = k * m / t_old / 1e3
        gw_n = k * m / t_new / 1e3
        print(f"m={m:6d} k={k:6d}: old {t_old:7.1f} us ({gw_o:6.0f} Gw/s)"
              f"  mxu {t_new:7.1f} us ({gw_n:6.0f} Gw/s)"
              f"  speedup {t_old/t_new:.2f}x")


if __name__ == "__main__":
    main()
