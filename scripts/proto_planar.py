#!/usr/bin/env python
"""Prototype: planar-packed tcq1 kernel (pre-swizzled windows + MXU bytes).

Pack-time layout change: tile order is k-major (state p = 16*t + v2, t =
k-col = sublane, v2 = m-row), and the bitstream is stored as per-sublane
ALIGNED 32-bit windows:  planar[kt, j*16 + t, mt] = tile-stream bits
[16*KV*t + 32*j, +32) (circular).  NP = ceil((15*KV+16)/32) planes.

In-kernel state derivation is then constant shifts only:
  u_i = (plane[j0] >> sh) | (plane[j0+1] << (32-sh)),  j0 = (KV*i)>>5
No per-sublane variable shifts, no broadcast/select chains.  The 1mad
byte-sum rides the MXU as in proto_mxu_bytesum.
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


def n_planes(KV: int) -> int:
    return -(-(15 * KV + 16) // 32)


def planar_pack_np(tr: np.ndarray, KV: int) -> np.ndarray:
    """canonical (ktiles, 8KV, mtiles) -> planar (ktiles, NP*16, mtiles)."""
    ktn, W, mtn = tr.shape
    assert W == 8 * KV
    NP = n_planes(KV)
    words = tr.astype(np.uint64)
    out = np.empty((ktn, NP * 16, mtn), np.uint32)
    for t in range(16):
        for j in range(NP):
            off = (16 * KV * t + 32 * j) % (256 * KV)
            w0, sh = off >> 5, np.uint64(off & 31)
            lo = words[:, w0, :]
            hi = words[:, (w0 + 1) % W, :]
            v = (lo >> sh) | (hi << (np.uint64(32) - sh)) if sh else lo
            out[:, j * 16 + t, :] = (v & np.uint64(0xFFFFFFFF)).astype(
                np.uint32)
    return out


def _tcq1p_kernel(x4_ref, tr_ref, o_ref, d_ref, *, KV, tk, wm, cc):
    j = pl.program_id(1)
    NP = n_planes(KV)
    M16 = jnp.uint32(0xFFFF)
    XOR = jnp.uint32(0x80808080)
    A, B = jnp.uint32(_MAD1_A), jnp.uint32(_MAD1_B)

    def decode_tile(kt):
        planes = [tr_ref[kt, jj * 16:(jj + 1) * 16, :] for jj in range(NP)]
        for i in range(16):  # i = m-row within tile (v2)
            off = KV * i
            j0, sh = off >> 5, off & 31
            if sh + 16 <= 32:
                u = planes[j0] >> jnp.uint32(sh) if sh else planes[j0]
            else:
                u = ((planes[j0] >> jnp.uint32(sh))
                     | (planes[j0 + 1] << jnp.uint32(32 - sh)))
            h = (u & M16) * A + B
            d_ref[kt * 16:(kt + 1) * 16, i * wm:(i + 1) * wm] = h ^ XOR

    x4 = x4_ref[0]  # (N, 4*tk*16)
    acc = None
    for c0 in range(0, tk, cc):
        for kt in range(c0, c0 + cc):
            decode_tile(kt)
        h8 = pltpu.bitcast(d_ref[c0 * 16:(c0 + cc) * 16, :], jnp.int8)
        part = jax.lax.dot_general(
            x4[:, c0 * 64:(c0 + cc) * 64], h8.astype(DDT),
            (((1,), (0,)), ((), ())), preferred_element_type=ACC)
        acc = part if acc is None else acc + part
    # each x element appears 4x in x4, so sum(x4)/4 == sum(x)
    sumx = jnp.sum(x4.astype(ACC), axis=1, keepdims=True) * 0.25
    acc = (acc + 2.0 * sumx) * _MAD_INV

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("KV", "m", "k"))
def tcq1p_decode_matmul(x, tr_pl, KV: int, m: int, k: int):
    N = x.shape[0]
    NP = n_planes(KV)
    kt_total = k // 16
    tk = next(c for c in (32, 16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(256, 128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    cc = next(c for c in (8, 4, 2, 1) if tk % c == 0)
    xp = x.astype(DDT).reshape(N, gk, tk * 16).transpose(1, 0, 2)
    x4 = jnp.repeat(xp, 4, axis=2)
    out = pl.pallas_call(
        functools.partial(_tcq1p_kernel, KV=KV, tk=tk, wm=wm, cc=cc),
        out_shape=jax.ShapeDtypeStruct((N, m), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((1, N, 4 * tk * 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, NP * 16, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tk * 16, 16 * wm), jnp.uint32)],
        compiler_params=_cparams(),
    )(x4, tr_pl)
    return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2).reshape(N, m))


def exact_reference_kmajor(x, tr_kt, KV, m, k):
    """f32 ground truth with the NEW k-major tile order."""
    tr = np.asarray(tr_kt)
    kt_n, W, mt_n = tr.shape
    p = np.arange(256)
    bitoff = (KV * p) % (32 * W)
    w0 = bitoff // 32
    sh = (bitoff % 32).astype(np.uint64)
    words = tr.astype(np.uint64)
    lo = words[:, w0, :]
    hi = words[:, (w0 + 1) % W, :]
    state = (lo >> sh[None, :, None]) | (hi << (32 - sh[None, :, None]))
    u = (state & 0xFFFF).astype(np.uint32)
    h = (u * np.uint32(_MAD1_A) + np.uint32(_MAD1_B)).astype(np.uint32)
    ssum = ((h & 255) + ((h >> 8) & 255) + ((h >> 16) & 255)
            + ((h >> 24) & 255))
    val = (ssum.astype(np.float32) - 510.0) * _MAD_INV  # (kt, 256, mt)
    # k-major: p = 16*t + v2 -> (kt, t, v2, mt)
    val = val.reshape(kt_n, 16, 16, mt_n)
    Wmat = val.transpose(3, 2, 0, 1).reshape(m, k)  # (mt,v2),(kt,t)
    xf = np.asarray(x.astype(jnp.float32))
    return xf @ Wmat.T


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


def main():
    key = jax.random.PRNGKey(0)
    for KV in (3, 4):
        m, k = 1024, 2048
        tr = np.asarray(jax.random.randint(
            key, (k // 16, 8 * KV, m // 16), 0, 2**31 - 1,
            jnp.int32)).astype(np.uint32)
        x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
        y_ref = exact_reference_kmajor(x, tr, KV, m, k)
        trp = jnp.asarray(planar_pack_np(tr, KV))
        y_new = np.asarray(tcq1p_decode_matmul(x, trp, KV, m, k))
        s = np.std(y_ref) + 1e-9
        err = np.max(np.abs(y_new - y_ref)) / s
        print(f"KV={KV} m={m} k={k}: planar err-vs-f32 {err:.3e} "
              f"{'OK' if err < 1e-5 else 'MISMATCH'}")
        if err >= 1e-5:
            print("ref", y_ref[0, :6]); print("new", y_new[0, :6])
            return

    KV = 3
    for (m, k) in [(4096, 4096), (28672, 4096), (4096, 14336),
                   (6144, 4096)]:
        tr = np.asarray(jax.random.randint(
            key, (k // 16, 8 * KV, m // 16), 0, 2**31 - 1,
            jnp.int32)).astype(np.uint32)
        x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
        trj = jnp.asarray(tr)
        trp = jnp.asarray(planar_pack_np(tr, KV))
        t_old = timeit(lambda xx, tt: tcq1_decode_matmul(
            xx, tt, KV, "1mad", m, k), x, trj)
        t_new = timeit(lambda xx, tt: tcq1p_decode_matmul(
            xx, tt, KV, m, k), x, trp)
        gw_o = k * m / t_old / 1e3
        gw_n = k * m / t_new / 1e3
        print(f"m={m:6d} k={k:6d}: old {t_old:7.1f} us ({gw_o:6.0f} Gw/s)"
              f"  planar {t_new:7.1f} us ({gw_n:6.0f} Gw/s)"
              f"  speedup {t_old/t_new:.2f}x")




def sweep():
    """Block-size sweep at the model's shapes."""
    import itertools
    key = jax.random.PRNGKey(0)
    KV = 3
    global _pick_width
    for (m, k) in [(4096, 4096), (28672, 4096), (4096, 14336),
                   (6144, 4096)]:
        tr = np.asarray(jax.random.randint(
            key, (k // 16, 8 * KV, m // 16), 0, 2**31 - 1,
            jnp.int32)).astype(np.uint32)
        x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
        trp = jnp.asarray(planar_pack_np(tr, KV))
        best = (1e18, None)
        for wm, tk, cc in itertools.product((64, 128, 256), (8, 16, 32),
                                            (4, 8)):
            if (m // 16) % wm or (k // 16) % tk or tk % cc:
                continue
            if tk * 16 * 16 * wm * 4 > 12 * 2**20:  # scratch cap
                continue
            fn = make_variant(wm, tk, cc, KV, m, k)
            try:
                t = timeit(lambda xx, tt: fn(xx, tt), x, trp)
            except Exception as e:
                print(f"  wm={wm} tk={tk} cc={cc}: FAIL {type(e).__name__}")
                continue
            gw = k * m / t / 1e3
            print(f"  m={m} k={k} wm={wm:3d} tk={tk:2d} cc={cc}: "
                  f"{t:7.1f} us ({gw:6.0f} Gw/s)")
            if t < best[0]:
                best = (t, (wm, tk, cc))
        print(f"== m={m} k={k}: best {best[1]} {best[0]:.1f} us "
              f"({k*m/best[0]/1e3:.0f} Gw/s)")


def make_variant(wm, tk, cc, KV, m, k):
    NP = n_planes(KV)
    kt_total = k // 16
    gk = kt_total // tk
    gm = (m // 16) // wm

    @jax.jit
    def fn(x, tr_pl):
        N = x.shape[0]
        xp = x.astype(DDT).reshape(N, gk, tk * 16).transpose(1, 0, 2)
        x4 = jnp.repeat(xp, 4, axis=2)
        out = pl.pallas_call(
            functools.partial(_tcq1p_kernel, KV=KV, tk=tk, wm=wm, cc=cc),
            out_shape=jax.ShapeDtypeStruct((N, m), ACC),
            grid=(gm, gk),
            in_specs=[
                pl.BlockSpec((1, N, 4 * tk * 16), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tk, NP * 16, wm), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((tk * 16, 16 * wm), jnp.uint32)],
            compiler_params=_cparams(),
        )(x4, tr_pl)
        return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2)
                .reshape(N, m))
    return fn


if __name__ == "__main__":
    import sys
    sweep() if "sweep" in sys.argv else main()
