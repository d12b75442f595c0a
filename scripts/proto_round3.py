#!/usr/bin/env python
"""Round-3 kernel perf sprint: cut the int8-MXU feed per weight.

Round-2 state: fused tcq1/tcq2 int8 kernels run 872-1178 Gw/s; ablations
put the int8 dot at ~950 Gw/s (binding) and decode at ~1250-1525 Gw/s.
The dot streams FOUR int8 bytes per weight (h = u*A as 4 signed bytes,
x repeated 4x).  This round probes feeds below 4 bytes/weight:

  sum2    V=2 pair state, ONE u32 word per weight PAIR: h = u*A;
          w_even = sb0+sb1, w_odd = sb2+sb3 (signed bytes).  MXU feed =
          2 bytes/weight (x repeated 2x), decode = 1 mul + 1 store per
          pair (vs 2 muls + 2 stores for dualmad).  Quality is the open
          question (triangular marginal vs Irwin-4) - measured separately
          by proto_sum2_quality.py.
  int4    probe: does Mosaic lower int4 x int4 (or int8 x int4) MXU dots,
          and at what rate vs int8?  If 2x int8: nib8 variant (w = sum of
          4 signed nibbles of a 16-bit scramble half) gives 2-byte-equiv
          feed with an Irwin-4-shaped marginal.
  dot-only ablations at K/2 to confirm the feed-rate hypothesis.
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from qpalette_tpu.kernels.fused import (_cparams, _pick_width,
                                        _MAD1_A, _MAD1_B, _MAD2_A)
from qpalette_tpu.kernels import formats as kf
from qpalette_tpu.ops import packing

from proto_fold import timeit  # noqa: E402

SUM2_SCALE = 104.0


def _extract(planes, KV, i):
    off = KV * i
    j0, sh = off >> 5, off & 31
    if sh + 16 <= 32:
        u = planes[j0] >> jnp.uint32(sh) if sh else planes[j0]
    else:
        u = ((planes[j0] >> jnp.uint32(sh))
             | (planes[j0 + 1] << jnp.uint32(32 - sh)))
    return u & jnp.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# sum2 kernel: one u32 row per weight pair -> int8 feed 2 bytes/weight
# ---------------------------------------------------------------------------

def _sum2_kernel(x_ref, tr_ref, o_ref, d0, d1, *, KV, tk, wm, cc, NP,
                 pingpong):
    j = pl.program_id(1)
    A = jnp.uint32(_MAD1_A)
    B = jnp.uint32(_MAD1_B)

    def decode_tile(kt, d_ref, row0):
        planes = [tr_ref[kt, jj * 8:(jj + 1) * 8, :] for jj in range(NP)]
        for i in range(16):
            u = _extract(planes, KV, i)
            d_ref[row0 + kt * 8:row0 + kt * 8 + 8,
                  i * wm:(i + 1) * wm] = u * A + B

    x = x_ref[0]
    acc = None
    nch = tk // cc
    for c in range(nch):
        c0 = c * cc
        if pingpong:
            d_ref = d0 if c % 2 == 0 else d1
            row0 = -c0 * 8
        else:
            d_ref = d0
            row0 = 0
        for kt in range(c0, c0 + cc):
            decode_tile(kt, d_ref, row0)
        chunk = d_ref[(0 if pingpong else c0 * 8):
                      (cc * 8 if pingpong else (c0 + cc) * 8), :]
        hmat = pltpu.bitcast(chunk, jnp.int8)
        part = jax.lax.dot_general(
            x[:, c0 * 32:(c0 + cc) * 32], hmat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit,
                   static_argnames=("KV", "m", "k", "wm", "tkc", "ccc",
                                    "pingpong"))
def run_sum2(x, tr_pl, KV, m, k, wm=128, tkc=32, ccc=8, pingpong=False):
    N = x.shape[0]
    NP = kf.tcq1_n_planes(KV)
    kt_total = k // 16
    tk = next(c for c in (tkc, 16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = wm if (m // 16) % wm == 0 else _pick_width(m // 16, (128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    cc = next(c for c in (ccc, 4, 2, 1) if tk % c == 0)

    # natural tile order IS pair-interleaved (pair t = cols 2t, 2t+1);
    # bytes (b0,b1)->even col, (b2,b3)->odd col => repeat each col 2x
    xp = jnp.repeat(x.reshape(N, gk, tk * 16).transpose(1, 0, 2), 2, axis=2)
    sx = jnp.max(jnp.abs(xp)).astype(jnp.float32) / 127.0
    xq = jnp.round(xp.astype(jnp.float32) / sx).astype(jnp.int8)
    rows = (cc if pingpong else tk) * 8
    scratch = [pltpu.VMEM((rows, 16 * wm), jnp.uint32),
               pltpu.VMEM((rows, 16 * wm) if pingpong else (8, 128),
                          jnp.uint32)]
    out = pl.pallas_call(
        functools.partial(_sum2_kernel, KV=KV, tk=tk, wm=wm, cc=cc, NP=NP,
                          pingpong=pingpong),
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.int32),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((1, N, 2 * tk * 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, NP * 8, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=_cparams(),
    )(xq, tr_pl)
    out = out.astype(jnp.float32) * (sx / SUM2_SCALE)
    return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2).reshape(N, m))


def lut_sum2():
    s = np.arange(1 << 16, dtype=np.uint64)
    h = (s * _MAD1_A + _MAD1_B) & 0xFFFFFFFF
    b = np.stack([(h >> (8 * i)) & 255 for i in range(4)], 1).astype(np.int64)
    sb = np.where(b >= 128, b - 256, b)
    w0 = sb[:, 0] + sb[:, 1]
    w1 = sb[:, 2] + sb[:, 3]
    return (np.stack([w0, w1], 1) / SUM2_SCALE).astype(np.float32)


# ---------------------------------------------------------------------------
# dot-rate ablations: int8 at K and K/2; int4 probes
# ---------------------------------------------------------------------------

def _dot_kernel(x_ref, w_ref, o_ref, *, nk):
    acc = None
    K = w_ref.shape[0] // nk
    for c in range(nk):
        part = jax.lax.dot_general(
            x_ref[:, c * K:(c + 1) * K], w_ref[c * K:(c + 1) * K, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = part if acc is None else acc + part
    o_ref[:] = acc


def time_dot(N, K, M, dtype, xdtype=None, nk=4, gm=1):
    xdtype = xdtype or dtype
    x = jnp.ones((N, K), xdtype)
    w = jnp.ones((K, M), dtype)

    @jax.jit
    def run(x, w):
        return pl.pallas_call(
            functools.partial(_dot_kernel, nk=nk),
            out_shape=jax.ShapeDtypeStruct((N, M), jnp.int32),
            grid=(gm,),
            in_specs=[pl.BlockSpec((N, K), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((K, M // gm), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N, M // gm), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            compiler_params=(pltpu.CompilerParams(
                dimension_semantics=("parallel",))),
        )(x, w)

    # feed-back trick: x depends on result so scan can't hoist
    def fb(xx, ww):
        return run(xx, ww).astype(xdtype) if xdtype != jnp.int8 else \
            run(xx, ww).astype(jnp.int8)
    t = timeit(lambda xx: run(xx.astype(xdtype), w).astype(jnp.float32),
               jnp.ones((N, K), jnp.float32))
    return t


def probe_int4():
    print("== int4 MXU probes ==")
    for name, wd, xd in [("i8 x i8 ", jnp.int8, jnp.int8),
                         ("i4 x i4 ", jnp.int4, jnp.int4),
                         ("i8 x i4w", jnp.int4, jnp.int8)]:
        try:
            K, M = 2048, 2048
            t = time_dot(1, K, M, wd, xd)
            print(f"  {name}: K={K} M={M} N=1  {t:8.1f} us  "
                  f"{K * M / t / 1e3:7.1f} Gelem/s")
        except Exception as e:
            print(f"  {name}: FAIL {type(e).__name__} {str(e)[:140]}")
    # int4 bitcast probe
    try:
        def bk(a_ref, o_ref):
            o_ref[:] = pltpu.bitcast(a_ref[:], jnp.int4).astype(
                jnp.int8)[:, :128]

        r = pl.pallas_call(
            bk, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.full((8, 128), 0x21, jnp.uint32))
        print("  bitcast u32->i4 OK:", np.asarray(r)[:2, 0])
    except Exception as e:
        print("  bitcast u32->i4 FAIL:", type(e).__name__, str(e)[:140])


def main():
    key = jax.random.PRNGKey(0)
    probe_int4()

    print("== dot-rate vs K (int8, N=1, M=2048) ==")
    for K in (4096, 2048, 1024):
        t = time_dot(1, K, 2048, jnp.int8, nk=4)
        print(f"  K={K:5d}: {t:8.1f} us  {K * 2048 / t / 1e3:7.1f} Gelem/s")

    # correctness: sum2 kernel vs spec dequant
    KV = 6
    m, k = 1024, 2048
    ntiles = (m // 16) * (k // 16)
    w2 = jax.random.randint(key, (ntiles, 4 * KV), 0, 2 ** 31 - 1,
                            jnp.int32).astype(jnp.uint32)
    lut = jnp.asarray(lut_sum2())
    W = packing.dequant_tcq2(w2, lut, m, k, KV)
    x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
    y_ref = np.asarray(x.astype(jnp.float32) @ W.T.astype(jnp.float32))
    tr2 = kf.tcq2_planar_weights(w2, m, k, KV)
    y = np.asarray(run_sum2(x, tr2, KV, m, k))
    rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
    print(f"sum2 max-rel-err vs spec: {rel:.5f} (int8-x quantization only)")

    shapes = [("qkv", 6144, 4096), ("o", 4096, 4096),
              ("ug", 28672, 4096), ("down", 4096, 14336)]
    for KV in (6, 7):
        print(f"== sum2 sweep KV={KV} ({KV / 2}bpw) ==")
        for name, m, k in shapes:
            ntiles = (m // 16) * (k // 16)
            w2 = jax.random.randint(key, (ntiles, 4 * KV), 0, 2 ** 31 - 1,
                                    jnp.int32).astype(jnp.uint32)
            tr2 = kf.tcq2_planar_weights(w2, m, k, KV)
            x = jax.random.normal(key, (1, k), jnp.float32).astype(
                jnp.bfloat16)
            for label, kw in [("wm128", dict()),
                              ("wm256", dict(wm=256)),
                              ("pp", dict(pingpong=True)),
                              ("pp wm256", dict(pingpong=True, wm=256))]:
                try:
                    t = timeit(lambda xx, tt: run_sum2(xx, tt, KV, m, k,
                                                       **kw), x, tr2)
                    print(f"  {name:5s} {label:9s} {t:9.1f} us "
                          f"{k * m / t / 1e3:7.1f} Gw/s")
                except Exception as e:
                    print(f"  {name:5s} {label:9s} FAIL {type(e).__name__} "
                          f"{str(e)[:100]}")


if __name__ == "__main__":
    main()
