#!/usr/bin/env python
"""Round 3 of the kernel sprint: E=1 folded bf16 dots with ping-pong.

proto_fold2 showed the int8 dot binds at ~950-990 Gw/s and that MXU time
scales with ENTRY count (instruction-issue bound at N=1), so an E=1 bf16
dot should stream ~2x the int8-E=4 rate — IF the fold's VPU work overlaps
the dot.  proto_fold's f32 variant serialized through the single scratch
(full 349 vs dotonly 1004); this round adds explicit ping-pong buffers.

Variants (all KV=3-equivalent 3 bits/weight):
  f32pp    tcq1 fold-to-16-bit-sums, pack k-row pairs, E=1 bf16, ping-pong
  t2f32    tcq2(KV=6) same fold; pack (h1,h2) pairs -> IDENTITY x order
  t2f32pp  + ping-pong
  i8ctrl   best known (tcq2-i8) as control
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from qpalette_tpu.kernels.fused import (_cparams, _pick_width, DDT, ACC,
                                        _MAD1_A, _MAD1_B, _MAD2_A, _MAD_INV,
                                        _planar_states)
from qpalette_tpu.kernels import formats as kf
from qpalette_tpu.ops import packing

from proto_fold import timeit  # noqa: E402

MPAIR = None


def _kernel(x_ref, tr_ref, o_ref, d0, d1, *, KV, tk, wm, cc, NP, v2,
            pingpong, abl):
    j = pl.program_id(1)
    MPAIR = jnp.uint32(0x00FF00FF)
    M16 = jnp.uint32(0xFFFF)
    A1, B1 = jnp.uint32(_MAD1_A), jnp.uint32(_MAD1_B)
    A2 = jnp.uint32(_MAD2_A)
    sub = 8 if v2 else 16

    def fold(h):
        t2 = (h & MPAIR) + ((h >> jnp.uint32(8)) & MPAIR)
        return t2 + (t2 >> jnp.uint32(16))  # low16 = 4-byte unsigned sum

    XOR = jnp.uint32(0x80808080)

    def decode_tile(kt, d_ref, row0):
        for i, u in _planar_states(tr_ref, kt, KV, NP, sub):
            if v2:
                # dualmad sums SIGNED bytes: bias via XOR 0x80 per byte so
                # unsigned-fold - 512 equals the signed sum
                s1 = fold((u * A1) ^ XOR)
                s2 = fold((u * A2) ^ XOR)
                pk = (s1 & M16) | (s2 << jnp.uint32(16))
                d_ref[row0 + kt * 8:row0 + kt * 8 + 8,
                      i * wm:(i + 1) * wm] = pk
            else:
                s4 = fold(u * A1 + B1)  # (16, wm)
                lo = s4[:8, :] & M16
                hi = s4[8:, :] << jnp.uint32(16)
                d_ref[row0 + kt * 8:row0 + kt * 8 + 8,
                      i * wm:(i + 1) * wm] = lo | hi

    x = x_ref[0]
    acc = None
    for c in range(tk // cc):
        c0 = c * cc
        if pingpong:
            d_ref, row0 = (d0 if c % 2 == 0 else d1), -c0 * 8
        else:
            d_ref, row0 = d0, 0
        if abl != "dotonly" or c == 0:
            for kt in range(c0, c0 + cc):
                decode_tile(kt, d_ref, row0)
        if abl == "deconly":
            continue
        lo = 0 if pingpong else c0 * 8
        chunk = d_ref[lo:lo + cc * 8, :]
        hmat = pltpu.bitcast(chunk, jnp.int16).astype(DDT)
        part = jax.lax.dot_general(
            x[:, c0 * 16:(c0 + cc) * 16], hmat,
            (((1,), (0,)), ((), ())), preferred_element_type=ACC)
        acc = part if acc is None else acc + part
    if abl == "deconly":
        acc = jnp.zeros(o_ref.shape[-2:], ACC) + (
            d0[0, 0].astype(jnp.int32) * 0).astype(ACC)

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("KV", "m", "k", "v2",
                                             "pingpong", "abl"))
def run(x, tr_pl, KV, m, k, v2=False, pingpong=False, abl="full"):
    N = x.shape[0]
    NP = kf.tcq1_n_planes(KV)
    kt_total = k // 16
    tk = next(c for c in (32, 16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    cc = next(c for c in (8, 4, 2, 1) if tk % c == 0)
    if v2:
        # identity within-tile order: k = 2t + comp == scratch row order
        xp = x.reshape(N, gk, tk * 16).transpose(1, 0, 2)
    else:
        # pair k-rows (r, r+8): scratch row 2r/2r+1 = k-cols r / r+8
        xp = (x.reshape(N, gk, tk, 2, 8).transpose(1, 0, 2, 4, 3)
              .reshape(gk, N, tk * 16))
    xp = xp.astype(DDT)
    rows = (cc if pingpong else tk) * 8
    scratch = [pltpu.VMEM((rows, 16 * wm), jnp.uint32),
               pltpu.VMEM((rows, 16 * wm) if pingpong else (8, 128),
                          jnp.uint32)]
    out = pl.pallas_call(
        functools.partial(_kernel, KV=KV, tk=tk, wm=wm, cc=cc, NP=NP,
                          v2=v2, pingpong=pingpong, abl=abl),
        out_shape=jax.ShapeDtypeStruct((N, m), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((1, N, tk * 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, NP * (8 if v2 else 16), wm),
                         lambda i, j: (j, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=_cparams(),
    )(xp, tr_pl)
    sumx = jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    off = 512.0 if v2 else 510.0
    out = (out - off * sumx) * _MAD_INV
    return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2).reshape(N, m))


def main():
    key = jax.random.PRNGKey(0)
    from qpalette_tpu.ops.codebooks import trellis_lut_arith
    from qpalette_tpu.kernels.fused import (tcq1_decode_matmul,
                                            tcq2_decode_matmul)
    # correctness vs exact kernels
    m, k = 1024, 2048
    KV1, KV2 = 3, 6
    nt = (m // 16) * (k // 16)
    w1 = jax.random.randint(key, (nt, 8 * KV1), 0, 2**31 - 1,
                            jnp.int32).astype(jnp.uint32)
    w2 = jax.random.randint(key, (nt, 4 * KV2), 0, 2**31 - 1,
                            jnp.int32).astype(jnp.uint32)
    t1 = kf.tcq1_planar_weights(w1, m, k, KV1)
    t2 = kf.tcq2_planar_weights(w2, m, k, KV2)
    x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
    for nm, (tr, kv, v2, refk) in {
        "f32": (t1, KV1, False,
                lambda: tcq1_decode_matmul(x, t1, KV1, "1mad", m, k)),
        "t2f32": (t2, KV2, True,
                  lambda: tcq2_decode_matmul(x, t2, KV2, m, k)),
    }.items():
        y_ref = np.asarray(refk())
        y = np.asarray(run(x, tr, kv, m, k, v2=v2))
        rel = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        print(f"{nm}: max-rel-err vs exact kernel {rel:.5f}")

    for name, m, k in [("o", 4096, 4096), ("ug", 28672, 4096),
                       ("down", 4096, 14336)]:
        nt = (m // 16) * (k // 16)
        w1 = jax.random.randint(key, (nt, 8 * KV1), 0, 2**31 - 1,
                                jnp.int32).astype(jnp.uint32)
        w2 = jax.random.randint(key, (nt, 4 * KV2), 0, 2**31 - 1,
                                jnp.int32).astype(jnp.uint32)
        t1 = kf.tcq1_planar_weights(w1, m, k, KV1)
        t2 = kf.tcq2_planar_weights(w2, m, k, KV2)
        x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
        print(f"== {name}: m={m} k={k} ==")
        for label, tr, kw in [
            ("f32", t1, dict()),
            ("f32 pp", t1, dict(pingpong=True)),
            ("f32 pp dot", t1, dict(pingpong=True, abl="dotonly")),
            ("f32 pp dec", t1, dict(pingpong=True, abl="deconly")),
            ("t2f32", t2, dict(v2=True)),
            ("t2f32 pp", t2, dict(v2=True, pingpong=True)),
            ("t2f32 pp dot", t2, dict(v2=True, pingpong=True,
                                      abl="dotonly")),
            ("t2f32 pp dec", t2, dict(v2=True, pingpong=True,
                                      abl="deconly")),
        ]:
            kv = KV2 if kw.get("v2") else KV1
            try:
                t = timeit(lambda xx, tt: run(xx, tt, kv, m, k, **kw),
                           x, tr)
                print(f"  {label:14s} {t:9.1f} us  {k*m/t/1e3:7.1f} Gw/s")
            except Exception as e:
                print(f"  {label:14s} FAILED {type(e).__name__} "
                      f"{str(e)[:100]}")


if __name__ == "__main__":
    main()
