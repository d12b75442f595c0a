#!/usr/bin/env python
"""Validate + time the round-3 kernel upgrades on chip:
  - sum2 decode (2 int8/weight MXU feed) at even/odd KV
  - dense planar layout (even KV: true KV/2 bits/weight, no inflation)
  - dualmad on the dense layout (regression)
Correctness vs the executable spec (packing.dequant_tcq2) at small shapes,
then Gw/s at the 8B model shapes for the bench-relevant configs.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from qpalette_tpu.kernels import formats as kf
from qpalette_tpu.kernels import fused
from qpalette_tpu.ops import packing
from qpalette_tpu.ops.codebooks import trellis_lut_arith
from proto_fold import timeit

key = jax.random.PRNGKey(0)


def check(KV, mode, m=256, k=512):
    ntiles = (m // 16) * (k // 16)
    tr = jax.random.randint(key, (ntiles, 4 * KV), 0, 2 ** 31 - 1,
                            jnp.int32).astype(jnp.uint32)
    lut = jnp.asarray(trellis_lut_arith(mode))
    W = packing.dequant_tcq2(tr, lut, m, k, KV)
    trpl = kf.tcq2_planar_weights(tr, m, k, KV)
    Wd = fused.tcq2_dequant(trpl, KV, m, k, mode=mode)
    err_d = float(jnp.abs(Wd.astype(jnp.float32).T - W).max())
    x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
    y_ref = x.astype(jnp.float32) @ W.T
    y = fused.tcq2_decode_matmul(x, trpl, KV, m, k, a8=False, mode=mode)
    err_f = float(jnp.abs(y - y_ref).max() / (jnp.abs(y_ref).max() + 1e-9))
    ya = fused.tcq2_decode_matmul(x, trpl, KV, m, k, a8=True, mode=mode)
    err_a = float(jnp.abs(ya - y_ref).max() / (jnp.abs(y_ref).max() + 1e-9))
    print(f"  KV={KV} {mode:8s} dense={kf.planar_dense(KV)}: "
          f"dequant {err_d:.4f}  fused(bf16) {err_f:.6f}  a8 {err_a:.4f}")
    assert err_f < 1e-5, "bf16 fused path must be bit-exact"
    assert err_a < 0.05


def check1(KV, m=256, k=512):
    ntiles = (m // 16) * (k // 16)
    tr = jax.random.randint(key, (ntiles, 8 * KV), 0, 2 ** 31 - 1,
                            jnp.int32).astype(jnp.uint32)
    lut = jnp.asarray(trellis_lut_arith("1mad"))
    W = packing.dequant_tcq(tr, lut, m, k, KV, v=1)
    trpl = kf.tcq1_planar_weights(tr, m, k, KV)
    Wd = fused.tcq1_dequant(trpl, KV, m, k, mode="1mad")
    err_d = float(jnp.abs(Wd.astype(jnp.float32).T - W).max())
    x = jax.random.normal(key, (1, k), jnp.float32).astype(jnp.bfloat16)
    y_ref = x.astype(jnp.float32) @ W.T
    y = fused.tcq1_decode_matmul(x, trpl, KV, "1mad", m, k)
    err_f = float(jnp.abs(y - y_ref).max() / (jnp.abs(y_ref).max() + 1e-9))
    print(f"  tcq1 KV={KV} dense={kf.planar_dense(KV)}: dequant {err_d:.4f} "
          f"fused {err_f:.6f}")
    assert err_f < 1e-5


def sweep():
    shapes = [("qkv", 6144, 4096), ("o", 4096, 4096),
              ("ug", 28672, 4096), ("down", 4096, 14336)]
    for mode in ("sum2", "dualmad"):
        for KV in (6, 8, 7):
            print(f"== {mode} KV={KV} ({KV / 2}bpw stored="
                  f"{KV / 2 if kf.planar_dense(KV) else 4}bpw) ==")
            for name, m, k in shapes:
                ntiles = (m // 16) * (k // 16)
                tr = jax.random.randint(key, (ntiles, 4 * KV), 0,
                                        2 ** 31 - 1, jnp.int32
                                        ).astype(jnp.uint32)
                trpl = kf.tcq2_planar_weights(tr, m, k, KV)
                x = jax.random.normal(key, (1, k), jnp.float32).astype(
                    jnp.bfloat16)
                t = timeit(lambda xx, tt: fused.tcq2_decode_matmul(
                    xx, tt, KV, m, k, a8=True, mode=mode), x, trpl)
                gbs = m * k * (KV / 2 if kf.planar_dense(KV)
                               else 32 * kf.planar_n_planes(KV) / 8 / KV
                               * KV / 2) / 8 / t / 1e3
                print(f"  {name:5s} {t:9.1f} us  {m * k / t / 1e3:7.1f} "
                      f"Gw/s  {gbs:6.1f} GB/s")


if __name__ == "__main__":
    print("== correctness vs spec ==")
    for KV, mode in [(6, "sum2"), (6, "dualmad"), (8, "sum2"),
                     (7, "sum2"), (7, "dualmad"), (4, "sum2")]:
        check(KV, mode)
    for KV in (4, 3):
        check1(KV)
    sweep()
