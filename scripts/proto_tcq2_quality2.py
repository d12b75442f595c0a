#!/usr/bin/env python
"""Quality probes for op-reduced arithmetic trellis decodes.

All: h = (u*A [+B]) mod 2^32, signed bytes sb_i (int8 reinterpret).
Weight = sum of alpha-weighted signed bytes (alphas ride the activation
vector at zero kernel cost).
"""
import itertools
import numpy as np
import jax.numpy as jnp

from qpalette_tpu.ops.codebooks import MAD1_A, MAD1_B
from qpalette_tpu.quant.viterbi import tcq_quantize

L = 16


def sbytes(h):
    b = np.stack([(h >> (8 * i)) & 255 for i in range(4)], 1).astype(np.int64)
    return np.where(b >= 128, b - 256, b).astype(np.float64)


def lut_v1(alphas, A=MAD1_A, B=0):
    s = np.arange(1 << L, dtype=np.uint64)
    h = (s * A + B) & 0xFFFFFFFF
    w = sbytes(h) @ np.asarray(alphas, np.float64)
    lut = w[:, None].astype(np.float32)
    return lut / np.sqrt((lut ** 2).mean())


def lut_v2(alphas, A=MAD1_A, B=0):
    """w0 = a0*sb0 + a1*sb1, w1 = a0*sb2 + a1*sb3."""
    s = np.arange(1 << L, dtype=np.uint64)
    h = (s * A + B) & 0xFFFFFFFF
    sb = sbytes(h)
    a0, a1 = alphas
    lut = np.stack([a0 * sb[:, 0] + a1 * sb[:, 1],
                    a0 * sb[:, 2] + a1 * sb[:, 3]], 1).astype(np.float32)
    return lut / np.sqrt((lut ** 2).mean())


def proxy_err(lut, KV, v, size=1024, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((size, size)).astype(np.float32)
    seqs = jnp.asarray(W.reshape(-1, 256))
    hat, _ = tcq_quantize(seqs, jnp.asarray(lut), KV, v=v)
    return float(((np.asarray(hat) - W.reshape(-1, 256)) ** 2).mean())


if __name__ == "__main__":
    print("V=1 KV=3 signed, no B, a=1111:",
          proxy_err(lut_v1([1, 1, 1, 1]), 3, 1))
    print("V=1 KV=3 signed, +B, a=1111:",
          proxy_err(lut_v1([1, 1, 1, 1], B=MAD1_B), 3, 1))
    for a1 in (1.0, 0.75, 0.6, 0.5):
        print(f"V=2 KV=6 signed, no B, a=(1,{a1}):",
              proxy_err(lut_v2([1, a1]), 6, 2))
    # different multipliers (odd, rich bit mixing)
    for A in (MAD1_A, 0x9E3779B1, 0x85EBCA77, 2654435761):
        print(f"V=2 KV=6 A={A:#x} a=(1,0.75):",
              proxy_err(lut_v2([1, 0.75], A=A), 6, 2))
