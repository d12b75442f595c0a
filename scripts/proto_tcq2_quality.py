#!/usr/bin/env python
"""Quality check for the V=2 arithmetic-decode trellis (tcq2) vs tcq1.

tcq2 decode candidates (state s, h = s*A+B mod 2^32, bytes b0..b3):
  sum2   w0 = (b0+b1-255)/s2, w1 = (b2+b3-255)/s2   (1 mul per 2 weights)
  dual   w0 = bytesum4(s*A1+B1)/s4, w1 = bytesum4(s*A2+B2)/s4 (2 muls)
Both compared at 3 bits/weight: tcq2 KV=6 (bits per state) vs tcq1 KV=3.
"""
import numpy as np
import jax.numpy as jnp

from qpalette_tpu.ops.codebooks import (MAD1_A, MAD1_B, MAD2_A, MAD2_B,
                                        trellis_lut_arith)
from qpalette_tpu.quant.viterbi import tcq_quantize

L = 16


def lut_pair_sum2(A=MAD1_A, B=MAD1_B):
    s = np.arange(1 << L, dtype=np.uint64)
    h = (s * A + B) & 0xFFFFFFFF
    w0 = ((h & 255) + ((h >> 8) & 255)).astype(np.float64) - 255.0
    w1 = (((h >> 16) & 255) + ((h >> 24) & 255)).astype(np.float64) - 255.0
    lut = np.stack([w0, w1], 1).astype(np.float32)
    return lut / np.sqrt((lut ** 2).mean())


def lut_pair_dual():
    s = np.arange(1 << L, dtype=np.uint64)
    out = []
    for A, B in ((MAD1_A, MAD1_B), (MAD2_A, MAD2_B)):
        h = (s * A + B) & 0xFFFFFFFF
        y = ((h & 255) + ((h >> 8) & 255) + ((h >> 16) & 255)
             + ((h >> 24) & 255)).astype(np.float64) - 510.0
        out.append(y)
    lut = np.stack(out, 1).astype(np.float32)
    return lut / np.sqrt((lut ** 2).mean())


def proxy_err(lut, KV, v, size=1024, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((size, size)).astype(np.float32)
    seqs = jnp.asarray(W.reshape(-1, 256))
    hat, _ = tcq_quantize(seqs, jnp.asarray(lut), KV, v=v)
    hat = np.asarray(hat)
    return float(((hat - W.reshape(-1, 256)) ** 2).mean())


if __name__ == "__main__":
    l1 = trellis_lut_arith("1mad")
    l1 = l1 / np.sqrt((l1 ** 2).mean())
    print("tcq1 KV=3 (V=1, 3bpw):", proxy_err(l1, 3, 1))
    print("tcq2 sum2 KV=6 (V=2, 3bpw):", proxy_err(lut_pair_sum2(), 6, 2))
    print("tcq2 dual KV=6 (V=2, 3bpw):", proxy_err(lut_pair_dual(), 6, 2))
    print("tcq2 sum2 KV=8 (V=2, 4bpw):", proxy_err(lut_pair_sum2(), 8, 2))
    l1 = trellis_lut_arith("1mad")
    l1 = l1 / np.sqrt((l1 ** 2).mean())
    print("tcq1 KV=4 (V=1, 4bpw):", proxy_err(l1, 4, 1))
