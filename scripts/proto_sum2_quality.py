#!/usr/bin/env python
"""Round-3 quality sweep for reduced-MXU-feed trellis decode variants.

Candidates (state u16, h = u*A+B mod 2^32, sb = signed bytes, sn = signed
nibbles):
  sum2      w0 = sb0+sb1, w1 = sb2+sb3        (2 int8/weight feed)
  sum2s     byte scales: w0 = sb0 + s*sb1 ... (free x-side constants)
  nib8      w0 = sn0+..+sn3 (lo16), w1 = sn4+..+sn7 (hi16)
            (4 int4/weight feed - only useful if int4 MXU is 2x int8)
  dual      reference tcq2 (4 int8/weight)    [round-2 baseline 0.0191@3b]

All V=2 (one state per weight pair).  Proxy err protocol = mem_op.py
cache_quantizer_err (random Gaussian matrix, no Hessian).
"""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from qpalette_tpu.ops.codebooks import MAD1_A, MAD1_B, MAD2_A, MAD2_B
from qpalette_tpu.quant.viterbi import tcq_quantize


def _sbytes(h):
    b = np.stack([(h >> (8 * i)) & 255 for i in range(4)], 1).astype(np.int64)
    return np.where(b >= 128, b - 256, b)


def _snibs(h16):
    n = np.stack([(h16 >> (4 * i)) & 15 for i in range(4)], 1).astype(np.int64)
    return np.where(n >= 8, n - 16, n)


def lut_sum2(A=MAD1_A, B=MAD1_B, s=1.0):
    u = np.arange(1 << 16, dtype=np.uint64)
    h = (u * A + B) & 0xFFFFFFFF
    sb = _sbytes(h)
    w0 = sb[:, 0] + s * sb[:, 1]
    w1 = sb[:, 2] + s * sb[:, 3]
    lut = np.stack([w0, w1], 1).astype(np.float32)
    return lut / np.sqrt((lut ** 2).mean())

def lut_nib8(A=MAD1_A, B=MAD1_B):
    u = np.arange(1 << 16, dtype=np.uint64)
    h = (u * A + B) & 0xFFFFFFFF
    w0 = _snibs(h & 0xFFFF).sum(1)
    w1 = _snibs((h >> 16) & 0xFFFF).sum(1)
    lut = np.stack([w0, w1], 1).astype(np.float32)
    return lut / np.sqrt((lut ** 2).mean())


def lut_dual():
    u = np.arange(1 << 16, dtype=np.uint64)
    out = []
    for A in (MAD1_A, MAD2_A):
        h = (u * A) & 0xFFFFFFFF
        out.append(_sbytes(h).sum(1))
    lut = np.stack(out, 1).astype(np.float32)
    return lut / np.sqrt((lut ** 2).mean())


def proxy_err(lut, KV, size=1024, seed=0):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((size, size)).astype(np.float32)
    seqs = jnp.asarray(W.reshape(-1, 256))
    hat, _ = tcq_quantize(seqs, jnp.asarray(lut), KV, v=2)
    return float(((np.asarray(hat) - W.reshape(-1, 256)) ** 2).mean())


if __name__ == "__main__":
    sz = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    print(f"(size={sz})")
    print("dual  KV=6 (3.0bpw):", proxy_err(lut_dual(), 6, sz))
    for KV in (6, 7, 8):
        print(f"sum2  KV={KV} ({KV/2}bpw):", proxy_err(lut_sum2(), KV, sz))
    for s in (0.75, 0.5, 1.25):
        print(f"sum2s s={s} KV=6:", proxy_err(lut_sum2(s=s), 6, sz))
    for A, B, tag in ((MAD2_A, MAD2_B, "A2"), (2654435761, 0x9E3779B9, "fib")):
        print(f"sum2 {tag} KV=6:", proxy_err(lut_sum2(A=A, B=B), 6, sz))
    for KV in (6, 7):
        print(f"nib8  KV={KV} ({KV/2}bpw):", proxy_err(lut_nib8(), KV, sz))
