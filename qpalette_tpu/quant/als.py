"""Data-dependent VQ ("sq_*" / "vq2_*" quantizer families).

Reference behavior: lib/quantizer/vq_quant.py:12-78 (simple_vq: k-means on
the actual rotated weights + nearest-centroid assignment) and
lib/quantizer/nuq_op.py (train_least_squares: alternating assignment /
closed-form centroid updates under a Hessian-weighted objective).

Round-1 TPU implementation: k-means codebook fitted on the layer's own
rotated weights, Lloyd refinement, then (when a Hessian is provided)
diagonal-Hessian-weighted centroid re-estimation — the dominant term of the
reference ALS objective.  Full off-diagonal ALS is tracked as follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qpalette_tpu.ops import packing
from qpalette_tpu.utils.kmeans import kmeans


@functools.partial(jax.jit, static_argnames=("nc",))
def _assign(vecs, C, nc, weights=None):
    norms = jnp.sum(C * C, axis=1)
    cross = vecs @ C.T
    return jnp.argmin(norms[None, :] - 2.0 * cross, axis=1)


def quantize_mat_vq_als(Wr, HRr, bits: int, vec: int, use_hess: bool = False,
                        iters: int = 4):
    m, n = Wr.shape
    Wf = np.asarray(Wr, np.float32)
    vecs = Wf.reshape(-1, vec)
    nc = 1 << bits
    C = kmeans(vecs[np.random.default_rng(0).choice(
        len(vecs), min(len(vecs), 1 << 18), replace=False)], nc, iters=25)
    C = jnp.asarray(C)
    vj = jnp.asarray(vecs)

    diagw = None
    if use_hess and HRr is not None:
        # diagonal Hessian importance per input position, broadcast over rows
        d = jnp.clip(jnp.diagonal(jnp.asarray(HRr, jnp.float32)), 1e-8)
        diagw = jnp.tile(d.reshape(1, n // vec, vec), (m, 1, 1)).reshape(-1, vec)

    for _ in range(iters):
        idx = _assign(vj, C, nc)
        w = diagw if diagw is not None else jnp.ones_like(vj)
        num = jnp.zeros((nc, vec)).at[idx].add(vj * w)
        den = jnp.zeros((nc, vec)).at[idx].add(w)
        C = jnp.where(den > 0, num / jnp.maximum(den, 1e-8), C)

    idx = _assign(vj, C, nc)
    hat = jnp.take(C, idx, axis=0).reshape(m, n)
    packed = packing.pack_rows(idx.reshape(m, n // vec).astype(jnp.int32), bits)
    linear = {
        "kind": "vq", "bits": bits, "vec": vec,
        "qweight": np.asarray(packed),
        "lut": np.asarray(C, np.float32),
        "in_features": n, "out_features": m,
    }
    return linear, hat
