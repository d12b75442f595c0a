"""Coordinate-descent refinement of quantized weights.

Reference behavior: lib/algo/ldlq_beam_cd.py:105-209 — after LDLQ, sweep
coordinate blocks re-optimizing each assignment against the *global*
Hessian-weighted residual (local + cross terms).

Formulation: minimize tr(E H Eᵀ), E = Ŵ − W.  Exact block-CD update for
column block j (size = vec): the unconstrained optimum given all other
columns is  t_j = Ŵ_j − (E H)_j (H_jj)⁻¹ ; project t_j onto the codebook,
update E, repeat.  One sweep costs one (m,n)×(n,vec) matmul per block
(same order as an LDLQ pass); assignments are re-packed afterwards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from qpalette_tpu.ops import packing
from qpalette_tpu.quant.ldlq import regularize_h


@functools.partial(jax.jit, static_argnames=("vec", "sweeps"))
def cd_refine_vq(W, hatW, H, lut, vec: int, sweeps: int = 2):
    """Refine a VQ/SQ quantization.  Returns (hatW', idx (m, n/vec))."""
    m, n = W.shape
    W = W.astype(jnp.float32)
    Hn = regularize_h(H.astype(jnp.float32))
    lutf = lut.astype(jnp.float32)  # (C, vec)
    norms = jnp.sum(lutf * lutf, axis=1)
    E0 = hatW.astype(jnp.float32) - W
    nb = n // vec

    def block_step(carry, j):
        E, idxs = carry
        c0 = j * vec
        Hcol = jax.lax.dynamic_slice(Hn, (0, c0), (n, vec))
        Hjj = jax.lax.dynamic_slice(Hn, (c0, c0), (vec, vec))
        EH = E @ Hcol  # (m, vec)
        Ej = jax.lax.dynamic_slice(E, (0, c0), (m, vec))
        Wj = jax.lax.dynamic_slice(W, (0, c0), (m, vec))
        hat_j = Ej + Wj
        target = hat_j - EH @ jnp.linalg.inv(Hjj)
        cross = target @ lutf.T
        idx = jnp.argmin(norms[None, :] - 2.0 * cross, axis=1)
        newhat = jnp.take(lutf, idx, axis=0)
        E = jax.lax.dynamic_update_slice(E, newhat - Wj, (0, c0))
        idxs = jax.lax.dynamic_update_slice(
            idxs, idx[:, None].astype(jnp.int32), (0, j))
        return (E, idxs), None

    idxs = jnp.zeros((m, nb), jnp.int32)
    E = E0
    for _ in range(sweeps):
        (E, idxs), _ = jax.lax.scan(block_step, (E, idxs), jnp.arange(nb))
    return E + W, idxs


def refine_artifact_vq(W, art, H, sweeps: int = 2):
    """Refine a 'vq'-kind artifact in place (codes re-packed)."""
    import numpy as np
    from qpalette_tpu.ops.codebooks import vq_lut
    meta = art["meta"]
    assert meta["kind"] == "vq"
    lut = jnp.asarray(art["lut"] if "lut" in art
                      else vq_lut(meta["bits"], meta["vec"]))
    m, n = meta["out_features"], meta["in_features"]
    Wscale = jnp.asarray(art["Wscale"])
    hatW = packing.dequant_lut(jnp.asarray(art["qweight"]), lut, m, n,
                               meta["bits"], meta["vec"])
    hat2, idxs = cd_refine_vq(W, hatW, H, lut, meta["vec"], sweeps)
    art = dict(art)
    art["qweight"] = np.asarray(packing.pack_rows(idxs, meta["bits"]))
    scaled_W = np.asarray(W) * np.asarray(Wscale)[:, None]
    scaled_hat = np.asarray(hat2) * np.asarray(Wscale)[:, None]
    err = float(((scaled_W - scaled_hat) ** 2).mean()
                / (scaled_W ** 2).mean())
    art["meta"] = dict(meta, err=err, refined=True)
    return art
