"""Hessian-weighted beam-search trellis refinement (TCQ quality tool).

Reference behavior: lib/algo/ldlq_beam_cd.py:20-98 routes LDLQ tile
quantization through `cb.quantize_beam_search_with_hessian(thing, D_tiled,
beam_sz=1024)`, minimizing the QUADRATIC tile objective e D̃ eᵀ (D̃ = the
within-tile Hessian block) instead of plain MSE.  That method is never
defined anywhere in the reference codebase — the beam branch is uncallable
dead code — so this module is a working TPU-native realization of the
intent.

Why beam: plain Viterbi is exact only for (block-)diagonal weighting; an
off-diagonal D̃ couples sequence positions beyond the trellis state, so the
DP is approximate and a beam over full candidate histories is the natural
search.  Each step scores all 2^KV successors of every beam element:

    Δ = (w - x_i) Q_i (w - x_i)ᵀ + 2 (w - x_i) · (D̃[P_i, :] e_histᵀ)

(one (beam·nc, v)×(v, T) contraction per step), then keeps the best `beam`.

Tail-biting: the first state is FIXED to the Viterbi solution's s₀ (the
beam refines a valid encoding), and the final steps' new-bits are penalized
to +inf unless they reproduce s₀'s wrapped bits — every returned sequence
satisfies the circular-stream property ops/packing.pack_trellis requires.
The Viterbi seed also gives a monotonicity guarantee: the caller keeps
whichever of (viterbi, beam) scores lower under D̃.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

L = 16


def _wrap_constraints(s0: jax.Array, S: int, KV: int):
    """Forced new-bit masks/values per step for tail-biting.

    Step i (1-indexed from the trellis start) appends KV stream bits at
    positions [i*KV + L - KV, i*KV + L); positions p >= S*KV wrap onto the
    start of the circular stream and must equal bit (p - S*KV) of s0.
    Returns (fmask (S,) int32 — static per step, fval (B, S) int32)."""
    SKV = S * KV
    i = jnp.arange(S)[:, None]
    j = jnp.arange(KV)[None, :]
    p = i * KV + (L - KV) + j
    forced = p >= SKV
    fmask = jnp.sum(jnp.where(forced, 1 << j, 0), axis=1)  # (S,)
    src = jnp.clip(p - SKV, 0, L - 1)  # (S, KV)
    bits = (s0[:, None, None] >> src[None]) & 1  # (B, S, KV)
    fval = jnp.sum(jnp.where(forced[None], bits << j[None], 0), axis=2)
    return fmask.astype(jnp.int32), fval.astype(jnp.int32)


def seq_objective(hat: jax.Array, X: jax.Array, Dt: jax.Array):
    """Per-tile quadratic objective e D̃ eᵀ; hat/X (B, T), Dt (T, T)."""
    e = (hat - X).astype(jnp.float32)
    return jnp.einsum("bt,tu,bu->b", e, Dt.astype(jnp.float32), e)


@functools.partial(jax.jit, static_argnames=("KV", "v", "beam"))
def tcq_quantize_beam(X: jax.Array, lut: jax.Array, Dt: jax.Array,
                      states_init: jax.Array, KV: int, v: int = 1,
                      beam: int = 16):
    """Refine Viterbi states under the full within-tile weighting Dt.

    X (B, T) tile sequences (T = S*v); lut (2^L, v); Dt (T, T) PSD;
    states_init (B, S) a valid tail-biting encoding (from
    viterbi.tcq_quantize).  Returns (hat (B, T), states (B, S)) — the
    better of the beam result and the seed, per tile."""
    Bt, T = X.shape
    S = T // v
    nc = 1 << KV
    lutf = lut.astype(jnp.float32)
    Dtf = Dt.astype(jnp.float32)
    BIG = jnp.float32(1e30)

    s0 = states_init[:, 0].astype(jnp.int32)
    fmask, fval = _wrap_constraints(s0, S, KV)

    # beam state: error history over committed positions, running score,
    # last state, state trace
    e0 = jnp.take(lutf, s0, axis=0) - X[:, :v]  # (B, v)
    Q0 = Dtf[:v, :v]
    score0 = jnp.einsum("bv,vu,bu->b", e0, Q0, e0)
    ehist = jnp.zeros((Bt, beam, T), jnp.float32)
    ehist = ehist.at[:, :, :v].set(e0[:, None, :])
    score = jnp.broadcast_to(score0[:, None], (Bt, beam)).astype(jnp.float32)
    # only element 0 is "real" at step 0; kill duplicates so the first
    # top_k doesn't multiply the same prefix
    score = score + jnp.where(jnp.arange(beam)[None, :] == 0, 0.0, BIG)
    trace = jnp.zeros((Bt, beam, S), jnp.int32)
    trace = trace.at[:, :, 0].set(s0[:, None])
    last = jnp.broadcast_to(s0[:, None], (Bt, beam)).astype(jnp.int32)

    def step(carry, i):
        ehist, score, trace, last = carry
        base = last >> KV  # (B, beam)
        nb = jnp.arange(nc, dtype=jnp.int32)
        succ = base[..., None] | (nb[None, None, :] << (L - KV))
        w = jnp.take(lutf, succ, axis=0)  # (B, beam, nc, v)
        xi = jax.lax.dynamic_slice(X, (0, i * v), (Bt, v))
        e = w - xi[:, None, None, :]
        Q = jax.lax.dynamic_slice(Dtf, (i * v, i * v), (v, v))
        Drows = jax.lax.dynamic_slice(Dtf, (i * v, 0), (v, T))
        r = jnp.einsum("bkt,vt->bkv", ehist, Drows)
        quad = jnp.einsum("bkcv,vu,bkcu->bkc", e, Q, e)
        lin = 2.0 * jnp.einsum("bkcv,bkv->bkc", e, r)
        fm = fmask[i]
        ok = (nb[None, None, :] & fm) == fval[:, i][:, None, None]
        cand = score[..., None] + quad + lin + jnp.where(ok, 0.0, BIG)
        flat = cand.reshape(Bt, beam * nc)
        negtop, topi = jax.lax.top_k(-flat, beam)
        kidx = topi // nc
        score = -negtop
        ehist = jnp.take_along_axis(ehist, kidx[..., None], axis=1)
        trace = jnp.take_along_axis(trace, kidx[..., None], axis=1)
        last = jnp.take_along_axis(
            succ.reshape(Bt, beam * nc), topi, axis=1).astype(jnp.int32)
        sel_e = jnp.take_along_axis(
            e.reshape(Bt, beam * nc, v), topi[..., None], axis=1)
        ehist = jax.lax.dynamic_update_slice(ehist, sel_e, (0, 0, i * v))
        trace = jax.lax.dynamic_update_index_in_dim(trace, last, i, axis=2)
        return (ehist, score, trace, last), None

    (ehist, score, trace, last), _ = jax.lax.scan(
        step, (ehist, score, trace, last), jnp.arange(1, S))
    best = jnp.argmin(score, axis=1)
    states_beam = jnp.take_along_axis(trace, best[:, None, None],
                                      axis=1)[:, 0]
    hat_beam = jnp.take(lutf, states_beam, axis=0).reshape(Bt, T)
    hat_init = jnp.take(lutf, states_init, axis=0).reshape(Bt, T)
    better = (seq_objective(hat_beam, X, Dtf)
              <= seq_objective(hat_init, X, Dtf))  # (B,)
    states = jnp.where(better[:, None], states_beam, states_init)
    hat = jnp.where(better[:, None], hat_beam, hat_init)
    return hat, states.astype(jnp.int32)
