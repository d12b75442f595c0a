"""Tensor-parallel forward via shard_map: Megatron-style col/row split.

Reference behavior being replaced: the reference's vestigial TP hooks — the
`rcp`/`tp_rank` buffers of QuantizedLinear (lib/linear/quantized_linear.py:
42-44) and the rcp-conditional Hadamard reshapes (lib/codebook/
bitshift.py:374-388, lib/utils/data_utils.py:287-308) — which document how
incoherence rotations must compose with row/col weight sharding but are
never driven by any collective.  Here the whole decoder layer runs under
``jax.shard_map`` over a tp mesh axis with XLA collectives on ICI:

  * q/k/v, up/gate: column-parallel (output rows sharded; the shared input
    rotation sees replicated activations — rotation math unchanged).
  * o, down: row-parallel (input dim sharded).  Their quantization-time
    input rotation is block-diagonal I_tp ⊗ Ĥ_{n/tp} (quantize_linear
    rot_blocks=tp), so each device rotates its local activation shard with
    a full local Hadamard — zero communication — and the partial outputs
    are psum'd.  This is exactly the reference's `rcp=1` case.
  * attention runs on local heads (head-sharded KV cache).

Per token this costs 2 psums/layer (o, down) instead of the 2 activation
all-gathers of the naive everything-column-parallel scheme, and every
weight byte is read by exactly one chip.

Constraints (asserted): heads, kv-heads and intermediate divisible by tp;
no merged projections (merged row-concat layouts would need shard-
interleaved packing); o/down must use non-split schemes (tcq/tcq1/vq/
dense — the input-split tcomb would straddle shard boundaries).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from qpalette_tpu.models import llama
from qpalette_tpu.models.llama import (AttnSpec, LlamaConfig, MLPSpec,
                                       ModelSpec)

COL_PROJS = ("q", "k", "v", "up", "gate")
ROW_PROJS = ("o", "down")


def _scale_linear_spec(lspec, tp: int, row: bool):
    """LinearSpec -> per-device local LinearSpec."""
    from qpalette_tpu.runtime.qlinear import LinearSpec
    d = dataclasses.asdict(lspec)
    if row:
        assert lspec.kind in ("tcq", "tcq1", "vq", "dense", "dense_rot"), \
            f"row-parallel unsupported for split scheme {lspec.kind}"
        assert lspec.in_features % tp == 0
        if lspec.kind == "vq":
            # packed word rows (k-major) must split evenly over tp
            nwords8 = lspec.in_features // lspec.vec * lspec.bits // 32 // 8
            assert nwords8 % tp == 0, (
                f"VQ row-parallel needs (k*bits/vec/256) % tp == 0 "
                f"(got {nwords8} words/8 for tp={tp})")
        d["in_features"] = lspec.in_features // tp
    else:
        assert lspec.out_features % tp == 0
        d["out_features"] = lspec.out_features // tp
        if lspec.kind == "comb":  # output-split halves shard together
            m1, m2 = lspec.split
            assert m1 % tp == 0 and m2 % tp == 0
            d["split"] = (m1 // tp, m2 // tp)
    return LinearSpec(**d)


def localize_spec(spec: ModelSpec, tp: int, axis: str = "tp") -> ModelSpec:
    """Global ModelSpec -> the per-device spec seen inside shard_map."""
    cfg = spec.config
    assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, (
        f"tp={tp} must divide num_heads={cfg.num_heads} and "
        f"num_kv_heads={cfg.num_kv_heads}")
    assert cfg.intermediate_size % tp == 0, (
        f"tp={tp} must divide intermediate_size={cfg.intermediate_size}")
    lcfg = dataclasses.replace(cfg, num_heads=cfg.num_heads // tp,
                               num_kv_heads=cfg.num_kv_heads // tp,
                               intermediate_size=cfg.intermediate_size // tp)
    layers = []
    for aspec, mspec in spec.layers:
        assert aspec.merge is None and not mspec.merge_ug, \
            "tensor-parallel path requires unmerged projections"
        assert aspec.rot_blocks_o == tp and mspec.rot_blocks_down == tp, (
            "row-parallel layers must be quantized with rot_blocks=tp "
            f"(got o={aspec.rot_blocks_o}, down={mspec.rot_blocks_down})")
        aprojs = tuple(
            (nm, _scale_linear_spec(ls, tp, row=(nm == "o")))
            for nm, ls in aspec.projs)
        mprojs = tuple(
            (nm, _scale_linear_spec(ls, tp, row=(nm == "down")))
            for nm, ls in mspec.projs)
        # local rotation = full Hadamard of the local shard width
        layers.append((AttnSpec(None, aprojs, rot_blocks_o=1),
                       MLPSpec(False, mprojs, rot_blocks_down=1)))
    return ModelSpec(lcfg, tuple(layers), tp_axis=axis)


def _leaf_pspec(proj: str, leaf: str, ndim: int, axis: str) -> P:
    """PartitionSpec for one param leaf of one projection."""
    row = proj in ROW_PROJS
    if leaf == "wscale":
        return P() if row else P(axis)
    if leaf in ("trellis_kt", "trellis1_kt", "trellis2_kt", "trellis_pl"):
        # (k/16, words, m/16): row-parallel shards k-tiles, col shards m
        return P(axis, None, None) if row else P(None, None, axis)
    if leaf == "qweight_t":
        # (8, words-over-k, m)
        return P(None, axis, None) if row else P(None, None, axis)
    if leaf == "w":  # dense (m, n)
        return P(None, axis) if row else P(axis, None)
    if leaf in ("lut", "clut"):
        return P()
    if leaf == "trellis":  # canonical (m-tiles*k-tiles, words): xla path
        raise NotImplementedError(
            "tp path needs kernel (impl='pallas') or dense layouts; "
            "canonical 'trellis' rows mix m- and k-tiles")
    return P()


def param_pspecs(spec: ModelSpec, params, axis: str = "tp"):
    """PartitionSpec pytree for a quantized-model params pytree."""
    def layer_specs(lp):
        out = {}
        for k, v in lp.items():
            if k in ("su_o",):
                out[k] = P(axis)
            elif k == "su_dp":
                out[k] = P(axis)
            elif isinstance(v, dict):  # projection param group
                out[k] = {leaf: _leaf_pspec(k, leaf, getattr(a, "ndim", 0),
                                            axis)
                          for leaf, a in v.items()}
            else:  # su_qkv, su_ug, ln_*
                out[k] = P()
        return out

    pspecs = {"layers": [layer_specs(lp) for lp in params["layers"]],
              "luts": {k: P() for k in params.get("luts", {})}}
    for k in ("embed", "lm_head", "ln_f"):
        if k in params:
            pspecs[k] = P()
    return pspecs


def shard_tp_params(params, spec: ModelSpec, mesh: Mesh, axis: str = "tp"):
    pspecs = param_pspecs(spec, params, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs, is_leaf=lambda x: isinstance(x, P))


def kv_cache_pspec(axis: str = "tp") -> P:
    return P(None, None, axis, None)


def tp_forward_fn(spec: ModelSpec, mesh: Mesh, params, axis: str = "tp",
                  with_cache: bool = False):
    """Build a jit-able tensor-parallel forward over `mesh`.

    Returns fn(params, tokens [, kv_caches, cache_pos]) operating on
    globally-sharded arrays (placed by shard_tp_params /
    NamedSharding(kv_cache_pspec)).
    """
    tp = mesh.shape[axis]
    lspec = localize_spec(spec, tp, axis)
    pspecs = param_pspecs(spec, params, axis)

    if not with_cache:
        def body(params, tokens):
            return llama.forward(lspec, params, tokens)

        return jax.jit(jax.shard_map(
            body, mesh=mesh, in_specs=(pspecs, P()), out_specs=P(),
            check_vma=False))

    def body(params, tokens, kv_caches, cache_pos):
        return llama.forward(lspec, params, tokens, kv_caches=kv_caches,
                             cache_pos=cache_pos)

    nlayer = spec.config.num_layers
    kvspec = [(kv_cache_pspec(axis), kv_cache_pspec(axis))
              for _ in range(nlayer)]
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(pspecs, P(), kvspec, P()),
        out_specs=(P(), kvspec), check_vma=False))
