"""Sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpalette_tpu.models.llama import LlamaConfig, forward
from qpalette_tpu.parallel.sharding import (make_mesh, param_shardings,
                                            shard_params)
from qpalette_tpu.runtime.loader import build_quantized_model


CFG = LlamaConfig(vocab_size=256, hidden_size=256, intermediate_size=512,
                  num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
                  rope_theta=10000.0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_forward_matches_single_device(tmp_path):
    spec, params = build_quantized_model(
        CFG, "tcq_4_none_0.9", model_key="tiny_tp",
        save_dir=str(tmp_path), dummy=True)
    toks = jnp.asarray(np.arange(16).reshape(2, 8) % CFG.vocab_size,
                       jnp.int32)
    ref = np.asarray(forward(spec, params, toks))

    mesh = make_mesh(8, tp=4)
    sparams = shard_params(params, mesh)
    out = np.asarray(jax.jit(
        lambda p, t: forward(spec, p, t))(sparams, toks))
    assert np.allclose(out, ref, atol=2e-2), np.abs(out - ref).max()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_param_shardings_cover_all_leaves(tmp_path):
    spec, params = build_quantized_model(
        CFG, "ldlq_2_4_none_1.0", model_key="tiny_tp2",
        save_dir=str(tmp_path), dummy=True)
    mesh = make_mesh(8, tp=2)
    sh = param_shardings(params, mesh)
    jax.tree.map(lambda x, s: None, params, sh)  # same structure

    sparams = shard_params(params, mesh)
    # trellis/qweight rows must actually be split over tp
    lp = sparams["layers"][0]
    q = lp["q"]["qweight"]
    shard_shapes = {tuple(s.data.shape) for s in q.addressable_shards}
    assert all(ss[0] == q.shape[0] // 2 for ss in shard_shapes)


def test_dryrun_entry():
    import __graft_entry__ as ge
    n = min(8, len(jax.devices()))
    ge.dryrun_multichip(n)


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
