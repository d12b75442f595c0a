import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpalette_tpu.ops import packing
from qpalette_tpu.ops.codebooks import trellis_lut, vq_lut, tlut_bits_for_kv
from qpalette_tpu.ops.hadamard import hadamard_transform_t, random_signs
from qpalette_tpu.quant import quantizers
from qpalette_tpu.quant.viterbi import tcq_quantize, viterbi_encode
from qpalette_tpu.quant.ldlq import block_ldl, regularize_h
from qpalette_tpu.quant.incoherent import (
    quantize_linear, parse_quantizer_str, save_artifact, load_artifact)


def test_viterbi_states_valid_chain():
    KV = 4
    lut = jnp.asarray(trellis_lut(9))
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32))
    hat, states = tcq_quantize(X, lut, KV)
    st = np.asarray(states)
    # transition: s_{i+1} = (s_i >> KV) | (new << (L-KV))
    assert np.all((st[:, 1:] & ((1 << (16 - KV)) - 1)) == (st[:, :-1] >> KV))
    # tail-biting wrap
    assert np.all((st[:, 0] & ((1 << (16 - KV)) - 1)) == (st[:, -1] >> KV))
    # reconstruction matches lut
    expect = np.asarray(trellis_lut(9))[st].reshape(4, 256)
    assert np.allclose(np.asarray(hat), expect)


@pytest.mark.parametrize("KV", [3, 6])
def test_viterbi_distortion_reasonable(KV):
    # quantizing N(0,1) data at KV/2 bits/weight should beat naive scalar
    lut = jnp.asarray(trellis_lut(tlut_bits_for_kv(KV)))
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
    hat, _ = tcq_quantize(X, lut, KV)
    mse = float(jnp.mean((hat - X) ** 2))
    # rate-distortion for Gaussian at R bits: 2^(-2R); trellis should be
    # within ~3x of it (reference quant_err: tcq_6 -> 0.019 at R=3)
    R = KV / 2
    assert mse < 3.5 * 2 ** (-2 * R), mse


def test_block_ldl_reconstructs():
    rng = np.random.default_rng(2)
    A = rng.standard_normal((64, 64)).astype(np.float32)
    H = A @ A.T + 0.1 * np.eye(64, dtype=np.float32)
    L, D = block_ldl(jnp.asarray(H), 16)
    Lfull = np.asarray(L) + np.eye(64, dtype=np.float32)  # add back unit diag
    m = 64 // 16
    Dfull = np.zeros((64, 64), np.float32)
    for i in range(m):
        Dfull[i*16:(i+1)*16, i*16:(i+1)*16] = np.asarray(D)[i]
    # H = L D L^T with L unit-block-lower.  Our L returns strictly-lower
    # (diag blocks zeroed), but block_LDL normalizes so within-diag-block
    # entries vanish: check reconstruction
    assert np.allclose(Lfull @ Dfull @ Lfull.T, H, rtol=1e-3, atol=1e-2)


def _dequant_artifact(linear, hatW_expected_shape):
    kind = linear["kind"]
    m, n = hatW_expected_shape
    if kind == "tcq":
        lut = jnp.asarray(trellis_lut(linear["tlut_bits"]))
        return packing.dequant_tcq(jnp.asarray(linear["trellis"]), lut, m, n,
                                   linear["KV"])
    if kind == "vq":
        lut = jnp.asarray(vq_lut(linear["bits"], linear["vec"]))
        return packing.dequant_lut(jnp.asarray(linear["qweight"]), lut, m, n,
                                   linear["bits"], linear["vec"])
    if kind == "tcomb":
        lut = jnp.asarray(trellis_lut(linear["tlut_bits"]))
        n1, n2 = linear["in_part"]
        w1 = packing.dequant_tcq(jnp.asarray(linear["trellis1"]), lut, m, n1,
                                 linear["KV1"])
        w2 = packing.dequant_tcq(jnp.asarray(linear["trellis2"]), lut, m, n2,
                                 linear["KV2"])
        return jnp.concatenate([w1, w2], axis=1)
    raise ValueError(kind)


@pytest.mark.parametrize("scheme", ["tcq", "vq", "tcomb"])
def test_pack_matches_hatw(scheme):
    """decode(packed codes) must equal the hatW the quantizer reports."""
    rng = np.random.default_rng(3)
    m, n = 32, 64
    Wr = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    if scheme == "tcq":
        linear, hatW = quantizers.quantize_mat_tcq(Wr, None, KV=4)
    elif scheme == "vq":
        linear, hatW = quantizers.quantize_mat_vq(Wr, None, bits=4, vec=2)
    else:
        linear, hatW = quantizers.quantize_mat_combt(Wr, None, KV1=4, KV2=5)
    dec = _dequant_artifact(linear, (m, n))
    assert np.allclose(np.asarray(dec), np.asarray(hatW), atol=1e-5)


def test_ldlq_with_hessian_reduces_weighted_error():
    rng = np.random.default_rng(4)
    m, n = 32, 64
    W = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    A = rng.standard_normal((n, 4 * n)).astype(np.float32)
    H = jnp.asarray(A @ A.T / (4 * n))
    _, hat_noh = quantizers.quantize_mat_vq(W, None, bits=2, vec=1)
    _, hat_h = quantizers.quantize_mat_vq(W, H, bits=2, vec=1, use_hess=True)
    Hn = np.asarray(regularize_h(H))
    def proxy(hat):
        E = np.asarray(hat) - np.asarray(W)
        return float(np.trace(E @ Hn @ E.T))
    assert proxy(hat_h) < proxy(hat_noh)


@pytest.mark.parametrize("qstr", [
    "tcq_4_none_0.9", "tcomb_4_5_0.5_none_0.9", "ldlq_2_4_none_1.0",
    "ldlq_1_4_none_1.0", "sq_4_none_0.9", "comb_4_5_0.5_none_0.9",
])
def test_quantize_linear_end_to_end(qstr, tmp_path):
    rng = np.random.default_rng(5)
    m, n = 32, 64
    W = rng.standard_normal((m, n)).astype(np.float32) * 0.02
    art = quantize_linear(W, qstr, seed=0)
    assert art["meta"]["err"] < 0.25, art["meta"]["err"]

    # runtime reconstruction: y = dequant(Wq) @ z * Wscale where
    # z = ht_t(x * SU); must approximate y = W x
    x = rng.standard_normal((4, n)).astype(np.float32)
    z = hadamard_transform_t(jnp.asarray(x) * jnp.asarray(art["SU"])[None, :])
    lin = {k: v for k, v in art.items() if k not in ("meta", "SU", "Wscale")}
    lin.update({k: v for k, v in art["meta"].items()})
    Wq = _dequant_artifact_from_art(art, (m, n))
    y = np.asarray(z @ Wq.T) * art["Wscale"][None, :]
    y_ref = x @ W.T
    rel = np.mean((y - y_ref) ** 2) / np.mean(y_ref ** 2)
    assert rel < 0.3, rel

    # artifact IO round-trip
    p = str(tmp_path / "a.npz")
    save_artifact(art, p)
    art2 = load_artifact(p)
    assert art2["meta"]["quantizer_str"] == qstr
    for k in art:
        if k != "meta":
            assert np.array_equal(art[k], art2[k])


def _dequant_artifact_from_art(art, shape):
    meta = art["meta"]
    m, n = shape
    kind = meta["kind"]
    if kind == "tcq":
        lut = jnp.asarray(trellis_lut(meta["tlut_bits"]))
        return packing.dequant_tcq(jnp.asarray(art["trellis"]), lut, m, n,
                                   meta["KV"])
    if kind == "vq":
        lut = jnp.asarray(art["lut"]) if "lut" in art else \
            jnp.asarray(vq_lut(meta["bits"], meta["vec"]))
        return packing.dequant_lut(jnp.asarray(art["qweight"]), lut, m, n,
                                   meta["bits"], meta["vec"])
    if kind == "tcomb":
        lut = jnp.asarray(trellis_lut(meta["tlut_bits"]))
        n1, n2 = meta["in_part"]
        w1 = packing.dequant_tcq(jnp.asarray(art["trellis1"]), lut, m, n1,
                                 meta["KV1"])
        w2 = packing.dequant_tcq(jnp.asarray(art["trellis2"]), lut, m, n2,
                                 meta["KV2"])
        return jnp.concatenate([w1, w2], axis=1)
    if kind == "comb":
        lut = jnp.asarray(trellis_lut(meta["tlut_bits"]))
        m1, m2 = meta["out_part"]
        w1 = packing.dequant_tcq(jnp.asarray(art["trellis1"]), lut, m1, n,
                                 meta["KV1"])
        w2 = packing.dequant_tcq(jnp.asarray(art["trellis2"]), lut, m2, n,
                                 meta["KV2"])
        return jnp.concatenate([w1, w2], axis=0)
    raise ValueError(kind)


def test_parse_quantizer_str():
    s = parse_quantizer_str("tcomb_6_7_0.5_none_0.9")
    assert s.family == "tcomb" and s.KV == (6, 7) and s.avg_bits == 3.25
    s = parse_quantizer_str("ldlq_2_6_none_1.0")
    assert s.bits == 6 and s.vec == 2 and s.avg_bits == 3.0
    s = parse_quantizer_str("tcq_6_hess_0.9")
    assert s.use_hess and s.avg_bits == 3.0


def test_hessian_collection_and_coeffs():
    from qpalette_tpu.models.llama import LlamaConfig
    from qpalette_tpu.runtime.loader import (build_dense_model,
                                             random_dense_params)
    from qpalette_tpu.quant.hessian import (collect_hessians,
                                            err_coeffs_from_hessians)
    cfg = LlamaConfig.tiny()
    dp = random_dense_params(cfg, seed=1)
    spec, params = build_dense_model(cfg, dp)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, cfg.vocab_size, (2, 16)) for _ in range(2)]
    H = collect_hessians(spec, params, batches)
    assert set(H) == {f"{i}_{g}" for i in range(cfg.num_layers)
                      for g in ("qkv", "o", "up", "down")}
    Hq = H["0_qkv"]
    assert Hq.shape == (cfg.hidden_size, cfg.hidden_size)
    # PSD + symmetric
    assert np.allclose(Hq, Hq.T, atol=1e-4)
    assert np.linalg.eigvalsh(Hq).min() > -1e-3

    coeffs = err_coeffs_from_hessians(H, dp, cfg.num_layers)
    assert len(coeffs) == cfg.num_layers * 7
    assert abs(np.mean(list(coeffs.values())) - 1.0) < 1e-6

    # hessian-aware quantization consumes these H matrices
    from qpalette_tpu.quant.incoherent import quantize_linear
    art = quantize_linear(dp["layers"][0]["self_attn.q_proj"],
                          "ldlq_1_3_hess_1.0", H=Hq, seed=0)
    assert art["meta"]["err"] < 1.0


def test_cd_refinement_reduces_weighted_error():
    from qpalette_tpu.quant.refine import cd_refine_vq
    from qpalette_tpu.ops.codebooks import vq_lut
    rng = np.random.default_rng(7)
    m, n, bits, vec = 32, 64, 3, 2
    W = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    A = rng.standard_normal((n, 4 * n)).astype(np.float32)
    H = jnp.asarray(A @ A.T / (4 * n))
    lut = jnp.asarray(vq_lut(bits, vec))
    _, hat0 = quantizers.quantize_mat_vq(W, H, bits=bits, vec=vec,
                                         use_hess=True)
    hat1, idxs = cd_refine_vq(W, hat0, H, lut, vec, sweeps=2)
    Hn = np.asarray(regularize_h(H))

    def obj(hat):
        E = np.asarray(hat) - np.asarray(W)
        return float(np.trace(E @ Hn @ E.T))

    assert obj(hat1) <= obj(hat0) + 1e-5, (obj(hat0), obj(hat1))
    # codes consistent with hat
    dec = np.asarray(lut)[np.asarray(idxs)].reshape(m, n)
    assert np.allclose(dec, np.asarray(hat1), atol=1e-6)


def test_tcq1_arithmetic_mode_end_to_end():
    """V=1 arithmetic-decode trellis (1mad): valid chain, exact pack
    round-trip against the arithmetic table, sane distortion."""
    from qpalette_tpu.ops.codebooks import trellis_lut_arith
    rng = np.random.default_rng(9)
    m, n = 32, 64
    Wr = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    linear, hatW = quantizers.quantize_mat_tcq1(Wr, None, KV=3)
    assert linear["kind"] == "tcq1" and linear["decode_mode"] == "1mad"
    lut = jnp.asarray(trellis_lut_arith("1mad"))
    dec = packing.dequant_tcq(jnp.asarray(linear["trellis"]), lut, m, n,
                              3, v=1)
    assert np.allclose(np.asarray(dec), np.asarray(hatW), atol=1e-5)
    mse = float(jnp.mean((hatW - Wr) ** 2))
    assert mse < 3.5 * 2 ** (-2 * 3), mse  # 3 bits/weight

    art = quantize_linear(np.asarray(Wr) * 0.02, "tcq1_3_none_0.9", seed=0)
    assert art["meta"]["err"] < 0.2, art["meta"]["err"]


def test_tcq2_dualmad_end_to_end():
    """V=2 arithmetic trellis (dualmad): exact pack round-trip against
    packing.dequant_tcq2 and distortion at the 3 bits/weight level
    (claimed 0.0191 @ 4096^2; small-matrix bound is looser)."""
    from qpalette_tpu.ops.codebooks import trellis_lut_arith
    rng = np.random.default_rng(10)
    m, n = 32, 64
    Wr = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    linear, hatW = quantizers.quantize_mat_tcq2(Wr, None, KV=6)
    assert linear["kind"] == "tcq2" and linear["decode_mode"] == "dualmad"
    lut = jnp.asarray(trellis_lut_arith("dualmad"))
    dec = packing.dequant_tcq2(jnp.asarray(linear["trellis"]), lut, m, n, 6)
    assert np.allclose(np.asarray(dec), np.asarray(hatW), atol=1e-5)
    mse = float(jnp.mean((hatW - Wr) ** 2))
    assert mse < 0.06, mse  # 3 bits/weight (reference tcq_6 proxy 0.0189)

    art = quantize_linear(np.asarray(Wr) * 0.02, "tcq2_6_none_0.9", seed=0)
    assert art["meta"]["err"] < 0.2, art["meta"]["err"]


def test_viterbi_high_kv_backtrace():
    """KV > 8 uses >8-bit backtrace pointers (regression: uint8 overflow
    produced garbage for tcq_9/tcq_10)."""
    lut = jnp.asarray(trellis_lut(tlut_bits_for_kv(9)))
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.standard_normal((2, 256)).astype(np.float32))
    hat, states = tcq_quantize(X, lut, 9)
    st = np.asarray(states)
    assert np.all((st[:, 1:] & ((1 << 7) - 1)) == (st[:, :-1] >> 9))
    mse = float(jnp.mean((hat - X) ** 2))
    assert mse < 0.02, mse  # 4.5 bits/weight


def test_block_ldl_dampens_singular_hessian():
    """Near-singular H must not propagate NaNs (reference nuq_op.py:298-314
    escalating-dampening behavior)."""
    from qpalette_tpu.quant.ldlq import block_ldl
    n = 32
    rng = np.random.default_rng(5)
    u = rng.standard_normal((n, 2)).astype(np.float32)
    H = jnp.asarray(u @ u.T)  # rank-2: plain Cholesky fails
    L, D = block_ldl(H, 16)
    assert np.isfinite(np.asarray(L)).all()
    assert np.isfinite(np.asarray(D)).all()


def test_als_full_hessian_beats_diagonal():
    """Full off-diagonal ALS (CD assignments + closed-form centroids) must
    reduce tr(E H E^T) below the diagonal-only estimate (reference
    nuq_op.py train_least_squares objective-decreases property)."""
    from qpalette_tpu.quant.als import quantize_mat_vq_als
    from qpalette_tpu.quant.ldlq import regularize_h
    rng = np.random.default_rng(6)
    m, n, bits, vec = 64, 64, 3, 1
    W = rng.standard_normal((m, n)).astype(np.float32)
    X = rng.standard_normal((256, n)).astype(np.float32)
    H = (X.T @ X / 256).astype(np.float32)
    Hn = np.asarray(regularize_h(jnp.asarray(H)))

    def obj(hat):
        E = np.asarray(hat) - W
        return float(np.einsum("ij,jk,ik->", E, Hn, E))

    _, hat_full = quantize_mat_vq_als(jnp.asarray(W), jnp.asarray(H),
                                      bits, vec, use_hess=True, iters=3)
    _, hat_nohess = quantize_mat_vq_als(jnp.asarray(W), None, bits, vec,
                                        use_hess=False, iters=3)
    assert np.isfinite(np.asarray(hat_full)).all()
    assert obj(hat_full) < obj(hat_nohess) * 1.001, \
        (obj(hat_full), obj(hat_nohess))


def test_als_vec2_full_hessian_runs():
    from qpalette_tpu.quant.als import quantize_mat_vq_als
    rng = np.random.default_rng(7)
    m, n = 32, 64
    W = rng.standard_normal((m, n)).astype(np.float32)
    X = rng.standard_normal((128, n)).astype(np.float32)
    H = (X.T @ X / 128).astype(np.float32)
    linear, hat = quantize_mat_vq_als(jnp.asarray(W), jnp.asarray(H),
                                      bits=4, vec=2, use_hess=True, iters=2)
    assert np.isfinite(np.asarray(hat)).all()
    dec = packing.dequant_lut(jnp.asarray(linear["qweight"]),
                              jnp.asarray(linear["lut"]), m, n, 4, 2)
    assert np.allclose(np.asarray(dec), np.asarray(hat), atol=1e-5)


def test_beam_refinement_improves_weighted_objective():
    """Beam-refined TCQ must not worsen tr(E H E^T) vs plain Viterbi LDLQ
    and must keep a packable (tail-biting) code (reference ldlq_beam_cd
    intent; quant/beam.py)."""
    rng = np.random.default_rng(12)
    m, n, KV = 32, 32, 4
    W = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    X = rng.standard_normal((128, n)).astype(np.float32)
    H = jnp.asarray((X.T @ X / 128).astype(np.float32))
    Hn = np.asarray(regularize_h(H))

    def obj(hat):
        E = np.asarray(hat) - np.asarray(W)
        return float(np.trace(E @ Hn @ E.T))

    l0, hat0 = quantizers.quantize_mat_tcq(W, H, KV, use_hess=True)
    l1, hat1 = quantizers.quantize_mat_tcq(W, H, KV, use_hess=True, beam=8)
    assert obj(hat1) <= obj(hat0) + 1e-4, (obj(hat0), obj(hat1))
    # packed code decodes to exactly hat1 (valid circular bitstream)
    lut = jnp.asarray(trellis_lut(l1["tlut_bits"]))
    dec = packing.dequant_tcq(jnp.asarray(l1["trellis"]), lut, m, n, KV)
    assert np.allclose(np.asarray(dec), np.asarray(hat1), atol=1e-5)


def test_tcq2s_sum2_end_to_end():
    """tcq2s (sum2 decode): exact pack round-trip against the spec
    decoder, DEPLOYED-scaling distortion (input RMS = cb_rms·s, exactly
    what incoherent.quantize_linear feeds the quantizer: 0.0196 @ 3 bits
    on this 32×64 seed — competitive with tcq_6's 0.0189), and the
    hess-weighted variant must beat the unweighted one on the Hessian
    metric (round-4: replaces the former mse<0.07 assert that silently
    covered a 2× codebook/signal scale mismatch)."""
    from qpalette_tpu.ops.codebooks import trellis_lut_arith, lut_rms
    rng = np.random.default_rng(11)
    m, n = 32, 64
    Wr = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    cbr = lut_rms(trellis_lut_arith("sum2"))
    sc = 0.9 * cbr
    linear, hatW = quantizers.quantize_mat_tcq2(Wr * sc, None, KV=6,
                                                mode="sum2")
    assert linear["kind"] == "tcq2" and linear["decode_mode"] == "sum2"
    lut = jnp.asarray(trellis_lut_arith("sum2"))
    dec = packing.dequant_tcq2(jnp.asarray(linear["trellis"]), lut, m, n, 6)
    assert np.allclose(np.asarray(dec), np.asarray(hatW), atol=1e-5)
    mse = float(jnp.mean((hatW / sc - Wr) ** 2))
    assert mse < 0.022, mse  # 0.0196 measured; margin for jax updates

    # hess-weighted tcq2s: tr(E H Eᵀ) must improve on the unweighted quant
    X = rng.standard_normal((4 * n, n)).astype(np.float32)
    H = jnp.asarray(X.T @ X / (4 * n) + 0.1 * np.eye(n, dtype=np.float32))
    _, hat_h = quantizers.quantize_mat_tcq2(Wr * sc, H, KV=6, mode="sum2",
                                            use_hess=True)
    E_h = np.asarray(hat_h / sc - Wr)
    E_u = np.asarray(hatW / sc - Wr)
    Hn = np.asarray(H)
    assert np.trace(E_h @ Hn @ E_h.T) < np.trace(E_u @ Hn @ E_u.T)

    art = quantize_linear(np.asarray(Wr) * 0.02, "tcq2s_6_none_0.9", seed=0)
    assert art["meta"]["decode_mode"] == "sum2"
    assert art["meta"]["err"] < 0.03, art["meta"]["err"]
