import numpy as np
import jax.numpy as jnp
import pytest

from qpalette_tpu.ops import packing
from qpalette_tpu.ops.codebooks import trellis_lut, vq_lut


@pytest.mark.parametrize("bits,vec,m,k", [
    (4, 1, 32, 64), (3, 1, 16, 256), (8, 1, 8, 128),
    (6, 2, 32, 64), (12, 2, 16, 128), (7, 2, 16, 256),
    (11, 4, 16, 128), (2, 1, 32, 64),
])
def test_rowpack_roundtrip(bits, vec, m, k):
    rng = np.random.default_rng(bits * 100 + vec)
    P = k // vec
    idx = rng.integers(0, 1 << bits, (m, P))
    packed = packing.pack_rows(jnp.asarray(idx), bits)
    assert packed.dtype == jnp.uint32
    out = packing.unpack_rows(packed, bits, P)
    assert np.array_equal(np.asarray(out), idx)


def _random_tailbiting_states(rng, T, KV):
    """Generate valid tail-biting sequences for the transition
    s_{i+1} = (s_i >> KV) | (new << (L - KV))."""
    L = packing.L
    S = 256 // packing.V
    # generate the circular bitstream directly, read windows
    streams = rng.integers(0, 2, (T, S * KV))
    states = np.zeros((T, S), dtype=np.int64)
    for i in range(S):
        o = i * KV
        for b in range(L):
            states[:, i] |= streams[:, (o + b) % (S * KV)] << b
    return states


@pytest.mark.parametrize("KV", [2, 3, 4, 6, 7, 10])
def test_trellispack_roundtrip(KV):
    rng = np.random.default_rng(KV)
    states = _random_tailbiting_states(rng, 8, KV)
    packed = packing.pack_trellis(jnp.asarray(states), KV)
    assert packed.shape == (8, 4 * KV)
    out = packing.unpack_trellis(packed, KV)
    assert np.array_equal(np.asarray(out), states)


def test_tiles_mat_roundtrip():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((64, 48)).astype(np.float32)
    tiles = packing.mat_to_tiles(jnp.asarray(mat))
    assert tiles.shape == ((64 // 16) * (48 // 16), 16, 16)
    back = packing.tiles_to_mat(tiles, 64, 48)
    assert np.array_equal(np.asarray(back), mat)


def test_dequant_lut_matches_manual():
    bits, vec, m, k = 5, 2, 16, 64
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 1 << bits, (m, k // vec))
    lut = np.asarray(vq_lut(bits, vec, n_samples=1 << 14))
    packed = packing.pack_rows(jnp.asarray(idx), bits)
    w = packing.dequant_lut(packed, jnp.asarray(lut), m, k, bits, vec)
    expect = lut[idx].reshape(m, k)
    assert np.allclose(np.asarray(w), expect)


def test_dequant_tcq_matches_manual():
    KV, m, k = 4, 32, 32
    rng = np.random.default_rng(4)
    ntiles = (m // 16) * (k // 16)
    states = _random_tailbiting_states(rng, ntiles, KV)
    lut = trellis_lut(9)
    packed = packing.pack_trellis(jnp.asarray(states), KV)
    w = packing.dequant_tcq(packed, jnp.asarray(lut), m, k, KV)
    vals = lut[states]  # (T, 128, 2)
    tiles = vals.reshape(ntiles, 16, 16)
    expect = np.asarray(packing.tiles_to_mat(jnp.asarray(tiles), m, k))
    assert np.allclose(np.asarray(w), expect)


def test_native_pack_matches_jax():
    from qpalette_tpu.ops import native_pack
    if not native_pack.available():
        import pytest
        pytest.skip("native lib not built (make -C native)")
    rng = np.random.default_rng(7)
    for bits, P in [(3, 256), (6, 128), (12, 64)]:
        idx = rng.integers(0, 1 << bits, (16, P))
        native = native_pack.pack_rows(idx, bits)
        ref = np.asarray(packing.pack_rows(jnp.asarray(idx), bits))
        assert native.shape == ref.shape
        assert np.array_equal(native, ref)
        back = native_pack.unpack_rows(native, bits, P)
        assert np.array_equal(back, idx)
    for KV in (3, 6, 10):
        states = _random_tailbiting_states(rng, 8, KV)
        native = native_pack.pack_trellis(states, KV)
        ref = np.asarray(packing.pack_trellis(jnp.asarray(states), KV))
        assert np.array_equal(native, ref)
        back = native_pack.unpack_trellis(native, KV)
        assert np.array_equal(back, states)
