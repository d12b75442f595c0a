import numpy as np
import jax.numpy as jnp
import pytest

from qpalette_tpu.ops.hadamard import (
    get_had_factors, hadamard_matrix, hadamard_transform,
    hadamard_transform_t)


@pytest.mark.parametrize("k", [1, 2, 4, 8, 128, 12, 20, 28, 108, 36, 60, 124, 140])
def test_hadamard_matrix_orthogonal(k):
    H = hadamard_matrix(k)
    assert np.allclose(H @ H.T, k * np.eye(k), atol=1e-8)
    if k in (12, 20, 28, 108):  # constructible: entries must be ±1
        assert set(np.unique(H)) <= {-1.0, 1.0}


@pytest.mark.parametrize("k", [43])
def test_random_orthogonal_fallback(k):
    H = hadamard_matrix(k)
    assert np.allclose(H @ H.T, k * np.eye(k), atol=1e-6)


@pytest.mark.parametrize("n", [64, 128, 4096, 14336, 3072, 11008, 5120, 1024])
def test_factors(n):
    facs = get_had_factors(n)
    assert np.prod(facs) == n
    assert all(f <= 256 for f in facs)


@pytest.mark.parametrize("n", [128, 4096, 14336, 3072])
def test_transform_orthonormal_inverse(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, n)).astype(np.float32)
    y = hadamard_transform(jnp.asarray(x))
    z = hadamard_transform_t(y)
    assert np.allclose(np.asarray(z), x, atol=1e-3)
    # orthonormal: norms preserved
    assert np.allclose(np.linalg.norm(np.asarray(y), axis=1),
                       np.linalg.norm(x, axis=1), rtol=1e-4)


def test_transform_matches_dense_matrix():
    n = 256
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, n)).astype(np.float32)
    y = np.asarray(hadamard_transform(jnp.asarray(x)))
    # build the dense H by transforming the identity
    eye = np.eye(n, dtype=np.float32)
    H = np.asarray(hadamard_transform(jnp.asarray(eye)))
    assert np.allclose(y, x @ H, atol=1e-4)
    # incoherence: flat magnitudes
    assert np.abs(H).max() <= 1.0 / np.sqrt(n) + 1e-6


def test_transform_axis_arg():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 64, 4)).astype(np.float32)
    y = hadamard_transform(jnp.asarray(x), axis=1)
    y2 = jnp.moveaxis(hadamard_transform(jnp.moveaxis(jnp.asarray(x), 1, -1)), -1, 1)
    assert np.allclose(np.asarray(y), np.asarray(y2), atol=1e-5)
