"""Exact 1-D k-means (native DP) vs Lloyd's: the DP must match brute force
on small instances and never lose to Lloyd's on Gaussian codebooks
(reference parity: flash1dkmeans, lib/quantizer/vq_quant.py:12-33)."""

import itertools

import numpy as np
import pytest

from qpalette_tpu.utils.kmeans import kmeans1d_exact, kmeans


def _ssq(x, c):
    return float(np.sum(np.min((x[:, None] - c[None, :]) ** 2, axis=1)))


def test_exact_matches_bruteforce():
    lib_c = kmeans1d_exact(np.zeros(4), 2)
    if lib_c is None:
        pytest.skip("native kmeans1d not built")
    rng = np.random.default_rng(0)
    x = np.sort(rng.standard_normal(12))
    k = 3
    # brute force over all contiguous partitions
    best = 1e18
    for cuts in itertools.combinations(range(1, 12), k - 1):
        b = [0] + list(cuts) + [12]
        ssq = sum(np.sum((x[b[i]:b[i + 1]]
                          - x[b[i]:b[i + 1]].mean()) ** 2)
                  for i in range(k))
        best = min(best, ssq)
    c = kmeans1d_exact(x, k).astype(np.float64)
    got = _ssq(x, c)
    assert abs(got - best) < 1e-9 * max(1.0, best), (got, best)


def test_exact_beats_or_ties_lloyd():
    if kmeans1d_exact(np.zeros(4), 2) is None:
        pytest.skip("native kmeans1d not built")
    rng = np.random.default_rng(1)
    x = rng.standard_normal(20000).astype(np.float64)
    for k in (4, 16, 64):
        c_exact = kmeans1d_exact(x, k).astype(np.float64)
        assert c_exact.shape == (k,)
        # Lloyd with quantile init (the old fallback path)
        qs = (np.arange(k) + 0.5) / k
        c = np.quantile(x, qs)
        for _ in range(40):
            a = np.argmin(np.abs(x[:, None] - c[None, :]), axis=1)
            for j in range(k):
                if np.any(a == j):
                    c[j] = x[a == j].mean()
        assert _ssq(x, c_exact) <= _ssq(x, c) * (1 + 1e-9)


def test_weighted_binning_consistent():
    if kmeans1d_exact(np.zeros(4), 2) is None:
        pytest.skip("native kmeans1d not built")
    rng = np.random.default_rng(2)
    x = rng.standard_normal(1 << 17)
    cb = kmeans1d_exact(x, 16, max_bins=1 << 14)  # binned path
    cf = kmeans1d_exact(x, 16, max_bins=1 << 17)  # direct, same data
    assert np.all(np.diff(cb) > 0)
    assert np.abs(cb - cf).max() < 0.01  # binning is near-lossless
