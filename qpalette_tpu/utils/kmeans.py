"""K-means used for codebook construction (reference: lib/utils/kmeans.py).

Pure-JAX Lloyd iterations with k-means++-style seeding via quantiles/random
choice; runs on CPU or TPU.  Deterministic given the seed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _assign(x: jax.Array, c: jax.Array) -> jax.Array:
    # x (N, d), c (K, d) -> nearest centroid index (N,)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    c2 = jnp.sum(c * c, axis=1)[None, :]
    d = x2 + c2 - 2.0 * (x @ c.T)
    return jnp.argmin(d, axis=1)


def kmeans(x: np.ndarray | jax.Array, k: int, iters: int = 40,
           seed: int = 0) -> np.ndarray:
    """Lloyd's k-means; returns centroids sorted for determinism (K, d)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    n, d = x.shape
    if d == 1:
        # quantile init: near-optimal for 1-D Gaussian codebooks
        qs = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
        c = jnp.quantile(x[:, 0], qs)[:, None]
    else:
        key = jax.random.PRNGKey(seed)
        idx = jax.random.choice(key, n, (k,), replace=False)
        c = x[idx]

    @jax.jit
    def step(c):
        a = _assign(x, c)
        one = jnp.ones((n,), jnp.float32)
        cnt = jnp.zeros((k,), jnp.float32).at[a].add(one)
        s = jnp.zeros((k, d), jnp.float32).at[a].add(x)
        newc = s / jnp.maximum(cnt, 1.0)[:, None]
        return jnp.where(cnt[:, None] > 0, newc, c)

    for _ in range(iters):
        c = step(c)
    c = np.asarray(c)
    order = np.lexsort(c.T[::-1])
    return c[order]
