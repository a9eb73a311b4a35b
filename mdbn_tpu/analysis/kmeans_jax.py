"""On-device k-means (Lloyd's algorithm) in JAX.

TPU-native alternative to the host sklearn path in ``analysis.cluster`` for
large cohorts: the distance matrix is one [N, K] matmul-shaped op per
iteration, fully jitted, with k-means++ seeding. Deterministic given the key.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _sq_dists(x: jax.Array, x2: jax.Array, centers: jax.Array) -> jax.Array:
    """||x - c||^2 for all pairs via the matmul identity
    ``||x||^2 - 2 x.c + ||c||^2`` (the x.c term is one [N, K] matmul; avoids
    an N x K x D broadcast). ``x2`` is the precomputed [N, 1] row norms."""
    return x2 - 2.0 * x @ centers.T + jnp.sum(centers * centers, axis=1)[None, :]


def _plus_plus_init(key: jax.Array, x: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding: sample each next center with prob ∝ D²(x)."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # [N, 1]

    def body(carry, i):
        centers, key = carry
        d2_all = _sq_dists(x, x2, centers)
        d2 = jnp.min(d2_all + jnp.where(jnp.arange(k) < i, 0.0, jnp.inf)[None, :],
                     axis=1)
        key, kc = jax.random.split(key)
        idx = jax.random.categorical(kc, jnp.log(jnp.maximum(d2, 0.0) + 1e-12))
        return (centers.at[i].set(x[idx]), key), None

    (centers, _), _ = jax.lax.scan(body, (centers0, key), jnp.arange(1, k))
    return centers


@partial(jax.jit, static_argnums=(2, 3))
def kmeans_fit(key: jax.Array, x: jax.Array, k: int, n_iters: int = 50
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (labels [N], centers [K, D], inertia scalar)."""
    x = jnp.asarray(x, jnp.float32)
    centers = _plus_plus_init(key, x, k)
    x2 = jnp.sum(x * x, axis=1, keepdims=True)  # [N, 1], reused every iter

    def step(centers, _):
        d2 = _sq_dists(x, x2, centers)
        labels = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # [N, K]
        counts = onehot.sum(axis=0)  # [K]
        sums = onehot.T @ x  # [K, D]
        new_centers = jnp.where(counts[:, None] > 0,
                                sums / jnp.maximum(counts[:, None], 1.0),
                                centers)
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers, None, length=n_iters)
    d2 = _sq_dists(x, x2, centers)
    labels = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return labels, centers, inertia


def kmeans_cluster_jax(codes, n_clusters: int, seed: int = 0, n_init: int = 10,
                       n_iters: int = 50):
    """sklearn-shaped wrapper: best of ``n_init`` seedings by inertia, all
    restarts batched into ONE device dispatch (vmapped over the seed keys).
    Returns (labels, centers) as numpy arrays."""
    import numpy as np

    x = jnp.asarray(codes, jnp.float32)
    keys = jnp.stack([jax.random.PRNGKey(seed * 1000 + i)
                      for i in range(n_init)])
    labels, centers, inertia = jax.vmap(
        lambda kk: kmeans_fit(kk, x, n_clusters, n_iters))(keys)
    best = int(jnp.argmin(inertia))
    return np.asarray(labels[best]), np.asarray(centers[best])
