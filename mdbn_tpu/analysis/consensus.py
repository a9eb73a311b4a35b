"""Consensus clustering (Monti et al. 2003, Machine Learning 52) on device.

The standard tool of the TCGA subtyping literature the reference's pipeline
feeds (Liang et al. 2015 reproduce such a study): cluster many row
subsamples, accumulate how often each patient pair lands in the same
cluster when co-sampled, and read both the final assignment and the
cluster-count evidence off the consensus matrix

    M[i, j] = (# resamples where i, j co-clustered) /
              (# resamples where i, j co-sampled).

A clean k shows a near-binary M (block structure); ambiguity shows as mass
in the middle — quantified by PAC (proportion of ambiguous clustering,
Senbabaoglu et al. 2014): the fraction of co-sampled pairs with
M in (u1, u2). k selection = argmin PAC.

TPU mapping: every resample's k-means runs the fused on-device
``kmeans_jax.kmeans_fit``; the R resamples run in ONE ``lax.scan`` whose
carry is the [N, N] co-cluster / co-sample accumulators (no R x N x N
tensor ever lives), with the pair indicators computed as one-hot matmuls.
The final cut is average-linkage hierarchical clustering on 1 - M (host,
O(N^2) on a cohort of hundreds of patients — negligible).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .kmeans_jax import kmeans_fit


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _consensus_accumulate(key: jax.Array, x: jax.Array, k: int, m: int,
                          n_resamples: int, n_iters: int):
    """Returns (co-cluster counts [N, N], co-sample counts [N, N])."""
    n = x.shape[0]

    def one(carry, rkey):
        C, S = carry
        ki, kf = jax.random.split(rkey)
        idx = jax.random.permutation(ki, n)[:m]              # subsample rows
        labels, _, _ = kmeans_fit(kf, x[idx], k, n_iters)
        A = jax.nn.one_hot(labels, k, dtype=jnp.float32)     # [m, K]
        co = A @ A.T                                         # [m, m] 0/1
        P = jax.nn.one_hot(idx, n, dtype=jnp.float32)        # [m, N] scatter
        C = C + P.T @ co @ P
        S = S + P.T @ jnp.ones((m, m), jnp.float32) @ P
        return (C, S), None

    zero = jnp.zeros((n, n), jnp.float32)
    (C, S), _ = jax.lax.scan(one, (zero, zero),
                             jax.random.split(key, n_resamples))
    return C, S


def consensus_matrix(codes, n_clusters: int, n_resamples: int = 100,
                     subsample: float = 0.8, seed: int = 0,
                     n_iters: int = 50) -> np.ndarray:
    """Monti consensus matrix M [N, N] for one k (see module docstring)."""
    x = jnp.asarray(codes, jnp.float32)
    n = x.shape[0]
    m = int(round(subsample * n))
    if not (n_clusters < m <= n):
        raise ValueError(f"subsample of {m} rows (from {n}) must exceed "
                         f"n_clusters={n_clusters}")
    C, S = _consensus_accumulate(jax.random.PRNGKey(seed), x, int(n_clusters),
                                 m, int(n_resamples), int(n_iters))
    M = np.asarray(C) / np.maximum(np.asarray(S), 1.0)
    np.fill_diagonal(M, 1.0)
    return M


def pac_score(M: np.ndarray, u1: float = 0.1, u2: float = 0.9) -> float:
    """Proportion of ambiguous clustering: fraction of off-diagonal pairs
    with consensus strictly inside (u1, u2). Lower = cleaner clustering."""
    off = ~np.eye(M.shape[0], dtype=bool)
    v = M[off]
    return float(np.mean((v > u1) & (v < u2)))


def _cut_consensus(M: np.ndarray, n_clusters: int) -> np.ndarray:
    """Average-linkage hierarchical cut of the consensus DISSIMILARITY
    (Monti's final assignment), host-side."""
    from scipy.cluster.hierarchy import fcluster, linkage
    from scipy.spatial.distance import squareform

    D = 1.0 - M
    D = 0.5 * (D + D.T)
    np.fill_diagonal(D, 0.0)
    Z = linkage(squareform(D, checks=False), method="average")
    return fcluster(Z, t=n_clusters, criterion="maxclust") - 1


def consensus_cluster(codes, n_clusters: int, n_resamples: int = 100,
                      subsample: float = 0.8, seed: int = 0,
                      n_iters: int = 50) -> Tuple[np.ndarray, np.ndarray]:
    """Consensus clustering at a fixed k. Returns (labels [N], M [N, N])."""
    M = consensus_matrix(codes, n_clusters, n_resamples, subsample, seed,
                         n_iters)
    return _cut_consensus(M, n_clusters), M


def select_n_clusters_consensus(
    codes, k_min: int = 2, k_max: int = 8, n_resamples: int = 100,
    subsample: float = 0.8, seed: int = 0, n_iters: int = 50,
    pac_tol: float = 0.01,
) -> Tuple[int, Dict[int, float], np.ndarray]:
    """Pick the cluster count by PAC over ``[k_min, k_max]``.

    Rule: the LARGEST k whose PAC is within ``pac_tol`` of the minimum.
    Plain argmin is wrong for separable data: merging whole true clusters
    is also perfectly stable, so PAC is ~0 for EVERY k <= k_true (Monti's
    consensus-CDF argument), while splitting a true cluster at k > k_true
    assigns its members arbitrarily and PAC jumps. The largest
    near-minimal k is therefore the finest stable structure.

    Returns ``(best_k, {k: pac}, labels_of_best_k)`` — mirrors
    ``cluster.select_n_clusters`` (silhouette) so callers can switch
    criteria; PAC is the consensus-stability evidence the TCGA literature
    standardized on (Senbabaoglu et al. 2014)."""
    n = np.shape(codes)[0]
    k_max = min(k_max, n - 1)
    if k_max < k_min:
        raise ValueError(f"cohort of {n} samples is too small for "
                         f"k_min={k_min}")
    scores: Dict[int, float] = {}
    for k in range(k_min, k_max + 1):
        M = consensus_matrix(codes, k, n_resamples, subsample, seed, n_iters)
        scores[k] = pac_score(M)
    floor = min(scores.values()) + pac_tol
    best = max(k for k, s in scores.items() if s <= floor)
    # recompute only the winner's matrix (deterministic in seed) instead of
    # holding every k's [N, N] matrix alive through the sweep
    M_best = consensus_matrix(codes, best, n_resamples, subsample, seed,
                              n_iters)
    return best, scores, _cut_consensus(M_best, best)
