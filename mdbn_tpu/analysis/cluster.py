"""Downstream analysis: latent feature extraction + k-means patient
clustering (SURVEY.md §2.1 last rows, BASELINE.json config 5).

k-means runs on host via scikit-learn (present in the environment, SURVEY.md
§7); the latent codes come off-device once per cohort.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def extract_latent(model, data) -> np.ndarray:
    """Joint latent codes for all samples. ``model`` is any object with the
    reference-shaped ``transform`` (RBM/DBN/MDBN)."""
    return np.asarray(model.transform(data))


def kmeans_cluster(codes: np.ndarray, n_clusters: int, seed: int = 0,
                   n_init: int = 10) -> Tuple[np.ndarray, np.ndarray]:
    """Cluster latent codes; returns (labels, centers)."""
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=n_clusters, random_state=seed, n_init=n_init)
    labels = km.fit_predict(codes)
    return labels, km.cluster_centers_


def cluster_patients(model, modalities: Dict[str, np.ndarray], n_clusters: int,
                     seed: int = 0) -> np.ndarray:
    """End-to-end: MDBN joint codes -> k-means patient subgroups."""
    codes = extract_latent(model, modalities)
    labels, _ = kmeans_cluster(codes, n_clusters, seed=seed)
    return labels


def adjusted_rand_index(a: np.ndarray, b: np.ndarray) -> float:
    from sklearn.metrics import adjusted_rand_score

    return float(adjusted_rand_score(a, b))


def select_n_clusters(codes: np.ndarray, k_min: int = 2, k_max: int = 8,
                      seed: int = 0) -> Tuple[int, Dict[int, float], np.ndarray]:
    """Pick the cluster count by silhouette score over ``[k_min, k_max]``.

    The paper pipeline the reference reproduces (Liang et al. 2015) chooses
    the patient-subgroup count from the data rather than fixing it; the
    silhouette criterion is the standard model-free way. Returns
    ``(best_k, {k: score}, labels_of_best_k)`` — the winning assignment is
    returned so callers don't re-fit the same k-means."""
    from sklearn.metrics import silhouette_score

    k_max = min(k_max, len(codes) - 1)
    if k_max < k_min:
        raise ValueError(f"cohort of {len(codes)} samples is too small for "
                         f"k_min={k_min} (need more than k_min samples)")
    # the silhouette is O(n^2) pairwise distances; a fixed-size subsample
    # gives the same k selection on large (streamed) cohorts
    sample_size = min(len(codes), 10_000)
    scores: Dict[int, float] = {}
    fits: Dict[int, np.ndarray] = {}
    for k in range(k_min, k_max + 1):
        labels, _ = kmeans_cluster(codes, k, seed=seed)
        if len(np.unique(labels)) < 2:
            continue
        scores[k] = float(silhouette_score(codes, labels,
                                           sample_size=sample_size,
                                           random_state=seed))
        fits[k] = labels
    if not scores:
        raise ValueError("no k in range produced >= 2 distinct clusters")
    best = max(scores, key=scores.get)
    return best, scores, fits[best]
