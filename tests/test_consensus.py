"""Consensus clustering (Monti 2003) + PAC k-selection.

Validation: planted clusters must yield a near-binary consensus matrix
whose hierarchical cut recovers the planting exactly, PAC must pick the
planted k against both smaller and larger candidates, and the matrix
estimator's normalization (co-clustered / co-sampled) is checked on a
degenerate one-cluster dataset where every co-sampled pair must always
co-cluster.
"""

import numpy as np
import pytest

from mdbn_tpu.analysis.cluster import adjusted_rand_index
from mdbn_tpu.analysis.consensus import (
    consensus_cluster,
    consensus_matrix,
    pac_score,
    select_n_clusters_consensus,
)


def _planted(n=120, k=3, d=8, sep=4.0, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, k, n)
    centers = rng.normal(0, 1, (k, d)) * sep
    return (centers[labels] + rng.normal(0, 1, (n, d))).astype(np.float32), labels


def test_recovers_planted_clusters_and_block_structure():
    x, truth = _planted()
    pred, M = consensus_cluster(x, 3, n_resamples=50, seed=0)
    assert adjusted_rand_index(truth, pred) == pytest.approx(1.0)
    # block structure: same-cluster pairs ~1, cross-cluster ~0
    same = truth[:, None] == truth[None, :]
    off = ~np.eye(len(truth), dtype=bool)
    assert M[same & off].mean() > 0.95
    assert M[~same].mean() < 0.05
    # well-formed: symmetric, unit diagonal, [0, 1]
    np.testing.assert_allclose(M, M.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(M), 1.0)
    assert M.min() >= 0.0 and M.max() <= 1.0


def test_pac_selects_planted_k():
    x, truth = _planted(sep=5.0, seed=1)
    best, scores, pred = select_n_clusters_consensus(
        x, k_min=2, k_max=5, n_resamples=40, seed=0)
    assert best == 3, scores
    assert scores[3] < scores[4] and scores[3] < scores[2]
    assert adjusted_rand_index(truth, pred) == pytest.approx(1.0)


def test_normalization_on_one_cluster_data():
    """k=1 on any data: every co-sampled pair co-clusters, so every
    consensus entry must be exactly 1 wherever the pair was ever co-sampled
    (checks the C/S normalization, not just the clustering)."""
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (40, 4)).astype(np.float32)
    M = consensus_matrix(x, 1, n_resamples=30, subsample=0.8, seed=0)
    sampled = M > 0  # pairs never co-sampled stay 0/never-updated
    assert np.all(M[sampled] == pytest.approx(1.0))
    # with 30 resamples at 80%, nearly all pairs get co-sampled
    assert sampled.mean() > 0.99


def test_pac_definition():
    M = np.array([[1.0, 0.5, 0.95], [0.5, 1.0, 0.05], [0.95, 0.05, 1.0]])
    # off-diagonal values: 0.5 (ambiguous), 0.95, 0.05 (confident)
    assert pac_score(M) == pytest.approx(1.0 / 3.0)
    assert pac_score(M, u1=0.01, u2=0.99) == pytest.approx(1.0)


def test_determinism_and_validation():
    x, _ = _planted(n=50)
    M1 = consensus_matrix(x, 3, n_resamples=10, seed=7)
    M2 = consensus_matrix(x, 3, n_resamples=10, seed=7)
    np.testing.assert_array_equal(M1, M2)
    with pytest.raises(ValueError, match="must exceed"):
        consensus_matrix(x, 45, n_resamples=5)
    with pytest.raises(ValueError, match="too small"):
        select_n_clusters_consensus(x[:2], k_min=3)


def test_cli_consensus_kmeans(tmp_path):
    """CLI 'kmeans': 'consensus' selects k by PAC and reports ARI."""
    import json

    from mdbn_tpu.config import RBMConfig, save_config
    from mdbn_tpu.run import main

    save_config({
        "model": RBMConfig(n_visible=784, n_hidden=32, epochs=4,
                           batch_size=20, engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 150, "n_prototypes": 3,
                 "seed": 3},
        "analysis": {"kmeans": "consensus", "k_min": 2, "k_max": 4,
                     "consensus_resamples": 30},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    km = [r for r in recs if r["kind"] == "kmeans"]
    assert km and "pac_scores" in km[0]
    assert km[0]["ari_vs_planted"] > 0.9


def test_pac_rule_prefers_finest_stable_structure():
    """Separable data gives PAC ~0 for EVERY k <= k_true (merging whole
    clusters is stable too); the rule must still pick k_true = the largest
    near-minimal k. 4 well-separated clusters arranged as 2 super-groups
    makes k=2 AND k=4 stable."""
    rng = np.random.default_rng(3)
    centers = np.array([[-20, -3], [-20, 3], [20, -3], [20, 3]], np.float32)
    labels = rng.integers(0, 4, 160)
    x = (centers[labels] * 1.0 + rng.normal(0, 0.4, (160, 2))).astype(np.float32)
    best, scores, pred = select_n_clusters_consensus(
        x, k_min=2, k_max=6, n_resamples=40, seed=0)
    assert scores[2] < 0.01 and scores[4] < 0.01  # both stable
    assert best == 4, scores
    assert adjusted_rand_index(labels, pred) == pytest.approx(1.0)
