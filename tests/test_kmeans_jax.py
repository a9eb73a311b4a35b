"""On-device JAX k-means vs sklearn on planted-cluster data."""

import numpy as np

from mdbn_tpu.analysis.cluster import adjusted_rand_index, kmeans_cluster
from mdbn_tpu.analysis.kmeans_jax import kmeans_cluster_jax
from mdbn_tpu.data.synthetic import tcga_like


def test_recovers_planted_clusters():
    mods, labels = tcga_like(n_patients=300, n_clusters=3,
                             dims={"ge": 50, "meth": 10, "mirna": 10}, seed=0,
                             signal=2.5)
    x = mods["ge"]
    pred_jax, centers = kmeans_cluster_jax(x, 3, seed=0)
    assert adjusted_rand_index(labels, pred_jax) > 0.95
    assert centers.shape == (3, 50)


def test_agrees_with_sklearn():
    mods, labels = tcga_like(n_patients=200, n_clusters=4,
                             dims={"ge": 30, "meth": 10, "mirna": 10}, seed=1,
                             signal=2.5)
    x = mods["ge"]
    pred_jax, _ = kmeans_cluster_jax(x, 4, seed=0)
    pred_sk, _ = kmeans_cluster(x, 4, seed=0)
    assert adjusted_rand_index(pred_jax, pred_sk) > 0.95


def test_empty_cluster_guard():
    # k > distinct points: empty clusters must not NaN out
    x = np.ones((10, 4), np.float32)
    pred, centers = kmeans_cluster_jax(x, 3, seed=0, n_init=2, n_iters=5)
    assert np.isfinite(centers).all()


def test_cluster_patients_end_to_end():
    from mdbn_tpu.analysis.cluster import cluster_patients

    class FakeModel:
        def transform(self, mods):
            return mods["ge"][:, :5]

    mods, labels = tcga_like(n_patients=120, n_clusters=3,
                             dims={"ge": 40, "meth": 10, "mirna": 10},
                             seed=3, signal=3.0)
    pred = cluster_patients(FakeModel(), mods, n_clusters=3)
    assert pred.shape == (120,)
