"""Does learn_variance help when the data is NOT unit-variance? (VARIANCE.md)

The graded pipeline z-scores continuous omics features (BASELINE.json
config 2), and the sigma=1 GRBM is correct exactly then. This experiment
measures the realistic failure mode: per-feature scales the preprocessing
missed (unlogged counts, platform batch effects) — the cluster SIGNAL
lives in a small block of correctly-scaled features while a large block of
uninformative features carries inflated scales. A fixed-sigma model reads
amplitude as importance (hidden pre-activations are raw v @ W), so the
loud noise features dominate its weights; the learned-variance model's
v/sigma^2 input scaling re-weights features by their fitted noise level.

Protocol per noise-scale kappa x seed: train a Gaussian RBM (H=32, CD-1)
with (a) fixed sigma=1 on the mis-scaled data, (b) learn_variance=True on
the mis-scaled data, and (c) fixed sigma=1 on PROPERLY re-z-scored data
(the preprocessing-oracle ceiling). Metric: k-means ARI of the hidden
codes vs the planted clusters (the framework's end use), plus the learned
sigma's log-log correlation with the true scales. TPU, XLA engine (the
fused kernels gate learn_variance off).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from mdbn_tpu.analysis.cluster import adjusted_rand_index, kmeans_cluster
from mdbn_tpu.config import RBMConfig
from mdbn_tpu.data.synthetic import zscore
from mdbn_tpu.models.rbm import RBM

N, V, H, K = 400, 256, 32, 3
V_SIG = 32  # informative features (unit scale); the rest are scaled noise
SIGNAL = 1.2
EPOCHS = 40
SEEDS = (0, 1, 2)


def planted(seed, kappa):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, K, N)
    centers = np.zeros((K, V), np.float32)
    centers[:, :V_SIG] = rng.standard_normal((K, V_SIG)) * SIGNAL
    x = centers[labels] + rng.standard_normal((N, V))
    x = zscore(x.astype(np.float32))
    # noise features get scales log-uniform in [1, kappa]; signal stays 1
    scales = np.ones(V, np.float32)
    scales[V_SIG:] = np.exp(rng.uniform(0.0, np.log(kappa),
                                        V - V_SIG)).astype(np.float32)
    return (x * scales).astype(np.float32), labels, scales


def ari_of(data, labels, cfg):
    rbm = RBM(cfg).train(data)
    codes = np.asarray(rbm.transform(data))
    pred, _ = kmeans_cluster(codes, K, seed=0)
    return adjusted_rand_index(labels, pred), rbm


def run(kappa):
    rows = []
    for seed in SEEDS:
        xs, labels, scales = planted(seed, kappa)
        base = dict(n_visible=V, n_hidden=H, visible="gaussian", lr=0.005,
                    grad_clip=1.0, epochs=EPOCHS, batch_size=20, seed=seed,
                    engine="xla")
        t0 = time.perf_counter()
        ari_fixed, _ = ari_of(xs, labels, RBMConfig(**base))
        ari_lv, rbm_lv = ari_of(xs, labels, RBMConfig(
            **base, learn_variance=True, lr_variance=0.05))
        ari_oracle, _ = ari_of(zscore(xs), labels, RBMConfig(**base))
        lsig = np.log(np.asarray(rbm_lv.sigma))
        lsc = np.log(scales)
        corr = (float(np.corrcoef(lsig, lsc)[0, 1])
                if lsc.std() > 0 else float("nan"))
        rows.append((ari_fixed, ari_lv, ari_oracle, corr))
        print(f"  kappa={kappa} seed {seed}: fixed {ari_fixed:.3f}  "
              f"learn_var {ari_lv:.3f}  re-zscored {ari_oracle:.3f}  "
              f"sigma-corr {corr:.3f}  [{time.perf_counter() - t0:.1f}s]",
              flush=True)
    r = np.array(rows)
    print(f"kappa={kappa}: fixed {r[:,0].mean():.3f}±{r[:,0].std():.3f}  "
          f"learn_var {r[:,1].mean():.3f}±{r[:,1].std():.3f}  "
          f"re-zscored {r[:,2].mean():.3f}±{r[:,2].std():.3f}  "
          f"sigma-corr {np.nanmean(r[:,3]):.3f}", flush=True)
    return r


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    for kappa in (1.0, 2.0, 4.0, 8.0):
        run(kappa)


if __name__ == "__main__":
    main()
