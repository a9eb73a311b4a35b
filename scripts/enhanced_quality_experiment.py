"""Does the enhanced gradient train better/more robustly? (round 3)

Three measurements, run on the TPU
(`python scripts/enhanced_quality_experiment.py`); results in ENHANCED.md:

1. Enumerable ground truth (mnist_like 16x12, exact log Z): plain CD-1 vs
   enhanced CD-1 at equal epochs, on the data as-is AND on its bit-flipped
   representation (v -> 1-v; Cho, Raiko & Ilin 2011's "1-MNIST" probe).
   The enhanced update is provably representation-invariant
   (tests/test_enhanced.py::test_flip_invariance), so its two columns should
   agree statistically; plain CD is expected to degrade on the flipped
   representation.
2. Graded c1 shape (784x500, batch 20): downstream cluster recovery — train
   on flipped mnist_like, k-means the hidden codes, score ARI vs the
   generating prototype labels. The framework's end use is latent-code
   clustering (BASELINE.json:11), so this is the metric that matters.
3. Honest cost accounting at the c1 shape: updates/s for plain-XLA,
   enhanced-XLA, and the plain Pallas mega-kernel (enhanced is gated to the
   XLA engine, so its real cost is the Pallas-vs-XLA gap, not the
   recombination arithmetic).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mdbn_tpu import RBM, RBMConfig
from mdbn_tpu.analysis import ais
from mdbn_tpu.analysis.cluster import adjusted_rand_index
from mdbn_tpu.core.rbm_math import free_energy
from mdbn_tpu.data.synthetic import mnist_like


def exact_ll(rbm, x):
    z = ais.exact_log_z(rbm.params)
    return float(-jnp.mean(free_energy(rbm.params, jnp.asarray(x), rbm.cfg)) - z)


def enumerable():
    data = mnist_like(1024, n_features=16, seed=1, binarize="sample")
    test = mnist_like(256, n_features=16, seed=9, binarize="sample")
    print(f"\n## mnist_like 16x12 (mean pixel {data.mean():.2f}), exact test "
          "log-likelihood (3 seeds, mean ± std)\n")
    print("| lr | rep | plain CD-1 | enhanced CD-1 |")
    print("|---|---|---|---|")
    for lr in (0.1, 0.3):
        for rep, d, t in (("as-is", data, test), ("flipped", 1 - data, 1 - test)):
            cols = []
            for gradient in ("plain", "enhanced"):
                lls = []
                for seed in range(3):
                    cfg = RBMConfig(n_visible=16, n_hidden=12, lr=lr, epochs=40,
                                    batch_size=16, gradient=gradient,
                                    engine="xla", seed=seed)
                    lls.append(exact_ll(RBM(cfg).train(d), t))
                lls = np.asarray(lls)
                cols.append(f"{lls.mean():.2f} ± {lls.std():.2f}")
            print(f"| {lr} | {rep} | {cols[0]} | {cols[1]} |", flush=True)


def c1_clustering():
    data, labels = mnist_like(2000, seed=2, return_labels=True)
    flipped = 1 - data
    print("\n## c1 shape 784x64, k-means ARI of hidden codes vs generating "
          "prototypes (flipped representation, 3 seeds)\n")
    print("| rep | plain CD-1 | enhanced CD-1 |")
    print("|---|---|---|")
    from sklearn.cluster import KMeans

    for rep, d in (("as-is", data), ("flipped", flipped)):
        cols = []
        for gradient in ("plain", "enhanced"):
            aris = []
            for seed in range(3):
                cfg = RBMConfig(n_visible=784, n_hidden=64, lr=0.05, epochs=10,
                                batch_size=20, gradient=gradient,
                                engine="xla", seed=seed)
                rbm = RBM(cfg).train(d)
                codes = np.asarray(rbm.transform(d))
                pred = KMeans(n_clusters=10, n_init=10,
                              random_state=seed).fit_predict(codes)
                aris.append(adjusted_rand_index(labels, pred))
            aris = np.asarray(aris)
            cols.append(f"{aris.mean():.3f} ± {aris.std():.3f}")
        print(f"| {rep} | {cols[0]} | {cols[1]} |", flush=True)


def cost():
    data = jnp.asarray(mnist_like(6000, seed=2))  # upload once
    nb = 6000 // 20
    print("\n## marginal cost at the graded c1 shape (784x500, batch 20; "
          "two-point method, fixed launch/upload cost cancelled)\n")
    print("| engine | gradient | marginal updates/s |")
    print("|---|---|---|")

    def timed(cfg):
        RBM(cfg).train(data)  # compile warmup at the SAME shapes
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rbm = RBM(cfg).train(data)
            np.asarray(rbm.params.W)  # true sync
            best = min(best, time.perf_counter() - t0)
        return best

    for engine, gradient in (("xla", "plain"), ("xla", "enhanced"),
                             ("pallas", "plain")):
        base = dict(n_visible=784, n_hidden=500, lr=0.05, batch_size=20,
                    gradient=gradient, engine=engine, seed=0)
        t_lo = timed(RBMConfig(**base, epochs=5))
        t_hi = timed(RBMConfig(**base, epochs=55))
        rate = 50 * nb / (t_hi - t_lo)
        print(f"| {engine} | {gradient} | {rate:,.0f} |", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    enumerable()
    c1_clustering()
    cost()


if __name__ == "__main__":
    main()
