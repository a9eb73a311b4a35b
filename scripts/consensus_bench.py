"""On-device consensus clustering vs the host loop -> BENCH_DETAIL.md.

Monti consensus is R independent k-means runs + co-clustering accumulation
— the classic embarrassingly-parallel analysis loop that host pipelines pay
per-resample overhead for. Here: the whole thing is ONE lax.scan on the
TPU (analysis/consensus.py) vs the equivalent host implementation (sklearn
KMeans per resample, numpy accumulation), identical R/subsample/k.

Run on the TPU: python scripts/consensus_bench.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from mdbn_tpu.analysis.consensus import consensus_matrix


def host_consensus(x, k, n_resamples, subsample, seed):
    from sklearn.cluster import KMeans

    rng = np.random.default_rng(seed)
    n = x.shape[0]
    m = int(round(subsample * n))
    C = np.zeros((n, n), np.float32)
    S = np.zeros((n, n), np.float32)
    for _ in range(n_resamples):
        idx = rng.permutation(n)[:m]
        labels = KMeans(n_clusters=k, n_init=1, max_iter=50,
                        random_state=int(rng.integers(2**31))).fit_predict(x[idx])
        A = np.eye(k, dtype=np.float32)[labels]
        co = A @ A.T
        C[np.ix_(idx, idx)] += co
        S[np.ix_(idx, idx)] += 1.0
    M = C / np.maximum(S, 1.0)
    np.fill_diagonal(M, 1.0)
    return M


def main():
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    for n, d, k, R in ((400, 100, 3, 100), (2000, 100, 4, 200)):
        centers = rng.normal(0, 1, (k, d)).astype(np.float32) * 4
        labels = rng.integers(0, k, n)
        x = (centers[labels] + rng.normal(0, 1, (n, d))).astype(np.float32)

        consensus_matrix(x, k, n_resamples=R, seed=0)  # compile
        t0 = time.perf_counter()
        M_dev = consensus_matrix(x, k, n_resamples=R, seed=0)
        t_dev = time.perf_counter() - t0

        t0 = time.perf_counter()
        M_host = host_consensus(x, k, R, 0.8, 0)
        t_host = time.perf_counter() - t0

        # same estimator (different RNG streams): block structure must agree
        same = labels[:, None] == labels[None, :]
        off = ~np.eye(n, dtype=bool)
        print(f"N={n} d={d} k={k} R={R}: device {t_dev:.3f}s, host "
              f"{t_host:.3f}s ({t_host / t_dev:.1f}x); within-cluster "
              f"consensus device/host "
              f"{M_dev[same & off].mean():.3f}/{M_host[same & off].mean():.3f}, "
              f"cross {M_dev[~same].mean():.3f}/{M_host[~same].mean():.3f}")


if __name__ == "__main__":
    main()
