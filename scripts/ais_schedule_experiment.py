"""Equal-compute AIS anneal comparison at the c1 graded scale (round 3).

Question: does the Salakhutdinov-Murray piecewise schedule ("sm", dense near
beta=1) and/or multiple Gibbs sweeps per beta converge the hard c1 model
(CD-1-trained Bernoulli 784x500 — under-annealed at 64k uniform betas in
AIS.md) faster than the uniform schedule at the SAME transition count?
Compute cost of a run ~ n_betas * n_sweeps (each transition = one full Gibbs
sweep + one weight increment is O(chains * V * H) either way).

Run on the TPU: python scripts/ais_schedule_experiment.py
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from mdbn_tpu.analysis import ais
from mdbn_tpu.config import RBMConfig
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.models.rbm import RBM


def run(model, data, n_chains, n_betas, n_sweeps, schedule, n_seeds=5):
    vals, stds, secs = [], [], []
    for seed in range(n_seeds):
        t0 = time.perf_counter()
        out = ais.log_likelihood(model.params, model.cfg, data[:1000],
                                 key=jax.random.PRNGKey(100 + seed),
                                 n_chains=n_chains, n_betas=n_betas,
                                 n_sweeps=n_sweeps, schedule=schedule)
        secs.append(time.perf_counter() - t0)
        vals.append(out["log_z"])
        stds.append(out["logw_std"])
    vals = np.asarray(vals)
    row = {"schedule": schedule, "n_betas": n_betas, "n_sweeps": n_sweeps,
           "transitions": n_betas * n_sweeps,
           "log_z_mean": float(vals.mean()),
           "cross_seed_std": float(vals.std()),
           "logw_std_mean": float(np.mean(stds)),
           "sec": float(np.median(secs))}
    print(row, flush=True)
    return row


def main():
    print("backend:", jax.default_backend())
    c1 = RBMConfig(n_visible=784, n_hidden=500, k=1, lr=0.05, epochs=15,
                   batch_size=20, seed=0)
    d1 = mnist_like(2000, seed=2)
    m1 = RBM(c1).train(d1)
    print("c1 trained: err", m1.history[0], "->", m1.history[-1], flush=True)

    rows = []
    # 16k-transition tier
    rows.append(run(m1, d1, 256, 16000, 1, "uniform"))
    rows.append(run(m1, d1, 256, 16000, 1, "sm"))
    rows.append(run(m1, d1, 256, 4000, 4, "uniform"))
    rows.append(run(m1, d1, 256, 4000, 4, "sm"))
    # 64k-transition tier
    rows.append(run(m1, d1, 256, 64000, 1, "uniform"))
    rows.append(run(m1, d1, 256, 64000, 1, "sm"))
    rows.append(run(m1, d1, 256, 16000, 4, "sm"))
    # 256k-transition tier: where (if anywhere) does the drift stop?
    rows.append(run(m1, d1, 256, 256000, 1, "uniform"))
    rows.append(run(m1, d1, 256, 256000, 1, "sm"))
    rows.append(run(m1, d1, 256, 64000, 4, "sm"))

    print("\n| schedule | betas | sweeps | transitions | log Z | xseed std | logw_std | sec |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['schedule']} | {r['n_betas']} | {r['n_sweeps']} | "
              f"{r['transitions']} | {r['log_z_mean']:.2f} | "
              f"{r['cross_seed_std']:.3f} | {r['logw_std_mean']:.2f} | "
              f"{r['sec']:.2f} |")


if __name__ == "__main__":
    main()
