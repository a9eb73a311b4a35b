"""Bidirectional log-Z bracket at the c1 graded scale (round 3).

AIS.md's schedule experiment showed the CD-1-trained c1 model (Bernoulli
784x500) is under-annealed even at 256k transitions — but a one-sided
estimator can only show "still climbing", never "how far to go". The
bidirectional bracket (forward AIS lower bound + reverse AIS upper bound,
Grosse et al. 2015) answers that directly: the gap IS the remaining
uncertainty. This script trains the same c1 model, then measures the bracket
across anneal budgets; the reverse chains start from data rows mixed by
``init_gibbs`` full Gibbs sweeps at beta=1 (approximate model samples —
standard practice; the gap is a diagnostic, not a certificate).

Run on the TPU: python scripts/ais_bracket_at_scale.py
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


def run(model, data, n_chains, n_betas, n_sweeps, schedule, init, n_seeds=3,
        resample_ess=0.0):
    lows, highs, gaps, esss, nres, secs = [], [], [], [], [], []
    for seed in range(n_seeds):
        t0 = time.perf_counter()
        out = ais.log_z_bracket(model.params, model.cfg, data[:1000],
                                key=jax.random.PRNGKey(100 + seed),
                                n_chains=n_chains, n_betas=n_betas,
                                n_sweeps=n_sweeps, schedule=schedule,
                                init=init, init_gibbs=1000,
                                resample_ess=resample_ess)
        secs.append(time.perf_counter() - t0)
        lows.append(out["log_z_lower"])
        highs.append(out["log_z_upper"])
        gaps.append(out["log_z_gap"])
        esss.append(out["ess_fwd"])
        nres.append(out["n_resamples_fwd"])
    lo, hi = np.asarray(lows), np.asarray(highs)
    tag = f"smc@{resample_ess}" if resample_ess else init
    print(f"| {tag} | {schedule} | {n_betas} | {n_sweeps} "
          f"| {n_betas * n_sweeps} "
          f"| {lo.mean():.2f} ± {lo.std():.2f} | {hi.mean():.2f} ± {hi.std():.2f} "
          f"| {np.mean(gaps):.2f} | {np.mean(esss):.1f} | {np.mean(nres):.0f} "
          f"| {np.median(secs):.2f} |", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    # the SAME c1 model as scripts/ais_schedule_experiment.py, so this table
    # brackets exactly the log Z that AIS.md's one-sided runs left climbing
    data = mnist_like(2000, seed=2)
    model = RBM(RBMConfig(n_visible=784, n_hidden=500, k=1, lr=0.05,
                          epochs=15, batch_size=20, seed=0)).train(data)
    print("\n| init | schedule | betas | sweeps | transitions | log Z lower "
          "| log Z upper | gap | ESS fwd | resamples | sec |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    rows = [
        ("gibbs", "uniform", 16_000, 1, 0.0),
        ("resample", "uniform", 16_000, 1, 0.0),
        ("resample", "sm", 16_000, 1, 0.0),
        ("resample", "uniform", 64_000, 1, 0.0),
        ("resample", "sm", 64_000, 1, 0.0),
        ("resample", "sm", 256_000, 1, 0.0),
        # round 4 (VERDICT r3 #3): SMC adaptive resampling — the
        # ESS-triggered fix for the measured forward weight collapse
        ("resample", "uniform", 16_000, 1, 0.5),
        ("resample", "sm", 16_000, 1, 0.5),
        ("resample", "uniform", 64_000, 1, 0.5),
        ("resample", "sm", 64_000, 1, 0.5),
        ("resample", "sm", 256_000, 1, 0.5),
    ]
    for init, schedule, n_betas, n_sweeps, ress in rows:
        run(model, data, 256, n_betas, n_sweeps, schedule, init,
            resample_ess=ress)


if __name__ == "__main__":
    main()
