"""Does parallel-tempering PCD train better models? (round 3)

Two measurements, run on the TPU (`python scripts/pt_quality_experiment.py`):

1. Enumerable ground truth (bars-and-stripes 4x4, H=12, exact log Z): PCD-1
   vs PT-PCD-1 (8 rungs) at equal epochs across learning rates and seeds,
   scored by EXACT test log-likelihood. PCD's known failure mode — the
   persistent chain can't track fast-moving parameters at high lr
   (Desjardins et al. 2010) — should appear in the PCD column and not the
   PT column.
2. Graded c1 scale (Bernoulli 784x500, mnist_like): same comparison scored
   by the bidirectional AIS bracket (AIS.md), reporting the ll interval
   [mean_ll_lower, mean_ll_upper] for each model.

Results are recorded in PT.md.
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
from mdbn_tpu.core.rbm_math import free_energy
from mdbn_tpu.data.synthetic import bars_and_stripes, mnist_like


def exact_ll(rbm, x):
    z = ais.exact_log_z(rbm.params)
    return float(-jnp.mean(free_energy(rbm.params, jnp.asarray(x), rbm.cfg)) - z)


def small_scale():
    data = bars_and_stripes(1024, side=4, seed=1)
    test = bars_and_stripes(256, side=4, seed=9)
    print("\n## bars-and-stripes 16x12, exact test log-likelihood "
          "(3 seeds, mean ± std)\n")
    print("| lr | PCD-1 | PT-PCD-1 (8 rungs) |")
    print("|---|---|---|")
    for lr in (0.1, 0.5, 1.0):
        pcd_ll, pt_ll = [], []
        for seed in range(3):
            base = dict(n_visible=16, n_hidden=12, lr=lr, epochs=40,
                        batch_size=16, persistent=True, engine="xla",
                        seed=seed)
            pcd_ll.append(exact_ll(RBM(RBMConfig(**base)).train(data), test))
            pt_ll.append(exact_ll(
                RBM(RBMConfig(**base, pt_temps=8, pt_beta_min=0.0)).train(data),
                test))
        p, t = np.asarray(pcd_ll), np.asarray(pt_ll)
        print(f"| {lr} | {p.mean():.2f} ± {p.std():.2f} "
              f"| {t.mean():.2f} ± {t.std():.2f} |", flush=True)


def c1_scale():
    data = mnist_like(2000, seed=2)
    train, test = data[:1500], data[1500:]
    print("\n## c1 scale 784x500, AIS-bracketed test log-likelihood "
          "(15 epochs, lr 0.05)\n")
    print("| trainer | train sec | ll lower | ll upper | log Z gap | ESS fwd |")
    print("|---|---|---|---|---|---|")
    for name, extra in [("PCD-1", {}),
                        ("PT-PCD-1 (10 rungs)", {"pt_temps": 10})]:
        cfg = RBMConfig(n_visible=784, n_hidden=500, k=1, lr=0.05, epochs=15,
                        batch_size=20, persistent=True, engine="xla", seed=0,
                        **extra)
        t0 = time.perf_counter()
        rbm = RBM(cfg).train(train)
        dt = time.perf_counter() - t0
        out = ais.log_z_bracket(rbm.params, rbm.cfg, jnp.asarray(test),
                                key=jax.random.PRNGKey(5), n_chains=1024,
                                n_betas=64_000, n_sweeps=2, schedule="sm",
                                base_data=jnp.asarray(train))
        print(f"| {name} | {dt:.1f} | {out['mean_log_likelihood_lower']:.2f} "
              f"| {out['mean_log_likelihood_upper']:.2f} "
              f"| {out['log_z_gap']:.2f} | {out['ess_fwd']:.1f} |", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    small_scale()
    c1_scale()


if __name__ == "__main__":
    main()
