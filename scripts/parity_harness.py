"""Graded parity harness (SURVEY.md §4.4, BASELINE.json:2) — multi-seed.

Runs the NumPy oracle (the CPU reference stand-in) and the TPU trainer with
identical hyperparameters/epochs on each of the five graded configs, across
``--seeds`` independent RNG seeds per config (VERDICT r1 #3: >= 5 seeds, a
distributional criterion, no single-sample absolute-threshold escape hatch).

RNG streams necessarily differ between the on-chip PRNG and numpy, so each
implementation's final reconstruction error is a random variable; parity
means the two distributions agree. Criterion per config: the 95% t-intervals
of the final-epoch reconstruction error (mean +/- t_{0.975,n-1} * s/sqrt(n))
overlap. Data is held fixed per config so the comparison isolates
implementation/RNG effects.

Usage: python scripts/parity_harness.py [--quick] [--seeds N] [--out PARITY.md]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from mdbn_tpu.analysis.cluster import adjusted_rand_index, kmeans_cluster
from mdbn_tpu.config import DBNConfig, MDBNConfig, RBMConfig
from mdbn_tpu.data.synthetic import mnist_like, tcga_like
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.models.mdbn import MDBN
from mdbn_tpu.models.rbm import RBM
from mdbn_tpu.oracle import OracleDBN, OracleMDBN, OracleRBM, oracle_dbn_configs

TOWERS = ["ge", "meth", "mirna"]
T95 = {2: 12.706, 3: 4.303, 4: 3.182, 5: 2.776, 6: 2.571, 7: 2.447,
       8: 2.365, 9: 2.306, 10: 2.262}  # two-sided 95% t critical, df = n-1


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ci(vals):
    """(mean, half-width of the 95% t-interval)."""
    v = np.asarray(vals, np.float64)
    n = len(v)
    if n < 2:
        return float(v.mean()), float("inf")
    t = T95.get(n, 2.0)
    return float(v.mean()), float(t * v.std(ddof=1) / np.sqrt(n))


class Row:
    def __init__(self, name, o_errs, t_errs=None, engine="numpy", aris=None):
        self.name, self.o_errs, self.t_errs = name, o_errs, t_errs
        self.engine, self.aris = engine, aris

    @property
    def overlap(self):
        if self.t_errs is None:
            return None
        om, oh = ci(self.o_errs)
        tm, th = ci(self.t_errs)
        return abs(om - tm) <= oh + th


def run_all(quick: bool, n_seeds: int):
    E = 4 if quick else 10
    rows = []
    t_all = time.time()

    # ---- config 1: Bernoulli RBM, CD-1, batch 20 ----------------------------
    data = mnist_like(1000 if quick else 2000, seed=2)
    o_errs, t_errs = [], []
    for s in range(n_seeds):
        cfg = RBMConfig(n_visible=784, n_hidden=500 if not quick else 128, k=1,
                        lr=0.1, epochs=E, batch_size=20, seed=100 * s)
        o_errs.append(OracleRBM(cfg).train(data).history[-1])
        m = RBM(cfg).train(data)
        t_errs.append(m.history[-1])
        log(f"c1 seed {s}: oracle {o_errs[-1]:.4f} tpu {t_errs[-1]:.4f}")
    rows.append(Row("c1 Bernoulli RBM CD-1", o_errs, t_errs, m.metrics.engine))

    # ---- config 2: Gaussian-Bernoulli RBM on z-scored GE --------------------
    mods, labels = tcga_like(n_patients=200 if quick else 400, seed=1)
    o_errs, t_errs = [], []
    for s in range(n_seeds):
        cfg = RBMConfig(n_visible=mods["ge"].shape[1], n_hidden=200,
                        visible="gaussian", lr=0.005, epochs=E, batch_size=20,
                        seed=100 * s)
        o_errs.append(OracleRBM(cfg).train(mods["ge"]).history[-1])
        m = RBM(cfg).train(mods["ge"])
        t_errs.append(m.history[-1])
        log(f"c2 seed {s}: oracle {o_errs[-1]:.4f} tpu {t_errs[-1]:.4f}")
    rows.append(Row("c2 Gaussian RBM (GE)", o_errs, t_errs, m.metrics.engine))

    # ---- config 3: 3-layer DBN ----------------------------------------------
    o_errs, t_errs = [], []
    for s in range(n_seeds):
        dcfg = DBNConfig(layer_sizes=[200, 100, 50], visible="gaussian",
                         lr=0.1, gaussian_lr=0.005, epochs=E, batch_size=20,
                         seed=100 * s)
        od = OracleDBN(oracle_dbn_configs(dcfg, mods["ge"].shape[1])).train(mods["ge"])
        md = DBN(dcfg).train(mods["ge"])
        o_errs.append(od.layers[-1].history[-1])
        t_errs.append(md.layers[-1].history[-1])
        log(f"c3 seed {s}: oracle {o_errs[-1]:.4f} tpu {t_errs[-1]:.4f}")
    rows.append(Row("c3 DBN 3-layer (top layer)", o_errs, t_errs,
                    md.layers[-1].metrics.engine))

    # ---- configs 4+5: MDBN (PCD + momentum + L2) + k-means -------------------
    widths = {"ge": 200, "meth": 150, "mirna": 80}

    def tower_cfg(m_, s):
        return DBNConfig(layer_sizes=[widths[m_], 50], visible="gaussian",
                         gaussian_lr=0.005, k=2, persistent=True, momentum=0.5,
                         l2=1e-4, epochs=E, batch_size=20,
                         seed=100 * s + TOWERS.index(m_))

    o_errs, t_errs, cross_aris, o_pl, t_pl = [], [], [], [], []
    for s in range(n_seeds):
        tcfgs = {m_: tower_cfg(m_, s) for m_ in TOWERS}
        joint = RBMConfig(n_visible=1, n_hidden=60, lr=0.05, k=2,
                          persistent=True, momentum=0.5, l2=1e-4, epochs=E,
                          batch_size=20, seed=100 * s + 7)
        om = OracleMDBN(
            {m_: oracle_dbn_configs(tcfgs[m_], mods[m_].shape[1])
             for m_ in TOWERS}, joint).train(mods)
        mm = MDBN(MDBNConfig(towers=tcfgs, joint=joint)).train(mods)
        o_errs.append(om.joint.history[-1])
        t_errs.append(mm.joint.history[-1])
        o_pred, _ = kmeans_cluster(om.transform(mods), 3, seed=0)
        m_pred, _ = kmeans_cluster(np.asarray(mm.transform(mods)), 3, seed=0)
        cross_aris.append(adjusted_rand_index(o_pred, m_pred))
        o_pl.append(adjusted_rand_index(labels, o_pred))
        t_pl.append(adjusted_rand_index(labels, m_pred))
        log(f"c4+c5 seed {s}: oracle {o_errs[-1]:.4f} tpu {t_errs[-1]:.4f} "
            f"ARI x-impl {cross_aris[-1]:.3f}")
    rows.append(Row("c4+c5 MDBN joint (PCD+mom+L2)", o_errs, t_errs,
                    mm.joint.metrics.engine, cross_aris))
    rows.append(Row("c5 k-means ARI vs planted (oracle)", o_pl))
    rows.append(Row("c5 k-means ARI vs planted (tpu)", t_pl,
                    engine=mm.joint.metrics.engine))

    # ---- round-4 estimator rows (VERDICT r3 #5): every OTHER update rule a
    # user can select gets the same 5-seed CI-overlap grading as the five
    # graded configs — the oracle mirrors (mdbn_tpu/oracle.py) implement
    # each rule in NumPy, so these are true cross-implementation rows, not
    # self-comparisons.
    H = 500 if not quick else 128
    data = mnist_like(1000 if quick else 2000, seed=2)

    # parallel-tempering PCD (5-rung replica-swap ladder)
    o_errs, t_errs = [], []
    for s in range(n_seeds):
        cfg = RBMConfig(n_visible=784, n_hidden=H, k=1, lr=0.1, epochs=E,
                        batch_size=20, persistent=True, pt_temps=5,
                        pt_beta_min=0.2, seed=100 * s)
        o_errs.append(OracleRBM(cfg).train(data).history[-1])
        m = RBM(cfg).train(data)
        t_errs.append(m.history[-1])
        log(f"pt seed {s}: oracle {o_errs[-1]:.4f} tpu {t_errs[-1]:.4f}")
    rows.append(Row("PT-PCD (pt_temps=5)", o_errs, t_errs, m.metrics.engine))

    # enhanced gradient (Cho-Raiko-Ilin recombination)
    o_errs, t_errs = [], []
    for s in range(n_seeds):
        cfg = RBMConfig(n_visible=784, n_hidden=H, k=1, lr=0.1, epochs=E,
                        batch_size=20, gradient="enhanced", seed=100 * s)
        o_errs.append(OracleRBM(cfg).train(data).history[-1])
        m = RBM(cfg).train(data)
        t_errs.append(m.history[-1])
        log(f"enh seed {s}: oracle {o_errs[-1]:.4f} tpu {t_errs[-1]:.4f}")
    rows.append(Row("enhanced gradient", o_errs, t_errs, m.metrics.engine))

    # learned-variance GRBM (per-unit sigma^2 by CD) on scale-corrupted GE
    rng = np.random.default_rng(0)
    sig = np.exp(rng.uniform(-1.0, 1.0, mods["ge"].shape[1])).astype(np.float32)
    ge_scaled = (mods["ge"] * sig).astype(np.float32)
    o_errs, t_errs = [], []
    for s in range(n_seeds):
        cfg = RBMConfig(n_visible=ge_scaled.shape[1], n_hidden=200,
                        visible="gaussian", learn_variance=True, lr=0.005,
                        epochs=E, batch_size=20, seed=100 * s)
        o_errs.append(OracleRBM(cfg).train(ge_scaled).history[-1])
        m = RBM(cfg).train(ge_scaled)
        t_errs.append(m.history[-1])
        log(f"lv seed {s}: oracle {o_errs[-1]:.4f} tpu {t_errs[-1]:.4f}")
    rows.append(Row("learned-variance GRBM", o_errs, t_errs,
                    m.metrics.engine))

    log(f"total harness time: {time.time() - t_all:.0f}s")
    return rows


def render(rows, n_seeds) -> str:
    import jax

    lines = [
        "# PARITY — oracle (CPU reference stand-in) vs TPU trainer",
        "",
        f"Backend: {jax.default_backend()} ({jax.devices()[0]}). "
        f"{n_seeds} seeds per config, identical hyperparameters/epochs per "
        "seed, data fixed per config; RNG streams differ by construction, so "
        "parity is distributional (SURVEY.md §4.4, VERDICT r1 #3): PASS = the "
        "two implementations' 95% t-intervals of the final reconstruction "
        "error overlap. No absolute-threshold escape hatch.",
        "",
        "| config | oracle err (95% CI) | tpu err (95% CI) | CIs overlap | engine | cross-impl ARI |",
        "|---|---|---|---|---|---|",
    ]
    ok = True
    for r in rows:
        om, oh = ci(r.o_errs)
        o_s = f"{om:.6f} ± {oh:.6f}"
        if r.t_errs is None:
            lines.append(f"| {r.name} | {o_s} | — | — | {r.engine} | — |")
            continue
        tm, th = ci(r.t_errs)
        ok &= r.overlap
        ari_s = f"{np.mean(r.aris):.3f}" if r.aris else "—"
        lines.append(f"| {r.name} | {o_s} | {tm:.6f} ± {th:.6f} | "
                     f"{'yes' if r.overlap else 'NO'} | {r.engine} | {ari_s} |")
    lines += ["", f"**Overall: {'PASS' if ok else 'FAIL'}** "
              "(per config: overlapping 95% t-intervals of final "
              "reconstruction error across seeds; cross-implementation "
              "k-means agreement reported where clustering applies)."]
    # per-seed appendix (VERDICT r2 #10): enough digits that the CI-overlap
    # criterion is visibly non-degenerate — the per-seed spread IS the
    # statistic, so show it rather than a rounded-equal summary
    lines += ["", "## Per-seed final reconstruction errors (6 decimals)", "",
              "| config | seed | oracle | tpu |", "|---|---|---|---|"]
    for r in rows:
        if r.t_errs is None:
            continue
        for s, (o, t) in enumerate(zip(r.o_errs, r.t_errs)):
            lines.append(f"| {r.name} | {s} | {o:.6f} | {t:.6f} |")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--out", default="PARITY.md")
    args = ap.parse_args()
    rows = run_all(args.quick, args.seeds)
    md = render(rows, args.seeds)
    with open(args.out, "w") as f:
        f.write(md)
    print(md)
