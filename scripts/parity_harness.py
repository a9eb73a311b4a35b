"""Graded parity harness (SURVEY.md §4.4, BASELINE.json:2).

Runs the NumPy oracle (the CPU reference stand-in) and the TPU trainer with
identical hyperparameters/epochs on each of the five graded configs and
reports reconstruction-error parity plus, where clustering applies, the ARI
between the two implementations' k-means assignments on joint latent codes.

RNG streams necessarily differ (on-chip PRNG vs numpy), so parity is
distributional: final-epoch reconstruction errors must agree within
tolerance, not bit-match.

Usage: python scripts/parity_harness.py [--quick] [--out PARITY.md]
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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def reldiff(a, b):
    return abs(a - b) / max(abs(a), abs(b), 1e-12)


def run_all(quick: bool):
    E = 4 if quick else 10
    rows = []
    t_all = time.time()

    # ---- config 1: Bernoulli RBM, CD-1, batch 20 ----------------------------
    data = mnist_like(1000 if quick else 2000, seed=2)
    cfg = RBMConfig(n_visible=784, n_hidden=500 if not quick else 128, k=1,
                    lr=0.1, epochs=E, batch_size=20, seed=0)
    o = OracleRBM(cfg).train(data)
    m = RBM(cfg).train(data)
    rows.append(("c1 Bernoulli RBM CD-1", o.history[-1], m.history[-1],
                 m.metrics.engine, None))

    # ---- config 2: Gaussian-Bernoulli RBM on z-scored GE --------------------
    mods, labels = tcga_like(n_patients=200 if quick else 400, seed=1)
    cfg = RBMConfig(n_visible=mods["ge"].shape[1], n_hidden=200, visible="gaussian",
                    lr=0.005, epochs=E, batch_size=20, seed=0)
    o = OracleRBM(cfg).train(mods["ge"])
    m = RBM(cfg).train(mods["ge"])
    rows.append(("c2 Gaussian RBM (GE)", o.history[-1], m.history[-1],
                 m.metrics.engine, None))

    # ---- config 3: 3-layer DBN ----------------------------------------------
    dcfg = DBNConfig(layer_sizes=[200, 100, 50], visible="gaussian",
                     lr=0.1, gaussian_lr=0.005, epochs=E, batch_size=20, seed=0)
    od = OracleDBN(oracle_dbn_configs(dcfg, mods["ge"].shape[1])).train(mods["ge"])
    md = DBN(dcfg).train(mods["ge"])
    o_err = od.layers[-1].history[-1]
    m_err = md.layers[-1].history[-1]
    rows.append(("c3 DBN 3-layer (top layer)", o_err, m_err,
                 md.layers[-1].metrics.engine, None))

    # ---- configs 4+5: MDBN (PCD + momentum + L2) + k-means -------------------
    def tower_cfg(m_, width, seed):
        return DBNConfig(layer_sizes=[width, 50], visible="gaussian",
                         gaussian_lr=0.005, k=2, persistent=True, momentum=0.5,
                         l2=1e-4, epochs=E, batch_size=20, seed=seed)

    widths = {"ge": 200, "meth": 150, "mirna": 80}
    tcfgs = {m_: tower_cfg(m_, widths[m_], i) for i, m_ in enumerate(TOWERS)}
    joint = RBMConfig(n_visible=1, n_hidden=60, lr=0.05, k=2, persistent=True,
                      momentum=0.5, l2=1e-4, epochs=E, batch_size=20, seed=0)

    om = OracleMDBN(
        {m_: oracle_dbn_configs(tcfgs[m_], mods[m_].shape[1]) for m_ in TOWERS},
        joint).train(mods)
    mm = MDBN(MDBNConfig(towers=tcfgs, joint=joint)).train(mods)

    o_err = om.joint.history[-1]
    m_err = mm.joint.history[-1]
    o_pred, _ = kmeans_cluster(om.transform(mods), 3, seed=0)
    m_pred, _ = kmeans_cluster(np.asarray(mm.transform(mods)), 3, seed=0)
    cross_ari = adjusted_rand_index(o_pred, m_pred)
    rows.append(("c4+c5 MDBN joint (PCD+mom+L2)", o_err, m_err,
                 mm.joint.metrics.engine, cross_ari))
    rows.append(("c5 k-means ARI vs planted (oracle)",
                 adjusted_rand_index(labels, o_pred), None, "numpy", None))
    rows.append(("c5 k-means ARI vs planted (tpu)",
                 adjusted_rand_index(labels, m_pred), None,
                 mm.joint.metrics.engine, None))

    log(f"total harness time: {time.time() - t_all:.0f}s")
    return rows


def render(rows) -> str:
    import jax

    lines = [
        "# PARITY — oracle (CPU reference stand-in) vs TPU trainer",
        "",
        f"Backend: {jax.default_backend()} ({jax.devices()[0]}). "
        "Identical hyperparameters/epochs; RNG streams differ by construction, "
        "so parity is distributional (SURVEY.md §4.4).",
        "",
        "| config | oracle err | tpu err | rel diff | engine | cross-impl ARI |",
        "|---|---|---|---|---|---|",
    ]
    ok = True
    for name, o_err, m_err, engine, ari in rows:
        if m_err is None:
            lines.append(f"| {name} | {o_err:.4f} | — | — | {engine} | — |")
            continue
        rd = reldiff(o_err, m_err)
        # near-converged errors make relative diff meaningless; pass on either
        # a 15% relative or a 0.005 absolute agreement
        ok &= (rd < 0.15) or (abs(o_err - m_err) < 5e-3)
        ari_s = f"{ari:.3f}" if ari is not None else "—"
        lines.append(f"| {name} | {o_err:.4f} | {m_err:.4f} | {rd*100:.1f}% | {engine} | {ari_s} |")
    lines += ["", f"**Overall: {'PASS' if ok else 'FAIL'}** "
              "(reconstruction-error parity: rel diff < 15% or abs diff < 0.005 "
              "per config; cross-implementation clustering agreement where applicable)."]
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="PARITY.md")
    args = ap.parse_args()
    rows = run_all(args.quick)
    md = render(rows)
    with open(args.out, "w") as f:
        f.write(md)
    print(md)
