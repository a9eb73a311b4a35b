"""End-to-end demo: the reference notebook's flow, TPU-native.

Replicates the glgerard/MDBN notebook experience (SURVEY.md §1 L6) on
synthetic data: train a Bernoulli RBM on MNIST-like digits, train a
3-modality MDBN on TCGA-like multi-omics, extract joint latent codes,
cluster patients with k-means, and save figures.

    python examples/demo.py [--outdir demo_out]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mdbn_tpu import DBN, MDBN, RBM, DBNConfig, MDBNConfig, RBMConfig
from mdbn_tpu.analysis.cluster import adjusted_rand_index, extract_latent
from mdbn_tpu.analysis.kmeans_jax import kmeans_cluster_jax
from mdbn_tpu.data.synthetic import mnist_like, tcga_like


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="demo_out")
    ap.add_argument("--epochs", type=int, default=15)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # ---- 1. Bernoulli RBM on binarized MNIST-like digits -------------------
    print("[1/6] Bernoulli RBM on MNIST-like data ...")
    data = mnist_like(2000, seed=2)
    rbm = RBM(RBMConfig(n_visible=784, n_hidden=100, k=1, lr=0.1,
                        epochs=args.epochs, batch_size=20, seed=0))
    rbm.train(data)
    print(f"    engine={rbm.metrics.engine}  err {rbm.history[0]:.4f} -> {rbm.history[-1]:.4f}")

    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].plot(rbm.history)
    axes[0].set(title="RBM reconstruction error", xlabel="epoch", ylabel="MSE")
    axes[1].imshow(np.asarray(data[0]).reshape(28, 28), cmap="gray")
    axes[1].set(title="input sample")
    axes[2].imshow(np.asarray(rbm.reconstruct(data[:1]))[0].reshape(28, 28), cmap="gray")
    axes[2].set(title="1-step reconstruction")
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "rbm_mnist.png"), dpi=100)

    # daydream: prolonged-Gibbs samples from the trained RBM (the classic
    # tutorial figure)
    dreams = np.asarray(rbm.sample(n_samples=16, n_gibbs=1000, seed=7))
    fig, axes = plt.subplots(2, 8, figsize=(12, 3))
    for i, ax in enumerate(axes.ravel()):
        ax.imshow(dreams[i].reshape(28, 28), cmap="gray")
        ax.axis("off")
    fig.suptitle("RBM daydream samples (1000 Gibbs steps)")
    fig.savefig(os.path.join(args.outdir, "rbm_daydream.png"), dpi=100)

    # receptive fields of the first 25 hidden units
    W = rbm.params_numpy()["W"]
    fig, axes = plt.subplots(5, 5, figsize=(8, 8))
    for i, ax in enumerate(axes.ravel()):
        ax.imshow(W[:, i].reshape(28, 28), cmap="RdBu")
        ax.axis("off")
    fig.suptitle("RBM filters (first 25 hidden units)")
    fig.savefig(os.path.join(args.outdir, "rbm_filters.png"), dpi=100)

    # AIS log-likelihood of the trained RBM (partition function estimate)
    from mdbn_tpu.analysis.ais import log_likelihood
    ll = log_likelihood(rbm.params, rbm.cfg, data[:500], n_chains=128, n_betas=500)
    print(f"    AIS: log Z = {ll['log_z']:.1f}, mean test log-likelihood = "
          f"{ll['mean_log_likelihood']:.1f} nats")

    # ---- 2. 3-modality MDBN on TCGA-like multi-omics -----------------------
    print("[2/6] 3-modality MDBN on TCGA-like data ...")
    mods, labels = tcga_like(n_patients=400, n_clusters=3, seed=1)
    towers = {
        "ge": DBNConfig(layer_sizes=[400, 100], visible="gaussian",
                        gaussian_lr=0.005, epochs=args.epochs, batch_size=20, seed=1),
        "meth": DBNConfig(layer_sizes=[400, 100], visible="gaussian",
                          gaussian_lr=0.005, epochs=args.epochs, batch_size=20, seed=2),
        "mirna": DBNConfig(layer_sizes=[100, 50], visible="gaussian",
                           gaussian_lr=0.005, epochs=args.epochs, batch_size=20, seed=3),
    }
    mdbn = MDBN(MDBNConfig(
        towers=towers,
        joint=RBMConfig(n_visible=1, n_hidden=100, lr=0.05, epochs=args.epochs,
                        batch_size=20, seed=0)))
    mdbn.train(mods)

    fig, ax = plt.subplots(figsize=(7, 4))
    for name, hist in mdbn.history.items():
        if isinstance(hist[0], list):
            ax.plot(hist[-1], label=f"{name} (top layer)")
        else:
            ax.plot(hist, label=name)
    ax.set(title="MDBN training", xlabel="epoch", ylabel="reconstruction error")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "mdbn_training.png"), dpi=100)

    # ---- 3. Latent extraction + k-means patient clustering -----------------
    print("[3/6] joint latent codes -> on-device k-means ...")
    codes = extract_latent(mdbn, mods)
    pred, _ = kmeans_cluster_jax(codes, 3, seed=0)
    ari = adjusted_rand_index(labels, pred)
    print(f"    ARI vs planted clusters: {ari:.3f}")

    # 2-D PCA view of the joint codes, colored by predicted cluster
    codes_c = codes - codes.mean(0)
    _, _, vt = np.linalg.svd(codes_c, full_matrices=False)
    xy = codes_c @ vt[:2].T
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    for ax, col, title in ((axes[0], pred, "k-means clusters"),
                           (axes[1], labels, "planted (true) groups")):
        ax.scatter(xy[:, 0], xy[:, 1], c=col, cmap="tab10", s=12)
        ax.set(title=f"joint latent codes — {title}")
    fig.suptitle(f"patient stratification, ARI={ari:.3f}")
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "clusters.png"), dpi=100)

    # survival evaluation of the discovered clusters (paper pipeline, L4)
    from mdbn_tpu.analysis.survival import kaplan_meier, logrank_test, synthetic_survival
    times, events = synthetic_survival(labels, seed=0)
    lr_res = logrank_test(times, events, pred)
    print(f"    log-rank across clusters: chi2={lr_res['chi2']:.1f} "
          f"p={lr_res['p_value']:.2e}")
    fig, ax = plt.subplots(figsize=(7, 4))
    for g in np.unique(pred):
        t, s_km = kaplan_meier(times[pred == g], events[pred == g])
        ax.step(np.concatenate([[0], t]), np.concatenate([[1.0], s_km]),
                where="post", label=f"cluster {g}")
    ax.set(title=f"Kaplan-Meier by discovered cluster (log-rank p={lr_res['p_value']:.1e})",
           xlabel="time", ylabel="survival")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "survival.png"), dpi=100)

    # ---- 4. deep-autoencoder fine-tuning (Hinton & Salakhutdinov 2006) ------
    print("[4/6] deep-autoencoder fine-tuning of a DBN ...")
    dbn = DBN(DBNConfig(layer_sizes=[128, 32], epochs=max(3, args.epochs // 3),
                        batch_size=20, seed=0)).train(data)
    before = np.asarray(dbn.reconstruct(data[:8]))
    mse_before = float(np.mean((np.asarray(data) - np.asarray(dbn.reconstruct(data))) ** 2))
    ae_hist = dbn.finetune_autoencoder(data, epochs=20, lr=1e-3)
    after = np.asarray(dbn.reconstruct(data[:8]))
    mse_after = float(np.mean((np.asarray(data) - np.asarray(dbn.reconstruct(data))) ** 2))
    print(f"    recon MSE {mse_before:.4f} -> {mse_after:.4f} "
          f"(AE loss {ae_hist[0]:.1f} -> {ae_hist[-1]:.1f})")
    fig, axes = plt.subplots(3, 8, figsize=(12, 4.5))
    for i in range(8):
        axes[0, i].imshow(np.asarray(data[i]).reshape(28, 28), cmap="gray")
        axes[1, i].imshow(before[i].reshape(28, 28), cmap="gray")
        axes[2, i].imshow(after[i].reshape(28, 28), cmap="gray")
        for r in range(3):
            axes[r, i].axis("off")
    axes[0, 0].set_title("data", loc="left")
    axes[1, 0].set_title(f"pretrained decode (MSE {mse_before:.3f})", loc="left")
    axes[2, 0].set_title(f"AE fine-tuned (MSE {mse_after:.3f})", loc="left")
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "autoencoder.png"), dpi=100)

    # ---- 5. the COMPLETE 2006 network: label top + labeled up-down ----------
    print("[5/6] associative label top + labeled up-down (the complete 2006 "
          "algorithm) ...")
    data_l, digits = mnist_like(2000, seed=2, return_labels=True)
    gdbn = DBN(DBNConfig(layer_sizes=[128, 32], epochs=max(3, args.epochs // 3),
                         batch_size=20, seed=0)).train(data_l)
    lt_hist = gdbn.fit_label_top(data_l, digits, n_classes=10, n_hidden=64,
                                 epochs=15, lr=0.1)
    acc0 = float(np.mean(np.asarray(gdbn.predict_generative(data_l))
                         == np.asarray(digits)))
    # labeled up-down: wake clamps the true digit at the label top, sleep
    # dreams code AND label, every stack layer unties
    ud_hist = gdbn.finetune_updown_labeled(data_l, digits, epochs=10, lr=0.005)
    acc = float(np.mean(np.asarray(gdbn.predict_generative(data_l))
                        == np.asarray(digits)))
    print(f"    labeled up-down wake mse {ud_hist[0]:.4f} -> {ud_hist[-1]:.4f}")
    print(f"    free-energy classifier train acc: {acc0:.3f} -> {acc:.3f}")
    fig, axes = plt.subplots(4, 10, figsize=(13, 5.5))
    for y in range(10):
        dreams_y = np.asarray(gdbn.generate_class(y, n_samples=3,
                                                  n_gibbs=300, seed=y))
        proto = np.asarray(data_l)[np.asarray(digits) == y]
        axes[0, y].imshow(proto[0].reshape(28, 28), cmap="gray")
        axes[0, y].set_title(f"class {y}", fontsize=8)
        for r in range(3):
            axes[r + 1, y].imshow(dreams_y[r].reshape(28, 28), cmap="gray")
        for r in range(4):
            axes[r, y].axis("off")
    fig.suptitle("class-conditional dreams after labeled up-down: clamp one "
                 "label unit, Gibbs the associative top, down-pass the "
                 "untied generative weights (row 1 = a real sample)")
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "class_dreams.png"), dpi=100)

    # ---- 6. consensus clustering (Monti 2003) of the MDBN cohort ------------
    print("[6/6] consensus clustering of the joint codes ...")
    from mdbn_tpu.analysis.consensus import select_n_clusters_consensus

    best_k, pac, cons_pred = select_n_clusters_consensus(
        codes, k_min=2, k_max=6, n_resamples=80)
    cons_ari = adjusted_rand_index(labels, cons_pred)
    print(f"    PAC-selected k={best_k} "
          f"(PAC: { {k: round(v, 3) for k, v in pac.items()} }), "
          f"ARI={cons_ari:.3f}")
    from mdbn_tpu.analysis.consensus import consensus_matrix

    M = consensus_matrix(codes, best_k, n_resamples=80)
    order = np.argsort(cons_pred)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2))
    im = axes[0].imshow(M[order][:, order], cmap="viridis", vmin=0, vmax=1)
    axes[0].set(title=f"consensus matrix (patients ordered by cluster), "
                      f"k={best_k}")
    fig.colorbar(im, ax=axes[0], fraction=0.046)
    axes[1].plot(list(pac), [pac[k] for k in pac], "o-")
    axes[1].set(title="PAC by k (lower = more stable)", xlabel="k",
                ylabel="PAC")
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "consensus.png"), dpi=100)

    print(f"figures saved to {args.outdir}/")


if __name__ == "__main__":
    main()
