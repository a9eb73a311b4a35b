"""Checkpoint/resume + config round-trip + CLI smoke tests (SURVEY.md §5)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mdbn_tpu.checkpoint import LayerCheckpointer, restore_state, save_state
from mdbn_tpu.config import (DBNConfig, MDBNConfig, RBMConfig, load_config,
                             save_config)
from mdbn_tpu.core.state import init_train_state
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.train.trainer import train_rbm


def test_state_roundtrip(tmp_path):
    cfg = RBMConfig(n_visible=32, n_hidden=16, persistent=True, momentum=0.5,
                    epochs=2, batch_size=8, engine="xla")
    data = mnist_like(64, n_features=32, seed=0)
    state, _ = train_rbm(data, cfg)
    path = str(tmp_path / "ckpt")
    save_state(state, path)
    restored = restore_state(path)
    np.testing.assert_array_equal(np.asarray(restored.params.W), np.asarray(state.params.W))
    np.testing.assert_array_equal(np.asarray(restored.velocity.W), np.asarray(state.velocity.W))
    np.testing.assert_array_equal(np.asarray(restored.chain_h), np.asarray(state.chain_h))
    np.testing.assert_array_equal(np.asarray(restored.key), np.asarray(state.key))
    assert int(restored.epoch) == int(state.epoch)


def test_resume_continues_identically(tmp_path):
    """train(4 epochs) == train(2) -> checkpoint -> restore -> train(2)."""
    cfg = RBMConfig(n_visible=32, n_hidden=16, epochs=2, batch_size=8, engine="xla")
    data = mnist_like(64, n_features=32, seed=0)

    s_full, _ = train_rbm(data, cfg.replace(epochs=4))

    s_half, _ = train_rbm(data, cfg)
    path = str(tmp_path / "ckpt")
    save_state(s_half, path)
    s_resumed, _ = train_rbm(data, cfg, state=restore_state(path))

    np.testing.assert_allclose(np.asarray(s_resumed.params.W), np.asarray(s_full.params.W),
                               rtol=1e-5, atol=1e-6)


def test_layer_checkpointer(tmp_path):
    cfg = RBMConfig(n_visible=32, n_hidden=16, epochs=1, batch_size=8, engine="xla")
    state = init_train_state(cfg)
    ck = LayerCheckpointer(str(tmp_path / "dbn"))
    assert ck.completed() == []
    ck.save_layer("layer0", state, cfg)
    assert ck.has_layer("layer0")
    restored, rcfg = ck.load_layer("layer0")
    assert rcfg == cfg
    np.testing.assert_array_equal(np.asarray(restored.params.W), np.asarray(state.params.W))


def test_config_json_roundtrip(tmp_path):
    cfg = MDBNConfig(
        towers={"ge": DBNConfig(layer_sizes=[8, 4], visible="gaussian", epochs=1)},
        joint=RBMConfig(n_visible=4, n_hidden=2),
    )
    p = str(tmp_path / "cfg.json")
    save_config(cfg, p)
    loaded = load_config(p)
    assert loaded == cfg


def test_graded_configs_load():
    here = os.path.join(os.path.dirname(__file__), "..", "configs")
    names = sorted(os.listdir(here))
    graded = ["c1_bernoulli_rbm_mnist.json", "c2_gaussian_rbm_ge.json",
              "c3_dbn_3layer.json", "c4_mdbn_3modality.json",
              "c5_pcd_kmeans.json"]
    assert set(graded) <= set(names)
    for n in names:
        exp = load_config(os.path.join(here, n))
        assert "model" in exp and "data" in exp


def test_cli_rbm(tmp_path):
    from mdbn_tpu.run import main

    save_config({
        "model": RBMConfig(n_visible=784, n_hidden=16, epochs=2, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 100, "seed": 2},
    }, str(tmp_path / "exp.json"))
    metrics = str(tmp_path / "m.jsonl")
    assert main(["--config", str(tmp_path / "exp.json"), "--metrics", metrics]) == 0
    records = [json.loads(l) for l in open(metrics)]
    assert len(records) == 2
    assert records[-1]["recon_error"] < records[0]["recon_error"]


def test_cli_mdbn_kmeans(tmp_path):
    from mdbn_tpu.run import main

    save_config({
        "model": MDBNConfig(
            towers={m: DBNConfig(layer_sizes=[16, 8], visible="gaussian",
                                 epochs=2, batch_size=10, engine="xla", seed=i)
                    for i, m in enumerate(["ge", "meth", "mirna"])},
            joint=RBMConfig(n_visible=1, n_hidden=8, epochs=2, batch_size=10,
                            engine="xla"),
        ),
        "data": {"kind": "tcga_like", "n_patients": 80, "n_clusters": 3,
                 "dims": {"ge": 40, "meth": 30, "mirna": 20}, "seed": 1,
                 "signal": 3.0},
        "analysis": {"kmeans": 3},
    }, str(tmp_path / "exp.json"))
    metrics = str(tmp_path / "m.jsonl")
    assert main(["--config", str(tmp_path / "exp.json"), "--metrics", metrics]) == 0
    records = [json.loads(l) for l in open(metrics)]
    km = [r for r in records if r["kind"] == "kmeans"]
    assert km and km[0]["ari_vs_planted"] > 0.5


def test_periodic_epoch_checkpoints(tmp_path):
    from mdbn_tpu.config import TrainRuntimeConfig

    cfg = RBMConfig(n_visible=32, n_hidden=8, epochs=4, batch_size=8, engine="xla")
    data = mnist_like(64, n_features=32, seed=0)
    runtime = TrainRuntimeConfig(checkpoint_dir=str(tmp_path / "ck"),
                                 checkpoint_every_epochs=2)
    state, _ = train_rbm(data, cfg, runtime=runtime)
    assert (tmp_path / "ck" / "epoch00002").exists()
    assert (tmp_path / "ck" / "epoch00004").exists()
    restored = restore_state(str(tmp_path / "ck" / "epoch00004"))
    np.testing.assert_array_equal(np.asarray(restored.params.W), np.asarray(state.params.W))


def test_mdbn_save_load(tmp_path):
    from mdbn_tpu.data.synthetic import tcga_like
    from mdbn_tpu.models.mdbn import MDBN

    mods, _ = tcga_like(n_patients=64, dims={"ge": 20, "meth": 12, "mirna": 8}, seed=0)
    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[8, 4], visible="gaussian", epochs=1,
                             batch_size=8, engine="xla", seed=i)
                for i, m in enumerate(mods)},
        joint=RBMConfig(n_visible=1, n_hidden=4, epochs=1, batch_size=8, engine="xla"),
    )
    mdbn = MDBN(cfg).train(mods)
    codes = np.asarray(mdbn.transform(mods))
    mdbn.save(str(tmp_path / "model"))
    loaded = MDBN.load(str(tmp_path / "model"))
    codes2 = np.asarray(loaded.transform(mods))
    np.testing.assert_allclose(codes2, codes, rtol=1e-6, atol=1e-7)


def test_dbn_resume_skips_completed_layers(tmp_path):
    from mdbn_tpu.checkpoint import LayerCheckpointer
    from mdbn_tpu.models.dbn import DBN

    data = mnist_like(64, n_features=32, seed=0)
    cfg = DBNConfig(layer_sizes=[16, 8], visible="bernoulli", epochs=2,
                    batch_size=8, engine="xla", seed=0)
    ck = LayerCheckpointer(str(tmp_path / "dbn"))
    d1 = DBN(cfg).train(data, checkpointer=ck)
    assert ck.completed() == ["layer0", "layer1"]
    w0 = np.asarray(d1.layers[0].params.W)

    # re-train with the checkpointer: must restore, not retrain
    calls = []
    d2 = DBN(cfg).train(data, checkpointer=ck,
                        layer_callback=lambda l, r: calls.append(r.metrics))
    assert all(m is None for m in calls)  # no training happened
    np.testing.assert_array_equal(np.asarray(d2.layers[0].params.W), w0)
    np.testing.assert_allclose(np.asarray(d2.transform(data)),
                               np.asarray(d1.transform(data)), rtol=1e-6)


def test_mdbn_resume(tmp_path):
    from mdbn_tpu.data.synthetic import tcga_like
    from mdbn_tpu.models.mdbn import MDBN

    mods, _ = tcga_like(n_patients=48, dims={"ge": 16, "meth": 8, "mirna": 8}, seed=0)
    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[8, 4], visible="gaussian", epochs=1,
                             batch_size=8, engine="xla", seed=i)
                for i, m in enumerate(mods)},
        joint=RBMConfig(n_visible=1, n_hidden=4, epochs=1, batch_size=8, engine="xla"),
    )
    ckdir = str(tmp_path / "mdbn_ck")
    m1 = MDBN(cfg).train(mods, checkpoint_dir=ckdir)
    codes1 = np.asarray(m1.transform(mods))
    m2 = MDBN(cfg).train(mods, checkpoint_dir=ckdir)  # resumes everything
    np.testing.assert_allclose(np.asarray(m2.transform(mods)), codes1, rtol=1e-6)


def test_dbn_stale_checkpoint_rejected(tmp_path):
    from mdbn_tpu.checkpoint import LayerCheckpointer
    from mdbn_tpu.models.dbn import DBN

    data = mnist_like(64, n_features=32, seed=0)
    ck = LayerCheckpointer(str(tmp_path / "dbn"))
    DBN(DBNConfig(layer_sizes=[16, 8], epochs=1, batch_size=8, engine="xla",
                  seed=0)).train(data, checkpointer=ck)
    # changed layer width -> restoring must fail loudly, not silently diverge
    with pytest.raises(ValueError, match="different config"):
        DBN(DBNConfig(layer_sizes=[12, 8], epochs=1, batch_size=8, engine="xla",
                      seed=0)).train(data, checkpointer=ck)


def test_cli_dbn_resume(tmp_path):
    """Kill-and-rerun via the CLI: second run restores instead of retraining."""
    from mdbn_tpu.run import main

    save_config({
        "model": DBNConfig(layer_sizes=[16, 8], epochs=2, batch_size=8,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 64, "n_features": 64, "seed": 1},
    }, str(tmp_path / "exp.json"))
    ck = str(tmp_path / "ck")
    m1 = str(tmp_path / "m1.jsonl")
    m2 = str(tmp_path / "m2.jsonl")
    assert main(["--config", str(tmp_path / "exp.json"), "--checkpoint-dir", ck,
                 "--metrics", m1]) == 0
    assert main(["--config", str(tmp_path / "exp.json"), "--checkpoint-dir", ck,
                 "--metrics", m2]) == 0
    layers_run2 = [json.loads(l) for l in open(m2) if json.loads(l)["kind"] == "layer"]
    assert layers_run2 == []  # everything restored; no layer was retrained


def test_cli_save_load_transform(tmp_path):
    """Serving path: train + --save, then --load + --transform-out emits the
    cohort's latent codes without retraining."""
    from mdbn_tpu.run import main

    cfg_path = str(tmp_path / "exp.json")
    save_config({
        "model": RBMConfig(n_visible=64, n_hidden=8, epochs=2, batch_size=10,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 40, "n_features": 64,
                 "seed": 2},
    }, cfg_path)
    mdir = str(tmp_path / "model")
    assert main(["--config", cfg_path, "--save", mdir]) == 0

    out = str(tmp_path / "codes.npy")
    assert main(["--config", cfg_path, "--load", mdir,
                 "--transform-out", out]) == 0
    codes = np.load(out)
    assert codes.shape == (40, 8)
    assert np.all((codes >= 0) & (codes <= 1))

    # csv flavor
    out_csv = str(tmp_path / "codes.csv")
    assert main(["--config", cfg_path, "--load", mdir,
                 "--transform-out", out_csv]) == 0
    np.testing.assert_allclose(np.loadtxt(out_csv, delimiter=","), codes,
                               rtol=1e-5, atol=1e-6)


def test_cli_auto_k_and_inference_analysis(tmp_path):
    """'kmeans': 'auto' picks k by silhouette; --load + analysis clusters a
    cohort with a saved model (no retraining)."""
    from mdbn_tpu.run import main

    cfg_path = str(tmp_path / "exp.json")
    save_config({
        "model": MDBNConfig(
            towers={m: DBNConfig(layer_sizes=[16, 8], visible="gaussian",
                                 epochs=2, batch_size=10, engine="xla", seed=i)
                    for i, m in enumerate(["ge", "meth", "mirna"])},
            joint=RBMConfig(n_visible=1, n_hidden=8, epochs=2, batch_size=10,
                            engine="xla"),
        ),
        "data": {"kind": "tcga_like", "n_patients": 80, "n_clusters": 3,
                 "dims": {"ge": 40, "meth": 30, "mirna": 20}, "seed": 1,
                 "signal": 3.0},
        "analysis": {"kmeans": "auto", "k_min": 2, "k_max": 5},
    }, cfg_path)
    metrics = str(tmp_path / "m.jsonl")
    mdir = str(tmp_path / "model")
    assert main(["--config", cfg_path, "--metrics", metrics,
                 "--save", mdir]) == 0
    recs = [json.loads(l) for l in open(metrics)]
    km = [r for r in recs if r["kind"] == "kmeans"]
    assert km and 2 <= km[0]["k"] <= 5  # silhouette-selected within range
    assert km[0]["ari_vs_planted"] > 0.4
    assert set(km[0]["silhouette_scores"]) == {"2", "3", "4", "5"}

    # inference mode: saved model + analysis block, no training
    m2 = str(tmp_path / "m2.jsonl")
    assert main(["--config", cfg_path, "--load", mdir, "--metrics", m2]) == 0
    recs2 = [json.loads(l) for l in open(m2)]
    km2 = [r for r in recs2 if r["kind"] == "kmeans"]
    # same codes from the restored model -> same selected k and clustering
    assert km2 and km2[0]["k"] == km[0]["k"]
    assert km2[0]["cluster_sizes"] == km[0]["cluster_sizes"]
    assert not [r for r in recs2 if r["kind"] == "tower"]  # no training ran


def test_free_energy_gap():
    from mdbn_tpu.models.rbm import RBM

    data = mnist_like(120, seed=2)
    rbm = RBM(RBMConfig(n_visible=784, n_hidden=16, epochs=3, batch_size=20,
                        engine="xla", seed=0)).train(data[:100])
    gap_valid = rbm.free_energy_gap(data[:100], data[100:])
    assert np.isfinite(gap_valid)
    # random noise must have much higher free energy than training data
    noise = (np.random.default_rng(0).random((20, 784)) < 0.5).astype(np.float32)
    assert rbm.free_energy_gap(data[:100], noise) > gap_valid


def test_cli_ais_evaluation(tmp_path):
    """'analysis': {'ais': true} evaluates the trained model's AIS
    log-likelihood (RBM) / variational bound (DBN) through the CLI."""
    from mdbn_tpu.run import main

    cfg_path = str(tmp_path / "exp.json")
    save_config({
        "model": RBMConfig(n_visible=36, n_hidden=8, epochs=2, batch_size=10,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 60, "n_features": 36,
                 "seed": 2},
        "analysis": {"ais": True, "ais_samples": 40},
    }, cfg_path)
    metrics = str(tmp_path / "m.jsonl")
    assert main(["--config", cfg_path, "--metrics", metrics]) == 0
    recs = [json.loads(l) for l in open(metrics)]
    ais = [r for r in recs if r["kind"] == "ais"]
    assert ais and ais[0]["n_rows"] == 40
    assert np.isfinite(ais[0]["mean_log_likelihood"])

    # bidirectional bracket: the same RBM config with 'ais_bracket' reports
    # the forward/reverse sandwich instead of the one-sided estimate
    save_config({
        "model": RBMConfig(n_visible=36, n_hidden=8, epochs=2, batch_size=10,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 60, "n_features": 36,
                 "seed": 2},
        "analysis": {"ais": True, "ais_bracket": True, "ais_samples": 40,
                     "ais_betas": 300, "ais_init_gibbs": 50},
    }, cfg_path)
    metrics_b = str(tmp_path / "mb.jsonl")
    assert main(["--config", cfg_path, "--metrics", metrics_b]) == 0
    recs = [json.loads(l) for l in open(metrics_b)]
    br = [r for r in recs if r["kind"] == "ais"]
    assert br and np.isfinite(br[0]["log_z_gap"])
    assert (br[0]["mean_log_likelihood_lower"]
            <= br[0]["mean_log_likelihood_upper"] + 0.2)

    save_config({
        "model": DBNConfig(layer_sizes=[12, 6], epochs=2, batch_size=10,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 60, "n_features": 36,
                 "seed": 2},
        "analysis": {"ais": True, "ais_samples": 30},
    }, cfg_path)
    metrics2 = str(tmp_path / "m2.jsonl")
    assert main(["--config", cfg_path, "--metrics", metrics2]) == 0
    recs = [json.loads(l) for l in open(metrics2)]
    bound = [r for r in recs if r["kind"] == "ais"]
    assert bound and np.isfinite(bound[0]["mean_log_likelihood_bound"])


def test_cli_impute_evaluation(tmp_path):
    """analysis 'impute' block: leave-one-modality-out imputation quality
    through the CLI (structure + finiteness; the quality assertion lives in
    test_sampling.py::test_mdbn_impute_missing_modality)."""
    from mdbn_tpu.run import main

    save_config({
        "model": MDBNConfig(
            towers={m: DBNConfig(layer_sizes=[12, 6], visible="gaussian",
                                 epochs=3, batch_size=10, engine="xla", seed=i)
                    for i, m in enumerate(["ge", "meth", "mirna"])},
            joint=RBMConfig(n_visible=1, n_hidden=6, epochs=3, batch_size=10,
                            engine="xla"),
        ),
        "data": {"kind": "tcga_like", "n_patients": 60, "n_clusters": 3,
                 "dims": {"ge": 24, "meth": 16, "mirna": 12}, "seed": 1,
                 "signal": 3.0},
        "analysis": {"impute": {"holdout": "meth", "n_gibbs": 40,
                                "n_chains": 4}},
    }, str(tmp_path / "exp.json"))
    metrics = str(tmp_path / "m.jsonl")
    assert main(["--config", str(tmp_path / "exp.json"), "--metrics", metrics]) == 0
    records = [json.loads(l) for l in open(metrics)]
    imp = [r for r in records if r["kind"] == "impute"]
    assert imp and imp[0]["holdout"] == "meth"
    assert np.isfinite(imp[0]["mse"]) and np.isfinite(imp[0]["ratio"])


def test_cli_mdbn_updown_labeled(tmp_path):
    """CLI-driven COMPLETE 2006 fine-tuning on an MDBN: 'updown_labeled'
    fits the label top over the joint codes when absent, unties every tower
    layer AND the joint layer, reports accuracy on the planted subtypes,
    and persists the untied joint weights through --save."""
    from mdbn_tpu.models.mdbn import MDBN
    from mdbn_tpu.run import main

    save_config({
        "model": MDBNConfig(
            # under-pretrained gaussian towers yield near-constant joint
            # codes (std ~1e-6) — k-means survives on the residual signal
            # but the free-energy classifier cannot, so this phase needs
            # converged pretraining (40 epochs, gaussian_lr)
            towers={m: DBNConfig(layer_sizes=[16, 8], visible="gaussian",
                                 epochs=40, lr=0.1, gaussian_lr=0.02,
                                 batch_size=10, engine="xla", seed=i)
                    for i, m in enumerate(["ge", "meth", "mirna"])},
            joint=RBMConfig(n_visible=1, n_hidden=8, epochs=40, lr=0.2,
                            batch_size=10, engine="xla"),
        ),
        "data": {"kind": "tcga_like", "n_patients": 80, "n_clusters": 3,
                 "dims": {"ge": 40, "meth": 30, "mirna": 20}, "seed": 1,
                 "signal": 3.0},
        "finetune": {"mode": "updown_labeled", "epochs": 3, "lr": 0.01,
                     "n_classes": 3, "n_hidden": 24,
                     "label_top_epochs": 30, "label_top_lr": 0.2,
                     "batch_size": 10},
    }, str(tmp_path / "exp.json"))
    metrics = str(tmp_path / "m.jsonl")
    assert main(["--config", str(tmp_path / "exp.json"), "--metrics", metrics,
                 "--save", str(tmp_path / "model")]) == 0
    records = [json.loads(l) for l in open(metrics)]
    ft = [r for r in records if r["kind"] == "finetune"]
    assert ft and ft[0]["mode"] == "updown_labeled"
    assert np.isfinite(ft[0]["wake_mse_last"])
    assert ft[0]["train_accuracy"] > 0.8
    loaded = MDBN.load(str(tmp_path / "model"))
    assert hasattr(loaded, "_joint_gen") and hasattr(loaded, "_label_top")
    assert all(hasattr(loaded.towers[m], "_gen") for m in loaded.cfg.towers)
