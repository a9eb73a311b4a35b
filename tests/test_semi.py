"""Semi-supervised (partial-label) training of the labeled 2006 models.

Rows labeled ``-1`` are UNLABELED: their positive-phase / wake label block
is drawn from the EXACT posterior p(y | code) under the current associative
top (stochastic-EM CD on the marginal). Validation strategy:

- the posterior-fill primitive is pinned to the exact class posterior
  (label_top_logits softmax) distributionally, and must pass labeled rows
  through untouched;
- semi-supervised fit_label_top with scarce labels must classify the
  UNLABELED rows well — and at least as well as a model trained on the
  labeled subset alone (the unlabeled codes are the information gain);
- semi-supervised labeled up-down is held to ground truth on an enumerable
  model: the exact MARGINAL log p(v) (labels summed out) must improve;
- the CLI "label_fraction" knob hides a seeded fraction of labels and
  reports accuracy on the hidden rows end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdbn_tpu.config import DBNConfig, RBMConfig
from mdbn_tpu.core.rbm_math import RBMParams
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.train.labeled import (
    _class_logits,
    _posterior_label_fill,
    _validate_partial_labels,
    fit_label_top,
    label_top_logits,
    predict_label_top,
)


def _block_data(key, n, V, n_classes=3, flip=0.08):
    """Separable binary data: class k activates feature block k."""
    kl, kf = jax.random.split(key)
    labels = jax.random.randint(kl, (n,), 0, n_classes)
    block = V // n_classes
    base = jnp.zeros((n, V))
    for k in range(n_classes):
        mask = (labels == k)[:, None] & (jnp.arange(V) // block == k)[None, :]
        base = jnp.where(mask, 1.0, base)
    noise = jax.random.uniform(kf, (n, V)) < flip
    return (jnp.where(noise, 1.0 - base, base).astype(jnp.float32),
            np.asarray(labels))


def _rand_top(key, n_code, n_classes, H):
    kw, kb, kc = jax.random.split(key, 3)
    return RBMParams(
        W=0.7 * jax.random.normal(kw, (n_code + n_classes, H), jnp.float32),
        b=0.4 * jax.random.normal(kb, (n_code + n_classes,), jnp.float32),
        c=0.2 * jax.random.normal(kc, (H,), jnp.float32),
    )


def test_class_logits_softmax_is_exact_posterior():
    """_class_logits drops only class-INDEPENDENT energy terms: its softmax
    must equal the softmax of the full label_top_logits."""
    key = jax.random.PRNGKey(0)
    params = _rand_top(key, 6, 3, 5)
    codes = (jax.random.uniform(jax.random.PRNGKey(1), (9, 6)) < 0.5
             ).astype(jnp.float32)
    short = jax.nn.softmax(_class_logits(params, codes, 6), axis=1)
    full = jax.nn.softmax(label_top_logits(params, [], codes, 3), axis=1)
    np.testing.assert_allclose(np.asarray(short), np.asarray(full), rtol=2e-5)


def test_posterior_fill_keeps_labeled_and_samples_posterior():
    key = jax.random.PRNGKey(2)
    params = _rand_top(key, 4, 3, 5)
    codes = (jax.random.uniform(jax.random.PRNGKey(3), (2, 4)) < 0.5
             ).astype(jnp.float32)
    onehot = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    mask = jnp.asarray([1.0, 0.0])  # row 0 labeled, row 1 not

    draws = jax.vmap(lambda k: _posterior_label_fill(
        k, params, codes, onehot, mask, 4))(
        jax.random.split(jax.random.PRNGKey(4), 3000))
    d = np.asarray(draws)  # [R, 2, 3]
    # labeled row: clamped truth in every draw
    assert np.all(d[:, 0] == np.asarray(onehot[0]))
    # unlabeled row: frequency matches the exact posterior
    want = np.asarray(jax.nn.softmax(_class_logits(params, codes, 4),
                                     axis=1))[1]
    np.testing.assert_allclose(d[:, 1].mean(axis=0), want, atol=0.03)
    assert np.all(d.sum(axis=2) == 1.0)  # label block stays one-hot


def test_validate_partial_labels():
    lab, semi = _validate_partial_labels(np.array([0, 1, 2]), 3)
    assert not semi
    lab, semi = _validate_partial_labels(np.array([0, -1, 2]), 3)
    assert semi
    with pytest.raises(ValueError, match="out of range"):
        _validate_partial_labels(np.array([0, -2]), 3)
    with pytest.raises(ValueError, match="out of range"):
        _validate_partial_labels(np.array([0, 3]), 3)
    with pytest.raises(ValueError, match="at least one labeled"):
        _validate_partial_labels(np.array([-1, -1]), 3)
    with pytest.raises(ValueError, match="1-D"):
        _validate_partial_labels(np.array([[0, 1]]), 3)


def test_semi_label_top_beats_labeled_subset_alone():
    """30/300 labels: the semi-supervised top must classify the UNLABELED
    rows well, and no worse than a top trained on the labeled subset only
    (the 270 unlabeled codes are what it additionally learned from)."""
    data, labels = _block_data(jax.random.PRNGKey(5), 300, 12, flip=0.1)
    rng = np.random.default_rng(0)
    keep = rng.random(300) < 0.1
    semi_labels = np.where(keep, labels, -1)
    assert 15 <= keep.sum() <= 45

    top_semi, hist = fit_label_top([], data, semi_labels, 3, n_hidden=16,
                                   epochs=25, lr=0.2, seed=0)
    top_sub, _ = fit_label_top([], data[keep], labels[keep], 3, n_hidden=16,
                               epochs=25, lr=0.2, batch_size=10, seed=0)
    assert all(np.isfinite(hist))
    hid = ~keep
    acc_semi = float((np.asarray(predict_label_top(top_semi, [], data, 3))
                      [hid] == labels[hid]).mean())
    acc_sub = float((np.asarray(predict_label_top(top_sub, [], data, 3))
                     [hid] == labels[hid]).mean())
    assert acc_semi > 0.9, (acc_semi, acc_sub)
    assert acc_semi > acc_sub + 0.1, (acc_semi, acc_sub)


def test_semi_labeled_updown_improves_exact_marginal_ll():
    """Enumerable model, half the labels hidden: semi-supervised labeled
    up-down must improve the exact MARGINAL log p(v) — the objective its
    unlabeled rows actually train."""
    from mdbn_tpu.analysis.ais import exact_labeled_dbn_log_likelihood
    from mdbn_tpu.train.updown import finetune_updown_labeled

    key = jax.random.PRNGKey(21)
    data, labels = _block_data(key, 160, 6, n_classes=2)
    semi_labels = np.where(np.arange(160) % 2 == 0, labels, -1)
    cfg = DBNConfig(layer_sizes=[5, 4], epochs=15, lr=0.2, batch_size=20)
    dbn = DBN(cfg).train(data)
    layers = [(r.params, r.cfg) for r in dbn.layers]
    top, _ = fit_label_top(layers, data, semi_labels, 2, n_hidden=6,
                           epochs=20, lr=0.2)
    ll0 = exact_labeled_dbn_log_likelihood(layers, top, data, None, 2)

    rec, gen, top2, hist = finetune_updown_labeled(
        layers, top, data, semi_labels, 2, epochs=30, lr=0.05, batch_size=20)
    tuned = [(p, c) for p, (_, c) in zip(rec, layers)]
    ll1 = exact_labeled_dbn_log_likelihood(tuned, top2, data, None, 2,
                                           gen=gen)
    assert all(np.isfinite(hist))
    assert ll1 > ll0, (ll0, ll1)


def test_dbn_method_accepts_partial_labels():
    data, labels = _block_data(jax.random.PRNGKey(7), 300, 12)
    semi_labels = np.where(np.arange(300) % 3 == 0, labels, -1)
    dbn = DBN(DBNConfig(layer_sizes=[10, 6], epochs=30, lr=0.3,
                        batch_size=20)).train(data)
    dbn.fit_label_top(data, semi_labels, 3, n_hidden=16, epochs=25, lr=0.2)
    hist = dbn.finetune_updown_labeled(data, semi_labels, epochs=5, lr=0.02)
    assert len(hist) == 5 and all(np.isfinite(hist))
    pred = np.asarray(dbn.predict_generative(data))
    hid = np.arange(300) % 3 != 0
    assert float((pred[hid] == labels[hid]).mean()) > 0.9


def test_mdbn_semi_labeled_updown_runs_and_classifies():
    from mdbn_tpu.config import MDBNConfig
    from mdbn_tpu.models.mdbn import MDBN

    key = jax.random.PRNGKey(8)
    da, labels = _block_data(key, 300, 9)
    # second modality: same key -> same planted classes, its own widths
    db, labels_b = _block_data(key, 300, 6)
    assert (labels == labels_b).all()
    mods = {"a": da, "b": db}
    semi_labels = np.where(np.arange(300) % 3 == 0, labels, -1)
    cfg = MDBNConfig(
        towers={"a": DBNConfig(layer_sizes=[8, 5], epochs=30, lr=0.3,
                               batch_size=20),
                "b": DBNConfig(layer_sizes=[5], epochs=30, lr=0.3,
                               batch_size=20)},
        joint=RBMConfig(n_visible=1, n_hidden=8, epochs=30, lr=0.3,
                        batch_size=20))
    mdbn = MDBN(cfg).train(mods)
    mdbn.fit_label_top(mods, semi_labels, 3, n_hidden=16, epochs=25, lr=0.2)
    hist = mdbn.finetune_updown_labeled(mods, semi_labels, epochs=5, lr=0.02)
    assert len(hist) == 5 and all(np.isfinite(hist))
    pred = np.asarray(mdbn.predict_generative(mods))
    hid = np.arange(300) % 3 != 0
    assert float((pred[hid] == labels[hid]).mean()) > 0.9


def test_semi_phases_dp_mesh_match_single_device():
    """Semi-supervised label top + labeled up-down with mesh= reproduce the
    single-device run exactly — the labeled-row mask shards with the batch
    and the posterior fill sees identical per-row keys either way."""
    import jax as _jax

    from mdbn_tpu.parallel.mesh import make_mesh
    from mdbn_tpu.train.updown import finetune_updown_labeled

    if _jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    data, labels = _block_data(jax.random.PRNGKey(5), 160, 12, flip=0.1)
    semi_labels = np.where(np.arange(160) % 4 == 0, labels, -1)
    cfg = DBNConfig(layer_sizes=[8, 6], epochs=4, lr=0.2, batch_size=16,
                    engine="xla", seed=0)
    mesh = make_mesh(8)
    results = {}
    for m in (None, mesh):
        dbn = DBN(cfg).train(data)
        layers = [(r.params, r.cfg) for r in dbn.layers]
        top, h_top = fit_label_top(layers, data, semi_labels, 3, n_hidden=8,
                                   epochs=3, lr=0.2, batch_size=16, mesh=m)
        rec, gen, top2, h_ud = finetune_updown_labeled(
            layers, top, data, semi_labels, 3, epochs=3, lr=0.02,
            batch_size=16, mesh=m)
        results[m is None] = (h_top, h_ud, np.asarray(top2.W),
                              np.asarray(rec[0].W), np.asarray(gen[0][0]))
    single, meshed = results[True], results[False]
    for a, b in zip(single, meshed):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_cli_label_fraction_semi_supervised(tmp_path):
    """CLI end-to-end: hide 80% of the planted labels, train the label top
    semi-supervised, report accuracy on the hidden rows."""
    import json

    from mdbn_tpu.config import save_config
    from mdbn_tpu.run import main

    save_config({
        "model": DBNConfig(layer_sizes=[32, 16], epochs=8, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 300, "n_prototypes": 3,
                 "seed": 3},
        "finetune": {"mode": "label_top", "label_fraction": 0.2,
                     "epochs": 30, "n_hidden": 32, "lr": 0.2},
        "analysis": {},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    ft = [r for r in recs if r["kind"] == "finetune"]
    assert ft and ft[0]["mode"] == "label_top"
    assert "accuracy_unlabeled" in ft[0]
    assert ft[0]["accuracy_unlabeled"] > 0.8, ft[0]
    assert ft[0]["train_accuracy"] > 0.8, ft[0]


def test_cli_label_fraction_one_no_nan_in_metrics(tmp_path):
    """label_fraction=1.0 is allowed but hides zero rows: the metrics record
    must simply omit accuracy_unlabeled, never write NaN (which would break
    strict-JSON consumers of the metrics file)."""
    import json

    from mdbn_tpu.config import save_config
    from mdbn_tpu.run import main

    save_config({
        "model": DBNConfig(layer_sizes=[16], epochs=2, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 100, "n_prototypes": 3,
                 "seed": 3},
        "finetune": {"mode": "label_top", "label_fraction": 1.0,
                     "epochs": 3, "n_hidden": 16, "lr": 0.2},
        "analysis": {},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    # strict JSON parse of every line (json.loads would accept NaN)
    recs = [json.loads(l, parse_constant=lambda s: (_ for _ in ()).throw(
        ValueError(f"non-strict JSON constant {s}")))
        for l in open(tmp_path / "m.jsonl")]
    ft = [r for r in recs if r["kind"] == "finetune"][0]
    assert "accuracy_unlabeled" not in ft
    assert np.isfinite(ft["train_accuracy"])


def test_cli_label_fraction_validation(tmp_path):
    from mdbn_tpu.config import save_config
    from mdbn_tpu.run import main

    save_config({
        "model": DBNConfig(layer_sizes=[16], epochs=2, batch_size=20,
                           engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 100, "n_prototypes": 3,
                 "seed": 3},
        "finetune": {"mode": "autoencoder", "label_fraction": 0.2,
                     "epochs": 2},
    }, str(tmp_path / "exp.json"))
    with pytest.raises(ValueError, match="applies to the generative"):
        main(["--config", str(tmp_path / "exp.json")])
