"""Associative label-top RBM (Hinton-Osindero-Teh 2006 §4).

Validation: the free-energy logits are pinned against the house
free_energy() on explicitly concatenated inputs (the classifier IS the
energy model — no separate math to trust), softmax label sampling is
checked distributionally against the exact conditional, and the classifier
must recover planted separable classes through a pretrained stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdbn_tpu.config import DBNConfig, RBMConfig
from mdbn_tpu.core.rbm_math import RBMParams, free_energy
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.train.labeled import (
    _softmax_sample,
    fit_label_top,
    generate_class_conditional,
    label_top_logits,
    predict_label_top,
)


def _labeled_data(key, n, V, n_classes=3, flip=0.08):
    """Separable binary data: class k activates feature block k."""
    kl, kf = jax.random.split(key)
    labels = jax.random.randint(kl, (n,), 0, n_classes)
    block = V // n_classes
    base = jnp.zeros((n, V))
    for k in range(n_classes):
        mask = (labels == k)[:, None] & (jnp.arange(V) // block == k)[None, :]
        base = jnp.where(mask, 1.0, base)
    noise = jax.random.uniform(kf, (n, V)) < flip
    return jnp.where(noise, 1.0 - base, base).astype(jnp.float32), labels


def test_logits_equal_concatenated_free_energy():
    """label_top_logits == -free_energy([codes ; e_y]) computed the long way."""
    key = jax.random.PRNGKey(0)
    kp, kc = jax.random.split(key)
    n_code, n_classes, H = 6, 3, 5
    params = RBMParams(
        W=0.5 * jax.random.normal(kp, (n_code + n_classes, H), jnp.float32),
        b=0.3 * jnp.arange(n_code + n_classes, dtype=jnp.float32),
        c=0.1 * jnp.arange(H, dtype=jnp.float32),
    )
    codes = (jax.random.uniform(kc, (7, n_code)) < 0.5).astype(jnp.float32)
    logits = label_top_logits(params, [], codes, n_classes)
    cfg = RBMConfig(n_visible=n_code + n_classes, n_hidden=H)
    for y in range(n_classes):
        v = jnp.concatenate(
            [codes, jnp.tile(jax.nn.one_hot(y, n_classes), (7, 1))], axis=1)
        np.testing.assert_allclose(np.asarray(logits[:, y]),
                                   -np.asarray(free_energy(params, v, cfg)),
                                   rtol=2e-5)


def test_softmax_sample_matches_distribution():
    logits = jnp.asarray([[2.0, 0.0, -1.0]])
    want = np.asarray(jax.nn.softmax(logits, axis=1))[0]
    draws = jax.vmap(lambda k: _softmax_sample(k, logits))(
        jax.random.split(jax.random.PRNGKey(1), 4000))
    freq = np.asarray(draws).mean(axis=0)[0]
    np.testing.assert_allclose(freq, want, atol=0.03)
    # every draw is one-hot
    assert np.all(np.asarray(draws).sum(axis=2) == 1.0)


def test_classifier_recovers_planted_classes_through_stack():
    key = jax.random.PRNGKey(2)
    data, labels = _labeled_data(key, 300, 12)
    dbn = DBN(DBNConfig(layer_sizes=[10, 6], epochs=30, lr=0.3,
                        batch_size=20)).train(data)
    hist = dbn.fit_label_top(data, labels, n_classes=3, n_hidden=16,
                             epochs=25, lr=0.2)
    assert len(hist) == 25 and all(np.isfinite(hist))
    pred = np.asarray(dbn.predict_generative(data))
    acc = (pred == np.asarray(labels)).mean()
    assert acc > 0.9, acc
    post = np.asarray(dbn.class_posterior(data))
    assert post.shape == (300, 3)
    np.testing.assert_allclose(post.sum(axis=1), 1.0, rtol=1e-5)
    # posterior agrees with the argmax prediction
    np.testing.assert_array_equal(post.argmax(axis=1), pred)


def test_class_conditional_generation():
    """Dreamed samples of class k must match class-k data better than other
    classes' data (cosine to class means)."""
    key = jax.random.PRNGKey(3)
    data, labels = _labeled_data(key, 300, 12)
    dbn = DBN(DBNConfig(layer_sizes=[10, 6], epochs=30, lr=0.3,
                        batch_size=20)).train(data)
    dbn.fit_label_top(data, labels, n_classes=3, n_hidden=16, epochs=25,
                      lr=0.2)
    means = np.stack([np.asarray(data)[np.asarray(labels) == k].mean(axis=0)
                      for k in range(3)])
    ok = 0
    for k in range(3):
        s = np.asarray(dbn.generate_class(k, n_samples=50, n_gibbs=100,
                                          seed=k))
        assert s.shape == (50, 12)
        sims = (s / np.maximum(np.linalg.norm(s, axis=1, keepdims=True), 1e-9)) \
            @ (means / np.linalg.norm(means, axis=1, keepdims=True)).T
        ok += int(np.argmax(sims.mean(axis=0)) == k)
    assert ok >= 2, f"only {ok}/3 classes dreamed correctly"


def test_persistence_and_resume(tmp_path):
    key = jax.random.PRNGKey(4)
    data, labels = _labeled_data(key, 120, 12)
    dbn = DBN(DBNConfig(layer_sizes=[8, 6], epochs=3, lr=0.2,
                        batch_size=20)).train(data)
    dbn.fit_label_top(data, labels, n_classes=3, n_hidden=8, epochs=3)
    dbn.save(str(tmp_path / "m"))
    loaded = DBN.load(str(tmp_path / "m"))
    assert hasattr(loaded, "_label_top")
    np.testing.assert_array_equal(
        np.asarray(loaded.predict_generative(data)),
        np.asarray(dbn.predict_generative(data)))
    # resume keeps training the same top (same shape), no re-init
    h2 = loaded.fit_label_top(data, labels, n_classes=3, n_hidden=8, epochs=2)
    assert len(h2) == 2
    with pytest.raises(ValueError, match="classes"):
        loaded.fit_label_top(data, labels, n_classes=5, n_hidden=8, epochs=1)
    # a save WITHOUT the top clears the stale file
    dbn2 = DBN(DBNConfig(layer_sizes=[8, 6], epochs=2, lr=0.2,
                         batch_size=20)).train(data)
    dbn2.save(str(tmp_path / "m"))
    assert not hasattr(DBN.load(str(tmp_path / "m")), "_label_top")


def test_validation_errors():
    key = jax.random.PRNGKey(5)
    data, labels = _labeled_data(key, 60, 12)
    with pytest.raises(ValueError, match="out of range"):
        fit_label_top([], data, labels, n_classes=2, epochs=1)
    with pytest.raises(ValueError, match="1-D"):
        fit_label_top([], data, jnp.zeros((60, 3)), n_classes=3, epochs=1)
    with pytest.raises(ValueError, match="rows"):
        fit_label_top([], data, labels[:30], n_classes=3, epochs=1)
    with pytest.raises(RuntimeError, match="before"):
        DBN(DBNConfig(layer_sizes=[4])).predict_generative(data)
    p, _ = fit_label_top([], data, labels, n_classes=3, n_hidden=8, epochs=1)
    with pytest.raises(ValueError, match="codes width"):
        label_top_logits(p, [], data[:, :6], 3)
    with pytest.raises(ValueError, match="resume params"):
        fit_label_top([], data, labels, n_classes=3, n_hidden=16, epochs=1,
                      params=p)
    with pytest.raises(ValueError, match="label .* out of range"):
        generate_class_conditional(p, [], 7, 3)


def test_mdbn_label_top():
    from mdbn_tpu.config import MDBNConfig
    from mdbn_tpu.models.mdbn import MDBN

    key = jax.random.PRNGKey(6)
    ka, kb = jax.random.split(key)
    da, labels = _labeled_data(ka, 200, 12)
    # second modality shares the labels (same planted classes, new noise)
    db, _ = _labeled_data(jax.random.PRNGKey(7), 200, 9)
    # re-plant modality b on the SAME labels so the joint code is informative
    block = 9 // 3
    base = jnp.zeros((200, 9))
    for k in range(3):
        mask = (labels == k)[:, None] & (jnp.arange(9) // block == k)[None, :]
        base = jnp.where(mask, 1.0, base)
    noise = jax.random.uniform(kb, (200, 9)) < 0.08
    db = jnp.where(noise, 1.0 - base, base).astype(jnp.float32)

    mods = {"a": da, "b": db}
    cfg = MDBNConfig(
        towers={"a": DBNConfig(layer_sizes=[8], epochs=30, lr=0.3,
                               batch_size=20),
                "b": DBNConfig(layer_sizes=[6], epochs=30, lr=0.3,
                               batch_size=20)},
        joint=RBMConfig(n_visible=1, n_hidden=8, epochs=30, lr=0.3,
                        batch_size=20))
    mdbn = MDBN(cfg).train(mods)
    hist = mdbn.fit_label_top(mods, labels, n_classes=3, n_hidden=16,
                              epochs=25, lr=0.2)
    assert all(np.isfinite(hist))
    pred = np.asarray(mdbn.predict_generative(mods))
    acc = (pred == np.asarray(labels)).mean()
    assert acc > 0.9, acc
    post = np.asarray(mdbn.class_posterior(mods))
    np.testing.assert_allclose(post.sum(axis=1), 1.0, rtol=1e-5)
