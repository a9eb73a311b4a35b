"""Up-down (contrastive wake-sleep) fine-tuning — Hinton-Osindero-Teh 2006.

Validation strategy: the DBN's directed generative model is small enough to
enumerate exactly (analysis.ais.exact_dbn_log_likelihood), so up-down is
held to ground truth — the exact likelihood of the tuned generative model
must beat the pretrained (tied) one — rather than to a proxy metric. The
enumerator itself is validated against an independent brute-force double
enumeration written out longhand in this file.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdbn_tpu.analysis.ais import (
    dbn_log_likelihood_bound,
    exact_dbn_log_likelihood,
    exact_log_z,
)
from mdbn_tpu.config import DBNConfig, RBMConfig
from mdbn_tpu.core.rbm_math import RBMParams
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.train.updown import finetune_updown_stack


def _rand_params(key, V, H, scale=0.5):
    kw, kb, kc = jax.random.split(key, 3)
    return RBMParams(
        W=scale * jax.random.normal(kw, (V, H), jnp.float32),
        b=scale * jax.random.normal(kb, (V,), jnp.float32),
        c=scale * jax.random.normal(kc, (H,), jnp.float32),
    )


def _toy_data(key, n, V):
    """Two-mode binary data: half near all-ones, half near all-zeros."""
    kf, kn = jax.random.split(key)
    base = (jax.random.uniform(kf, (n, 1)) < 0.5).astype(jnp.float32)
    flip = jax.random.uniform(kn, (n, V)) < 0.1
    return jnp.where(flip, 1.0 - base, base).astype(jnp.float32)


def test_exact_dbn_ll_matches_independent_brute_force():
    """Message-passing enumerator == longhand double enumeration (V=4,3,3)."""
    key = jax.random.PRNGKey(0)
    k0, k1, kd = jax.random.split(key, 3)
    p0 = _rand_params(k0, 4, 3)
    top = _rand_params(k1, 3, 3)
    cfg0 = RBMConfig(n_visible=4, n_hidden=3)
    topc = RBMConfig(n_visible=3, n_hidden=3)
    data = (jax.random.uniform(kd, (7, 4)) < 0.5).astype(jnp.float32)

    got = exact_dbn_log_likelihood([(p0, cfg0), (top, topc)], data)

    # longhand: enumerate (h1, h2) jointly
    from scipy.special import logsumexp

    W0, b0 = np.asarray(p0.W, np.float64), np.asarray(p0.b, np.float64)
    Wt = np.asarray(top.W, np.float64)
    bt, ct = np.asarray(top.b, np.float64), np.asarray(top.c, np.float64)
    h1s = ((np.arange(8)[:, None] >> np.arange(3)) & 1).astype(np.float64)
    h2s = h1s.copy()
    # log p*(h1, h2) = -E_top
    e = h1s @ Wt @ h2s.T + (h1s @ bt)[:, None] + (h2s @ ct)[None, :]
    log_p_h1 = logsumexp(e, axis=1)  # unnormalized log p*(h1)
    X = np.asarray(data, np.float64)
    pre = h1s @ W0.T + b0[None, :]  # [8, 4]
    logsig, log1msig = -np.logaddexp(0, -pre), -np.logaddexp(0, pre)
    log_cond = X @ logsig.T + (1 - X) @ log1msig.T  # [N, 8]
    want = np.mean(logsumexp(log_cond + log_p_h1[None, :], axis=1)) \
        - logsumexp(e)
    assert got == pytest.approx(want, abs=1e-8)
    # and the top-RBM log Z agrees with the single-RBM enumerator
    assert logsumexp(e) == pytest.approx(exact_log_z(top), abs=1e-8)


def test_exact_dbn_ll_three_layer_and_gaussian_bottom():
    """3-layer chain enumerates; Gaussian bottom integrates to finite LL."""
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    layers = [
        (_rand_params(ks[0], 4, 3), RBMConfig(n_visible=4, n_hidden=3,
                                              visible="gaussian")),
        (_rand_params(ks[1], 3, 3), RBMConfig(n_visible=3, n_hidden=3)),
        (_rand_params(ks[2], 3, 2), RBMConfig(n_visible=3, n_hidden=2)),
    ]
    data = jax.random.normal(ks[3], (5, 4), jnp.float32)
    ll = exact_dbn_log_likelihood(layers, data)
    assert np.isfinite(ll)
    # bound <= exact (variational guarantee, modest MC/AIS slack)
    out = dbn_log_likelihood_bound(layers, data, n_samples=64, n_chains=64,
                                   n_betas=600)
    assert out["mean_log_likelihood_bound"] <= ll + 3 * out["mc_std"] + 0.2


def test_variational_bound_below_exact_bernoulli():
    key = jax.random.PRNGKey(2)
    k0, k1, kd = jax.random.split(key, 3)
    layers = [
        (_rand_params(k0, 5, 4), RBMConfig(n_visible=5, n_hidden=4)),
        (_rand_params(k1, 4, 3), RBMConfig(n_visible=4, n_hidden=3)),
    ]
    data = (jax.random.uniform(kd, (9, 5)) < 0.5).astype(jnp.float32)
    ll = exact_dbn_log_likelihood(layers, data)
    out = dbn_log_likelihood_bound(layers, data, n_samples=64, n_chains=64,
                                   n_betas=600)
    assert out["mean_log_likelihood_bound"] <= ll + 3 * out["mc_std"] + 0.2


def test_updown_improves_exact_generative_likelihood():
    """The acceptance test: up-down's untied generative model beats the
    pretrained tied one in EXACT log-likelihood on the training data."""
    key = jax.random.PRNGKey(3)
    data = _toy_data(key, 120, 6)
    cfg = DBNConfig(layer_sizes=[5, 4], epochs=12, lr=0.2, batch_size=20,
                    seed=0)
    dbn = DBN(cfg).train(data)
    layers = [(r.params, r.cfg) for r in dbn.layers]
    ll_before = exact_dbn_log_likelihood(layers, data)

    rec, gen, top, history = finetune_updown_stack(
        layers, data, epochs=30, lr=0.05, batch_size=20, seed=1)
    tuned = [(p, c) for p, (_, c) in zip(rec, layers[:-1])] \
        + [(top, layers[-1][1])]
    ll_after = exact_dbn_log_likelihood(tuned, data, gen=gen)

    assert len(history) == 30 and all(np.isfinite(history))
    assert ll_after > ll_before, (ll_before, ll_after)


def test_updown_unties_and_resumes():
    key = jax.random.PRNGKey(4)
    data = _toy_data(key, 60, 6)
    cfg = DBNConfig(layer_sizes=[4, 3], epochs=3, lr=0.1, batch_size=20)
    dbn = DBN(cfg).train(data)
    layers = [(r.params, r.cfg) for r in dbn.layers]

    rec, gen, top, _ = finetune_updown_stack(layers, data, epochs=2, lr=0.1,
                                             batch_size=20, seed=0)
    # untied: generative weights have moved off the recognition weights
    assert not np.allclose(np.asarray(gen[0][0]), np.asarray(rec[0].W))
    # resume accepts a previous gen and keeps training from it
    rec2, gen2, top2, _ = finetune_updown_stack(
        [(p, c) for p, (_, c) in zip(rec, layers[:-1])] + [(top, layers[-1][1])],
        data, epochs=1, lr=0.1, batch_size=20, seed=1, gen=gen)
    assert gen2[0][0].shape == gen[0][0].shape

    with pytest.raises(ValueError, match=">= 2 layers"):
        finetune_updown_stack(layers[:1], data)
    with pytest.raises(ValueError, match="gen has"):
        finetune_updown_stack(layers, data, gen=gen + gen)


def test_dbn_method_persistence_and_generation(tmp_path):
    key = jax.random.PRNGKey(5)
    data = _toy_data(key, 60, 6)
    cfg = DBNConfig(layer_sizes=[4, 3], epochs=3, lr=0.1, batch_size=20)
    dbn = DBN(cfg).train(data)
    hist = dbn.finetune_updown(data, epochs=2, lr=0.05)
    assert len(hist) == 2 and hasattr(dbn, "_gen")

    samples = dbn.generate(n_samples=4, n_gibbs=20)
    assert samples.shape == (4, 6)
    codes = dbn.transform(data)
    assert codes.shape == (60, 3)

    dbn.save(str(tmp_path / "m"))
    loaded = DBN.load(str(tmp_path / "m"))
    assert hasattr(loaded, "_gen")
    np.testing.assert_array_equal(np.asarray(loaded._gen[0][0]),
                                  np.asarray(dbn._gen[0][0]))
    # a save WITHOUT gen clears any stale gen.npz in the same directory
    dbn2 = DBN(cfg).train(data)
    dbn2.save(str(tmp_path / "m"))
    assert not hasattr(DBN.load(str(tmp_path / "m")), "_gen")
    # resume through the method uses the stored gen
    hist2 = loaded.finetune_updown(data, epochs=1, lr=0.05)
    assert len(hist2) == 1


def test_updown_gaussian_bottom_runs():
    key = jax.random.PRNGKey(6)
    data = jax.random.normal(key, (60, 6), jnp.float32)
    cfg = DBNConfig(layer_sizes=[4, 3], visible="gaussian", epochs=2,
                    lr=0.05, batch_size=20)
    dbn = DBN(cfg).train(data)
    rec, gen, top, history = finetune_updown_stack(
        [(r.params, r.cfg) for r in dbn.layers], data, epochs=2, lr=0.01,
        batch_size=20)
    assert all(np.isfinite(history))
    assert all(np.all(np.isfinite(np.asarray(W))) for W, _ in gen)


def test_bound_accepts_untied_gen_and_matches_tied_default():
    """gen=None and gen=tied weights must agree exactly (same key)."""
    key = jax.random.PRNGKey(7)
    k0, k1, kd = jax.random.split(key, 3)
    layers = [
        (_rand_params(k0, 5, 4), RBMConfig(n_visible=5, n_hidden=4)),
        (_rand_params(k1, 4, 3), RBMConfig(n_visible=4, n_hidden=3)),
    ]
    data = (jax.random.uniform(kd, (9, 5)) < 0.5).astype(jnp.float32)
    tied = [(p.W, p.b) for p, _ in layers[:-1]]
    a = dbn_log_likelihood_bound(layers, data, key=jax.random.PRNGKey(11),
                                 n_samples=8, n_chains=32, n_betas=200)
    b = dbn_log_likelihood_bound(layers, data, key=jax.random.PRNGKey(11),
                                 n_samples=8, n_chains=32, n_betas=200,
                                 gen=tied)
    assert a["mean_log_likelihood_bound"] == pytest.approx(
        b["mean_log_likelihood_bound"], abs=1e-6)
    # and exact enumeration honors gen the same way
    assert exact_dbn_log_likelihood(layers, data) == pytest.approx(
        exact_dbn_log_likelihood(layers, data, gen=tied), abs=1e-10)
    with pytest.raises(ValueError, match="gen has"):
        exact_dbn_log_likelihood(layers, data, gen=tied + tied)


# --- multimodal (MDBN) up-down ------------------------------------------------


def test_exact_mdbn_single_tower_reduces_to_dbn():
    """A 1-tower MDBN IS a DBN: both enumerators must agree exactly."""
    key = jax.random.PRNGKey(8)
    k0, k1, kd = jax.random.split(key, 3)
    p0 = _rand_params(k0, 5, 4)
    top = _rand_params(k1, 4, 3)
    cfg0 = RBMConfig(n_visible=5, n_hidden=4)
    topc = RBMConfig(n_visible=4, n_hidden=3)
    data = (jax.random.uniform(kd, (7, 5)) < 0.5).astype(jnp.float32)
    from mdbn_tpu.analysis.ais import exact_mdbn_log_likelihood

    got = exact_mdbn_log_likelihood({"a": [(p0, cfg0)]}, (top, topc),
                                    {"a": data})
    want = exact_dbn_log_likelihood([(p0, cfg0), (top, topc)], data)
    assert got == pytest.approx(want, abs=1e-10)


def test_exact_mdbn_two_towers_matches_brute_force():
    """2-tower enumerator (deep tower a + shallow tower b) == longhand
    enumeration over ALL hidden states jointly."""
    from scipy.special import logsumexp

    from mdbn_tpu.analysis.ais import exact_mdbn_log_likelihood

    key = jax.random.PRNGKey(9)
    ks = jax.random.split(key, 6)
    # tower a: 4 -> 3 -> 2 (two directed layers); tower b: 3 -> 2 (one)
    pa0, pa1 = _rand_params(ks[0], 4, 3), _rand_params(ks[1], 3, 2)
    pb0 = _rand_params(ks[2], 3, 2)
    joint = _rand_params(ks[3], 4, 3)  # visible = concat(2, 2)
    ca0 = RBMConfig(n_visible=4, n_hidden=3)
    ca1 = RBMConfig(n_visible=3, n_hidden=2)
    cb0 = RBMConfig(n_visible=3, n_hidden=2)
    cj = RBMConfig(n_visible=4, n_hidden=3)
    va = (jax.random.uniform(ks[4], (6, 4)) < 0.5).astype(jnp.float32)
    vb = (jax.random.uniform(ks[5], (6, 3)) < 0.5).astype(jnp.float32)

    got = exact_mdbn_log_likelihood(
        {"a": [(pa0, ca0), (pa1, ca1)], "b": [(pb0, cb0)]}, (joint, cj),
        {"a": va, "b": vb})

    def st(n):
        return ((np.arange(2 ** n)[:, None] >> np.arange(n)) & 1).astype(
            np.float64)

    def cond(S, T, W, b):
        pre = T @ np.asarray(W, np.float64).T + np.asarray(b, np.float64)
        return (S @ (-np.logaddexp(0, -pre)).T
                + (1 - S) @ (-np.logaddexp(0, pre)).T)

    ha1, ha2, hb1 = st(3), st(2), st(2)
    Xa, Xb = np.asarray(va, np.float64), np.asarray(vb, np.float64)
    la1 = cond(Xa, ha1, pa0.W, pa0.b)               # [N, 8]
    la2 = cond(ha1, ha2, pa1.W, pa1.b)              # [8, 4]
    lb1 = cond(Xb, hb1, pb0.W, pb0.b)               # [N, 4]
    Wj = np.asarray(joint.W, np.float64)
    bj, cjv = np.asarray(joint.b, np.float64), np.asarray(joint.c, np.float64)
    lls = []
    for n in range(6):
        # enumerate (ha1, ha2, hb1) longhand
        acc = []
        for i in range(8):
            for j in range(4):
                for kk in range(4):
                    v = np.concatenate([ha2[j], hb1[kk]])
                    nf = v @ bj + np.logaddexp(0, v @ Wj + cjv).sum()
                    acc.append(la1[n, i] + la2[i, j] + lb1[n, kk] + nf)
        lls.append(logsumexp(acc))
    want = float(np.mean(lls) - exact_log_z(joint))
    assert got == pytest.approx(want, abs=1e-8)


def _tiny_mdbn(key, n=120):
    from mdbn_tpu.config import MDBNConfig
    from mdbn_tpu.models.mdbn import MDBN

    ka, kb = jax.random.split(key)
    mods = {"a": _toy_data(ka, n, 6), "b": _toy_data(kb, n, 5)}
    cfg = MDBNConfig(
        towers={"a": DBNConfig(layer_sizes=[4, 3], epochs=6, lr=0.2,
                               batch_size=20),
                "b": DBNConfig(layer_sizes=[3], epochs=6, lr=0.2,
                               batch_size=20)},
        joint=RBMConfig(n_visible=1, n_hidden=4, epochs=6, lr=0.2,
                        batch_size=20))
    return MDBN(cfg).train(mods), mods


def test_updown_mdbn_improves_exact_generative_likelihood():
    from mdbn_tpu.analysis.ais import exact_mdbn_log_likelihood
    from mdbn_tpu.train.updown import finetune_updown_mdbn

    mdbn, mods = _tiny_mdbn(jax.random.PRNGKey(10))
    towers = {m: [(r.params, r.cfg) for r in mdbn.towers[m].layers]
              for m in mdbn.cfg.towers}
    joint = (mdbn.joint.params, mdbn.joint.cfg)
    ll_before = exact_mdbn_log_likelihood(towers, joint, mods)

    rec, gen, joint_p, history = finetune_updown_mdbn(
        towers, joint, mods, epochs=30, lr=0.05, batch_size=20, seed=1)
    tuned = {m: [(p, c) for p, (_, c) in zip(rec[m], towers[m])]
             for m in towers}
    ll_after = exact_mdbn_log_likelihood(tuned, (joint_p, joint[1]), mods,
                                         gen=gen)
    assert len(history) == 30 and all(np.isfinite(history))
    assert ll_after > ll_before, (ll_before, ll_after)


def test_mdbn_method_persistence_and_generation(tmp_path):
    from mdbn_tpu.models.mdbn import MDBN

    mdbn, mods = _tiny_mdbn(jax.random.PRNGKey(11), n=60)
    hist = mdbn.finetune_updown(mods, epochs=2, lr=0.05)
    assert len(hist) == 2
    assert all(hasattr(mdbn.towers[m], "_gen") for m in mdbn.cfg.towers)
    # tower gen covers ALL tower layers (the joint RBM is the only
    # undirected part of the multimodal generative model)
    assert len(mdbn.towers["a"]._gen) == 2 and len(mdbn.towers["b"]._gen) == 1

    out = mdbn.generate(n_samples=4, n_gibbs=20)
    assert out["a"].shape == (4, 6) and out["b"].shape == (4, 5)
    imputed = mdbn.impute({"a": mods["a"]}, n_gibbs=20, n_chains=2)
    assert imputed["b"].shape == (mods["a"].shape[0], 5)

    mdbn.save(str(tmp_path / "m"))
    loaded = MDBN.load(str(tmp_path / "m"))
    assert all(hasattr(loaded.towers[m], "_gen") for m in loaded.cfg.towers)
    np.testing.assert_array_equal(
        np.asarray(loaded.towers["a"]._gen[0][0]),
        np.asarray(mdbn.towers["a"]._gen[0][0]))
    # resume uses the stored gen
    hist2 = loaded.finetune_updown(mods, epochs=1, lr=0.05)
    assert len(hist2) == 1


def test_updown_mdbn_validates_inputs():
    from mdbn_tpu.train.updown import finetune_updown_mdbn

    mdbn, mods = _tiny_mdbn(jax.random.PRNGKey(12), n=40)
    towers = {m: [(r.params, r.cfg) for r in mdbn.towers[m].layers]
              for m in mdbn.cfg.towers}
    joint = (mdbn.joint.params, mdbn.joint.cfg)
    with pytest.raises(ValueError, match="disagree"):
        finetune_updown_mdbn(towers, joint, {"a": mods["a"]})
    with pytest.raises(ValueError, match="disagree on rows"):
        finetune_updown_mdbn(towers, joint,
                             {"a": mods["a"], "b": mods["b"][:10]})
    with pytest.raises(ValueError, match="wrong depth|missing"):
        finetune_updown_mdbn(towers, joint, mods,
                             gen={"a": [(towers["a"][0][0].W,
                                         towers["a"][0][0].b)],
                                  "b": []})


# --- labeled up-down: the complete 2006 algorithm ------------------------------


def test_exact_labeled_dbn_matches_brute_force():
    """Enumerator == longhand joint enumeration over (h1, top hidden)."""
    from scipy.special import logsumexp

    from mdbn_tpu.analysis.ais import exact_labeled_dbn_log_likelihood

    key = jax.random.PRNGKey(20)
    k0, k1, kd, kl = jax.random.split(key, 4)
    p0 = _rand_params(k0, 4, 3)
    cfg0 = RBMConfig(n_visible=4, n_hidden=3)
    C, H = 2, 3
    top = _rand_params(k1, 3 + C, H)
    data = (jax.random.uniform(kd, (6, 4)) < 0.5).astype(jnp.float32)
    labels = jax.random.randint(kl, (6,), 0, C)

    got = exact_labeled_dbn_log_likelihood([(p0, cfg0)], top,
                                           data, labels, C)

    W0, b0 = np.asarray(p0.W, np.float64), np.asarray(p0.b, np.float64)
    Wt = np.asarray(top.W, np.float64)
    bt, ct = np.asarray(top.b, np.float64), np.asarray(top.c, np.float64)
    h1s = ((np.arange(8)[:, None] >> np.arange(3)) & 1).astype(np.float64)
    X = np.asarray(data, np.float64)
    pre = h1s @ W0.T + b0[None, :]
    log_cond = X @ (-np.logaddexp(0, -pre)).T + (1 - X) @ (-np.logaddexp(0, pre)).T
    def negF(s, y):
        v = np.concatenate([s, np.eye(C)[y]])
        return v @ bt + np.logaddexp(0, v @ Wt + ct).sum()
    # proper Z: one-hot label support only
    log_z = logsumexp([negF(h1s[i], y) for i in range(8) for y in range(C)])
    lls = []
    for n in range(6):
        y = int(labels[n])
        lls.append(logsumexp([log_cond[n, i] + negF(h1s[i], y)
                              for i in range(8)]) - log_z)
    assert got == pytest.approx(np.mean(lls), abs=1e-8)


def _block_data(key, n, V, n_classes=2, flip=0.08):
    """Separable binary data: class k activates feature block k (the
    test_labeled generator, inlined)."""
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


def test_labeled_updown_improves_exact_joint_likelihood():
    from mdbn_tpu.analysis.ais import exact_labeled_dbn_log_likelihood
    from mdbn_tpu.train.labeled import fit_label_top
    from mdbn_tpu.train.updown import finetune_updown_labeled

    key = jax.random.PRNGKey(21)
    data, labels = _block_data(key, 160, 6)
    cfg = DBNConfig(layer_sizes=[5, 4], epochs=15, lr=0.2, batch_size=20)
    dbn = DBN(cfg).train(data)
    layers = [(r.params, r.cfg) for r in dbn.layers]
    top, _ = fit_label_top(layers, data, labels, 2, n_hidden=6, epochs=20,
                           lr=0.2)
    ll0 = exact_labeled_dbn_log_likelihood(layers, top, data, labels, 2)

    rec, gen, top2, hist = finetune_updown_labeled(
        layers, top, data, labels, 2, epochs=30, lr=0.05, batch_size=20)
    tuned = [(p, c) for p, (_, c) in zip(rec, layers)]
    ll1 = exact_labeled_dbn_log_likelihood(tuned, top2, data, labels, 2,
                                           gen=gen)
    assert all(np.isfinite(hist))
    assert ll1 > ll0, (ll0, ll1)


def test_dbn_labeled_updown_method_and_classification():
    from mdbn_tpu.train.updown import finetune_updown_labeled

    key = jax.random.PRNGKey(22)
    data, labels = _block_data(key, 120, 6)
    cfg = DBNConfig(layer_sizes=[10, 6], epochs=30, lr=0.3, batch_size=20)
    dbn = DBN(cfg).train(data)
    with pytest.raises(RuntimeError, match="before fit_label_top"):
        dbn.finetune_updown_labeled(data, labels)
    dbn.fit_label_top(data, labels, 2, n_hidden=16, epochs=25, lr=0.2)
    hist = dbn.finetune_updown_labeled(data, labels, epochs=5, lr=0.02)
    assert len(hist) == 5 and len(dbn._gen) == 2  # ALL layers untied
    acc = float(np.mean(np.asarray(dbn.predict_generative(data)) == labels))
    assert acc > 0.9, acc
    s = dbn.generate_class(1, n_samples=4, n_gibbs=30)
    assert s.shape == (4, 6)
    # gen from labeled up-down covers all layers -> unlabeled resume raises
    with pytest.raises(ValueError, match="gen has"):
        dbn.finetune_updown(data, epochs=1)

    layers = [(r.params, r.cfg) for r in dbn.layers]
    top, _ = dbn._label_top
    with pytest.raises(ValueError, match="out of range"):
        finetune_updown_labeled(layers, top, data, labels, 1)
    with pytest.raises(ValueError, match="label top has visible"):
        finetune_updown_labeled(layers, top, data, labels, 3)
    with pytest.raises(ValueError, match=">= 1 stack layer"):
        finetune_updown_labeled([], top, data, labels, 2)


def test_labeled_bound_is_lower_bound_on_enumerable_model():
    """labeled_dbn_log_likelihood_bound <= exact MARGINAL log p(v) of the
    complete labeled model (labels=None enumeration), and not vacuous."""
    from mdbn_tpu.analysis.ais import (exact_labeled_dbn_log_likelihood,
                                       labeled_dbn_log_likelihood_bound)
    from mdbn_tpu.train.labeled import fit_label_top
    from mdbn_tpu.train.updown import finetune_updown_labeled

    key = jax.random.PRNGKey(23)
    data, labels = _block_data(key, 160, 6)
    cfg = DBNConfig(layer_sizes=[5, 4], epochs=15, lr=0.2, batch_size=20)
    dbn = DBN(cfg).train(data)
    layers = [(r.params, r.cfg) for r in dbn.layers]
    top, _ = fit_label_top(layers, data, labels, 2, n_hidden=6, epochs=20,
                           lr=0.2)
    rec, gen, top, _ = finetune_updown_labeled(
        layers, top, data, labels, 2, epochs=10, lr=0.05, batch_size=20)
    tuned = [(p, c) for p, (_, c) in zip(rec, layers)]

    exact = exact_labeled_dbn_log_likelihood(tuned, top, data[:64], None, 2,
                                             gen=gen)
    out = labeled_dbn_log_likelihood_bound(
        tuned, top, 2, data[:64], key=jax.random.PRNGKey(3),
        n_samples=64, n_chains=256, n_betas=2000, gen=gen)
    bound = out["mean_log_likelihood_bound"]
    mc = 3 * out["mc_std"] + 0.2  # MC + AIS slack
    assert bound <= exact + mc, (bound, exact)
    assert bound >= exact - 5.0, (bound, exact)  # tight-ish, not vacuous
    with pytest.raises(ValueError, match="gen has"):
        labeled_dbn_log_likelihood_bound(tuned, top, 2, data[:8],
                                         gen=gen[:1])
    with pytest.raises(ValueError, match="label top has visible"):
        labeled_dbn_log_likelihood_bound(tuned, top, 3, data[:8])


def test_generate_routes_through_label_top_after_labeled_updown():
    """After labeled up-down EVERY stack layer is directed: generate() must
    Gibbs in the label top (marginalizing the label) and dream down through
    the untied generative weights — and refuse if the label top is gone."""
    key = jax.random.PRNGKey(24)
    data, labels = _block_data(key, 120, 6)
    cfg = DBNConfig(layer_sizes=[10, 6], epochs=10, lr=0.3, batch_size=20)
    dbn = DBN(cfg).train(data)
    dbn.fit_label_top(data, labels, 2, n_hidden=12, epochs=10, lr=0.2)
    dbn.finetune_updown_labeled(data, labels, epochs=2, lr=0.02)
    s = dbn.generate(n_samples=3, n_gibbs=10, seed=1)
    assert s.shape == (3, 6) and bool(np.all(np.isfinite(np.asarray(s))))
    del dbn._label_top
    with pytest.raises(RuntimeError, match="undirected top is gone"):
        dbn.generate(n_samples=2, n_gibbs=5)


# --- labeled multimodal up-down: the complete 2006 algorithm on the tree ----


def _labeled_mods(key, n=160, n_classes=2):
    """Two modalities whose class-k rows light feature block k (8% flips),
    sharing one planted label vector."""
    kl, ka, kb = jax.random.split(key, 3)
    labels = jax.random.randint(kl, (n,), 0, n_classes)

    def mk(k, V):
        block = V // n_classes
        base = jnp.zeros((n, V))
        for c in range(n_classes):
            mask = ((labels == c)[:, None]
                    & (jnp.arange(V) // block == c)[None, :])
            base = jnp.where(mask, 1.0, base)
        noise = jax.random.uniform(k, (n, V)) < 0.08
        return jnp.where(noise, 1.0 - base, base).astype(jnp.float32)

    return {"a": mk(ka, 6), "b": mk(kb, 6)}, np.asarray(labels)


def test_exact_labeled_mdbn_single_tower_reduces_to_labeled_dbn():
    """One tower + directed joint layer + label top IS a labeled DBN whose
    stack is [tower layers..., joint layer]: both enumerators must agree,
    for the joint p(v, y) and the marginal p(v)."""
    from mdbn_tpu.analysis.ais import (exact_labeled_dbn_log_likelihood,
                                       exact_labeled_mdbn_log_likelihood)

    key = jax.random.PRNGKey(30)
    k0, kj, kt, kd, kl = jax.random.split(key, 5)
    p0 = _rand_params(k0, 5, 3)
    joint = _rand_params(kj, 3, 4)
    top = _rand_params(kt, 4 + 2, 3)
    cfg0 = RBMConfig(n_visible=5, n_hidden=3)
    cj = RBMConfig(n_visible=3, n_hidden=4)
    data = (jax.random.uniform(kd, (6, 5)) < 0.5).astype(jnp.float32)
    labels = np.asarray(jax.random.randint(kl, (6,), 0, 2))

    for lab in (labels, None):
        got = exact_labeled_mdbn_log_likelihood(
            {"a": [(p0, cfg0)]}, (joint, cj), top, {"a": data}, lab, 2)
        want = exact_labeled_dbn_log_likelihood(
            [(p0, cfg0), (joint, cj)], top, data, lab, 2)
        assert got == pytest.approx(want, abs=1e-10), lab


def test_exact_labeled_mdbn_two_towers_matches_brute_force():
    """2-tower labeled enumerator == longhand enumeration over (t_a, t_b, u)."""
    from scipy.special import logsumexp

    from mdbn_tpu.analysis.ais import exact_labeled_mdbn_log_likelihood

    key = jax.random.PRNGKey(31)
    ks = jax.random.split(key, 7)
    pa0 = _rand_params(ks[0], 4, 2)
    pb0 = _rand_params(ks[1], 3, 2)
    joint = _rand_params(ks[2], 4, 3)   # concat(2, 2) -> 3-bit joint code
    C = 2
    top = _rand_params(ks[3], 3 + C, 3)
    ca0 = RBMConfig(n_visible=4, n_hidden=2)
    cb0 = RBMConfig(n_visible=3, n_hidden=2)
    cj = RBMConfig(n_visible=4, n_hidden=3)
    va = (jax.random.uniform(ks[4], (6, 4)) < 0.5).astype(jnp.float32)
    vb = (jax.random.uniform(ks[5], (6, 3)) < 0.5).astype(jnp.float32)
    labels = np.asarray(jax.random.randint(ks[6], (6,), 0, C))

    got = exact_labeled_mdbn_log_likelihood(
        {"a": [(pa0, ca0)], "b": [(pb0, cb0)]}, (joint, cj), top,
        {"a": va, "b": vb}, labels, C)

    def st(n):
        return ((np.arange(2 ** n)[:, None] >> np.arange(n)) & 1).astype(
            np.float64)

    def cond(S, T, W, b):
        pre = T @ np.asarray(W, np.float64).T + np.asarray(b, np.float64)
        return (S @ (-np.logaddexp(0, -pre)).T
                + (1 - S) @ (-np.logaddexp(0, pre)).T)

    ta, tb, us = st(2), st(2), st(3)
    la = cond(np.asarray(va, np.float64), ta, pa0.W, pa0.b)   # [N, 4]
    lb = cond(np.asarray(vb, np.float64), tb, pb0.W, pb0.b)   # [N, 4]
    Wj = np.asarray(joint.W, np.float64)
    bj = np.asarray(joint.b, np.float64)
    Wt = np.asarray(top.W, np.float64)
    bt, ct = np.asarray(top.b, np.float64), np.asarray(top.c, np.float64)

    def neg_f(u, y):
        v = np.concatenate([u, np.eye(C)[y]])
        return v @ bt + np.logaddexp(0, v @ Wt + ct).sum()

    # log Z over the one-hot-restricted support
    log_z = logsumexp([neg_f(us[i], y) for i in range(8) for y in range(C)])
    lls = []
    for n in range(6):
        acc = []
        for i in range(4):        # t_a
            for j in range(4):    # t_b
                t = np.concatenate([ta[i], tb[j]])
                for uu in range(8):
                    pre = us[uu] @ Wj.T + bj
                    lpt = float(np.sum(t * (-np.logaddexp(0, -pre))
                                       + (1 - t) * (-np.logaddexp(0, pre))))
                    acc.append(la[n, i] + lb[n, j] + lpt
                               + neg_f(us[uu], int(labels[n])))
        lls.append(logsumexp(acc) - log_z)
    assert got == pytest.approx(np.mean(lls), abs=1e-8)


def test_labeled_updown_mdbn_improves_exact_joint_likelihood():
    from mdbn_tpu.analysis.ais import exact_labeled_mdbn_log_likelihood
    from mdbn_tpu.config import MDBNConfig
    from mdbn_tpu.models.mdbn import MDBN
    from mdbn_tpu.train.updown import finetune_updown_mdbn_labeled

    mods, labels = _labeled_mods(jax.random.PRNGKey(32))
    cfg = MDBNConfig(
        towers={"a": DBNConfig(layer_sizes=[4, 3], epochs=15, lr=0.3,
                               batch_size=20),
                "b": DBNConfig(layer_sizes=[3], epochs=15, lr=0.3,
                               batch_size=20)},
        joint=RBMConfig(n_visible=1, n_hidden=4, epochs=15, lr=0.3,
                        batch_size=20))
    mdbn = MDBN(cfg).train(mods)
    mdbn.fit_label_top(mods, labels, 2, n_hidden=6, epochs=20, lr=0.2)
    towers = {m: [(r.params, r.cfg) for r in mdbn.towers[m].layers]
              for m in mdbn.cfg.towers}
    joint = (mdbn.joint.params, mdbn.joint.cfg)
    top, _ = mdbn._label_top
    ll0 = exact_labeled_mdbn_log_likelihood(towers, joint, top, mods,
                                            labels, 2)

    rec, gen, joint_p, joint_gen, top1, hist = finetune_updown_mdbn_labeled(
        towers, joint, top, mods, labels, 2, epochs=30, lr=0.05,
        batch_size=20, seed=1)
    tuned = {m: [(p, c) for p, (_, c) in zip(rec[m], towers[m])]
             for m in towers}
    ll1 = exact_labeled_mdbn_log_likelihood(
        tuned, (joint_p, joint[1]), top1, mods, labels, 2, gen=gen,
        joint_gen=joint_gen)
    assert len(hist) == 30 and all(np.isfinite(hist))
    assert ll1 > ll0, (ll0, ll1)


def test_mdbn_labeled_updown_method_generate_persistence(tmp_path):
    from mdbn_tpu.config import MDBNConfig
    from mdbn_tpu.models.mdbn import MDBN

    mods, labels = _labeled_mods(jax.random.PRNGKey(33), n=120)
    cfg = MDBNConfig(
        towers={"a": DBNConfig(layer_sizes=[6, 4], epochs=30, lr=0.3,
                               batch_size=20),
                "b": DBNConfig(layer_sizes=[4], epochs=30, lr=0.3,
                               batch_size=20)},
        joint=RBMConfig(n_visible=1, n_hidden=6, epochs=30, lr=0.3,
                        batch_size=20))
    mdbn = MDBN(cfg).train(mods)
    with pytest.raises(RuntimeError, match="before fit_label_top"):
        mdbn.finetune_updown_labeled(mods, labels)
    mdbn.fit_label_top(mods, labels, 2, n_hidden=12, epochs=25, lr=0.2)
    hist = mdbn.finetune_updown_labeled(mods, labels, epochs=5, lr=0.02)
    assert len(hist) == 5
    assert hasattr(mdbn, "_joint_gen")           # the joint layer untied
    assert len(mdbn.towers["a"]._gen) == 2       # ALL tower layers untied
    acc = float(np.mean(np.asarray(mdbn.predict_generative(mods)) == labels))
    assert acc > 0.9, acc

    # generate routes through the label top + untied joint weights
    out = mdbn.generate(n_samples=3, n_gibbs=10, seed=1)
    assert out["a"].shape == (3, 6) and out["b"].shape == (3, 6)
    assert all(np.all(np.isfinite(np.asarray(v))) for v in out.values())
    # class-conditional dreams per modality
    dreams = mdbn.generate_class(1, n_samples=4, n_gibbs=20)
    assert dreams["a"].shape == (4, 6) and dreams["b"].shape == (4, 6)

    mdbn.save(str(tmp_path / "m"))
    from mdbn_tpu.models.mdbn import MDBN as M2
    loaded = M2.load(str(tmp_path / "m"))
    assert hasattr(loaded, "_joint_gen") and hasattr(loaded, "_label_top")
    np.testing.assert_array_equal(np.asarray(loaded._joint_gen[0]),
                                  np.asarray(mdbn._joint_gen[0]))
    # resume consumes the stored joint gen + tower gens
    hist2 = loaded.finetune_updown_labeled(mods, labels, epochs=1, lr=0.02)
    assert len(hist2) == 1

    del mdbn._label_top
    with pytest.raises(RuntimeError, match="undirected top is gone"):
        mdbn.generate(n_samples=2, n_gibbs=5)


def test_updown_mdbn_labeled_validates_inputs():
    from mdbn_tpu.train.updown import finetune_updown_mdbn_labeled

    mdbn, mods = _tiny_mdbn(jax.random.PRNGKey(34), n=40)
    labels = np.zeros(40, int)
    towers = {m: [(r.params, r.cfg) for r in mdbn.towers[m].layers]
              for m in mdbn.cfg.towers}
    joint = (mdbn.joint.params, mdbn.joint.cfg)
    n_code = mdbn.joint.params.W.shape[1]
    top = _rand_params(jax.random.PRNGKey(0), n_code + 2, 3)
    with pytest.raises(ValueError, match="disagree"):
        finetune_updown_mdbn_labeled(towers, joint, top, {"a": mods["a"]},
                                     labels, 2)
    with pytest.raises(ValueError, match="label top has visible"):
        finetune_updown_mdbn_labeled(towers, joint, top, mods, labels, 3)
    with pytest.raises(ValueError, match="out of range"):
        finetune_updown_mdbn_labeled(towers, joint, top, mods,
                                     np.full(40, 5), 2)
    with pytest.raises(ValueError, match="joint_gen W"):
        finetune_updown_mdbn_labeled(
            towers, joint, top, mods, labels, 2,
            joint_gen=(np.zeros((2, 2)), np.zeros(2)))
