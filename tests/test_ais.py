"""AIS partition-function estimation vs exact enumeration (small models)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdbn_tpu.analysis.ais import ais_log_z, base_rate_biases, exact_log_z, log_likelihood
from mdbn_tpu.config import RBMConfig
from mdbn_tpu.core.rbm_math import RBMParams
from mdbn_tpu.data.synthetic import bars_and_stripes
from mdbn_tpu.models.rbm import RBM


def random_params(V, H, scale, seed):
    rng = np.random.default_rng(seed)
    return RBMParams(
        W=jnp.asarray(rng.standard_normal((V, H)).astype(np.float32) * scale),
        b=jnp.asarray(rng.standard_normal(V).astype(np.float32) * 0.2),
        c=jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.2),
    )


@pytest.mark.parametrize("scale", [0.05, 0.5])
def test_ais_matches_exact_log_z(scale):
    params = random_params(12, 8, scale, seed=0)
    exact = exact_log_z(params)
    a_base = jnp.zeros(12, jnp.float32)  # uniform base rate
    est, logw = ais_log_z(params, a_base, jax.random.PRNGKey(1),
                          n_chains=256, n_betas=2000)
    assert abs(float(est) - exact) < 0.15, (float(est), exact)


def test_ais_trained_rbm_log_likelihood():
    data = bars_and_stripes(512, side=4, seed=1)
    cfg = RBMConfig(n_visible=16, n_hidden=12, lr=0.3, epochs=30, batch_size=16,
                    engine="xla", seed=0)
    rbm = RBM(cfg).train(data)
    out = log_likelihood(rbm.params, cfg, data[:128], n_chains=128, n_betas=1000)
    exact = exact_log_z(rbm.params)
    assert abs(out["log_z"] - exact) < 0.5
    # trained model must beat the independent-pixels baseline
    p = np.clip(data.mean(0), 1e-2, 1 - 1e-2)
    indep_ll = float(np.mean(np.sum(data[:128] * np.log(p)
                                    + (1 - data[:128]) * np.log(1 - p), axis=1)))
    assert out["mean_log_likelihood"] > indep_ll + 1.0


def test_ais_sm_schedule_and_sweeps_match_exact_log_z():
    """The S&M piecewise schedule + multi-sweep transitions are the same
    estimator (same target, valid transition kernels at every beta): they
    must reproduce exact log Z on an enumerable model."""
    from mdbn_tpu.analysis.ais import anneal_betas

    # schedule sanity: monotone 0 -> 1, ~69% of points in [0.9, 1.0]
    b = np.asarray(anneal_betas(2000, "sm"))
    assert b[0] == 0.0 and b[-1] == 1.0 and np.all(np.diff(b) > 0)
    assert 0.6 < np.mean(b >= 0.9) < 0.75
    with pytest.raises(ValueError):
        anneal_betas(1000, "nope")

    params = random_params(12, 8, 0.5, seed=0)
    exact = exact_log_z(params)
    a_base = jnp.zeros(12, jnp.float32)
    est_sm, _ = ais_log_z(params, a_base, jax.random.PRNGKey(2),
                          n_chains=256, n_betas=2000, schedule="sm")
    assert abs(float(est_sm) - exact) < 0.15, (float(est_sm), exact)
    est_sw, _ = ais_log_z(params, a_base, jax.random.PRNGKey(3),
                          n_chains=256, n_betas=700, n_sweeps=3)
    assert abs(float(est_sw) - exact) < 0.15, (float(est_sw), exact)


def test_gaussian_ais_sm_schedule_and_sweeps_match_exact_log_z():
    from mdbn_tpu.analysis.ais import ais_log_z_gaussian, exact_log_z_gaussian

    params = random_params(12, 8, 0.3, seed=2)
    exact = exact_log_z_gaussian(params)
    est, _ = ais_log_z_gaussian(params, jnp.zeros(12, jnp.float32),
                                jax.random.PRNGKey(5), n_chains=256,
                                n_betas=700, n_sweeps=3, schedule="sm")
    assert abs(float(est) - exact) < 0.2, (float(est), exact)


@pytest.mark.parametrize("scale", [0.05, 0.3])
def test_gaussian_ais_matches_exact_log_z(scale):
    """VERDICT r1 #7: AIS for sigma=1 GRBMs, validated against exact
    enumeration (Z = (2pi)^{V/2} sum_h exp(c.h + b.Wh + ||Wh||^2/2))."""
    from mdbn_tpu.analysis.ais import ais_log_z_gaussian, exact_log_z_gaussian

    params = random_params(12, 8, scale, seed=2)
    exact = exact_log_z_gaussian(params)
    est, logw = ais_log_z_gaussian(params, jnp.zeros(12, jnp.float32),
                                   jax.random.PRNGKey(3),
                                   n_chains=256, n_betas=2000)
    assert abs(float(est) - exact) < 0.2, (float(est), exact)


def test_gaussian_trained_rbm_log_likelihood():
    """log_likelihood dispatches on cfg.visible: a trained GRBM on z-scored
    clustered data must beat the N(0, I) baseline density."""
    from mdbn_tpu.data.synthetic import tcga_like

    mods, _ = tcga_like(n_patients=300, dims={"ge": 16, "meth": 8, "mirna": 8},
                        seed=3, signal=2.0)
    data = mods["ge"]
    cfg = RBMConfig(n_visible=16, n_hidden=12, visible="gaussian", lr=0.01,
                    epochs=40, batch_size=20, engine="xla", seed=0)
    rbm = RBM(cfg).train(data)
    out = log_likelihood(rbm.params, cfg, data[:128], n_chains=128, n_betas=1000)
    from mdbn_tpu.analysis.ais import exact_log_z_gaussian

    exact = exact_log_z_gaussian(rbm.params)
    assert abs(out["log_z"] - exact) < 0.5
    # N(0, I) log-density of the test rows (data is z-scored)
    x = np.asarray(data[:128])
    iso = float(np.mean(-0.5 * (x * x).sum(1) - 0.5 * 16 * np.log(2 * np.pi)))
    assert out["mean_log_likelihood"] > iso


def test_reverse_ais_sandwich_on_enumerable_model():
    """Bidirectional MC (Grosse et al. 2015): with EXACT model-sample init
    the reverse estimate upper-bounds log Z in expectation, the forward one
    lower-bounds it — a coarse anneal must show the open sandwich around the
    enumerated truth, and a fine anneal must close it onto the truth."""
    from mdbn_tpu.analysis.ais import exact_sample, reverse_ais_log_z

    # strong coupling (scale 2.0) makes a coarse anneal's BIAS dominate
    # its MC noise, so the open sandwich is visible with one run per side
    params = random_params(12, 8, 2.0, seed=0)
    exact = exact_log_z(params)
    a_base = jnp.zeros(12, jnp.float32)
    v1 = jnp.asarray(exact_sample(params, 512, seed=1))

    # coarse anneal: both bounds biased, truth inside the open bracket
    f, _ = ais_log_z(params, a_base, jax.random.PRNGKey(2),
                     n_chains=512, n_betas=8)
    r, _ = reverse_ais_log_z(params, a_base, v1, jax.random.PRNGKey(3),
                             n_betas=8)
    assert float(f) < exact < float(r), (float(f), exact, float(r))

    # fine anneal: both ends land on the truth and the gap collapses
    f2, _ = ais_log_z(params, a_base, jax.random.PRNGKey(4),
                      n_chains=512, n_betas=2000)
    r2, _ = reverse_ais_log_z(params, a_base, v1, jax.random.PRNGKey(5),
                              n_betas=2000)
    assert abs(float(f2) - exact) < 0.15, (float(f2), exact)
    assert abs(float(r2) - exact) < 0.15, (float(r2), exact)
    assert float(r2) - float(f2) < float(r) - float(f)


def test_reverse_ais_gaussian_sandwich_on_enumerable_model():
    from mdbn_tpu.analysis.ais import (exact_sample, exact_log_z_gaussian,
                                       ais_log_z_gaussian,
                                       reverse_ais_log_z_gaussian)

    params = random_params(12, 8, 1.2, seed=2)
    exact = exact_log_z_gaussian(params)
    b_base = jnp.zeros(12, jnp.float32)
    v1 = jnp.asarray(exact_sample(params, 512, seed=1, visible="gaussian"))

    f, _ = ais_log_z_gaussian(params, b_base, jax.random.PRNGKey(2),
                              n_chains=512, n_betas=8)
    r, _ = reverse_ais_log_z_gaussian(params, b_base, v1,
                                      jax.random.PRNGKey(3), n_betas=8)
    assert float(f) < exact < float(r), (float(f), exact, float(r))

    f2, _ = ais_log_z_gaussian(params, b_base, jax.random.PRNGKey(4),
                               n_chains=512, n_betas=2000)
    r2, _ = reverse_ais_log_z_gaussian(params, b_base, v1,
                                       jax.random.PRNGKey(5), n_betas=2000)
    assert abs(float(f2) - exact) < 0.2, (float(f2), exact)
    assert abs(float(r2) - exact) < 0.2, (float(r2), exact)


@pytest.mark.parametrize("init", ["resample", "gibbs"])
def test_log_z_bracket_e2e_trained_model(init):
    """log_z_bracket end-to-end on a trained RBM, both reverse-init modes:
    the bracket must close around the enumerated truth, the ll bounds must
    be ordered, and the forward-ESS diagnostic must be reported."""
    from mdbn_tpu.analysis.ais import log_z_bracket

    data = bars_and_stripes(512, side=4, seed=1)
    cfg = RBMConfig(n_visible=16, n_hidden=12, lr=0.3, epochs=30,
                    batch_size=16, engine="xla", seed=0)
    rbm = RBM(cfg).train(data)
    exact = exact_log_z(rbm.params)
    out = log_z_bracket(rbm.params, cfg, data[:256],
                        key=jax.random.PRNGKey(7), n_chains=256,
                        n_betas=2000, init=init, init_gibbs=200)
    assert out["log_z_lower"] - 0.3 < exact < out["log_z_upper"] + 0.3, (
        out, exact)
    # a resolved bracket's gap can dip slightly negative by MC noise
    assert -0.2 < out["log_z_gap"] < 0.6, out
    assert (out["mean_log_likelihood_lower"]
            <= out["mean_log_likelihood_upper"] + 0.2)
    assert 1.0 <= out["ess_fwd"] <= 256.0
    with pytest.raises(ValueError, match="init"):
        log_z_bracket(rbm.params, cfg, data[:64], init="nope")


def test_dbn_bound_single_layer_equals_rbm_ais():
    """For a 1-layer stack the DBN bound IS the RBM AIS log-likelihood."""
    from mdbn_tpu.analysis.ais import dbn_log_likelihood_bound

    data = bars_and_stripes(256, side=4, seed=4)
    cfg = RBMConfig(n_visible=16, n_hidden=12, lr=0.3, epochs=20, batch_size=16,
                    engine="xla", seed=0)
    rbm = RBM(cfg).train(data)
    ll = log_likelihood(rbm.params, cfg, data[:64], key=jax.random.PRNGKey(9),
                        n_chains=128, n_betas=1000)
    bd = dbn_log_likelihood_bound([(rbm.params, cfg)], data[:64],
                                  key=jax.random.PRNGKey(9),
                                  n_chains=128, n_betas=1000)
    np.testing.assert_allclose(bd["mean_log_likelihood_bound"],
                               ll["mean_log_likelihood"], rtol=1e-6)


def test_dbn_bound_is_lower_bound_on_enumerable_model():
    """2-layer DBN small enough to evaluate log p(v) exactly:
    p(v) = sum_h1 p(v|h1) p_top(h1). The S&M bound must sit at or below the
    exact value (within MC error) and within a few nats of it."""
    from mdbn_tpu.analysis.ais import dbn_log_likelihood_bound
    from mdbn_tpu.config import DBNConfig
    from mdbn_tpu.models.dbn import DBN

    data = bars_and_stripes(512, side=3, seed=5)  # V = 9
    dcfg = DBNConfig(layer_sizes=[10, 8], visible="bernoulli", lr=0.3,
                     epochs=25, batch_size=16, engine="xla", seed=0)
    dbn = DBN(dcfg).train(data)
    (p1, c1), (p2, c2) = [(r.params, r.cfg) for r in dbn.layers]

    test = data[:64]
    out = dbn_log_likelihood_bound([(p1, c1), (p2, c2)], test,
                                   key=jax.random.PRNGKey(11),
                                   n_samples=64, n_chains=256, n_betas=2000)

    # exact: enumerate h1 (2^10) and h2 (2^8)
    from mdbn_tpu.analysis.ais import exact_log_z
    from scipy.special import logsumexp

    W1, b1, cc1 = (np.asarray(a, np.float64) for a in (p1.W, p1.b, p1.c))
    h1s = ((np.arange(2 ** 10)[:, None] >> np.arange(10)) & 1).astype(np.float64)
    log_z_top = exact_log_z(p2)
    # log p_top(h1) = -F_top(h1) - log Z_top
    from mdbn_tpu.core.rbm_math import free_energy

    fe_top = np.asarray(free_energy(p2, jnp.asarray(h1s, jnp.float32), c2),
                        np.float64)
    log_p_top = -fe_top - log_z_top
    # log p(v | h1): factorial Bernoulli with mean sigmoid(W1 h1 + b1);
    # v log(s) + (1-v) log(1-s) = v.pre - softplus(pre)
    pre = h1s @ W1.T + b1  # [2^10, 9]
    x = np.asarray(test, np.float64)  # [64, 9]
    logp_vh = (x @ pre.T) - np.logaddexp(0.0, pre).sum(axis=1)[None, :]
    exact_ll = float(np.mean(logsumexp(logp_vh + log_p_top[None, :], axis=1)))

    bound = out["mean_log_likelihood_bound"]
    mc = 3 * out["mc_std"] + 0.2  # MC + AIS slack
    assert bound <= exact_ll + mc, (bound, exact_ll)
    assert bound >= exact_ll - 5.0, (bound, exact_ll)  # tight-ish, not vacuous


def test_labeled_ais_matches_exact_log_z():
    """AIS over the associative label top's one-hot-restricted support
    reproduces exact enumeration; the restriction must make Z strictly
    smaller than the unrestricted-Bernoulli exact_log_z."""
    from mdbn_tpu.analysis.ais import ais_log_z_labeled, exact_log_z_labeled

    n_code, C = 8, 3
    params = random_params(n_code + C, 6, 0.5, seed=3)
    exact = exact_log_z_labeled(params, n_code, C)
    assert exact < exact_log_z(params)
    a_base = jnp.zeros(n_code + C, jnp.float32)
    est, logw = ais_log_z_labeled(params, a_base, n_code,
                                  jax.random.PRNGKey(2),
                                  n_chains=256, n_betas=2000)
    assert abs(float(est) - exact) < 0.2, (float(est), exact)
    assert logw.shape == (256,)
    # validation of the validators: n_code mismatch must raise
    with pytest.raises(ValueError, match="expected"):
        exact_log_z_labeled(params, n_code + 1, C)


# ---------------------------------------------------------------------------
# Round 4 (VERDICT r3 #3): SMC adaptive resampling inside the anneal —
# ESS-triggered multinomial resampling (Del Moral et al. 2006) attacks the
# measured forward-ESS ~ 1 weight collapse on the flagship model while
# keeping the Z estimate unbiased.


def test_smc_ais_matches_exact_log_z_and_resamples():
    """SMC AIS reproduces exact log Z on enumerable models. resample_ess
    high enough to actually TRIGGER (n_resamples asserted > 0 via the
    bracket's diagnostic below; here: estimate parity at an aggressive 0.9
    threshold which resamples many times)."""
    params = random_params(12, 8, 0.5, seed=0)
    exact = exact_log_z(params)
    a_base = jnp.zeros(12, jnp.float32)
    est, logw = ais_log_z(params, a_base, jax.random.PRNGKey(1),
                          n_chains=256, n_betas=2000, resample_ess=0.9)
    assert abs(float(est) - exact) < 0.15, (float(est), exact)
    # post-resample weights are the final epoch's only: near-uniform, so
    # their ESS is a large fraction of the population (the collapse fix)
    from mdbn_tpu.analysis.ais import _ess
    assert float(_ess(logw)) > 128.0


def test_smc_gaussian_ais_matches_exact_log_z():
    from mdbn_tpu.analysis.ais import ais_log_z_gaussian, exact_log_z_gaussian

    params = random_params(12, 8, 0.3, seed=2)
    exact = exact_log_z_gaussian(params)
    est, _ = ais_log_z_gaussian(params, jnp.zeros(12, jnp.float32),
                                jax.random.PRNGKey(3), n_chains=256,
                                n_betas=2000, resample_ess=0.9)
    assert abs(float(est) - exact) < 0.2, (float(est), exact)


def test_smc_reverse_ais_matches_exact_log_z():
    """The descending (reverse) anneal accepts the same SMC machinery."""
    from mdbn_tpu.analysis.ais import exact_sample, reverse_ais_log_z

    params = random_params(12, 8, 0.5, seed=0)
    exact = exact_log_z(params)
    a_base = jnp.zeros(12, jnp.float32)
    v1 = exact_sample(params, 256, seed=4)
    est, _ = reverse_ais_log_z(params, a_base, v1, jax.random.PRNGKey(5),
                               n_betas=2000, resample_ess=0.9)
    assert abs(float(est) - exact) < 0.15, (float(est), exact)


def test_smc_bracket_triggers_and_sandwiches_exact():
    """Bracket with SMC on a TRAINED multimodal model (bars-and-stripes —
    well-separated modes are what degrade plain-AIS weights) under a
    deliberately coarse anneal: resampling must actually FIRE
    (n_resamples_fwd > 0), the final-epoch ESS must recover far above the
    plain run's degraded value, and the bracket must still sandwich the
    exact log Z. The plain run at the same budget is the control: measured
    here, ESS 92/256 plain vs ~200/256 post-resample."""
    from mdbn_tpu.analysis.ais import log_z_bracket

    data = bars_and_stripes(512, side=4, seed=1)
    cfg = RBMConfig(n_visible=16, n_hidden=12, lr=0.5, epochs=60,
                    batch_size=16, engine="xla", seed=0)
    rbm = RBM(cfg).train(data)
    exact = exact_log_z(rbm.params)
    # uniform base (NOT the data base rates) + 100 betas: the coarse anneal
    # that degrades plain AIS on this model
    base = jnp.full((1, 16), 0.5, jnp.float32)
    plain = log_z_bracket(rbm.params, cfg, data[:64], base_data=base,
                          key=jax.random.PRNGKey(7), n_chains=256,
                          n_betas=100)
    smc = log_z_bracket(rbm.params, cfg, data[:64], base_data=base,
                        key=jax.random.PRNGKey(7), n_chains=256,
                        n_betas=100, resample_ess=0.7)
    assert plain["n_resamples_fwd"] == 0
    assert smc["n_resamples_fwd"] > 0
    assert smc["ess_fwd"] > 1.5 * plain["ess_fwd"], (smc, plain)
    assert smc["log_z_lower"] - 0.5 <= exact <= smc["log_z_upper"] + 0.5, (
        smc, exact)
    assert smc["log_z_gap"] < 1.0, smc
