"""Cox proportional hazards (Breslow ties, Newton-Raphson).

Validation strategy: the score test of the Cox model at beta=0 for a
tie-free 2-group indicator IS the log-rank test — an exact cross-check
between two independent implementations in this package. Plus planted
hazard-ratio recovery, invariances, and likelihood-ratio sanity.
"""

import numpy as np
import pytest

from mdbn_tpu.analysis.survival import (
    cox_ph,
    cox_ph_clusters,
    logrank_test,
    synthetic_survival,
)


def _tie_free(times, rng):
    """Break ties by adding distinct tiny jitter."""
    return times + rng.permutation(len(times)) * 1e-9


def test_score_test_equals_logrank_two_groups():
    """No ties, 2 groups: Cox score chi2 at beta=0 == exact log-rank chi2."""
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 150)
    times, events = synthetic_survival(labels, mean_survival=(1.0, 2.5),
                                       seed=1)
    times = _tie_free(times, rng)
    lr = logrank_test(times, events, labels)
    cox = cox_ph(times, events, (labels == 1).astype(float))
    assert cox["score_chi2"] == pytest.approx(lr["chi2"], rel=1e-8)
    assert cox["score_p"] == pytest.approx(lr["p_value"], rel=1e-6)


def test_recovers_planted_hazard_ratio():
    """Exponential survival with hazard ratio 3 between groups: beta-hat
    within the Wald CI of log(3), large n, no censoring."""
    rng = np.random.default_rng(2)
    n = 4000
    g = rng.integers(0, 2, n)
    hr = 3.0
    t = rng.exponential(1.0 / np.where(g == 1, hr, 1.0))
    out = cox_ph(_tie_free(t, rng), np.ones(n, int), g.astype(float))
    assert out["converged"]
    b = out["beta"][0]
    assert abs(b - np.log(hr)) < 3 * out["se"][0]
    assert out["ci95_low"][0] < hr < out["ci95_high"][0]
    assert out["lr_p"] < 1e-10 and out["p_wald"][0] < 1e-10


def test_null_covariate_is_null():
    """A covariate independent of survival: p-values are uniform-ish, beta
    small; LR and Wald agree about non-significance."""
    rng = np.random.default_rng(3)
    n = 500
    t = rng.exponential(1.0, n)
    x = rng.normal(0, 1, n)
    out = cox_ph(_tie_free(t, rng), np.ones(n, int), x)
    assert abs(out["beta"][0]) < 0.15
    assert out["p_wald"][0] > 0.01 and out["lr_p"] > 0.01
    # null model: ll at beta-hat barely beats ll0
    assert out["lr_chi2"] < 7.0


def test_invariances_and_multivariate():
    rng = np.random.default_rng(4)
    n = 300
    g = rng.integers(0, 2, n)
    age = rng.normal(60, 10, n)
    t = rng.exponential(1.0 / np.exp(0.8 * g + 0.02 * (age - 60)))
    t = _tie_free(t, rng)
    e = np.ones(n, int)
    X = np.stack([g.astype(float), age], axis=1)
    out = cox_ph(t, e, X)
    # shifting a covariate leaves beta unchanged (centering invariance)
    X2 = X.copy()
    X2[:, 1] += 1000.0
    out2 = cox_ph(t, e, X2)
    np.testing.assert_allclose(out["beta"], out2["beta"], atol=1e-6)
    # permuting patients leaves everything unchanged
    perm = rng.permutation(n)
    out3 = cox_ph(t[perm], e[perm], X[perm])
    np.testing.assert_allclose(out["beta"], out3["beta"], atol=1e-8)
    # both planted effects detected with the right sign
    assert out["beta"][0] > 0.3 and out["beta"][1] > 0.005


def test_censoring_handled():
    """Heavy censoring shrinks information (wider CI) but not the estimand."""
    rng = np.random.default_rng(5)
    n = 3000
    g = rng.integers(0, 2, n)
    t = rng.exponential(1.0 / np.where(g == 1, 2.0, 1.0))
    t = _tie_free(t, rng)
    cens = rng.random(n) < 0.5
    t_obs = np.where(cens, t * rng.random(n), t)
    e = (~cens).astype(int)
    out = cox_ph(t_obs, e, g.astype(float))
    assert out["ci95_low"][0] < 2.0 < out["ci95_high"][0]
    out_full = cox_ph(t, np.ones(n, int), g.astype(float))
    assert out["se"][0] > out_full["se"][0]


def test_cluster_wrapper_and_errors():
    rng = np.random.default_rng(6)
    labels = rng.integers(0, 3, 200)
    times, events = synthetic_survival(labels, seed=2)
    times = _tie_free(times, rng)
    out = cox_ph_clusters(times, events, labels, baseline=0)
    assert out["clusters"] == ["cluster_1_vs_0", "cluster_2_vs_0"]
    # planted mean survival (1, 2, 4) -> hazards (1, 1/2, 1/4): HRs < 1
    assert out["hazard_ratio"][0] < 1.0 and out["hazard_ratio"][1] < 1.0
    assert out["hazard_ratio"][1] < out["hazard_ratio"][0]
    # adjusted: an extra covariate column is carried through
    age = rng.normal(0, 1, 200)
    out2 = cox_ph_clusters(times, events, labels, extra_covariates=age)
    assert len(out2["beta"]) == 3 and out2["clusters"][-1] == "covariate_0"

    with pytest.raises(ValueError, match="baseline"):
        cox_ph_clusters(times, events, labels, baseline=9)
    with pytest.raises(ValueError, match=">= 2 distinct"):
        cox_ph_clusters(times, events, np.zeros(200, int))
    with pytest.raises(ValueError, match="no observed events"):
        cox_ph(times, np.zeros(200, int), labels.astype(float))
    with pytest.raises(ValueError, match="rows"):
        cox_ph(times, events, np.ones((7, 3)))


def test_breslow_ties_run():
    """Tied event times (integer grid) still converge and stay sane."""
    rng = np.random.default_rng(7)
    g = rng.integers(0, 2, 300)
    t = np.ceil(rng.exponential(1.0 / np.where(g == 1, 2.0, 1.0)) * 4)
    out = cox_ph(t, np.ones(300, int), g.astype(float))
    assert out["converged"] and 1.2 < out["hazard_ratio"][0] < 3.5


def test_cli_survival_cox(tmp_path):
    """CLI survival {"cox": true}: hazard ratios recorded next to log-rank."""
    import json

    from mdbn_tpu.config import RBMConfig, save_config
    from mdbn_tpu.run import main

    save_config({
        "model": RBMConfig(n_visible=784, n_hidden=32, epochs=4,
                           batch_size=20, engine="xla", seed=0),
        "data": {"kind": "mnist_like", "n_samples": 150, "n_prototypes": 3,
                 "seed": 3},
        "analysis": {"kmeans": 3, "survival": {"cox": True}},
    }, str(tmp_path / "exp.json"))
    assert main(["--config", str(tmp_path / "exp.json"),
                 "--metrics", str(tmp_path / "m.jsonl")]) == 0
    recs = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    km = [r for r in recs if r["kind"] == "kmeans"]
    assert km and "logrank" in km[0] and "cox" in km[0]
    cox = km[0]["cox"]
    assert len(cox["hazard_ratio"]) == 2 and cox["converged"]
