"""Survival analysis (Kaplan-Meier, log-rank) — the paper pipeline's cluster
evaluation (SURVEY.md §1 L4)."""

import numpy as np
import pytest

from mdbn_tpu.analysis.survival import kaplan_meier, logrank_test, synthetic_survival


def test_km_no_censoring_matches_empirical():
    times = np.array([1, 2, 3, 4, 5], float)
    events = np.ones(5, int)
    t, s = kaplan_meier(times, events)
    np.testing.assert_allclose(s, [0.8, 0.6, 0.4, 0.2, 0.0])


def test_km_with_censoring():
    # classic textbook check: censored subjects leave the risk set
    times = np.array([1, 2, 2, 3], float)
    events = np.array([1, 0, 1, 1], int)
    t, s = kaplan_meier(times, events)
    # t=1: 3/4 survive; t=2: one censored at 2 still at risk at t=2 -> (1-1/3);
    # t=3: (1-1/1)
    np.testing.assert_allclose(s, [0.75, 0.75 * (1 - 1 / 3), 0.0])


def test_logrank_separates_planted_hazards():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 3, 300)
    times, events = synthetic_survival(labels, mean_survival=(1.0, 3.0, 9.0), seed=1)
    out = logrank_test(times, events, labels)
    assert out["p_value"] < 1e-6
    assert out["dof"] == 2


def test_logrank_null_is_calibrated():
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 2, 400)
    times = rng.exponential(2.0, 400)  # same hazard for everyone
    events = np.ones(400, int)
    out = logrank_test(times, events, labels)
    assert out["p_value"] > 0.01


def test_logrank_needs_two_groups():
    with pytest.raises(ValueError, match="2 groups"):
        logrank_test(np.ones(5), np.ones(5, int), np.zeros(5))


def test_logrank_exact_matches_hand_computed_two_group():
    """Alternating-death example, worked by hand:
    A={1,3,5}, B={2,4,6}, all events. O_A=3, E_A=0.5+0.4+0.5+1/3+0.5,
    V=0.25+0.24+0.25+2/9+0.25 (t=6 has n_t=1, zero variance) ->
    chi2 = (3-2.23333)^2 / 1.212222 = 0.48488."""
    times = np.array([1, 3, 5, 2, 4, 6], float)
    events = np.ones(6, int)
    groups = np.array([0, 0, 0, 1, 1, 1])
    out = logrank_test(times, events, groups)
    assert out["method"] == "exact"
    np.testing.assert_allclose(out["chi2"], 0.4848811, rtol=1e-5)
    assert out["dof"] == 1
    np.testing.assert_allclose(out["observed"], [3, 3])
    np.testing.assert_allclose(out["expected"][0], 2.2333333, rtol=1e-6)


def test_logrank_exact_vs_approx_cross_check():
    """The approximation is conservative: approx chi2 <= exact chi2 on a
    separated example, and both detect the planted hazard difference."""
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 2, 200)
    times, events = synthetic_survival(labels, mean_survival=(1.0, 5.0), seed=3)
    exact = logrank_test(times, events, labels, method="exact")
    approx = logrank_test(times, events, labels, method="approx")
    assert exact["p_value"] < 1e-4 and approx["p_value"] < 1e-3
    assert approx["chi2"] <= exact["chi2"] * 1.05  # conservative (small slack)
