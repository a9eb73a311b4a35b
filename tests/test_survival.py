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
    times, events = synthetic_survival(labels, hazard_scale=(1.0, 3.0, 9.0), seed=1)
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
