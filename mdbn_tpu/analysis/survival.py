"""Survival analysis of patient clusters: Kaplan-Meier + log-rank test.

Completes the Liang et al. 2015 pipeline (SURVEY.md §1 L4: "in the paper:
survival / log-rank evaluation of clusters"): after k-means on the MDBN's
joint latent codes, evaluate whether the discovered patient subgroups differ
in survival. Pure NumPy/SciPy — no external survival package needed.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def kaplan_meier(times: np.ndarray, events: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Kaplan-Meier estimator. ``times`` >= 0; ``events`` 1 = death observed,
    0 = censored. Returns (unique_event_times, survival_probability)."""
    times = np.asarray(times, float)
    events = np.asarray(events, int)
    order = np.argsort(times)
    times, events = times[order], events[order]
    uniq = np.unique(times[events == 1])
    surv = []
    s = 1.0
    for t in uniq:
        at_risk = np.sum(times >= t)
        deaths = np.sum((times == t) & (events == 1))
        s *= 1.0 - deaths / at_risk
        surv.append(s)
    return uniq, np.asarray(surv)


def logrank_test(times: np.ndarray, events: np.ndarray, groups: np.ndarray,
                 method: str = "exact") -> Dict[str, float]:
    """K-group log-rank test (chi-square with K-1 dof).

    ``method="exact"`` (default) is the standard variance-normalized
    statistic: at each distinct event time the group death counts follow a
    multivariate hypergeometric distribution under the null, giving
    covariance ``V_jk = sum_t d_t (n_t-d_t)/(n_t-1) *
    (delta_jk n_kt/n_t - n_jt n_kt/n_t^2)``; the statistic is
    ``(O-E)' V^- (O-E)`` over the first K-1 groups (Liang et al. 2015 report
    log-rank this way). ``method="approx"`` is the conservative
    sum-of-(O-E)^2/E construction, kept as a cross-check.
    """
    from scipy import stats

    times = np.asarray(times, float)
    events = np.asarray(events, int)
    groups = np.asarray(groups)
    labels = np.unique(groups)
    K = len(labels)
    if K < 2:
        raise ValueError("log-rank test needs >= 2 groups")
    if method not in ("exact", "approx"):
        raise ValueError(f"method must be 'exact' or 'approx', got {method!r}")

    event_times = np.unique(times[events == 1])
    O = np.zeros(K)
    E = np.zeros(K)
    V = np.zeros((K, K))
    for t in event_times:
        at_risk = times >= t
        n_t = at_risk.sum()
        d_t = ((times == t) & (events == 1)).sum()
        n_kt = np.array([(at_risk & (groups == g)).sum() for g in labels], float)
        O += np.array([((times == t) & (events == 1) & (groups == g)).sum()
                       for g in labels], float)
        E += d_t * n_kt / n_t
        if n_t > 1:
            frac = n_kt / n_t
            V += (d_t * (n_t - d_t) / (n_t - 1)) * (np.diag(frac) - np.outer(frac, frac))
    dof = K - 1
    if method == "approx":
        valid = E > 0
        chi2 = float(np.sum((O[valid] - E[valid]) ** 2 / E[valid]))
    else:
        # drop the last group: (O-E) sums to 0, so V is singular over all K
        z = (O - E)[:dof]
        chi2 = float(z @ np.linalg.pinv(V[:dof, :dof]) @ z)
    p = float(stats.chi2.sf(chi2, dof))
    return {"chi2": chi2, "dof": dof, "p_value": p, "method": method,
            "observed": O.tolist(), "expected": E.tolist()}


def synthetic_survival(labels: np.ndarray, mean_survival: Tuple[float, ...] = (1.0, 2.0, 4.0),
                       censor_rate: float = 0.2, seed: int = 0
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Planted-survival generator for tests/demos: exponential survival times
    with a per-cluster MEAN survival time (= 1/hazard; numpy's exponential
    ``scale``) + uniform censoring. Clusters beyond ``len(mean_survival)``
    get the geometric extension (each further cluster doubles the last given
    mean) so distinct planted clusters never silently share a distribution."""
    rng = np.random.default_rng(seed)
    labels = np.asarray(labels)
    n_groups = int(labels.max()) + 1 if len(labels) else 0
    scales = list(map(float, mean_survival))
    while len(scales) < n_groups:
        scales.append(scales[-1] * 2.0)
    scales = np.asarray(scales, float)
    t = rng.exponential(scales[labels])
    censored = rng.random(len(t)) < censor_rate
    t = np.where(censored, t * rng.random(len(t)), t)
    return t, (~censored).astype(int)
