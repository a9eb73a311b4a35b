"""Annealed importance sampling for RBM partition functions.

Salakhutdinov & Murray, "On the quantitative analysis of deep belief
networks" (ICML 2008): estimate log Z of a trained Bernoulli RBM by annealing
from a base-rate RBM (W=0, hidden biases 0, visible biases fitted to the data
marginals) through K intermediate distributions, then report test-set
log-likelihood as ``mean(-F(v)) - log Z``.

Beyond the reference's capabilities (it never evaluates likelihood), but the
standard tool its research users need. Bernoulli visible only. Runs fully
jitted: all chains advance in parallel, the anneal is one ``lax.scan``.
``exact_log_z`` (brute-force over hidden states) validates AIS in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig
from ..core.rbm_math import RBMParams, free_energy


def base_rate_biases(data: jax.Array, eps: float = 1e-2) -> jax.Array:
    """Visible biases of the base-rate model: logit of smoothed data marginals."""
    p = jnp.clip(jnp.mean(data, axis=0), eps, 1.0 - eps)
    return jnp.log(p) - jnp.log1p(-p)


@partial(jax.jit, static_argnums=(3, 4))
def ais_log_z(
    params: RBMParams,
    a_base: jax.Array,  # [V] base-rate visible biases
    key: jax.Array,
    n_chains: int = 256,
    n_betas: int = 1000,
) -> Tuple[jax.Array, jax.Array]:
    """Estimate log Z of a Bernoulli RBM. Returns (log_z_estimate, log_weights).

    Interpolation: p_beta(v) ∝ exp((1-beta) a_A.v) * exp(beta a_B.v)
                               * prod_j (1 + exp(beta (W.v + c)_j)).
    """
    V, H = params.W.shape
    a_B, c = params.b, params.c
    betas = jnp.linspace(0.0, 1.0, n_betas)

    def log_p_star(v, beta):
        quad = (1.0 - beta) * (v @ a_base) + beta * (v @ a_B)
        hid = jnp.sum(jax.nn.softplus(beta * (v @ params.W + c)), axis=1)
        return quad + hid

    k0, kscan = jax.random.split(key)
    # exact sample from the base-rate model
    p0 = jax.nn.sigmoid(a_base)
    v = (jax.random.uniform(k0, (n_chains, V)) < p0).astype(params.W.dtype)
    logw = jnp.zeros(n_chains, jnp.float32)

    def step(carry, xs):
        v, logw = carry
        beta_prev, beta, k = xs
        logw = logw + log_p_star(v, beta) - log_p_star(v, beta_prev)
        # Gibbs transition at beta
        kh, kv = jax.random.split(k)
        hp = jax.nn.sigmoid(beta * (v @ params.W + c))
        h = (jax.random.uniform(kh, hp.shape) < hp).astype(v.dtype)
        vp = jax.nn.sigmoid((1.0 - beta) * a_base + beta * (h @ params.W.T + a_B))
        v = (jax.random.uniform(kv, vp.shape) < vp).astype(v.dtype)
        return (v, logw), None

    keys = jax.random.split(kscan, n_betas - 1)
    (v, logw), _ = jax.lax.scan(step, (v, logw),
                                (betas[:-1], betas[1:], keys))

    # log Z_A: base-rate RBM with H hidden units at beta=0 contributes 2^H
    log_z_a = jnp.sum(jax.nn.softplus(a_base)) + H * jnp.log(2.0)
    log_z = log_z_a + jax.scipy.special.logsumexp(logw) - jnp.log(n_chains)
    return log_z, logw


def exact_log_z(params: RBMParams) -> float:
    """Brute-force log Z by enumerating hidden states (H <= ~16 only).

    Z = sum_h exp(c.h) prod_i (1 + exp(b_i + (W h)_i)).
    """
    import numpy as np

    W = np.asarray(params.W)
    b = np.asarray(params.b)
    c = np.asarray(params.c)
    V, H = W.shape
    if H > 16:
        raise ValueError("exact enumeration needs n_hidden <= 16")
    hs = ((np.arange(2 ** H)[:, None] >> np.arange(H)) & 1).astype(np.float64)
    quad = hs @ c.astype(np.float64)
    soft = np.logaddexp(0.0, b.astype(np.float64)[None, :]
                        + hs @ W.astype(np.float64).T).sum(axis=1)
    from scipy.special import logsumexp

    return float(logsumexp(quad + soft))


def log_likelihood(
    params: RBMParams,
    cfg: RBMConfig,
    data: jax.Array,
    key: Optional[jax.Array] = None,
    n_chains: int = 256,
    n_betas: int = 1000,
    base_data: Optional[jax.Array] = None,
) -> dict:
    """Mean test log-likelihood via AIS: mean(-F(v)) - log Z."""
    if cfg.visible != "bernoulli":
        raise ValueError("AIS log-likelihood is implemented for bernoulli "
                         "visible units only")
    if key is None:
        key = jax.random.PRNGKey(0)
    data = jnp.asarray(data, params.W.dtype)
    a_base = base_rate_biases(base_data if base_data is not None else data)
    log_z, logw = ais_log_z(params, a_base, key, n_chains, n_betas)
    mean_neg_fe = -jnp.mean(free_energy(params, data, cfg))
    return {
        "log_z": float(log_z),
        "mean_log_likelihood": float(mean_neg_fe - log_z),
        "logw_std": float(jnp.std(logw)),
    }
