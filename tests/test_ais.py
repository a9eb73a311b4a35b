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


def test_ais_rejects_gaussian():
    cfg = RBMConfig(n_visible=4, n_hidden=2, visible="gaussian")
    params = random_params(4, 2, 0.1, seed=0)
    with pytest.raises(ValueError, match="bernoulli"):
        log_likelihood(params, cfg, jnp.zeros((2, 4)))
