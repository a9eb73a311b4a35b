"""Generative sampling tests: trained-model Gibbs chains must produce samples
that the model assigns data-like free energy (and that look like the data
distribution on bars-and-stripes, where valid patterns are enumerable)."""

import numpy as np

import jax.numpy as jnp

from mdbn_tpu.config import DBNConfig, MDBNConfig, RBMConfig
from mdbn_tpu.data.synthetic import bars_and_stripes, tcga_like
from mdbn_tpu.models.dbn import DBN
from mdbn_tpu.models.mdbn import MDBN
from mdbn_tpu.models.rbm import RBM


def test_rbm_sample_matches_data_energy():
    data = bars_and_stripes(512, side=4, seed=1)
    cfg = RBMConfig(n_visible=16, n_hidden=16, lr=0.3, epochs=30, batch_size=16,
                    engine="xla", seed=0)
    rbm = RBM(cfg).train(data)
    samples = np.asarray(rbm.sample(n_samples=64, n_gibbs=500, seed=3))
    assert samples.shape == (64, 16)
    assert ((samples >= 0) & (samples <= 1)).all()
    # free energy of hard-thresholded samples should be near the data's and
    # far below random noise
    fe = lambda v: float(np.mean(np.asarray(rbm.free_energy(v))))
    rng = np.random.default_rng(0)
    noise = (rng.random((64, 16)) < 0.5).astype(np.float32)
    hard = (samples > 0.5).astype(np.float32)
    assert fe(hard) < fe(noise) - 2.0
    assert abs(fe(hard) - fe(data[:64])) < 0.5 * abs(fe(noise) - fe(data[:64]))


def test_dbn_generate_shape():
    data = bars_and_stripes(256, side=4, seed=2)
    cfg = DBNConfig(layer_sizes=[12, 8], visible="bernoulli", epochs=5,
                    batch_size=16, engine="xla", seed=0)
    dbn = DBN(cfg).train(data)
    g = np.asarray(dbn.generate(n_samples=8, n_gibbs=50, seed=1))
    assert g.shape == (8, 16)
    assert np.isfinite(g).all() and ((g >= 0) & (g <= 1)).all()


def test_mdbn_generate_modalities():
    mods, _ = tcga_like(n_patients=64, dims={"ge": 20, "meth": 12, "mirna": 8}, seed=0)
    cfg = MDBNConfig(
        towers={m: DBNConfig(layer_sizes=[8, 4], visible="gaussian", epochs=1,
                             batch_size=8, engine="xla", seed=i)
                for i, m in enumerate(mods)},
        joint=RBMConfig(n_visible=1, n_hidden=6, epochs=1, batch_size=8, engine="xla"),
    )
    mdbn = MDBN(cfg).train(mods)
    g = mdbn.generate(n_samples=5, n_gibbs=20, seed=0)
    assert set(g) == {"ge", "meth", "mirna"}
    assert np.asarray(g["ge"]).shape == (5, 20)
    for v in g.values():
        assert np.isfinite(np.asarray(v)).all()


def test_gibbs_stationary_distribution_is_boltzmann():
    """Exactness of the Gibbs sampler: on a tiny enumerable RBM (V=4), the
    long-run visible-state frequencies must match the exact Boltzmann
    marginals P(v) ∝ exp(-F(v)) (chi-square-style tolerance)."""
    import jax
    import jax.numpy as jnp
    from scipy.special import logsumexp

    from mdbn_tpu.core.rbm_math import RBMParams, free_energy
    from mdbn_tpu.ops.sample import gibbs_sample

    V, H = 4, 3
    rng = np.random.default_rng(0)
    cfg = RBMConfig(n_visible=V, n_hidden=H)
    params = RBMParams(
        W=jnp.asarray(rng.standard_normal((V, H)).astype(np.float32) * 0.7),
        b=jnp.asarray(rng.standard_normal(V).astype(np.float32) * 0.3),
        c=jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.3),
    )

    # exact marginals over all 2^V visible states
    states = ((np.arange(2 ** V)[:, None] >> np.arange(V)) & 1).astype(np.float32)
    neg_fe = -np.asarray(free_energy(params, jnp.asarray(states), cfg), np.float64)
    p_exact = np.exp(neg_fe - logsumexp(neg_fe))

    # empirical: many parallel chains, long burn-in, final sampled state
    n_chains = 4096
    v0 = (np.random.default_rng(1).random((n_chains, V)) < 0.5).astype(np.float32)
    _, v = gibbs_sample(params, jnp.asarray(v0), jax.random.PRNGKey(2), cfg, 300)
    idx = (np.asarray(v).astype(int) * (2 ** np.arange(V))).sum(axis=1)
    p_emp = np.bincount(idx, minlength=2 ** V) / n_chains

    # multinomial noise at n=4096: se per state <= ~0.008; allow 5 sigma
    np.testing.assert_allclose(p_emp, p_exact, atol=0.04)
    # and the distribution must be far from uniform (the test has teeth)
    assert np.abs(p_exact - 1 / 2 ** V).max() > 0.05
