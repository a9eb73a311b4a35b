"""Learned-variance Gaussian-Bernoulli RBM (cfg.learn_variance).

The Cho/Krizhevsky GRBM parameterization with z = log sigma^2 learned by
CD alongside W/b/c (Cho, Ilin & Raiko, ICANN 2011). Held to the same
standards as every other estimator in the package: exact NumPy-oracle
parity under injected uniforms, exact log-Z enumeration vs AIS, planted
ground-truth recovery, GSPMD-dp equivalence, and loud engine/phase gates
everywhere the sigma scaling cannot be honored.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdbn_tpu import oracle as O
from mdbn_tpu.config import DBNConfig, RBMConfig
from mdbn_tpu.core.rbm_math import (RBMParams, apply_update, cd_step_stats,
                                    pt_step_stats, zero_velocity)
from mdbn_tpu.core.state import init_train_state
from mdbn_tpu.models.rbm import RBM
from mdbn_tpu.parallel.mesh import make_mesh
from mdbn_tpu.train.trainer import train_rbm


def _rand_params(rng, V, H, with_z=True, scale=0.3):
    p = {
        "W": (rng.standard_normal((V, H)) * scale).astype(np.float32),
        "b": (rng.standard_normal(V) * scale).astype(np.float32),
        "c": (rng.standard_normal(H) * scale).astype(np.float32),
    }
    if with_z:
        p["z"] = (rng.standard_normal(V) * scale).astype(np.float32)
    return p


def _to_jax(p):
    return RBMParams(W=jnp.asarray(p["W"]), b=jnp.asarray(p["b"]),
                     c=jnp.asarray(p["c"]),
                     z=jnp.asarray(p["z"]) if "z" in p else None)


def _planted_data(n=600, sig=(0.5, 2.0), V=16, seed=0):
    rng = np.random.default_rng(seed)
    sigma = np.array([sig[0]] * (V // 2) + [sig[1]] * (V - V // 2))
    return (rng.standard_normal((n, V)) * sigma).astype(np.float32), sigma


# ---------------------------------------------------------------- parity --

@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("sample_visible", [True, False])
@pytest.mark.parametrize("persistent", [False, True])
def test_cd_step_oracle_parity(k, sample_visible, persistent):
    """Injected-uniform exact parity of grads (incl. z), chain, and err."""
    cfg = RBMConfig(n_visible=12, n_hidden=6, visible="gaussian",
                    learn_variance=True, k=k, persistent=persistent,
                    sample_visible=sample_visible, batch_size=8, epochs=1)
    rng = np.random.default_rng(1)
    p = _rand_params(rng, 12, 6)
    v0 = rng.standard_normal((8, 12)).astype(np.float32)
    chain = (rng.random((8, 6)) < 0.5).astype(np.float32) if persistent else None
    u = O.draw_uniforms(cfg, 8, np.random.default_rng(2))
    og, oh, oe, _ = O.cd_step_stats(p, v0, chain, u, cfg)

    ju = {kk: jnp.asarray(vv) for kk, vv in u.items()}
    jg, jh, je = cd_step_stats(_to_jax(p), jnp.asarray(v0),
                               jnp.asarray(chain) if persistent else None,
                               ju, cfg)
    np.testing.assert_allclose(np.asarray(jg.W), og["W"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(jg.b), og["b"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(jg.c), og["c"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(jg.z), og["z"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(jh), oh, atol=1e-6)
    np.testing.assert_allclose(float(je), oe, rtol=1e-5)


def test_pt_step_oracle_parity():
    """Tempered chains + swaps with learned variance, injected uniforms."""
    from mdbn_tpu.ops.cd_step import draw_pt_uniforms

    cfg = RBMConfig(n_visible=10, n_hidden=5, visible="gaussian",
                    learn_variance=True, persistent=True, pt_temps=4,
                    pt_beta_min=0.2, batch_size=6, epochs=1)
    rng = np.random.default_rng(3)
    p = _rand_params(rng, 10, 5)
    v0 = rng.standard_normal((6, 10)).astype(np.float32)
    chains = (rng.random((4, 6, 5)) < 0.5).astype(np.float32)
    # host threefry draws feed both implementations identically
    ju = draw_pt_uniforms(cfg, 6, jax.random.PRNGKey(7))
    u = {kk: np.asarray(vv) for kk, vv in ju.items()}
    og, ochains, oe = O.pt_step_stats(p, v0, chains, u, cfg)
    jg, jchains, je = pt_step_stats(_to_jax(p), jnp.asarray(v0),
                                    jnp.asarray(chains), ju, cfg)
    np.testing.assert_allclose(np.asarray(jg.W), og["W"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(jg.z), og["z"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(jchains), ochains, atol=1e-6)
    np.testing.assert_allclose(float(je), oe, rtol=1e-5)


def test_apply_update_z_uses_lr_variance():
    cfg = RBMConfig(n_visible=6, n_hidden=4, visible="gaussian",
                    learn_variance=True, lr=0.1, lr_variance=0.02,
                    momentum=0.5, l2=0.01, grad_clip=0.5, batch_size=4)
    rng = np.random.default_rng(5)
    p = _rand_params(rng, 6, 4)
    g = _rand_params(rng, 6, 4, scale=2.0)  # exercises the clip
    op, ov = {k: v.copy() for k, v in p.items()}, O.zero_velocity(p)
    O.apply_update(op, ov, {k: v.copy() for k, v in g.items()}, cfg)
    jp, jv = apply_update(_to_jax(p), zero_velocity(_to_jax(p)),
                          _to_jax(g), cfg)
    for name, jval in zip(("W", "b", "c", "z"), jp):
        np.testing.assert_allclose(np.asarray(jval), op[name], atol=1e-6,
                                   err_msg=name)


# -------------------------------------------------- ground-truth recovery --

def test_planted_variance_recovery():
    """Train on independent features with two planted sigma groups; the
    learned sigma must recover both groups (the framework's reason for the
    feature: omics matrices are not exactly unit-variance)."""
    data, sigma = _planted_data(seed=0)
    cfg = RBMConfig(n_visible=16, n_hidden=8, visible="gaussian",
                    learn_variance=True, lr=0.02, lr_variance=0.05,
                    epochs=80, batch_size=20, seed=0, engine="xla")
    rbm = RBM(cfg).train(data)
    s = np.asarray(rbm.sigma)
    lo, hi = s[:8].mean(), s[8:].mean()
    assert abs(lo - 0.5) < 0.15, f"low-sigma group: {lo}"
    assert abs(hi - 2.0) < 0.4, f"high-sigma group: {hi}"
    # and the fixed-variance model cannot represent this (control)
    assert hi / lo > 2.5


def test_z_frozen_reduces_to_fixed_variance():
    """lr_variance=0 keeps z at its init (0): one epoch of W/b/c updates
    matches the plain sigma=1 path on the same draws to XLA-fusion noise
    (~1e-7; the extra multiply-by-exp(0) changes fusion groupings, so
    bitwise equality is not expected — over many epochs that noise crosses
    sampling thresholds and trajectories legitimately fork)."""
    data, _ = _planted_data(seed=1)
    base = dict(n_visible=16, n_hidden=8, visible="gaussian", lr=0.05,
                sample_visible=True, epochs=1, batch_size=20, seed=0,
                engine="xla")
    fixed = train_rbm(data, RBMConfig(**base))[0]
    frozen = train_rbm(data, RBMConfig(**base, learn_variance=True,
                                       lr_variance=0.0))[0]
    np.testing.assert_allclose(np.asarray(frozen.params.W),
                               np.asarray(fixed.params.W), atol=1e-6)
    np.testing.assert_allclose(np.asarray(frozen.params.z),
                               np.zeros(16), atol=0)


# ------------------------------------------------------------------ AIS --

def test_exact_log_z_consistency_and_ais():
    """exact_log_z_gaussian with z=zeros == the z=None formula; AIS (forward)
    and the bracket agree with enumeration on a small learned-variance model."""
    from mdbn_tpu.analysis.ais import (ais_log_z_gaussian, exact_log_z_gaussian,
                                       log_z_bracket)

    rng = np.random.default_rng(9)
    p = _rand_params(rng, 8, 6)
    pz0 = dict(p, z=np.zeros(8, np.float32))
    lz_none = exact_log_z_gaussian(_to_jax({k: p[k] for k in ("W", "b", "c")}))
    lz_zero = exact_log_z_gaussian(_to_jax(pz0))
    np.testing.assert_allclose(lz_zero, lz_none, rtol=1e-12)

    params = _to_jax(p)
    exact = exact_log_z_gaussian(params)
    est, logw = ais_log_z_gaussian(params, jnp.zeros(8), jax.random.PRNGKey(0),
                                   n_chains=256, n_betas=3000)
    assert abs(float(est) - exact) < 0.3, (float(est), exact)

    cfg = RBMConfig(n_visible=8, n_hidden=6, visible="gaussian",
                    learn_variance=True, batch_size=4)
    data = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    br = log_z_bracket(params, cfg, data, key=jax.random.PRNGKey(1),
                       n_chains=256, n_betas=3000)
    assert br["log_z_lower"] - 0.5 < exact < br["log_z_upper"] + 0.5, (br, exact)


def test_exact_sample_matches_learned_sigma():
    """With W=0 the model is exactly N(b, sigma^2): exact_sample's empirical
    per-unit std must match exp(z/2)."""
    from mdbn_tpu.analysis.ais import exact_sample

    z = np.log(np.array([0.25, 1.0, 4.0, 9.0], np.float32))
    params = RBMParams(W=jnp.zeros((4, 3)), b=jnp.asarray([1.0, -1.0, 0.0, 2.0]),
                       c=jnp.zeros(3), z=jnp.asarray(z))
    v = exact_sample(params, 4000, seed=0, visible="gaussian")
    np.testing.assert_allclose(v.std(axis=0), np.exp(0.5 * z), rtol=0.1)
    np.testing.assert_allclose(v.mean(axis=0), np.asarray(params.b), atol=0.15)


# ------------------------------------------------------- engines / gates --

def test_engine_gating():
    """learn_variance is FUSED in the mega-kernel (round-3 late work),
    including the PT combination (round 4); only the per-step grads kernel
    still refuses."""
    from mdbn_tpu.ops.cd_epoch_pallas import (make_pallas_grads_fn,
                                              make_pallas_train_fn)

    cfg = RBMConfig(n_visible=16, n_hidden=8, visible="gaussian",
                    learn_variance=True, batch_size=8, epochs=1,
                    engine="pallas")
    data, _ = _planted_data(n=64, seed=2)
    # the mega-kernel accepts learn_variance (builds without error)
    assert make_pallas_train_fn(cfg, 1, interpret=True) is not None
    # the per-step grads kernel cannot (fixed-variance refs)
    with pytest.raises(ValueError, match="learn_variance"):
        make_pallas_grads_fn(cfg)
    # PT + learn_variance is fused too (sigma-weighted tempered swap
    # marginals; exact-parity tests in test_pallas_pt.py)
    assert make_pallas_train_fn(cfg.replace(persistent=True, pt_temps=3,
                                            pt_beta_min=0.2), 1,
                                interpret=True) is not None
    # engine='pallas' on the CPU backend still refuses the zero-bits
    # interpreter (same rule as plain CD)
    with pytest.raises(ValueError, match="interpreter"):
        train_rbm(data, cfg)
    # auto on CPU routes to xla
    state, metrics = train_rbm(data, cfg.replace(engine="auto", epochs=2))
    assert metrics.engine == "xla"


def test_config_validation():
    with pytest.raises(ValueError, match="gaussian"):
        RBMConfig(n_visible=4, n_hidden=2, learn_variance=True)
    with pytest.raises(ValueError, match="enhanced"):
        RBMConfig(n_visible=4, n_hidden=2, visible="gaussian",
                  learn_variance=True, gradient="enhanced")
    with pytest.raises(ValueError, match="lr_variance"):
        RBMConfig(n_visible=4, n_hidden=2, visible="gaussian",
                  lr_variance=0.1)


def test_phase2_guards():
    """Unrolled-weight phases refuse learn_variance layers loudly."""
    from mdbn_tpu.train.autoencoder import finetune_autoencoder_stack
    from mdbn_tpu.train.updown import finetune_updown_stack

    cfg0 = RBMConfig(n_visible=16, n_hidden=8, visible="gaussian",
                     learn_variance=True, batch_size=8)
    cfg1 = RBMConfig(n_visible=8, n_hidden=4, batch_size=8)
    layers = [(init_train_state(cfg0).params, cfg0),
              (init_train_state(cfg1).params, cfg1)]
    data = jnp.zeros((32, 16))
    with pytest.raises(ValueError, match="learn_variance"):
        finetune_updown_stack(layers, data, epochs=1)
    with pytest.raises(ValueError, match="learn_variance"):
        finetune_autoencoder_stack(layers, data, epochs=1)
    from mdbn_tpu.analysis.ais import exact_dbn_log_likelihood
    with pytest.raises(ValueError, match="learn_variance"):
        exact_dbn_log_likelihood(layers, np.zeros((4, 16), np.float32))


# ------------------------------------------------- fused Pallas kernel --

def _host_replay(cfg, st0, data, uniforms, n_epochs):
    """XLA-engine replay of an inject-mode kernel run (same draws)."""
    nb = data.shape[0] // cfg.batch_size
    st = st0
    errs = []
    for e in range(n_epochs):
        es = []
        for i in range(nb):
            v0 = jnp.asarray(data[i * cfg.batch_size:(i + 1) * cfg.batch_size])
            ui = {k: uniforms[k][e, i] for k in uniforms}
            grads, chain, err = cd_step_stats(
                st.params, v0, st.chain_h if cfg.persistent else None, ui, cfg)
            p, vel = apply_update(st.params, st.velocity, grads, cfg, epoch=e)
            st = st._replace(params=p, velocity=vel,
                             chain_h=chain if cfg.persistent else st.chain_h)
            es.append(float(err))
        errs.append(float(np.mean(es)))
    return st, np.asarray(errs)


@pytest.mark.parametrize("persistent,momentum,sample_visible",
                         [(False, 0.0, True), (True, 0.5, True),
                          (False, 0.0, False)])
def test_fused_kernel_lv_inject_parity(persistent, momentum, sample_visible):
    """The mega-kernel's fused learn_variance path == the XLA engine on the
    same injected draws (CD, PCD+momentum, and the Rao-Blackwellized
    mean-field branch), via the CPU interpreter."""
    from mdbn_tpu.ops.cd_epoch_pallas import (draw_uniform_blocks,
                                              make_pallas_train_fn)

    data, _ = _planted_data(n=80, seed=0)
    cfg = RBMConfig(n_visible=16, n_hidden=8, visible="gaussian",
                    learn_variance=True, lr=0.02, lr_variance=0.05,
                    persistent=persistent, momentum=momentum,
                    sample_visible=sample_visible, epochs=2, batch_size=8,
                    seed=0, matmul_precision="highest")
    fn = make_pallas_train_fn(cfg, 2, interpret=True, inject=True)
    st0 = init_train_state(cfg)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(5), 2, 10)
    st1, errs = fn(st0, jnp.asarray(data), u)
    st_h, errs_h = _host_replay(cfg, st0, data, u, 2)
    np.testing.assert_allclose(np.asarray(st1.params.W),
                               np.asarray(st_h.params.W), atol=2e-6)
    np.testing.assert_allclose(np.asarray(st1.params.z),
                               np.asarray(st_h.params.z), atol=2e-6)
    np.testing.assert_allclose(np.asarray(st1.velocity.z),
                               np.asarray(st_h.velocity.z), atol=2e-6)
    np.testing.assert_allclose(np.asarray(errs), errs_h, atol=2e-6)


def test_fused_kernel_lv_hbm_mode_inject_parity():
    """The HBM-state tier carries the z/vz masters through its manual DMA
    staging (forced on a small shape via the cache entry point)."""
    from mdbn_tpu.ops.cd_epoch_pallas import (_cached_train_fn,
                                              draw_uniform_blocks)

    data, _ = _planted_data(n=48, seed=2)
    cfg = RBMConfig(n_visible=16, n_hidden=8, visible="gaussian",
                    learn_variance=True, lr=0.02, momentum=0.5,
                    persistent=True, epochs=2, batch_size=8, seed=0,
                    matmul_precision="highest")
    fn = _cached_train_fn(cfg, 2, interpret=True, inject=True,
                          hbm_state=True)
    st0 = init_train_state(cfg)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(7), 2, 6)
    st1, errs = fn(st0, jnp.asarray(data), u)
    st_h, errs_h = _host_replay(cfg, st0, data, u, 2)
    np.testing.assert_allclose(np.asarray(st1.params.W),
                               np.asarray(st_h.params.W), atol=2e-6)
    np.testing.assert_allclose(np.asarray(st1.params.z),
                               np.asarray(st_h.params.z), atol=2e-6)
    np.testing.assert_allclose(np.asarray(errs), errs_h, atol=2e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.parametrize("dp_reduce", ["factor", "ring"])
@pytest.mark.parametrize("batch", [16, 20])  # divisible and uneven-on-8
def test_dp_mega_kernel_lv_exact_parity(dp_reduce, batch):
    """The DP mega-kernel's fused learn_variance path (z statistic riding
    the factor gather / the bias ring's spare row) == the single-device
    host replay, including batch 20 unevenly sharded over 8 devices."""
    from mdbn_tpu.ops.cd_epoch_pallas import (draw_uniform_blocks,
                                              make_pallas_dp_train_fn)

    data, _ = _planted_data(n=80, seed=0)
    cfg = RBMConfig(n_visible=16, n_hidden=8, visible="gaussian",
                    learn_variance=True, lr=0.02, lr_variance=0.05,
                    persistent=True, momentum=0.5, epochs=1,
                    batch_size=batch, seed=0, matmul_precision="highest")
    fn = make_pallas_dp_train_fn(cfg, make_mesh(8), 1, dp_reduce=dp_reduce)
    st0 = init_train_state(cfg)
    nb = 80 // batch
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(5), 1, nb)
    st1, errs = fn(st0, jnp.asarray(data), u)
    st_h, errs_h = _host_replay(cfg, st0, data, u, 1)
    np.testing.assert_allclose(np.asarray(st1.params.W),
                               np.asarray(st_h.params.W), atol=5e-6)
    np.testing.assert_allclose(np.asarray(st1.params.z),
                               np.asarray(st_h.params.z), atol=5e-6)
    np.testing.assert_allclose(np.asarray(errs), errs_h, atol=5e-6)


# --------------------------------------------------------- DP / stack --

@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_gspmd_dp_matches_single_device():
    data, _ = _planted_data(n=320, seed=4)
    cfg = RBMConfig(n_visible=16, n_hidden=8, visible="gaussian",
                    learn_variance=True, lr=0.02, epochs=3, batch_size=32,
                    seed=0, engine="xla")
    s1, _ = train_rbm(data, cfg)
    s8, _ = train_rbm(data, cfg, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(s8.params.W), np.asarray(s1.params.W),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s8.params.z), np.asarray(s1.params.z),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_shard_map_dp_learn_variance_exact():
    """Explicit shard_map+pmean path carries the z statistic exactly."""
    from mdbn_tpu.parallel.dp import train_rbm_shard_map

    data, _ = _planted_data(n=320, seed=5)
    cfg = RBMConfig(n_visible=16, n_hidden=8, visible="gaussian",
                    learn_variance=True, lr=0.02, epochs=2, batch_size=32,
                    seed=0, engine="xla", shuffle=False)
    st8, errs = train_rbm_shard_map(init_train_state(cfg), jnp.asarray(data),
                                    cfg, make_mesh(8), n_epochs=2)
    assert np.isfinite(np.asarray(errs)).all()
    # z moved (the statistic crossed the pmean) and stays finite
    assert float(jnp.abs(st8.params.z).max()) > 1e-4
    assert np.isfinite(np.asarray(st8.params.z)).all()


def test_dbn_bottom_layer_and_checkpoint(tmp_path):
    """DBN with a learned-variance bottom layer: trains, transform is
    z-aware (differs from the unscaled pass), checkpoints round-trip z."""
    from mdbn_tpu.models.dbn import DBN

    data, _ = _planted_data(n=200, seed=6)
    dcfg = DBNConfig(layer_sizes=[8, 6], visible="gaussian", epochs=3,
                     batch_size=20, lr=0.05, gaussian_lr=0.02, seed=0,
                     engine="xla",
                     layer_overrides=[{"learn_variance": True,
                                       "lr_variance": 0.05}])
    dbn = DBN(dcfg).train(data)
    assert dbn.layers[0].state.params.z is not None
    codes = np.asarray(dbn.transform(data))
    assert codes.shape == (200, 6)
    # z-awareness: zeroing z changes the transform
    from mdbn_tpu.ops.transform import stack_hidden
    layers = [(l.state.params, l.cfg) for l in dbn.layers]
    plain0 = layers[0][0]._replace(z=jnp.zeros_like(layers[0][0].z))
    codes_z0 = np.asarray(stack_hidden([plain0, layers[1][0]],
                                       [l.cfg for l in dbn.layers], data))
    assert np.abs(codes - codes_z0).max() > 1e-4

    rbm0 = dbn.layers[0]
    path = str(tmp_path / "ckpt")
    rbm0.save(path)
    loaded = RBM.load(path)
    np.testing.assert_array_equal(np.asarray(loaded.state.params.z),
                                  np.asarray(rbm0.state.params.z))
    assert loaded.cfg.learn_variance


def test_gibbs_sample_uses_learned_sigma():
    """W=0 model: the Gibbs sampler's stationary distribution is N(b, sigma^2)."""
    from mdbn_tpu.ops.sample import gibbs_sample

    z = np.log(np.array([0.25, 4.0], np.float32))
    params = RBMParams(W=jnp.zeros((2, 3)), b=jnp.asarray([0.5, -0.5]),
                       c=jnp.zeros(3), z=jnp.asarray(z))
    cfg = RBMConfig(n_visible=2, n_hidden=3, visible="gaussian",
                    learn_variance=True, batch_size=4)
    _, v = gibbs_sample(params, jnp.zeros((2000, 2)), jax.random.PRNGKey(0),
                        cfg, 3)
    np.testing.assert_allclose(np.asarray(v).std(axis=0), np.exp(0.5 * z),
                               rtol=0.1)
