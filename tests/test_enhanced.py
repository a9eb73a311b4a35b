"""Enhanced gradient (Cho, Raiko & Ilin, ICML 2011): oracle<->JAX parity,
the definitional covariance form, the bit-flip invariance property that
motivates the estimator (with a plain-gradient failing control), GSPMD dp
equivalence, and the engine gating."""

import numpy as np
import pytest

import mdbn_tpu.oracle as oracle
from mdbn_tpu.config import DBNConfig, RBMConfig
from mdbn_tpu.core.rbm_math import RBMParams, apply_update, cd_step_stats
from tests.test_parity_core import TOL, make_case

ENH_CONFIGS = [
    RBMConfig(n_visible=13, n_hidden=9, gradient="enhanced", k=1),
    RBMConfig(n_visible=13, n_hidden=9, gradient="enhanced", k=2),
    RBMConfig(n_visible=13, n_hidden=9, gradient="enhanced", k=1, persistent=True),
    RBMConfig(n_visible=13, n_hidden=9, gradient="enhanced", visible="gaussian", k=1),
    RBMConfig(n_visible=13, n_hidden=9, gradient="enhanced", k=1,
              sparsity_target=0.1, sparsity_cost=0.5),
]


@pytest.mark.parametrize("cfg", ENH_CONFIGS,
                         ids=lambda c: f"{c.visible}-k{c.k}-p{int(c.persistent)}-sp{int(bool(c.sparsity_target))}")
def test_enhanced_oracle_jax_parity(cfg):
    p_np, p_jx, v0, uniforms, chain = make_case(cfg)
    chain_arg = chain if cfg.persistent else None
    g_np, _, err_np, _ = oracle.cd_step_stats(p_np, v0, chain_arg, uniforms, cfg)
    g_jx, _, err_jx = cd_step_stats(p_jx, v0, chain_arg, uniforms, cfg)
    np.testing.assert_allclose(np.asarray(g_jx.W), g_np["W"], **TOL)
    np.testing.assert_allclose(np.asarray(g_jx.b), g_np["b"], **TOL)
    np.testing.assert_allclose(np.asarray(g_jx.c), g_np["c"], **TOL)
    np.testing.assert_allclose(float(err_jx), err_np, **TOL)


def test_enhanced_matches_covariance_definition():
    """The rank-1-correction implementation must equal the definition:
    gW_e = <(v-mu)(h-lam)'>_data - <(v-mu)(h-lam)'>_model, with the bias
    gradients re-centered through gW_e (Cho et al. eqs. 12-14)."""
    cfg = RBMConfig(n_visible=13, n_hidden=9, gradient="enhanced", k=1)
    p_np, _, v0, uniforms, _ = make_case(cfg)
    B = v0.shape[0]

    # replay the CD-1 chain with the same injected uniforms
    h0p = oracle.hidden_mean(p_np, v0)
    h0s = (uniforms["h0"] < h0p).astype(np.float32)
    vmean = oracle.visible_mean(p_np, h0s, cfg.visible)
    vs = (uniforms["v"][0] < vmean).astype(np.float32)
    hmean = oracle.hidden_mean(p_np, vs)

    mu = 0.5 * (v0.mean(0) + vs.mean(0))
    lam = 0.5 * (h0p.mean(0) + hmean.mean(0))
    gW_def = ((v0 - mu).T @ (h0p - lam) - (vs - mu).T @ (hmean - lam)) / B
    gb_def = (v0 - vs).mean(0) - gW_def @ lam
    gc_def = (h0p - hmean).mean(0) - gW_def.T @ mu

    g, _, _, _ = oracle.cd_step_stats(p_np, v0, None, uniforms, cfg)
    np.testing.assert_allclose(g["W"], gW_def, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g["b"], gb_def, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g["c"], gc_def, rtol=1e-5, atol=1e-6)


def _flip_params(p, i):
    """Bit-flip reparameterization of visible unit i: v_i -> 1 - v_i with
    W'_i = -W_i, b'_i = -b_i, c' = c + W_i leaves the model distribution
    invariant (E(v, h) changes only by a constant)."""
    W = np.asarray(p.W).copy()
    b = np.asarray(p.b).copy()
    c = np.asarray(p.c) + W[i]
    W[i] = -W[i]
    b[i] = -b[i]
    return RBMParams(W=W, b=b, c=c.astype(np.float32))


def _one_update(p, v0, uniforms, cfg):
    g, _, _ = cd_step_stats(p, v0, None, uniforms, cfg)
    from mdbn_tpu.core.rbm_math import zero_velocity

    newp, _ = apply_update(p, zero_velocity(p), g, cfg)
    return newp


@pytest.mark.parametrize("gradient,invariant", [("enhanced", True), ("plain", False)])
def test_flip_invariance(gradient, invariant):
    """THE property the enhanced gradient buys (Cho et al. 2011): one training
    update commutes with the bit-flip reparameterization of any visible unit.
    The plain CD gradient provably lacks it (gW'_i = gc - gW_i != -gW_i), so
    the plain case is the failing control that shows the test has teeth."""
    i = 3
    cfg = RBMConfig(n_visible=13, n_hidden=9, gradient=gradient, k=1, lr=1.0)
    _, p, v0, uniforms, _ = make_case(cfg, batch=16, seed=5)

    # transformed problem: flipped column i in the data, matched randomness
    # (visible-sampling uniforms for column i complement: u' = 1 - u makes
    # (u' < 1 - p) draw exactly 1 - (u < p), ties a.s. absent)
    v0_f = v0.copy()
    v0_f[:, i] = 1.0 - v0_f[:, i]
    uni_f = {k: np.array(u, copy=True) for k, u in uniforms.items()}
    uni_f["v"][:, :, i] = 1.0 - uni_f["v"][:, :, i]

    new_p = _one_update(p, v0, uniforms, cfg)
    new_p_f = _one_update(_flip_params(p, i), v0_f, uni_f, cfg)

    expected = _flip_params(new_p, i)  # transform of the updated params
    diffs = [float(np.abs(np.asarray(a) - np.asarray(e)).max())
             for a, e in zip(new_p_f, expected) if a is not None]
    if invariant:
        assert max(diffs) < 1e-5, diffs
    else:
        assert max(diffs) > 1e-3, diffs


def test_enhanced_gspmd_dp_matches_single_device():
    """GSPMD writes the math globally, so the enhanced recombination's
    global-batch means are exact under dp sharding by construction."""
    from mdbn_tpu.data.synthetic import mnist_like
    from mdbn_tpu.parallel.mesh import make_mesh
    from mdbn_tpu.train.trainer import train_rbm

    data = mnist_like(320, n_features=64, seed=3)
    cfg = RBMConfig(n_visible=64, n_hidden=32, gradient="enhanced", k=1,
                    lr=0.05, epochs=2, batch_size=16, engine="xla", seed=1)
    state1, m1 = train_rbm(data, cfg)
    state8, m8 = train_rbm(data, cfg, mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(state8.params.W),
                               np.asarray(state1.params.W), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(m8.errors, m1.errors, rtol=1e-4, atol=1e-5)


def test_enhanced_trains():
    from mdbn_tpu.data.synthetic import bars_and_stripes
    from mdbn_tpu.train.trainer import train_rbm

    data = bars_and_stripes(256, side=4, seed=3)
    cfg = RBMConfig(n_visible=16, n_hidden=16, gradient="enhanced", lr=0.2,
                    epochs=12, batch_size=16, engine="auto")
    state, metrics = train_rbm(data, cfg)
    # CPU backend: auto routes to xla (the fused enhanced kernel is
    # TPU-only); on hardware auto picks the Pallas engine (test_pallas_tpu)
    assert metrics.engine == "xla"
    assert metrics.errors[-1] < metrics.errors[0] * 0.8
    assert np.isfinite(metrics.errors).all()


def test_enhanced_dbn_config_plumbs_through():
    dcfg = DBNConfig(layer_sizes=[8, 6], gradient="enhanced")
    assert dcfg.rbm_config(0, 16).gradient == "enhanced"
    assert dcfg.rbm_config(1, 8).gradient == "enhanced"


def test_enhanced_pt_parity():
    """PT-PCD rung-0 statistics get the same recombination (oracle mirror)."""
    from mdbn_tpu.core.rbm_math import pt_step_stats

    cfg = RBMConfig(n_visible=13, n_hidden=9, gradient="enhanced", k=1,
                    persistent=True, pt_temps=3, pt_beta_min=0.5)
    rng = np.random.default_rng(11)
    p_np, p_jx, v0, _, _ = make_case(cfg, batch=6, seed=11)
    chains = (rng.random((3, 6, 9)) < 0.5).astype(np.float32)
    uniforms = {
        "h0": rng.random((6, 9), dtype=np.float32),
        "v": rng.random((1, 3, 6, 13), dtype=np.float32),
        "h": rng.random((1, 3, 6, 9), dtype=np.float32),
        "swap": rng.random((2, 2, 6), dtype=np.float32),
    }
    g_np, _, _ = oracle.pt_step_stats(p_np, v0, chains, uniforms, cfg)
    g_jx, _, _ = pt_step_stats(p_jx, v0, chains, uniforms, cfg)
    np.testing.assert_allclose(np.asarray(g_jx.W), g_np["W"], **TOL)
    np.testing.assert_allclose(np.asarray(g_jx.b), g_np["b"], **TOL)
    np.testing.assert_allclose(np.asarray(g_jx.c), g_np["c"], **TOL)


def test_enhanced_engine_gating():
    """enhanced must never silently run a kernel that computes plain CD.

    Round-3 update: the mega-kernel now FUSES the enhanced recombination
    (exact-parity tests in test_pallas_dp.py), so only the paths that
    mathematically cannot support it still raise — the per-step grads kernel
    and the shard_map+pmean fallback, where per-shard enhanced grads would be
    pmean'd (nonlinear in the batch means => wrong update)."""
    import jax

    from mdbn_tpu.data.synthetic import mnist_like
    from mdbn_tpu.ops.cd_epoch_pallas import (
        make_pallas_grads_fn,
        make_pallas_train_fn,
    )
    from mdbn_tpu.parallel.dp import train_rbm_shard_map
    from mdbn_tpu.parallel.mesh import make_mesh
    from mdbn_tpu.core.state import init_train_state
    from mdbn_tpu.train.trainer import train_rbm

    cfg = RBMConfig(n_visible=16, n_hidden=8, gradient="enhanced",
                    batch_size=8, epochs=1, engine="pallas")
    data = mnist_like(32, n_features=16, seed=0)
    # the fused paths now accept enhanced (build without error)
    assert make_pallas_train_fn(cfg, 1, interpret=True) is not None
    # the per-step grads kernel cannot (recombination needs global means)
    with pytest.raises(ValueError, match="enhanced"):
        make_pallas_grads_fn(cfg)
    mesh = make_mesh(8)
    st = init_train_state(cfg)
    with pytest.raises(ValueError, match="enhanced"):
        train_rbm_shard_map(st, jax.numpy.asarray(data), cfg, mesh, 1)
    # engine='pallas' on the CPU backend still refuses to silently run the
    # zero-bits interpreter (same rule as plain CD)
    with pytest.raises(ValueError, match="interpreter"):
        train_rbm(data, cfg)
