"""Exact oracle<->JAX parity on the deterministic sub-computations
(SURVEY.md §4.2): identical injected uniforms must give identical
conditionals, gradients, updates, and errors to float32 tolerance."""

import numpy as np
import pytest

import mdbn_tpu.oracle as oracle
from mdbn_tpu.config import RBMConfig
from mdbn_tpu.core.rbm_math import (
    RBMParams,
    apply_update,
    cd_step_stats,
    free_energy,
    hidden_mean,
    visible_mean,
    zero_velocity,
)

TOL = dict(rtol=2e-5, atol=2e-5)


def make_case(cfg: RBMConfig, batch=6, seed=0):
    rng = np.random.default_rng(seed)
    p_np = oracle.init_params(cfg, rng)
    # non-trivial biases to exercise every term
    p_np["b"] = rng.standard_normal(cfg.n_visible).astype(np.float32) * 0.1
    p_np["c"] = rng.standard_normal(cfg.n_hidden).astype(np.float32) * 0.1
    p_jx = RBMParams(W=p_np["W"], b=p_np["b"], c=p_np["c"])
    if cfg.visible == "bernoulli":
        v0 = (rng.random((batch, cfg.n_visible)) < 0.4).astype(np.float32)
    else:
        v0 = rng.standard_normal((batch, cfg.n_visible)).astype(np.float32)
    uniforms = oracle.draw_uniforms(cfg, batch, rng)
    chain = (rng.random((batch, cfg.n_hidden)) < 0.5).astype(np.float32)
    return p_np, p_jx, v0, uniforms, chain


CONFIGS = [
    RBMConfig(n_visible=13, n_hidden=9, visible="bernoulli", k=1),
    RBMConfig(n_visible=13, n_hidden=9, visible="bernoulli", k=3),
    RBMConfig(n_visible=13, n_hidden=9, visible="bernoulli", k=2, sample_visible=False),
    RBMConfig(n_visible=13, n_hidden=9, visible="bernoulli", k=1, persistent=True),
    RBMConfig(n_visible=13, n_hidden=9, visible="gaussian", k=1),
    RBMConfig(n_visible=13, n_hidden=9, visible="gaussian", k=2, sample_visible=True),
    RBMConfig(n_visible=13, n_hidden=9, visible="gaussian", k=1, persistent=True),
    RBMConfig(n_visible=13, n_hidden=9, visible="bernoulli", k=1, error_metric="xent"),
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=lambda c: f"{c.visible}-k{c.k}-p{int(c.persistent)}-sv{c.sample_visible}-{c.error_metric}")
def test_cd_step_stats_parity(cfg):
    p_np, p_jx, v0, uniforms, chain = make_case(cfg)
    chain_arg = chain if cfg.persistent else None
    g_np, newchain_np, err_np, _ = oracle.cd_step_stats(p_np, v0, chain_arg, uniforms, cfg)
    g_jx, newchain_jx, err_jx = cd_step_stats(p_jx, v0, chain_arg, uniforms, cfg)
    np.testing.assert_allclose(np.asarray(g_jx.W), g_np["W"], **TOL)
    np.testing.assert_allclose(np.asarray(g_jx.b), g_np["b"], **TOL)
    np.testing.assert_allclose(np.asarray(g_jx.c), g_np["c"], **TOL)
    np.testing.assert_allclose(np.asarray(newchain_jx), newchain_np, **TOL)
    np.testing.assert_allclose(float(err_jx), err_np, **TOL)


@pytest.mark.parametrize("visible", ["bernoulli", "gaussian"])
def test_conditionals_parity(visible):
    cfg = RBMConfig(n_visible=17, n_hidden=11, visible=visible)
    p_np, p_jx, v0, uniforms, chain = make_case(cfg)
    np.testing.assert_allclose(
        np.asarray(hidden_mean(p_jx, v0, cfg)), oracle.hidden_mean(p_np, v0), **TOL)
    h = oracle.hidden_mean(p_np, v0).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(visible_mean(p_jx, h, cfg)), oracle.visible_mean(p_np, h, visible), **TOL)
    np.testing.assert_allclose(
        np.asarray(free_energy(p_jx, v0, cfg)), oracle.free_energy(p_np, v0, visible),
        rtol=1e-4, atol=1e-4)


def test_momentum_l2_update_parity():
    cfg = RBMConfig(n_visible=13, n_hidden=9, lr=0.07, momentum=0.9, l2=1e-3)
    p_np, p_jx, v0, uniforms, _ = make_case(cfg)
    vel_np = oracle.zero_velocity(p_np)
    # seed velocity with something nonzero to exercise momentum
    rng = np.random.default_rng(42)
    for k in vel_np:
        vel_np[k] = (rng.standard_normal(vel_np[k].shape) * 0.01).astype(np.float32)
    vel_jx = RBMParams(W=vel_np["W"].copy(), b=vel_np["b"].copy(), c=vel_np["c"].copy())

    g_np, _, _, _ = oracle.cd_step_stats(p_np, v0, None, uniforms, cfg)
    g_jx, _, _ = cd_step_stats(p_jx, v0, None, uniforms, cfg)

    p_np_copy = {k: v.copy() for k, v in p_np.items()}
    oracle.apply_update(p_np_copy, vel_np, g_np, cfg)
    new_p, new_vel = apply_update(p_jx, vel_jx, g_jx, cfg)
    for name in ("W", "b", "c"):
        np.testing.assert_allclose(np.asarray(getattr(new_p, name)), p_np_copy[name], **TOL)
        np.testing.assert_allclose(np.asarray(getattr(new_vel, name)), vel_np[name], **TOL)


def test_multi_step_training_parity():
    """Run 20 sequential updates through both stacks with shared uniforms —
    the full training recursion must track exactly."""
    cfg = RBMConfig(n_visible=16, n_hidden=12, k=1, lr=0.1, momentum=0.5, l2=1e-4,
                    persistent=True, batch_size=8)
    rng = np.random.default_rng(7)
    p_np, p_jx, _, _, chain = make_case(cfg, batch=8, seed=7)
    vel_np = oracle.zero_velocity(p_np)
    vel_jx = zero_velocity(p_jx)
    chain_np = chain.copy()
    chain_jx = chain.copy()
    p_np = {k: v.copy() for k, v in p_np.items()}

    for step in range(20):
        v0 = (rng.random((8, 16)) < 0.4).astype(np.float32)
        uniforms = oracle.draw_uniforms(cfg, 8, rng)
        g_np, chain_np, err_np, _ = oracle.cd_step_stats(p_np, v0, chain_np, uniforms, cfg)
        oracle.apply_update(p_np, vel_np, g_np, cfg)
        g_jx, chain_jx, err_jx = cd_step_stats(p_jx, v0, chain_jx, uniforms, cfg)
        p_jx, vel_jx = apply_update(p_jx, vel_jx, g_jx, cfg)
        np.testing.assert_allclose(float(err_jx), err_np, rtol=1e-4, atol=1e-4)

    np.testing.assert_allclose(np.asarray(p_jx.W), p_np["W"], rtol=1e-3, atol=1e-4)


def test_grad_clip_parity():
    cfg = RBMConfig(n_visible=13, n_hidden=9, visible="gaussian", lr=0.01,
                    grad_clip=0.05, momentum=0.3)
    p_np, p_jx, v0, uniforms, _ = make_case(cfg)
    vel_np = oracle.zero_velocity(p_np)
    vel_jx = zero_velocity(p_jx)
    g_np, _, _, _ = oracle.cd_step_stats(p_np, v0, None, uniforms, cfg)
    g_jx, _, _ = cd_step_stats(p_jx, v0, None, uniforms, cfg)
    p_np_c = {k: v.copy() for k, v in p_np.items()}
    oracle.apply_update(p_np_c, vel_np, g_np, cfg)
    new_p, new_vel = apply_update(p_jx, vel_jx, g_jx, cfg)
    for name in ("W", "b", "c"):
        np.testing.assert_allclose(np.asarray(getattr(new_p, name)), p_np_c[name], **TOL)


def test_pseudo_likelihood_parity():
    from mdbn_tpu.core.rbm_math import pseudo_likelihood as pl_jx

    cfg = RBMConfig(n_visible=13, n_hidden=9, error_metric="pseudo")
    p_np, p_jx, v0, _, _ = make_case(cfg)
    for bit in (0, 5, 12):
        a = oracle.pseudo_likelihood(p_np, v0, bit, "bernoulli")
        b = float(pl_jx(p_jx, v0, bit, cfg))
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_pseudo_monitor_decreases_in_training():
    from mdbn_tpu.data.synthetic import bars_and_stripes
    from mdbn_tpu.train.trainer import train_rbm

    data = bars_and_stripes(256, side=4, seed=3)
    cfg = RBMConfig(n_visible=16, n_hidden=16, lr=0.3, epochs=12, batch_size=16,
                    error_metric="pseudo", engine="xla")
    ocfg = cfg
    o = oracle.OracleRBM(ocfg).train(data)
    state, metrics = train_rbm(data, cfg)
    assert metrics.errors[-1] < metrics.errors[0]
    assert o.history[-1] < o.history[0]
    np.testing.assert_allclose(metrics.errors[-1], o.history[-1], rtol=0.3, atol=0.5)


def test_sparsity_target_parity():
    cfg = RBMConfig(n_visible=13, n_hidden=9, sparsity_target=0.1, sparsity_cost=0.5)
    p_np, p_jx, v0, uniforms, _ = make_case(cfg)
    g_np, _, _, _ = oracle.cd_step_stats(p_np, v0, None, uniforms, cfg)
    g_jx, _, _ = cd_step_stats(p_jx, v0, None, uniforms, cfg)
    np.testing.assert_allclose(np.asarray(g_jx.c), g_np["c"], **TOL)
    # and the penalty actually changes the gradient
    base = RBMConfig(n_visible=13, n_hidden=9)
    g0, _, _ = cd_step_stats(p_jx, v0, None, uniforms, base)
    assert np.abs(np.asarray(g_jx.c) - np.asarray(g0.c)).max() > 1e-4


def test_momentum_schedule_parity():
    from mdbn_tpu.core.rbm_math import resolve_momentum

    cfg = RBMConfig(n_visible=13, n_hidden=9, momentum=0.9, initial_momentum=0.5,
                    momentum_switch_epoch=5)
    for ep in (0, 4, 5, 9):
        np.testing.assert_allclose(float(resolve_momentum(cfg, ep)),
                                   oracle.resolve_momentum(cfg, ep))
    assert oracle.resolve_momentum(cfg, 4) == 0.5
    assert oracle.resolve_momentum(cfg, 5) == 0.9


def test_momentum_schedule_training_parity():
    """Full training with the 0.5->0.9 switch: xla engine vs oracle at equal
    hyperparameters (distributional: same final-error neighborhood)."""
    from mdbn_tpu.data.synthetic import bars_and_stripes
    from mdbn_tpu.train.trainer import train_rbm

    data = bars_and_stripes(256, side=4, seed=3)
    cfg = RBMConfig(n_visible=16, n_hidden=16, lr=0.1, momentum=0.9,
                    initial_momentum=0.5, momentum_switch_epoch=4,
                    sparsity_target=0.2, sparsity_cost=0.1,
                    epochs=10, batch_size=16, engine="xla")
    o = oracle.OracleRBM(cfg).train(data)
    state, metrics = train_rbm(data, cfg)
    assert metrics.errors[-1] < metrics.errors[0]
    np.testing.assert_allclose(metrics.errors[-1], o.history[-1], rtol=0.25, atol=0.02)
