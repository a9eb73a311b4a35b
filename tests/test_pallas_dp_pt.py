"""Parallel tempering under data parallelism (round 4, VERDICT r3 #4).

Each batch row owns its complete M-rung ladder (Metropolis swaps are
per-particle), so ladders shard with the batch: the DP mega-kernel resorts
the [M*B, H] rung-major chain particle-major, runs every rung's Gibbs sweeps
and both swap rounds shard-locally, and routes ONLY the rung-0 statistics
through the existing factor/ring reduce. Injected global uniforms (resharded
per-particle) make the whole multi-shard run exactly reproducible by the
single-device pt_step_stats replay.

Split out of test_pallas_dp.py (round 5): the combined module compiled
2,564 executables > the 2,048-per-module cap enforced by tests/conftest.py
(the compile-cache segfault envelope).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdbn_tpu.config import RBMConfig
from mdbn_tpu.core.state import init_train_state
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.ops.cd_epoch_pallas import make_pallas_dp_train_fn
from mdbn_tpu.parallel.mesh import make_mesh

from test_pallas_pt import _draw_pt, _host_replay_pt  # noqa: E402

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")

E = 2


def _assert_pt_dp_parity(cfg, state, errs, state0, data, uniforms, E):
    params, vel, chain, exp_errs = _host_replay_pt(cfg, state0, data,
                                                   uniforms, E)
    np.testing.assert_allclose(np.asarray(errs), exp_errs, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.params.W),
                               np.asarray(params.W), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.params.b),
                               np.asarray(params.b), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.params.c),
                               np.asarray(params.c), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.velocity.W),
                               np.asarray(vel.W), rtol=2e-4, atol=2e-6)
    if cfg.learn_variance:
        np.testing.assert_allclose(np.asarray(state.params.z),
                                   np.asarray(params.z), rtol=2e-4,
                                   atol=2e-6)
    # the FULL rung-major ladder (all M*B rows, incl. accepted swaps): the
    # particle-major resort must invert exactly
    assert state.chain_h.shape == chain.shape
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


PT_CFG = RBMConfig(n_visible=96, n_hidden=32, k=2, lr=0.1, epochs=E,
                   batch_size=32, seed=0, momentum=0.5, l2=1e-4,
                   persistent=True, pt_temps=4, pt_beta_min=0.2,
                   engine="pallas")
PT_DATA = mnist_like(128, n_features=96, seed=3)  # nb = 4


@pytest.mark.parametrize("dp_reduce", ["factor", "ring"])
def test_pt_dp_exact_parity(dp_reduce):
    """PT-PCD (4 rungs, k=2, momentum + L2) on 8 shards, both reduce
    schemes: exact parity vs the single-device pt_step_stats replay —
    weights, velocity, per-epoch errors, and the complete ladder."""
    nb = PT_DATA.shape[0] // PT_CFG.batch_size
    uniforms = _draw_pt(PT_CFG, nb, E)
    fn = make_pallas_dp_train_fn(PT_CFG, make_mesh(8), E, inject=True,
                                 dp_reduce=dp_reduce)
    assert fn is not None
    state0 = init_train_state(PT_CFG)
    state, errs = fn(state0, jnp.asarray(PT_DATA), uniforms)
    _assert_pt_dp_parity(PT_CFG, state, errs, state0, PT_DATA, uniforms, E)


def test_pt_dp_uneven_batch20_exact():
    """The graded global batch of 20 under tempering on 8 devices (local
    shards of 3 particles' ladders; shard 6 part-pad, shard 7 all-pad):
    pad particles' ladders evolve harmlessly while the masked rung-0
    statistics stay the exact global-batch mean."""
    cfg = PT_CFG.replace(batch_size=20, pt_temps=3, k=1, seed=1)
    data = mnist_like(40, n_features=96, seed=9)  # nb = 2
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw_pt(cfg, nb, E)
    fn = make_pallas_dp_train_fn(cfg, make_mesh(8), E, inject=True)
    assert fn is not None
    state0 = init_train_state(cfg)
    state, errs = fn(state0, jnp.asarray(data), uniforms)
    _assert_pt_dp_parity(cfg, state, errs, state0, data, uniforms, E)


def test_pt_dp_gaussian_sampled_exact():
    """Gaussian visibles with per-rung variance 1/beta (sampled negative
    phase) under DP: the tempered noise scaling shards per-particle too."""
    rng = np.random.default_rng(4)
    data = rng.standard_normal((64, 48)).astype(np.float32)
    cfg = RBMConfig(n_visible=48, n_hidden=16, visible="gaussian", lr=0.005,
                    k=1, epochs=E, batch_size=16, seed=0, persistent=True,
                    pt_temps=3, pt_beta_min=0.3, sample_visible=True,
                    grad_clip=1.0, engine="pallas")
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw_pt(cfg, nb, E)
    fn = make_pallas_dp_train_fn(cfg, make_mesh(8), E, inject=True)
    state0 = init_train_state(cfg)
    state, errs = fn(state0, jnp.asarray(data), uniforms)
    _assert_pt_dp_parity(cfg, state, errs, state0, data, uniforms, E)


def test_pt_dp_learn_variance_uneven_exact():
    """PT x learn_variance fused UNDER DP (round 4): the sigma-weighted
    tempered ladder shards per-particle, the rung-0 z statistic rides the
    factor exchange, and the uneven graded batch of 20 masks pad particles
    out of every statistic — exact vs the single-device replay."""
    rng = np.random.default_rng(6)
    data = rng.standard_normal((40, 48)).astype(np.float32)
    cfg = RBMConfig(n_visible=48, n_hidden=16, visible="gaussian", lr=0.005,
                    k=1, epochs=E, batch_size=20, seed=2, persistent=True,
                    pt_temps=3, pt_beta_min=0.3, learn_variance=True,
                    momentum=0.5, grad_clip=1.0, engine="pallas")
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw_pt(cfg, nb, E)
    fn = make_pallas_dp_train_fn(cfg, make_mesh(8), E, inject=True)
    assert fn is not None
    state0 = init_train_state(cfg)
    state, errs = fn(state0, jnp.asarray(data), uniforms)
    _assert_pt_dp_parity(cfg, state, errs, state0, data, uniforms, E)


def test_pt_dp_parity_breaks_without_allreduce():
    """Failing-on-purpose control: with the reduce disabled each shard
    updates from its 4 local particles only — the result must NOT match the
    global replay, proving the PT parity tests exercise the collective."""
    nb = PT_DATA.shape[0] // PT_CFG.batch_size
    uniforms = _draw_pt(PT_CFG, nb, E)
    fn = make_pallas_dp_train_fn(PT_CFG, make_mesh(8), E, inject=True,
                                 _skip_allreduce=True)
    state0 = init_train_state(PT_CFG)
    state, errs = fn(state0, jnp.asarray(PT_DATA), uniforms)
    params, _, _, _ = _host_replay_pt(PT_CFG, state0, PT_DATA, uniforms, E)
    assert not np.allclose(np.asarray(state.params.W), np.asarray(params.W),
                           rtol=2e-4, atol=2e-6)


def test_pt_shard_map_dp_exact():
    """parallel.dp's explicit shard_map + pmean path under tempering at the
    graded batch 20: exact against a host-side reconstruction of its
    per-shard key schedule, local ladders, and masked rung-0 pmean."""
    from mdbn_tpu.core.rbm_math import apply_update, pt_step_stats
    from mdbn_tpu.ops.cd_step import draw_pt_uniforms
    from mdbn_tpu.parallel.dp import train_rbm_shard_map

    cfg = RBMConfig(n_visible=48, n_hidden=16, k=1, lr=0.1, epochs=1,
                    batch_size=20, seed=0, persistent=True, pt_temps=3,
                    pt_beta_min=0.5, engine="xla")
    data = mnist_like(40, n_features=48, seed=2)  # nb = 2
    mesh = make_mesh(8)
    st0 = init_train_state(cfg)
    st, errs = train_rbm_shard_map(st0, jnp.asarray(data), cfg, mesh,
                                   n_epochs=1)

    ndev, B, M = 8, 20, 3
    lb = 3
    local_cfg = cfg.replace(batch_size=lb)
    batches = np.pad(np.asarray(data).reshape(2, B, 48),
                     ((0, 0), (0, ndev * lb - B), (0, 0)))
    params, vel = st0.params, st0.velocity
    chains = {d: jnp.zeros((M, lb, cfg.n_hidden), jnp.float32)
              for d in range(ndev)}
    key, kepochs = jax.random.split(st0.key)
    ekey = jax.random.split(kepochs, 1)[0]
    _, ksteps = jax.random.split(ekey)
    keys = jax.random.split(ksteps, 2)
    errs_host = []
    for i in range(2):
        gs, es = [], []
        for d in range(ndev):
            kd = jax.random.fold_in(keys[i], d)
            mask = jnp.asarray(
                (np.arange(d * lb, (d + 1) * lb) < B).astype(np.float32))[:, None]
            v0 = jnp.asarray(batches[i, d * lb:(d + 1) * lb])
            g, chains[d], e = pt_step_stats(
                params, v0, chains[d], draw_pt_uniforms(local_cfg, lb, kd),
                local_cfg, row_mask=mask, norm=B / ndev)
            gs.append(g)
            es.append(float(e))
        grads = jax.tree.map(lambda *x: sum(x) / ndev, *gs)
        params, vel = apply_update(params, vel, grads, cfg, epoch=0)
        errs_host.append(np.mean(es))
    np.testing.assert_allclose(np.asarray(errs), [np.mean(errs_host)],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st.params.W), np.asarray(params.W),
                               rtol=1e-5, atol=1e-6)
    # ladder comes back rung-major at the global batch, pad particles dropped
    assert st.chain_h.shape == (M * B, cfg.n_hidden)
    exp_chain = np.concatenate(
        [np.concatenate([np.asarray(chains[d])[m, : min(lb, max(0, B - d * lb))]
                         for d in range(ndev)], axis=0)
         for m in range(M)], axis=0)
    np.testing.assert_allclose(np.asarray(st.chain_h), exp_chain,
                               rtol=1e-5, atol=1e-6)
