"""The fully W-blocked tier under DP (round 5, VERDICT r4 #4).

Each shard's gradient h-matrix (64 structural rows, f32) all-gathers whole
once per update, the SFX v-factor chunks gather at storage dtype per W row
chunk, and every shard computes every global gradient chunk from the
identical gathered slots in the identical order (bit-identical replicas).
Split from test_pallas_dp_chunk.py to keep each module under the
2,048-compile cap (tests/conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdbn_tpu.config import RBMConfig
from mdbn_tpu.core.state import init_train_state
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.parallel.mesh import make_mesh

from test_pallas_dp import E, _draw, _host_replay  # noqa: E402

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


# ---------------------------------------------------------------------------
# Round 5 (VERDICT r4 #4): the fully W-blocked tier under DP — each shard's
# [128, Hp] gradient h-matrix all-gathers whole (f32) once per update, the
# SFX v-factor chunks gather at storage dtype per W row chunk, and every
# shard computes every global gradient chunk from the identical gathered
# slots in the identical order.


def _force_wb_tier():
    """Monkeypatch context: route DP builds through the W-blocked tier."""
    import contextlib

    import mdbn_tpu.ops.cd_epoch_pallas as cep

    @contextlib.contextmanager
    def ctx():
        orig = cep.needs_w_chunking
        cep.needs_w_chunking = lambda c, ndev=1, dp_reduce="factor": True
        try:
            yield
        finally:
            cep.needs_w_chunking = orig

    return ctx()


WB_CFG = RBMConfig(n_visible=64, n_hidden=100, k=1, lr=0.05, epochs=E,
                   batch_size=32, seed=0, momentum=0.5, l2=1e-4,
                   grad_clip=0.5, persistent=True, sample_visible=False,
                   engine="pallas")
WB_DATA = mnist_like(128, n_features=64, seed=3)  # nb = 4


@pytest.mark.parametrize("momentum", [0.0, 0.5])
def test_dp_wblocked_exact_parity(momentum):
    """8-shard W-blocked DP (H=100 padded to 128, V=64 -> chunked fori
    passes): exact host-replay parity for PCD (+ momentum + L2 + clip)."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = WB_CFG.replace(seed=71 + int(momentum * 10), momentum=momentum)
    nb = WB_DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_wb_tier():
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], 8, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(WB_DATA), uniforms)
    params, vel, chain, exp_errs = _host_replay(cfg, state0, WB_DATA,
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
    assert state.chain_h.shape == chain.shape
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


def test_dp_wblocked_uneven_batch20_exact():
    """The graded global batch of 20 through the W-blocked DP exchange:
    per-source lane-validity signs + sender-masked h-matrices keep the pad
    shards out of every statistic exactly (shard 6 part-pad, 7 all-pad)."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = WB_CFG.replace(seed=73, batch_size=20, momentum=0.0)
    data = mnist_like(40, n_features=64, seed=9)  # nb = 2
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_wb_tier():
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], 8, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(data), uniforms)
    params, vel, chain, exp_errs = _host_replay(cfg, state0, data,
                                                uniforms, E)
    np.testing.assert_allclose(np.asarray(errs), exp_errs, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.params.W),
                               np.asarray(params.W), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.params.b),
                               np.asarray(params.b), rtol=2e-4, atol=2e-6)
    assert state.chain_h.shape == (20, cfg.n_hidden)
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


def test_dp_wblocked_gaussian_exact():
    """Gaussian mean-field (the wide-omics regime the tier exists for)
    through the W-blocked DP exchange."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = RBMConfig(n_visible=64, n_hidden=100, visible="gaussian",
                    k=1, lr=0.005, epochs=E, batch_size=16, seed=74,
                    grad_clip=1.0, engine="pallas")
    rng = np.random.default_rng(4)
    data = rng.standard_normal((64, 64)).astype(np.float32)  # nb = 4
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_wb_tier():
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], 8, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(data), uniforms)
    params, vel, chain, exp_errs = _host_replay(cfg, state0, data,
                                                uniforms, E)
    np.testing.assert_allclose(np.asarray(errs), exp_errs, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.params.W),
                               np.asarray(params.W), rtol=2e-4, atol=2e-6)


def test_dp_wblocked_parity_breaks_without_allreduce():
    """Failing-on-purpose control: _skip_allreduce builds the W-blocked
    kernel single-shard — the result must NOT match the global replay."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = WB_CFG.replace(seed=75, momentum=0.0)
    nb = WB_DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_wb_tier():
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], 8, E,
                                 True, True, True, True)  # _skip_allreduce
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(WB_DATA), uniforms)
    params, _, _, _ = _host_replay(cfg, state0, WB_DATA, uniforms, E)
    assert not np.allclose(np.asarray(state.params.W), np.asarray(params.W),
                           rtol=2e-4, atol=2e-6)


def test_wblocked_dp_routing():
    """Round-5 routing closure (VERDICT r4 #4): 40000x1000 bf16 on 8 shards
    routes through the W-blocked tier (was: no fused DP path by
    construction), and auto-engine picks the DP mega-kernel for it."""
    from mdbn_tpu.ops.cd_epoch_pallas import (needs_w_chunking,
                                              pallas_state_mode)
    from mdbn_tpu.train.trainer import resolve_dp_engine

    big = RBMConfig(n_visible=40000, n_hidden=1000, visible="gaussian",
                    lr=0.001, batch_size=20, param_dtype="bfloat16",
                    compute_dtype="bfloat16", engine="auto")
    assert needs_w_chunking(big.replace(batch_size=3), 8, "factor")
    assert pallas_state_mode(big.replace(batch_size=3), ndev=8,
                             dp_reduce="factor") is True
    assert resolve_dp_engine(big, make_mesh(8), backend="tpu") == "pallas_dp"
