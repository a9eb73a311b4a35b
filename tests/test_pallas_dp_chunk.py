"""DP mega-kernel x chunk-update tier (round 4, VERDICT r3 #2).

The chunk-update tier composes with the DP factor exchange — each shard
computes the global gradient per W row chunk straight from the GATHERED
phase factors, so the full [V, H] gradient transient never exists on any
shard (the wide multi-chip path). Forced through the tier at
interpreter-sized shapes; H=32 is lane-misaligned, so these also exercise
the H-padded DP variant (padded uniforms, padded replicated state,
in-kernel inertness mask).

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
from mdbn_tpu.parallel.mesh import make_mesh

from test_pallas_dp import (  # noqa: E402
    CFG, DATA, E, UNEVEN_CFG, UNEVEN_DATA, _draw, _host_replay,
    _assert_dp_replay_parity,
)

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _force_chunk_tier(chunk_bytes, stream_vel=False):
    """Monkeypatch context: route builds through the chunk-update tier."""
    import contextlib

    import mdbn_tpu.ops.cd_epoch_pallas as cep

    @contextlib.contextmanager
    def ctx():
        orig = (cep.needs_chunk_update, cep.chunk_update_streams_velocity,
                cep._UPDATE_CHUNK_BYTES)
        cep.needs_chunk_update = lambda c, ndev=1, dp_reduce="factor": True
        if stream_vel:
            cep.chunk_update_streams_velocity = (
                lambda c, ndev=1, dp_reduce="factor": True)
        cep._UPDATE_CHUNK_BYTES = chunk_bytes
        try:
            yield
        finally:
            (cep.needs_chunk_update, cep.chunk_update_streams_velocity,
             cep._UPDATE_CHUNK_BYTES) = orig

    return ctx()


def test_dp_chunk_update_exact_parity():
    """8-shard factor-exchange DP with the gradient applied in forced 32-row
    chunks (V=144 -> 4 full + 1 ragged 16-row chunk), H padded 32->128:
    exact host-replay parity for PCD + momentum + L2 + k=2."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = CFG.replace(seed=41)
    nb = DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_chunk_tier(32 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], 8, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, DATA, uniforms, E)


def test_dp_chunk_update_uneven_batch20_exact():
    """The graded global batch of 20 (local shards of 3 rows, part-pad and
    all-pad tail shards) through the DP chunk tier: masked statistics reach
    the chunked update exactly."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = UNEVEN_CFG.replace(seed=42)
    nb = UNEVEN_DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_chunk_tier(16 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], 8, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(UNEVEN_DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, UNEVEN_DATA,
                             uniforms, E)


def test_dp_chunk_update_stream_vel_exact():
    """stream_vel under DP: every shard stages its W-velocity chunks through
    the aliased HBM buffer while the factor exchange keeps replicas
    bit-identical — still exact vs the host replay over multiple epochs."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = CFG.replace(seed=43)
    nb = DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_chunk_tier(32 * 4 * 128, stream_vel=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], 8, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, DATA, uniforms, E)


def test_dp_chunk_update_lv_parity():
    """Learned-variance GRBM through the DP chunk tier: the z statistic is
    computed per W row chunk from the gathered factors on every shard.
    Tolerances as the other lv kernel tests (the chunked wh pass re-tiles
    a dot — <=1 ULP, see test_pallas_widemode)."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = RBMConfig(n_visible=144, n_hidden=32, k=1, lr=0.005, epochs=E,
                    batch_size=32, seed=44, momentum=0.5, l2=1e-4,
                    visible="gaussian", learn_variance=True,
                    persistent=True, engine="pallas")
    rng = np.random.default_rng(5)
    data = rng.standard_normal((128, 144)).astype(np.float32)
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_chunk_tier(32 * 4 * 128):
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
    np.testing.assert_allclose(np.asarray(state.params.z),
                               np.asarray(params.z), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.velocity.z),
                               np.asarray(vel.z), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


def test_dp_chunk_update_parity_breaks_without_allreduce():
    """Failing-on-purpose control for the chunk tier: with the factor
    exchange disabled each shard updates from its local 4 rows only — the
    result must NOT match the global replay, proving the tests above
    exercise the gathered-factor chunk math."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = CFG.replace(seed=45)
    nb = DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(8)
    with _force_chunk_tier(32 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], 8, E,
                                 True, True, True, True)  # _skip_allreduce
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    params, _, _, _ = _host_replay(cfg, state0, DATA, uniforms, E)
    assert not np.allclose(np.asarray(state.params.W), np.asarray(params.W),
                           rtol=2e-4, atol=2e-6)
