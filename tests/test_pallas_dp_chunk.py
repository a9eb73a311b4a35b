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
from mdbn_tpu.data.synthetic import mnist_like
from mdbn_tpu.parallel.mesh import make_mesh

from mdbn_tpu.parallel.mesh import interpret_safe_ndev

from test_pallas_dp import (  # noqa: E402
    CFG, DATA, E, UNEVEN_CFG, UNEVEN_DATA, _draw, _host_replay,
    _assert_dp_replay_parity,
)

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")

# Simulated-mesh width for the hbm-state (manual-DMA) tiers: 8, except on
# single-core hosts where 8 blocking interpret callbacks deadlock XLA:CPU
# (measured; see parallel/mesh.py:interpret_safe_ndev). The uneven batch
# keeps 2.5 rows/shard so the tail shard always carries pad rows: the
# graded 20-on-8, or 10-on-4 on the capped mesh.
ND = interpret_safe_ndev(8)
UCFG = UNEVEN_CFG.replace(batch_size=2 * ND + ND // 2)


def _force_chunk_tier(chunk_bytes, stream_vel=False, fx_chunked=False):
    """Monkeypatch context: route builds through the chunk-update tier
    (optionally with the chunked factor exchange and/or velocity
    streaming forced on)."""
    import contextlib

    import mdbn_tpu.ops.cd_epoch_pallas as cep

    @contextlib.contextmanager
    def ctx():
        orig = (cep.needs_chunk_update, cep.chunk_update_streams_velocity,
                cep.chunk_update_fx_chunked, cep.chunk_update_fx_bytes,
                cep._UPDATE_CHUNK_BYTES)
        cep.needs_chunk_update = lambda c, ndev=1, dp_reduce="factor": True
        if stream_vel:
            cep.chunk_update_streams_velocity = (
                lambda c, ndev=1, dp_reduce="factor": True)
        if fx_chunked:
            cep.chunk_update_fx_chunked = (
                lambda c, ndev=1, dp_reduce="factor": True)
            cep.chunk_update_fx_bytes = (
                lambda c, ndev=1, dp_reduce="factor": None)
        cep._UPDATE_CHUNK_BYTES = chunk_bytes
        try:
            yield
        finally:
            (cep.needs_chunk_update, cep.chunk_update_streams_velocity,
             cep.chunk_update_fx_chunked, cep.chunk_update_fx_bytes,
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
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, DATA, uniforms, E)


def test_dp_chunk_update_uneven_batch20_exact():
    """The graded global batch of 20 (local shards of 3 rows, part-pad and
    all-pad tail shards) through the DP chunk tier: masked statistics reach
    the chunked update exactly."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = UCFG.replace(seed=42)
    nb = UNEVEN_DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(16 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
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
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128, stream_vel=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
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
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
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
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, True, True)  # _skip_allreduce
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    params, _, _, _ = _host_replay(cfg, state0, DATA, uniforms, E)
    assert not np.allclose(np.asarray(state.params.W), np.asarray(params.W),
                           rtol=2e-4, atol=2e-6)


# ---------------------------------------------------------------------------
# Round 5 (VERDICT r4 #3): the CHUNKED factor exchange — wide x DP at
# realistic per-shard batches. The h-block factors gather whole; the v-block
# factors stream through a chunk-lane-sized ring slot per W row chunk, so
# neither the O(ndev*2B*V) gathered v-factors nor the [V, H] gradient ever
# materializes on any shard. Forced through the mode at interpreter-sized
# shapes (V=144 -> one 128-row chunk + one ragged 16-row chunk; H=32 padded
# to 128 exercises the inertness mask under fxc too).


def test_dp_fxc_exact_parity():
    """8-shard chunked-factor-exchange DP (PCD + momentum + L2 + k=2):
    exact host-replay parity — the per-chunk gathers reassemble the exact
    global statistics."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = CFG.replace(seed=51)
    nb = DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128, fx_chunked=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, DATA, uniforms, E)


def test_dp_fxc_uneven_batch20_exact():
    """The graded global batch of 20 through the chunked exchange: the
    per-chunk masking (pad rows zeroed at stage time) keeps every gathered
    statistic the exact global-batch mean."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = UCFG.replace(seed=52)
    nb = UNEVEN_DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(16 * 4 * 128, fx_chunked=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(UNEVEN_DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, UNEVEN_DATA,
                             uniforms, E)


def test_dp_fxc_stream_vel_exact():
    """fxc x stream_vel: chunked gathers AND HBM-staged W velocity (the
    wide-momentum multi-chip combination) stay exact over multiple epochs."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = CFG.replace(seed=53)
    nb = DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128, stream_vel=True, fx_chunked=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, DATA, uniforms, E)


def test_dp_fxc_lv_parity():
    """Learned variance through the chunked exchange: the z statistic
    assembles per chunk from the gathered v slices and the pre-update W
    rows — same tolerances as the full-gather chunk tier."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = RBMConfig(n_visible=144, n_hidden=32, k=1, lr=0.005, epochs=E,
                    batch_size=32, seed=54, momentum=0.5, l2=1e-4,
                    visible="gaussian", learn_variance=True,
                    persistent=True, engine="pallas")
    rng = np.random.default_rng(7)
    data = rng.standard_normal((128, 144)).astype(np.float32)
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128, fx_chunked=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
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
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


def test_dp_fxc_parity_breaks_without_allreduce():
    """Failing-on-purpose control: _skip_allreduce builds single-shard
    (fxc downgrades to the local chunk loop), so the result must NOT match
    the global replay — the fxc tests above exercise the gathers."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = CFG.replace(seed=55)
    nb = DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128, fx_chunked=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, True, True)  # _skip_allreduce
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    params, _, _, _ = _host_replay(cfg, state0, DATA, uniforms, E)
    assert not np.allclose(np.asarray(state.params.W), np.asarray(params.W),
                           rtol=2e-4, atol=2e-6)


def test_wide_dp_fxc_routing():
    """The round-5 closure probe (VERDICT r4 #3): 20000x400 at REALISTIC
    per-shard batches routes fused under DP — local B 20 in every graded
    variant (plain / momentum / learned-variance, f32), and local B 64 in
    the bf16 regime the wide guidance recommends. f32 local B 64 exceeds
    VMEM in any full-W tier (82 MB H-padded W master + whole-W read plus
    the [64, 20000] f32 Gibbs activations) — it was the one published
    fused rejection until the round-5 wide-offset W-blocked packing
    (B <= 64) admitted it; it now routes W-blocked, measured 9.2k/s vs
    2.4k XLA (BENCH_DETAIL.md wide section)."""
    from mdbn_tpu.ops.cd_epoch_pallas import (chunk_update_fx_chunked,
                                              needs_chunk_update,
                                              needs_w_chunking,
                                              pallas_state_mode)

    base = dict(n_visible=20000, n_hidden=400, k=1, lr=0.005,
                visible="gaussian", engine="pallas")
    for lb, kw in ((20, {}), (20, dict(momentum=0.5)),
                   (20, dict(learn_variance=True)),
                   (64, dict(param_dtype="bfloat16",
                             compute_dtype="bfloat16")),
                   (64, dict(momentum=0.5, param_dtype="bfloat16",
                             compute_dtype="bfloat16"))):
        cfg = RBMConfig(batch_size=lb, **base, **kw)
        assert pallas_state_mode(cfg, ndev=8, dp_reduce="factor") is True, (lb, kw)
        assert chunk_update_fx_chunked(cfg, ndev=8, dp_reduce="factor"), (lb, kw)
    # f32 local-64: every full-W tier still rejects it, and the round-5
    # wide-offset W-blocked tier is what admits it fused
    cfg64 = RBMConfig(batch_size=64, **base)
    assert not needs_chunk_update(cfg64, 8, "factor")
    assert needs_w_chunking(cfg64, 8, "factor")
    assert pallas_state_mode(cfg64, ndev=8, dp_reduce="factor") is True


# ---------------------------------------------------------------------------
# Round 5 (VERDICT r4 #7): tempering + the enhanced gradient through the DP
# chunk tier — PT's rung-0 factors and the per-chunk enhanced recombination
# compose with both the full factor gather and the chunked exchange.


def test_dp_chunk_enhanced_exact_parity():
    """Enhanced through the DP chunk tier (full factor gather): the global
    mean offsets come off the gathered factors, the recombination runs per
    chunk — exact vs the cd_step_stats host replay."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = CFG.replace(seed=61, gradient="enhanced", sparsity_target=0.1,
                      sparsity_cost=0.05)
    nb = DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, DATA, uniforms, E)


def test_dp_fxc_enhanced_uneven_exact():
    """Enhanced x CHUNKED exchange at the graded uneven batch 20: mu
    assembles per gathered chunk, lam/h0_mean off the gathered h block,
    masked pad rows stay out of every offset — exact vs the host replay."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = UCFG.replace(seed=62, gradient="enhanced")
    nb = UNEVEN_DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(16 * 4 * 128, fx_chunked=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(UNEVEN_DATA), uniforms)
    _assert_dp_replay_parity(cfg, state, errs, state0, UNEVEN_DATA,
                             uniforms, E)


def test_dp_chunk_pt_exact_parity():
    """PT-PCD through the DP chunk tier: per-shard ladders, rung-0 factors
    through the gather, chunked gradient — exact vs pt_step_stats."""
    from test_pallas_pt import _draw_pt, _host_replay_pt

    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = RBMConfig(n_visible=96, n_hidden=32, k=1, lr=0.1, epochs=E,
                    batch_size=32, seed=63, momentum=0.5, l2=1e-4,
                    persistent=True, pt_temps=3, pt_beta_min=0.3,
                    engine="pallas")
    data = mnist_like(128, n_features=96, seed=3)
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw_pt(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(data), uniforms)
    params, vel, chain, exp_errs = _host_replay_pt(cfg, state0, data,
                                                   uniforms, E)
    np.testing.assert_allclose(np.asarray(errs), exp_errs, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.params.W),
                               np.asarray(params.W), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.velocity.W),
                               np.asarray(vel.W), rtol=2e-4, atol=2e-6)
    assert state.chain_h.shape == chain.shape
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


def test_dp_fxc_pt_uneven_exact():
    """PT x CHUNKED exchange at an uneven batch: pad particles' ladders and
    the per-chunk gathered rung-0 factors — exact vs the replay."""
    from test_pallas_pt import _draw_pt, _host_replay_pt

    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = RBMConfig(n_visible=96, n_hidden=32, k=1, lr=0.1, epochs=E,
                    batch_size=20, seed=64, persistent=True, pt_temps=3,
                    pt_beta_min=0.3, engine="pallas")
    data = mnist_like(40, n_features=96, seed=9)
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw_pt(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_chunk_tier(32 * 4 * 128, fx_chunked=True):
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
                                 True, True, False, True)
        state0 = init_train_state(cfg)
        state, errs = fn(state0, jnp.asarray(data), uniforms)
    params, vel, chain, exp_errs = _host_replay_pt(cfg, state0, data,
                                                   uniforms, E)
    np.testing.assert_allclose(np.asarray(errs), exp_errs, rtol=2e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.params.W),
                               np.asarray(params.W), rtol=2e-4, atol=2e-6)
    assert state.chain_h.shape == chain.shape
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)
