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
from mdbn_tpu.parallel.mesh import interpret_safe_ndev, make_mesh

from test_pallas_dp import E, _draw, _host_replay  # noqa: E402

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")

# Simulated-mesh width for these manual-DMA interpret runs: 8, except on
# single-core hosts where 8 blocking interpret callbacks deadlock XLA:CPU
# (measured; see parallel/mesh.py:interpret_safe_ndev).
ND = interpret_safe_ndev(8)


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
    mesh = make_mesh(ND)
    with _force_wb_tier():
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
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

    cfg = WB_CFG.replace(seed=73, batch_size=2 * ND + ND // 2,
                         momentum=0.0)  # 20 on 8 (graded), 10 on 4
    data = mnist_like(4 * ND + ND, n_features=64, seed=9)  # nb = 2
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_wb_tier():
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
    np.testing.assert_allclose(np.asarray(state.params.b),
                               np.asarray(params.b), rtol=2e-4, atol=2e-6)
    assert state.chain_h.shape == (cfg.batch_size, cfg.n_hidden)
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
    mesh = make_mesh(ND)
    with _force_wb_tier():
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


def test_dp_wblocked_wide_offset_exact_parity():
    """Round 5: local batch > 32 routes through the WIDE-offset packing
    (vs lanes at 64 instead of 32, 128 structural h-matrix rows) — exact
    host-replay parity at local batch 40 (global 320 on 8 shards) with
    PCD + momentum + L2 + clip. This is the layout that admits realistic
    per-shard batches (e.g. 20000x400 f32 at local 64) to the fused DP
    path."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = WB_CFG.replace(seed=81, batch_size=40 * ND, momentum=0.5)
    data = mnist_like(80 * ND, n_features=64, seed=11)  # nb = 2, local b 40
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_wb_tier():
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
    np.testing.assert_allclose(np.asarray(state.params.b),
                               np.asarray(params.b), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.params.c),
                               np.asarray(params.c), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.velocity.W),
                               np.asarray(vel.W), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


def test_dp_wblocked_wide_offset_uneven_exact():
    """Wide-offset packing with an UNEVEN global batch: 300 on 8 shards
    ceil-splits to local 38 with shard 7 carrying 4 pad rows — the
    per-source lane-validity signs and sender-masked h-matrices must keep
    them out of every statistic exactly."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = WB_CFG.replace(seed=82, batch_size=38 * ND - ND // 2,
                         momentum=0.0)  # local 38, tail shard part-pad
    data = mnist_like(2 * (38 * ND - ND // 2), n_features=64, seed=12)
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_wb_tier():
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
    np.testing.assert_allclose(np.asarray(state.params.b),
                               np.asarray(params.b), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


def test_dp_wblocked_parity_breaks_without_allreduce():
    """Failing-on-purpose control: _skip_allreduce builds the W-blocked
    kernel single-shard — the result must NOT match the global replay."""
    from mdbn_tpu.ops.cd_epoch_pallas import _cached_dp_train_fn

    cfg = WB_CFG.replace(seed=75, momentum=0.0)
    nb = WB_DATA.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, E)
    mesh = make_mesh(ND)
    with _force_wb_tier():
        fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], ND, E,
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


def test_wblocked_dp_wide_batch_routing():
    """Round 5: 20000x400 f32 at local batch 64 (global 512 on 8 shards) —
    previously the ONE published fused-DP rejection at the graded wide
    shape (the chunk tier's W master+read + Gibbs activations overflow) —
    now routes through the wide-offset W-blocked tier, and auto-engine
    picks the DP mega-kernel for it."""
    from mdbn_tpu.ops.cd_epoch_pallas import (needs_chunk_update,
                                              needs_w_chunking,
                                              pallas_state_mode)
    from mdbn_tpu.train.trainer import resolve_dp_engine

    wide = RBMConfig(n_visible=20000, n_hidden=400, visible="gaussian",
                     lr=0.001, batch_size=512, engine="auto",
                     sample_visible=False)
    local = wide.replace(batch_size=64)
    assert not needs_chunk_update(local, 8, "factor")  # measured rejection
    assert needs_w_chunking(local, 8, "factor")        # wide-offset packing
    assert pallas_state_mode(local, ndev=8, dp_reduce="factor") is True
    assert resolve_dp_engine(wide, make_mesh(8), backend="tpu") == "pallas_dp"


def test_wblocked_dp_chunk_rows_full_size_when_fit():
    """Code-review r5 finding #2: the DP chunk target no longer halves
    unconditionally — w_chunk_rows_for tries the full ~2 MB granularity
    first and falls back only when the gathered SFX slots + chunk
    transients overflow the tier budget. 28000x400 f32 keeps the full
    chunk under DP (same rows as single-chip — 3.6x fewer ring gathers
    per update than the old halved target); the 40000x1000 bf16 boundary
    shape still falls back to the halved granularity it was hardware-
    validated at."""
    from mdbn_tpu.ops.cd_epoch_pallas import (needs_w_chunking,
                                              w_chunk_padded_cfg,
                                              w_chunk_rows_for)

    wide = RBMConfig(n_visible=28000, n_hidden=400, visible="gaussian",
                     lr=0.001, batch_size=3, sample_visible=False)
    assert needs_w_chunking(wide, 8, "factor")
    pw = w_chunk_padded_cfg(wide)
    assert w_chunk_rows_for(pw, 8) == w_chunk_rows_for(pw, 1) == 800

    boundary = RBMConfig(n_visible=40000, n_hidden=1000, visible="gaussian",
                         lr=0.001, batch_size=3, param_dtype="bfloat16",
                         compute_dtype="bfloat16")
    pb = w_chunk_padded_cfg(boundary)
    assert w_chunk_rows_for(pb, 8) == 160  # halved target
    assert w_chunk_rows_for(pb, 1) == 320  # single-chip keeps full size
