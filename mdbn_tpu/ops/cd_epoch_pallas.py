"""Fused Pallas TPU CD-k training kernel — the framework's hot path.

TPU-native design for the graded metric (CD-1 weight updates/sec per chip,
BASELINE.json:2,5). The reference's training loop is a Python-per-minibatch
affair; at batch 20 the three Gibbs matmuls are far too small to amortize any
per-step dispatch, so here the **entire multi-epoch training run is ONE kernel
launch**:

- grid = (epochs, num_batches / U). TPU grid iterations run sequentially,
  which is exactly SGD's data dependence (update t+1 needs weights from t);
  each grid step additionally unrolls U consecutive minibatch updates to
  amortize the ~3 us fixed per-grid-step cost (measured on v5e) U-fold.
- Parameters, momentum velocities, and the PCD chain live in VMEM for the
  whole run (constant-index blocks): weights are read from HBM once and
  written back once — zero HBM weight traffic per update.
- Minibatches stream HBM->VMEM via the automatic grid pipeline (double
  buffered), overlapping the next super-batch's DMA with this one's compute.
  With per-epoch shuffling, the batch *order* is a scalar-prefetched
  permutation table consulted by the data BlockSpec's index_map (batch-order
  shuffle; the reference lineage doesn't shuffle at all).
- Each Gibbs step fuses both matmuls (MXU; optionally bf16 with f32
  accumulation via cfg.compute_dtype), the sigmoids, on-chip-PRNG
  Bernoulli/Gaussian sampling (pltpu.prng_*), the momentum+L2 update, and the
  reconstruction-error monitor — one pass over VMEM-resident weights (the
  north-star kernel of BASELINE.json:5). With momentum=0 (the default) the
  velocity buffers are elided from the recursion to halve update traffic.

Sampling-dependent math is validated distributionally against the NumPy
oracle; deterministic sub-paths are validated exactly via the shared XLA
engine (SURVEY.md §4.2). ``make_pallas_train_fn`` returns None when the VMEM
footprint doesn't fit (very wide omics layers) and the trainer falls back to
the XLA engine.
"""

from __future__ import annotations

import functools
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RBMConfig
from ..core.rbm_math import RBMParams
from ..core.state import TrainState

# Conservative budget for params+velocities+activations; v5e VMEM ~128 MiB.
_VMEM_BUDGET = 100 * 1024 * 1024
_MAX_UNROLL = 8  # minibatch updates fused per grid step


def _pick_unroll(nb: int, cfg: RBMConfig) -> int:
    """Largest divisor of nb <= _MAX_UNROLL whose data block stays small and
    whose total footprint fits the VMEM budget."""
    budget_rows = max(1, (2 * 1024 * 1024) // max(1, 4 * cfg.n_visible))  # ~2MB block
    max_u = max(1, min(_MAX_UNROLL, budget_rows // max(1, cfg.batch_size)))
    while max_u > 1 and estimate_vmem_bytes(cfg, max_u) > _VMEM_BUDGET:
        max_u -= 1
    for u in range(max_u, 0, -1):
        if nb % u == 0:
            return u
    return 1


def estimate_vmem_bytes(cfg: RBMConfig, unroll: int = _MAX_UNROLL) -> int:
    f = 4  # float32
    w = cfg.n_visible * cfg.n_hidden * f
    batch = cfg.batch_size * (cfg.n_visible + cfg.n_hidden) * f
    data_block = 2 * unroll * cfg.batch_size * cfg.n_visible * f  # double-buffered
    # pre-drawn PRNG blocks (u_h0 + u_h + u_v/n_v), which scale with k*unroll;
    # the Gaussian path's Box-Muller holds 2 transient uniforms alongside the
    # output, hence the extra factor
    rng = unroll * cfg.batch_size * cfg.n_hidden * f  # u_h0
    rng += cfg.k * unroll * cfg.batch_size * cfg.n_hidden * f  # u_h
    if cfg.resolved_sample_visible:
        per_v = cfg.k * unroll * cfg.batch_size * cfg.n_visible * f
        rng += per_v if cfg.visible == "bernoulli" else 3 * per_v
    # W+velW (plus their input copies) + biases + ~8 batch-sized temps
    return (4 * w + 4 * (cfg.n_visible + cfg.n_hidden) * f + 8 * batch
            + data_block + rng)


def _uniform_from_bits(shape) -> jax.Array:
    """U[0,1) from the on-chip PRNG via the mantissa bit-trick.

    Mosaic can't cast uint32->float32, so: keep 23 random mantissa bits, OR in
    the exponent of 1.0, bitcast to a float in [1,2), subtract 1.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    fbits = jax.lax.bitwise_or(
        jax.lax.bitwise_and(bits, jnp.int32(0x007FFFFF)), jnp.int32(0x3F800000)
    )
    return pltpu.bitcast(fbits, jnp.float32) - 1.0


def _normal_from_bits(shape) -> jax.Array:
    """N(0,1) via Box-Muller from two uniform draws."""
    u1 = _uniform_from_bits(shape)
    u2 = _uniform_from_bits(shape)
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - u1 + 1e-12))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def _dot_nt(a, b, cd=jnp.float32):  # a @ b, f32 accumulation
    return jax.lax.dot_general(a.astype(cd), b.astype(cd), (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tt(a, b, cd=jnp.float32):  # a @ b.T without materializing the transpose
    return jax.lax.dot_general(a.astype(cd), b.astype(cd), (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b, cd=jnp.float32):  # a.T @ b without materializing the transpose
    return jax.lax.dot_general(a.astype(cd), b.astype(cd), (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cd_train_kernel(
    # scalar prefetch
    seed_ref,  # SMEM (4,) int32: (seed, unused, start_epoch, unused)
    perm_ref,  # SMEM (perm_epochs, nsteps) int32 super-batch order (used by index_map)
    # pipelined input
    batch_ref,  # VMEM (1, U, B, V) — U consecutive minibatches
    # initial values (constant-index: loaded once)
    W_in, b_in, c_in, vW_in, vb_in, vc_in, chain_in,
    # outputs (constant-index: VMEM-resident across the whole grid)
    W, b, c, vW, vb, vc, chain, err_ref,
    *,
    cfg: RBMConfig,
    unroll: int,
    nb: int,  # total minibatches per epoch (= num grid steps * unroll)
):
    e = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(e == 0, i == 0))
    def _load_state():
        W[:] = W_in[:]
        b[:] = b_in[:]
        c[:] = c_in[:]
        vW[:] = vW_in[:]
        vb[:] = vb_in[:]
        vc[:] = vc_in[:]
        chain[:] = chain_in[:]

    @pl.when(i == 0)
    def _zero_epoch_err():
        err_ref[e, 0] = jnp.float32(0.0)

    # distinct PRNG stream per (run, epoch, grid step); the stream advances
    # across the unrolled updates within the step. prng_seed takes <=2 values.
    pltpu.prng_seed(seed_ref[0], e * pl.num_programs(1) + i)

    B = cfg.batch_size
    inv_b = jnp.float32(1.0 / B)
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    lr = jnp.float32(cfg.lr)
    is_last_step = jnp.logical_and(e == pl.num_programs(0) - 1,
                                   i == pl.num_programs(1) - 1)
    use_momentum = bool(cfg.momentum) or cfg.initial_momentum is not None
    if cfg.initial_momentum is not None:
        # Hinton-guide schedule: initial_momentum until momentum_switch_epoch
        cur_epoch = seed_ref[2] + e
        m = jnp.where(cur_epoch < cfg.momentum_switch_epoch,
                      jnp.float32(cfg.initial_momentum), jnp.float32(cfg.momentum))
    else:
        m = jnp.float32(cfg.momentum)

    # Pre-generate every random draw for all `unroll` updates in <=3 PRNG
    # calls: each prng_random_bits call costs ~0.3us of fixed latency on v5e,
    # so per-sample calls would dominate the tiny per-update compute.
    V, H = cfg.n_visible, cfg.n_hidden
    u_h0 = _uniform_from_bits((unroll * B, H))
    u_h = _uniform_from_bits((cfg.k * unroll * B, H))
    u_v = None
    n_v = None
    if cfg.resolved_sample_visible:
        if cfg.visible == "bernoulli":
            u_v = _uniform_from_bits((cfg.k * unroll * B, V))
        else:
            n_v = _normal_from_bits((cfg.k * unroll * B, V))

    err_acc = jnp.float32(0.0)
    for u in range(unroll):
        v0 = batch_ref[0, u]  # [B, V]
        Wv = W[:]
        Wc = Wv.astype(cd)

        # positive phase
        h0p = jax.nn.sigmoid(_dot_nt(v0, Wc, cd) + c[0])  # [B, H]
        h0s = (u_h0[u * B:(u + 1) * B] < h0p).astype(jnp.float32)

        h = chain[:] if cfg.persistent else h0s
        vs = v0
        hmean = h0p
        v1mean_cd = None
        for t in range(cfg.k):
            r = (u * cfg.k + t) * B  # row offset into the pre-drawn blocks
            pre_v = _dot_tt(h, Wc, cd) + b[0]  # [B, V]
            vmean = jax.nn.sigmoid(pre_v) if cfg.visible == "bernoulli" else pre_v
            if t == 0:
                v1mean_cd = vmean
            if cfg.visible == "bernoulli":
                vs = ((u_v[r:r + B] < vmean).astype(jnp.float32)
                      if cfg.resolved_sample_visible else vmean)
            else:
                vs = (vmean + n_v[r:r + B]
                      if cfg.resolved_sample_visible else vmean)
            hmean = jax.nn.sigmoid(_dot_nt(vs, Wc, cd) + c[0])
            h = (u_h[r:r + B] < hmean).astype(jnp.float32)

        if cfg.persistent:
            chain[:] = h
            pre_vd = _dot_tt(h0s, Wc, cd) + b[0]
            v1mean = jax.nn.sigmoid(pre_vd) if cfg.visible == "bernoulli" else pre_vd
        else:
            v1mean = v1mean_cd

        # gradients (log-likelihood ascent direction, batch mean);
        # positive and negative phases merged into ONE MXU call over [2B] rows
        gW = _dot_tn(jnp.concatenate([v0, vs], axis=0),
                     jnp.concatenate([h0p, -hmean], axis=0), cd) * inv_b  # [V, H]
        gb = jnp.sum(v0 - vs, axis=0, keepdims=True) * inv_b  # [1, V]
        gc = jnp.sum(h0p - hmean, axis=0, keepdims=True) * inv_b  # [1, H]
        if cfg.sparsity_target is not None and cfg.sparsity_cost:
            gc = gc + jnp.float32(cfg.sparsity_cost) * (
                jnp.float32(cfg.sparsity_target)
                - jnp.sum(h0p, axis=0, keepdims=True) * inv_b)

        # momentum + L2 (decay on W only) update, fused
        if cfg.grad_clip is not None:
            clip = jnp.float32(cfg.grad_clip)
            gW = jnp.clip(gW, -clip, clip)
            gb = jnp.clip(gb, -clip, clip)
            gc = jnp.clip(gc, -clip, clip)
        if cfg.l2:
            gW = gW - jnp.float32(cfg.l2) * Wv
        if use_momentum:
            # full momentum path: velocity buffers read+written every update
            nvW = m * vW[:] + lr * gW
            nvb = m * vb[:] + lr * gb
            nvc = m * vc[:] + lr * gc
            vW[:] = nvW
            vb[:] = nvb
            vc[:] = nvc
            W[:] = Wv + nvW
            b[:] = b[:] + nvb
            c[:] = c[:] + nvc
        else:
            # momentum=0 (default): velocity = lr*grad is not part of the
            # recursion; skip its per-update traffic. Write it only at the very
            # last update for state parity with the XLA engine.
            W[:] = Wv + lr * gW
            b[:] = b[:] + lr * gb
            c[:] = c[:] + lr * gc
            if u == unroll - 1:
                @pl.when(is_last_step)
                def _final_vel():
                    vW[:] = lr * gW
                    vb[:] = lr * gb
                    vc[:] = lr * gc

        # reconstruction-error monitor (the graded parity metric)
        if cfg.error_metric == "mse":
            d = v0 - v1mean
            err_acc += jnp.sum(d * d) * jnp.float32(1.0 / (B * cfg.n_visible))
        else:
            eps = 1e-7
            p = jnp.clip(v1mean, eps, 1.0 - eps)
            err_acc += -jnp.sum(v0 * jnp.log(p) + (1.0 - v0) * jnp.log(1.0 - p)) * inv_b

    err_ref[e, 0] = err_ref[e, 0] + err_acc * jnp.float32(1.0 / nb)


def _build_pallas_call(cfg: RBMConfig, n_epochs: int, nb: int, unroll: int,
                       shuffle: bool, interpret):
    if interpret is True:
        # the generic interpreter lacks pltpu.prng_*; use the TPU interpreter
        # (NB: it stubs prng_random_bits to zeros — structure-only testing)
        interpret = pltpu.InterpretParams()
    V, H, B = cfg.n_visible, cfg.n_hidden, cfg.batch_size
    f32 = jnp.float32
    nsteps = nb // unroll

    def const(shape):
        return pl.BlockSpec(shape, lambda e, i, seed, perm: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    if shuffle:
        data_index = lambda e, i, seed, perm: (perm[e, i], 0, 0, 0)
    else:
        data_index = lambda e, i, seed, perm: (perm[0, i], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # seed, perm
        grid=(n_epochs, nsteps),
        in_specs=[
            pl.BlockSpec((1, unroll, B, V), data_index,
                         memory_space=pltpu.VMEM),  # super-batches
            const((V, H)), const((1, V)), const((1, H)),  # W, b, c
            const((V, H)), const((1, V)), const((1, H)),  # velocities
            const((B, H)),  # chain
        ],
        out_specs=[
            const((V, H)), const((1, V)), const((1, H)),
            const((V, H)), const((1, V)), const((1, H)),
            const((B, H)),
            pl.BlockSpec((n_epochs, 1), lambda e, i, seed, perm: (0, 0),
                         memory_space=pltpu.SMEM),  # per-epoch err (scalars)
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((V, H), f32), jax.ShapeDtypeStruct((1, V), f32),
        jax.ShapeDtypeStruct((1, H), f32),
        jax.ShapeDtypeStruct((V, H), f32), jax.ShapeDtypeStruct((1, V), f32),
        jax.ShapeDtypeStruct((1, H), f32),
        jax.ShapeDtypeStruct((B, H), f32),
        jax.ShapeDtypeStruct((n_epochs, 1), f32),
    ]
    steps = n_epochs * nb
    flops_step = 2 * B * V * H * (2 + 2 * cfg.k)
    return pl.pallas_call(
        functools.partial(_cd_train_kernel, cfg=cfg, unroll=unroll, nb=nb),
        grid_spec=grid_spec,
        out_shape=out_shape,
        # params/velocities/chain update in place:
        # operands: 0=seed 1=perm 2=batches 3..9=state -> outputs 0..6
        input_output_aliases={i + 3: i for i in range(7)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),  # strictly sequential SGD
        ),
        cost_estimate=pl.CostEstimate(
            flops=steps * flops_step,
            bytes_accessed=steps * B * V * 4 + 2 * 4 * (V * H + V + H),
            transcendentals=steps * B * (H * (1 + cfg.k) + V * cfg.k),
        ),
        interpret=interpret,
    )


def make_pallas_train_fn(cfg: RBMConfig, n_epochs: int,
                         interpret: Optional[bool] = None):
    """Build ``fn(state, data) -> (state, errs[n_epochs])`` running ``n_epochs``
    epochs in ONE kernel launch, or None if the state won't fit in VMEM.

    Cached per (cfg, n_epochs, interpret): rebuilding fresh jit wrappers per
    model instance would re-trace/lower every kernel (measured ~5 s/layer).
    """
    if estimate_vmem_bytes(cfg, unroll=1) > _VMEM_BUDGET:
        return None  # even the unroll=1 footprint doesn't fit
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _cached_train_fn(cfg, n_epochs, interpret)


@lru_cache(maxsize=512)
def _cached_train_fn(cfg: RBMConfig, n_epochs: int, interpret: bool):

    def train_fn(state: TrainState, data: jax.Array) -> Tuple[TrainState, jax.Array]:
        n = data.shape[0]
        nb = n // cfg.batch_size
        unroll = _pick_unroll(nb, cfg)
        nsteps = nb // unroll
        key, kperm, kepoch = jax.random.split(state.key, 3)
        batches = data[: nb * cfg.batch_size].reshape(
            nsteps, unroll, cfg.batch_size, cfg.n_visible)
        if cfg.shuffle:
            # super-batch-order shuffle: one permutation of the nsteps blocks
            # per epoch (the reference lineage doesn't shuffle at all)
            perm = jax.vmap(lambda k: jax.random.permutation(k, nsteps))(
                jax.random.split(kperm, n_epochs)).astype(jnp.int32)
        else:
            perm = jax.lax.broadcasted_iota(jnp.int32, (1, nsteps), 1)
        seed = jnp.concatenate([
            jax.random.randint(kepoch, (2,), 0, jnp.iinfo(jnp.int32).max, jnp.int32),
            jnp.stack([state.epoch.astype(jnp.int32), jnp.int32(0)]),
        ])

        call = _build_pallas_call(cfg, n_epochs, nb, unroll, cfg.shuffle, interpret)
        p, vel = state.params, state.velocity
        W, bb, cc, vW, vb, vc, chain, errs = call(
            seed, perm, batches,
            p.W, p.b.reshape(1, -1), p.c.reshape(1, -1),
            vel.W, vel.b.reshape(1, -1), vel.c.reshape(1, -1),
            state.chain_h,
        )
        new_state = TrainState(
            params=RBMParams(W=W, b=bb[0], c=cc[0]),
            velocity=RBMParams(W=vW, b=vb[0], c=vc[0]),
            chain_h=chain,
            key=key,
            epoch=state.epoch + n_epochs,
        )
        return new_state, errs[:, 0]

    return jax.jit(train_fn)


def make_pallas_epoch_fn(cfg: RBMConfig, interpret: Optional[bool] = None):
    """Single-epoch variant with the trainer's ``epoch_fn(state, data) ->
    (state, mean_err)`` signature (used for per-epoch callbacks/checkpoints)."""
    fn = make_pallas_train_fn(cfg, 1, interpret=interpret)
    if fn is None:
        return None

    def epoch_fn(state, data):
        state, errs = fn(state, data)
        return state, errs[0]

    return epoch_fn


# ---------------------------------------------------------------------------
# Gradients-only step kernel: the fused CD step as a pure function, for use
# under shard_map + lax.pmean (fused Pallas sampling on the DP path — the
# north-star combination of BASELINE.json:5). The parameter update happens
# outside, after the cross-chip allreduce.


def _cd_grads_kernel(seed_ref, batch_ref, W_in, b_in, c_in, chain_in,
                     gW_ref, gb_ref, gc_ref, chain_ref, err_ref, *, cfg: RBMConfig):
    pltpu.prng_seed(seed_ref[0], seed_ref[1])
    B = cfg.batch_size
    inv_b = jnp.float32(1.0 / B)
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    V, H = cfg.n_visible, cfg.n_hidden

    v0 = batch_ref[:]
    Wc = W_in[:].astype(cd)
    h0p = jax.nn.sigmoid(_dot_nt(v0, Wc, cd) + c_in[0])
    h0s = (_uniform_from_bits(h0p.shape) < h0p).astype(jnp.float32)

    h = chain_in[:] if cfg.persistent else h0s
    vs = v0
    hmean = h0p
    v1mean_cd = None
    for t in range(cfg.k):
        pre_v = _dot_tt(h, Wc, cd) + b_in[0]
        vmean = jax.nn.sigmoid(pre_v) if cfg.visible == "bernoulli" else pre_v
        if t == 0:
            v1mean_cd = vmean
        if cfg.visible == "bernoulli":
            vs = ((_uniform_from_bits(vmean.shape) < vmean).astype(jnp.float32)
                  if cfg.resolved_sample_visible else vmean)
        else:
            vs = (vmean + _normal_from_bits(vmean.shape)
                  if cfg.resolved_sample_visible else vmean)
        hmean = jax.nn.sigmoid(_dot_nt(vs, Wc, cd) + c_in[0])
        h = (_uniform_from_bits(hmean.shape) < hmean).astype(jnp.float32)

    if cfg.persistent:
        chain_ref[:] = h
        pre_vd = _dot_tt(h0s, Wc, cd) + b_in[0]
        v1mean = jax.nn.sigmoid(pre_vd) if cfg.visible == "bernoulli" else pre_vd
    else:
        chain_ref[:] = chain_in[:]
        v1mean = v1mean_cd

    gW_ref[:] = _dot_tn(jnp.concatenate([v0, vs], axis=0),
                        jnp.concatenate([h0p, -hmean], axis=0), cd) * inv_b
    gb_ref[:] = jnp.sum(v0 - vs, axis=0, keepdims=True) * inv_b
    gc = jnp.sum(h0p - hmean, axis=0, keepdims=True) * inv_b
    if cfg.sparsity_target is not None and cfg.sparsity_cost:
        gc = gc + jnp.float32(cfg.sparsity_cost) * (
            jnp.float32(cfg.sparsity_target)
            - jnp.sum(h0p, axis=0, keepdims=True) * inv_b)
    gc_ref[:] = gc

    if cfg.error_metric == "mse":
        d = v0 - v1mean
        err_ref[0, 0] = jnp.sum(d * d) * jnp.float32(1.0 / (B * V))
    else:
        eps = 1e-7
        p = jnp.clip(v1mean, eps, 1.0 - eps)
        err_ref[0, 0] = -jnp.sum(v0 * jnp.log(p)
                                 + (1.0 - v0) * jnp.log(1.0 - p)) * inv_b


@lru_cache(maxsize=512)
def make_pallas_grads_fn(cfg: RBMConfig, interpret: Optional[bool] = None):
    """Fused CD-k step returning (grads, new_chain, err) — no update.

    ``fn(seed[2] int32, v0[B,V], params, chain[B,H])``; usable inside
    shard_map (one call per local shard per step, pmean the outputs)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if interpret is True:
        interpret = pltpu.InterpretParams()
    V, H, B = cfg.n_visible, cfg.n_hidden, cfg.batch_size
    f32 = jnp.float32

    call = pl.pallas_call(
        functools.partial(_cd_grads_kernel, cfg=cfg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (2,)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # batch [B, V]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b (1, V)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c (1, H)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # chain [B, H]
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((V, H), f32), jax.ShapeDtypeStruct((1, V), f32),
            jax.ShapeDtypeStruct((1, H), f32), jax.ShapeDtypeStruct((B, H), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ],
        interpret=interpret,
    )

    def grads_fn(seed, v0, params: RBMParams, chain):
        gW, gb, gc, new_chain, err = call(
            seed, v0, params.W, params.b.reshape(1, -1), params.c.reshape(1, -1),
            chain)
        return RBMParams(W=gW, b=gb[0], c=gc[0]), new_chain, err[0, 0]

    return grads_fn
