"""Epoch/batch training driver.

TPU-first design (SURVEY.md §3.5 / §7 hard-part #1): at batch 20 the CD
matmuls are tiny, so per-step dispatch would dominate. The dataset is uploaded
once and stays HBM-resident; one **epoch** — the whole minibatch loop — is a
single device dispatch (`lax.scan` over batches inside jit, or one Pallas
mega-kernel for the fused engine). Host<->device traffic per epoch is one
scalar (mean reconstruction error) down.

Data parallelism is GSPMD-idiomatic: the epoch fn is jitted over a
``Mesh('dp')`` with the batch dimension sharded and params replicated; XLA
inserts the gradient all-reduce (one psum of the (dW, db, dc) stats per step,
riding ICI) automatically. ``parallel/dp.py`` also provides an explicit
``shard_map`` + ``psum`` variant used to validate the semantics on an
8-device CPU mesh (SURVEY.md §4.5).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RBMConfig, TrainRuntimeConfig
from ..core.rbm_math import RBMParams, apply_update, cd_step_stats
from ..core.state import TrainState, init_train_state
from ..ops.cd_step import draw_uniforms


def _epoch_xla(state: TrainState, data: jax.Array, cfg: RBMConfig) -> Tuple[TrainState, jax.Array]:
    """One epoch, pure-JAX engine: lax.scan over minibatches, all on device.

    ``data``: [n_samples, n_visible], HBM-resident. Returns (state, mean_err).
    """
    n = data.shape[0]
    nb = n // cfg.batch_size
    key, kperm, kepoch = jax.random.split(state.key, 3)

    if cfg.shuffle:
        order = jax.random.permutation(kperm, n)[: nb * cfg.batch_size]
        batches = data[order].reshape(nb, cfg.batch_size, data.shape[1])
    else:
        batches = data[: nb * cfg.batch_size].reshape(nb, cfg.batch_size, data.shape[1])

    def step(carry, xs):
        params, vel, chain = carry
        v0, k = xs
        grads, new_chain, err = cd_step_stats(params, v0, chain if cfg.persistent else None,
                                              draw_uniforms(cfg, cfg.batch_size, k), cfg)
        params, vel = apply_update(params, vel, grads, cfg)
        return (params, vel, new_chain), err

    keys = jax.random.split(kepoch, nb)
    (params, vel, chain), errs = jax.lax.scan(step, (state.params, state.velocity, state.chain_h),
                                              (batches, keys))
    return TrainState(params, vel, chain, key, state.epoch + 1), errs.mean()


def _make_epoch_fn(cfg: RBMConfig, mesh: Optional[Mesh], axis: str) -> Callable:
    """Jit the epoch function, optionally sharded over a dp mesh."""
    if cfg.engine == "pallas" or (cfg.engine == "auto" and mesh is None
                                  and jax.default_backend() not in ("cpu",)):
        try:
            from ..ops.cd_epoch_pallas import make_pallas_epoch_fn

            fn = make_pallas_epoch_fn(cfg)
            if fn is not None:
                return fn
        except Exception:
            if cfg.engine == "pallas":
                raise
    epoch = partial(_epoch_xla, cfg=cfg)
    if mesh is None:
        return jax.jit(epoch)
    # GSPMD data parallelism: batch dim sharded, state replicated. XLA inserts
    # the per-step gradient psum over the 'dp' axis (ICI) automatically.
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(axis))  # shard samples across dp
    chain_sh = NamedSharding(mesh, P(axis))  # PCD chains live with the batch shards
    state_sh = TrainState(
        params=RBMParams(repl, repl, repl),
        velocity=RBMParams(repl, repl, repl),
        chain_h=chain_sh,
        key=repl,
        epoch=repl,
    )
    return jax.jit(epoch, in_shardings=(state_sh, data_sh), out_shardings=(state_sh, repl))


class EpochMetrics:
    __slots__ = ("errors", "updates_per_sec", "wall_seconds")

    def __init__(self):
        self.errors: List[float] = []
        self.updates_per_sec: List[float] = []
        self.wall_seconds: List[float] = []


def train_rbm(
    data: jax.Array,
    cfg: RBMConfig,
    state: Optional[TrainState] = None,
    mesh: Optional[Mesh] = None,
    runtime: Optional[TrainRuntimeConfig] = None,
    epoch_callback: Optional[Callable[[int, float, TrainState], None]] = None,
) -> Tuple[TrainState, EpochMetrics]:
    """Train one RBM for ``cfg.epochs`` epochs; one device dispatch per epoch.

    Mirrors the reference's ``RBM.train`` entry point (BASELINE.json:5) with
    the epoch loop on the host (cold) and everything else on device (hot).
    """
    runtime = runtime or TrainRuntimeConfig()
    axis = runtime.mesh_axis
    if state is None:
        state = init_train_state(cfg)
    data = jnp.asarray(data, jnp.dtype(cfg.param_dtype))

    if runtime.debug_nans:
        jax.config.update("jax_debug_nans", True)

    epoch_fn = _make_epoch_fn(cfg, mesh, axis)
    if mesh is not None:
        data = jax.device_put(data, NamedSharding(mesh, P(axis)))
        state = jax.device_put(
            state,
            TrainState(
                params=RBMParams(*(NamedSharding(mesh, P()),) * 3),
                velocity=RBMParams(*(NamedSharding(mesh, P()),) * 3),
                chain_h=NamedSharding(mesh, P(axis)),
                key=NamedSharding(mesh, P()),
                epoch=NamedSharding(mesh, P()),
            ),
        )

    nb = data.shape[0] // cfg.batch_size
    metrics = EpochMetrics()
    profiling = runtime.profile
    if profiling:
        jax.profiler.start_trace(runtime.profile_dir)
    try:
        for ep in range(cfg.epochs):
            t0 = time.perf_counter()
            state, err = epoch_fn(state, data)
            err = float(err)
            dt = time.perf_counter() - t0
            metrics.errors.append(err)
            metrics.wall_seconds.append(dt)
            metrics.updates_per_sec.append(nb / dt if dt > 0 else float("inf"))
            if epoch_callback is not None:
                epoch_callback(ep, err, state)
    finally:
        if profiling:
            jax.profiler.stop_trace()
    return state, metrics
