"""RNG plumbing + the jitted CD-k training step (the "xla" engine's hot op).

``draw_uniforms`` maps a single threefry key to every random draw one CD-k
step consumes, in the same layout the oracle uses, so the deterministic core
(``core.rbm_math.cd_step_stats``) is shared and exactly testable. The Pallas
engine (``ops.cd_epoch_pallas``) replaces this path with in-kernel PRNG and is
tested distributionally (SURVEY.md §4.2).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig
from ..core.rbm_math import RBMParams, apply_update, cd_step_stats


def draw_uniforms(cfg: RBMConfig, batch: int, key: jax.Array) -> Dict[str, jax.Array]:
    kh0, kv, kh, kn = jax.random.split(key, 4)
    u = {
        "h0": jax.random.uniform(kh0, (batch, cfg.n_hidden), jnp.float32),
        "v": jax.random.uniform(kv, (cfg.k, batch, cfg.n_visible), jnp.float32),
        "h": jax.random.uniform(kh, (cfg.k, batch, cfg.n_hidden), jnp.float32),
    }
    if cfg.visible == "gaussian" and cfg.resolved_sample_visible:
        u["noise"] = jax.random.normal(kn, (cfg.k, batch, cfg.n_visible), jnp.float32)
    return u


def draw_pt_uniforms(cfg: RBMConfig, batch: int, key: jax.Array) -> Dict[str, jax.Array]:
    """Uniforms for one parallel-tempering update (core.rbm_math.pt_step_stats
    and oracle.pt_step_stats share this exact layout): the Gibbs draws gain a
    leading rung dim M, plus [2, M-1, batch] swap uniforms (even + odd round)."""
    M = cfg.pt_temps
    kh0, kv, kh, kn, ks = jax.random.split(key, 5)
    u = {
        "h0": jax.random.uniform(kh0, (batch, cfg.n_hidden), jnp.float32),
        "v": jax.random.uniform(kv, (cfg.k, M, batch, cfg.n_visible), jnp.float32),
        "h": jax.random.uniform(kh, (cfg.k, M, batch, cfg.n_hidden), jnp.float32),
        "swap": jax.random.uniform(ks, (2, M - 1, batch), jnp.float32),
    }
    if cfg.visible == "gaussian" and cfg.resolved_sample_visible:
        u["noise"] = jax.random.normal(kn, (cfg.k, M, batch, cfg.n_visible), jnp.float32)
    return u


def cd_train_step(
    params: RBMParams,
    velocity: RBMParams,
    chain_h: Optional[jax.Array],
    v0: jax.Array,
    key: jax.Array,
    cfg: RBMConfig,
    axis_name: Optional[str] = None,
    epoch=0,
) -> Tuple[RBMParams, RBMParams, jax.Array, jax.Array]:
    """One full CD-k/PCD weight update: stats -> (allreduce) -> momentum+L2.

    Pass ``epoch`` when using a momentum schedule (cfg.initial_momentum).
    Under data parallelism ``axis_name`` names the mesh axis: the minibatch is
    sharded across it, and gradients/error are mean-allreduced over ICI
    (``lax.pmean`` => one psum per step, SURVEY.md §2.4). Because the local
    stats are already batch means, the pmean of means equals the global-batch
    mean — DP math is identical to single-chip math.
    """
    grads, new_chain, err = cd_step_stats(params, v0, chain_h, draw_uniforms(cfg, v0.shape[0], key), cfg)
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        err = jax.lax.pmean(err, axis_name)
    new_params, new_velocity = apply_update(params, velocity, grads, cfg, epoch=epoch)
    return new_params, new_velocity, new_chain, err
