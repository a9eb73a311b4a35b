"""Training state pytree.

Checkpointable unit per SURVEY.md §5: params + momentum velocities + PCD
chain state + RNG key + epoch counter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig
from .rbm_math import RBMParams, init_params, zero_velocity


class TrainState(NamedTuple):
    params: RBMParams
    velocity: RBMParams
    chain_h: jax.Array  # [batch, n_hidden] persistent hidden samples (PCD); zeros if CD
    key: jax.Array  # threefry root key for this RBM's training
    epoch: jax.Array  # scalar int32


def init_train_state(cfg: RBMConfig, key: jax.Array | None = None) -> TrainState:
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    kinit, ktrain = jax.random.split(key)
    params = init_params(cfg, kinit)
    # Theano-tutorial convention: the persistent chain starts at zeros.
    # Parallel tempering (cfg.pt_temps > 1) keeps one persistent chain per
    # temperature rung, stacked along the row dim ([M*batch, n_hidden], rung
    # m = rows [m*batch, (m+1)*batch)) so the TrainState pytree — and every
    # checkpoint — keeps its shape-independent structure.
    rows = cfg.batch_size * (cfg.pt_temps if cfg.pt_temps > 1 else 1)
    chain_h = jnp.zeros((rows, cfg.n_hidden), jnp.dtype(cfg.param_dtype))
    return TrainState(
        params=params,
        velocity=zero_velocity(params),
        chain_h=chain_h,
        key=ktrain,
        epoch=jnp.zeros((), jnp.int32),
    )
