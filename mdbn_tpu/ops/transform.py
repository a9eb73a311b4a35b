"""Deterministic forward passes (feature extraction / reconstruction).

The reference's ``transform`` is a mean-field upward pass — probabilities,
never samples (SURVEY.md §3.4) — so it jits to a chain of fused
matmul+sigmoid layers; one dispatch covers the whole cohort.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig
from ..core.rbm_math import RBMParams, hidden_mean, visible_mean


@partial(jax.jit, static_argnums=(2,))
def transform(params: RBMParams, v: jax.Array, cfg: RBMConfig) -> jax.Array:
    return hidden_mean(params, v, cfg)


@partial(jax.jit, static_argnums=(2,))
def reconstruct(params: RBMParams, v: jax.Array, cfg: RBMConfig) -> jax.Array:
    return visible_mean(params, hidden_mean(params, v, cfg), cfg)


def stack_hidden(params_list, cfgs, x: jax.Array) -> jax.Array:
    """Un-jitted mean-field upward pass through a stack — the ONE definition
    of the forward semantics, shared by transform and the fine-tuning paths
    (callers jit/differentiate it as needed)."""
    h = x
    for p, cfg in zip(params_list, cfgs):
        h = hidden_mean(p, h, cfg)
    return h


@lru_cache(maxsize=None)
def _stack_fwd(cfgs: Tuple[RBMConfig, ...]):
    @jax.jit
    def fwd(params_list, v):
        return stack_hidden(params_list, cfgs, v)

    return fwd


def stack_transform(layers: Sequence[Tuple[RBMParams, RBMConfig]], v: jax.Array) -> jax.Array:
    """Forward through a DBN stack in one jitted pass (cached per stack spec)."""
    cfgs = tuple(cfg for _, cfg in layers)
    return _stack_fwd(cfgs)([p for p, _ in layers], v)
