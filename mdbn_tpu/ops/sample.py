"""Generative sampling ("daydreaming") from trained models.

The Theano-tutorial lineage the reference descends from demonstrates sampling
from the trained RBM via prolonged Gibbs chains (SURVEY.md §0). Here:

- ``gibbs_sample``: jitted n-step Gibbs chain in a trained RBM; the whole
  chain is one ``lax.scan`` dispatch.
- DBN/MDBN generation: Gibbs in the top (joint) RBM, then a deterministic
  mean-field down-pass through the directed layers below.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig
from ..core.rbm_math import RBMParams, hidden_mean, visible_mean


@partial(jax.jit, static_argnums=(3, 4))
def gibbs_sample(
    params: RBMParams,
    v_init: jax.Array,
    key: jax.Array,
    cfg: RBMConfig,
    n_steps: int,
) -> Tuple[jax.Array, jax.Array]:
    """Run an n-step Gibbs chain from ``v_init`` [B, V].

    Returns (v_mean, v_sample) at the final step — mean-field probabilities
    (for display) and the sampled state (for chaining).
    """
    # the chain runs in f32 regardless of the storage dtype: visible_mean
    # accumulates in f32 (preferred_element_type), so a bf16-stored model
    # would otherwise mismatch the scan carry's dtype
    v_init = jnp.asarray(v_init, jnp.float32)

    def step(carry, k):
        v, _ = carry
        kh, kv = jax.random.split(k)
        hp = hidden_mean(params, v, cfg)
        h = (jax.random.uniform(kh, hp.shape) < hp).astype(jnp.float32)
        vmean = visible_mean(params, h, cfg)
        if cfg.visible == "bernoulli":
            v = (jax.random.uniform(kv, vmean.shape) < vmean).astype(jnp.float32)
        else:
            v = vmean + jax.random.normal(kv, vmean.shape, jnp.float32)
        return (v, vmean), None  # carry the mean; no per-step stacking

    (v, vmean), _ = jax.lax.scan(step, (v_init, v_init),
                                 jax.random.split(key, n_steps))
    return vmean, v


@lru_cache(maxsize=None)
def _down_pass_fn(cfgs: Tuple[RBMConfig, ...]):
    """Mean-field top-down pass through directed layers (deepest first)."""

    @jax.jit
    def down(params_list, h):
        x = h
        for p, cfg in zip(params_list, cfgs):
            x = visible_mean(p, x, cfg)
        return x

    return down


def generate_from_stack(
    layers: Sequence[Tuple[RBMParams, RBMConfig]],
    n_samples: int,
    key: jax.Array,
    n_gibbs: int = 200,
) -> jax.Array:
    """Sample from a DBN: Gibbs in the top RBM, mean-field down-pass below.

    ``layers`` is bottom-up [(params, cfg), ...]. Returns visible-space
    mean-field samples [n_samples, n_visible_bottom].
    """
    top_params, top_cfg = layers[-1]
    kinit, kgibbs = jax.random.split(key)
    v0 = (jax.random.uniform(kinit, (n_samples, top_cfg.n_visible)) < 0.5).astype(
        top_params.W.dtype)
    top_mean, _ = gibbs_sample(top_params, v0, kgibbs, top_cfg, n_gibbs)
    below = layers[:-1]
    if not below:
        return top_mean
    params_list = [p for p, _ in reversed(below)]
    cfgs = tuple(cfg for _, cfg in reversed(below))
    return _down_pass_fn(cfgs)(params_list, top_mean)
