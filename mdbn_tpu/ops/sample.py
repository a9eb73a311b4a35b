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

    sigma = (None if params.z is None
             else jnp.exp(0.5 * params.z.astype(jnp.float32)))

    def step(carry, k):
        v, _ = carry
        kh, kv = jax.random.split(k)
        hp = hidden_mean(params, v, cfg)
        h = (jax.random.uniform(kh, hp.shape) < hp).astype(jnp.float32)
        vmean = visible_mean(params, h, cfg)
        if cfg.visible == "bernoulli":
            v = (jax.random.uniform(kv, vmean.shape) < vmean).astype(jnp.float32)
        else:
            noise = jax.random.normal(kv, vmean.shape, jnp.float32)
            v = vmean + (noise if sigma is None else noise * sigma)
        return (v, vmean), None  # carry the mean; no per-step stacking

    (v, vmean), _ = jax.lax.scan(step, (v_init, v_init),
                                 jax.random.split(key, n_steps))
    return vmean, v


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def gibbs_sample_clamped(
    params: RBMParams,
    v_init: jax.Array,
    clamp_mask: jax.Array,  # [V], 1.0 = clamped to v_init, 0.0 = free
    key: jax.Array,
    cfg: RBMConfig,
    n_steps: int,
    n_burnin: int = 0,
    n_chains: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Clamped Gibbs with a subset of visible units fixed to ``v_init``.

    Conditional inference in the RBM: the free visible units are sampled from
    P(v_free | v_clamped) by alternating h ~ P(h|v) / v ~ P(v|h) and
    overwriting the clamped block each step (Ngiam et al. 2011's multimodal
    inference recipe, applied here to the MDBN's joint RBM for
    missing-modality imputation). Returns ``(v_post_mean, v_sample)``:

    - ``v_post_mean``: the Monte-Carlo posterior mean E[v_free | v_clamped] —
      the per-step mean-field values averaged over the post-``n_burnin``
      steps of ``n_chains`` independent chains per row. One final Gibbs state
      is a single noisy draw; for weakly-separated codes that MC noise can
      swamp the conditional signal, so averaging is the correct deterministic
      readout (noise shrinks as 1/sqrt(chains x steps)).
    - ``v_sample``: the final sampled state of the first chain (for chaining
      / distributional tests). The clamped block passes through unchanged in
      both outputs.
    """
    if not 0 <= n_burnin < n_steps:
        raise ValueError(f"need 0 <= n_burnin < n_steps, got {n_burnin}/{n_steps}")
    v_init = jnp.asarray(v_init, jnp.float32)
    clamp_mask = jnp.asarray(clamp_mask, jnp.float32)
    B = v_init.shape[0]
    v0 = jnp.tile(v_init, (n_chains, 1))  # [C*B, V]

    sigma = (None if params.z is None
             else jnp.exp(0.5 * params.z.astype(jnp.float32)))

    def step(carry, xs):
        v, acc = carry
        k, i = xs
        kh, kv = jax.random.split(k)
        hp = hidden_mean(params, v, cfg)
        h = (jax.random.uniform(kh, hp.shape) < hp).astype(jnp.float32)
        vmean = visible_mean(params, h, cfg)
        if cfg.visible == "bernoulli":
            vs = (jax.random.uniform(kv, vmean.shape) < vmean).astype(jnp.float32)
        else:
            noise = jax.random.normal(kv, vmean.shape, jnp.float32)
            vs = vmean + (noise if sigma is None else noise * sigma)
        v = clamp_mask * v0 + (1.0 - clamp_mask) * vs
        acc = acc + jnp.where(i >= n_burnin, 1.0, 0.0) * vmean
        return (v, acc), None

    (v, acc), _ = jax.lax.scan(
        step, (v0, jnp.zeros_like(v0)),
        (jax.random.split(key, n_steps), jnp.arange(n_steps)))
    post = acc / (n_steps - n_burnin)
    post = post.reshape(n_chains, B, -1).mean(axis=0)
    post = clamp_mask * v_init + (1.0 - clamp_mask) * post
    return post, v[:B]


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
