"""Supervised DBN fine-tuning: softmax head + backprop through the stack.

The deeplearning.net DBN tutorial — the reference's direct ancestor
(SURVEY.md §0) — follows greedy pretraining with a supervised phase: attach a
logistic-regression layer to the top code and backprop cross-entropy through
the sigmoid stack. Here that phase is a single jitted ``lax.scan`` over
minibatches per epoch using ``jax.grad`` (no hand-written backward pass —
XLA differentiates the whole stack).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig
from ..core.rbm_math import RBMParams, hidden_mean


def _forward_logits(stack_params: List[RBMParams], head: Tuple[jax.Array, jax.Array],
                    cfgs: Tuple[RBMConfig, ...], x: jax.Array) -> jax.Array:
    from ..ops.transform import stack_hidden

    h = stack_hidden(stack_params, cfgs, x)
    Wh, bh = head
    return h @ Wh + bh


def _batched(batch_size: int, n_rows: int):
    """(n_usable, n_batches) with the shared sub-batch guard."""
    n = (n_rows // batch_size) * batch_size
    nb = n // batch_size
    if nb == 0:
        raise ValueError(f"dataset has {n_rows} samples — fewer than one "
                         f"minibatch (batch_size={batch_size})")
    return n, nb


def _check_labels(labels, n_classes: int) -> None:
    """Out-of-range labels would yield NaN losses (take_along_axis fill mode
    under jit) or silently train on the wrong class — validate on host."""
    import numpy as np

    lab = np.asarray(labels)
    if lab.size and (lab.min() < 0 or lab.max() >= n_classes):
        raise ValueError(f"labels must be in [0, {n_classes}); got range "
                         f"[{lab.min()}, {lab.max()}]")


def _sgd(params, forward_logits, xb, yb, epochs: int, lr: float):
    """Shared softmax-cross-entropy SGD loop: scan over minibatches per epoch.
    ``xb`` is any pytree of [nb, B, ...] leaves consumed by forward_logits."""

    def loss_fn(params, xs, y):
        logp = jax.nn.log_softmax(forward_logits(params, xs))
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    @jax.jit
    def epoch(params, _):
        def step(params, xs):
            batch, y = xs
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, y)
            params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
            return params, loss

        params, losses = jax.lax.scan(step, params, (xb, yb))
        return params, losses.mean()

    history = []
    for _ in range(epochs):
        params, mean_loss = epoch(params, None)
        history.append(float(mean_loss))
    return params, history


def finetune_stack(
    layers: List[Tuple[RBMParams, RBMConfig]],
    data: jax.Array,
    labels: jax.Array,
    n_classes: int,
    epochs: int = 10,
    lr: float = 0.1,
    batch_size: int = 20,
    seed: int = 0,
    mesh=None,
) -> Tuple[List[RBMParams], Tuple[jax.Array, jax.Array], List[float]]:
    """Backprop fine-tuning. Returns (tuned stack params, softmax head,
    per-epoch mean cross-entropy). With a ``mesh`` the epoch runs
    data-parallel via GSPMD (parallel/dp.dp_put_finetune), same math."""
    _check_labels(labels, n_classes)
    cfgs = tuple(cfg for _, cfg in layers)
    stack = [p for p, _ in layers]
    key = jax.random.PRNGKey(seed)
    top_width = cfgs[-1].n_hidden
    head = (0.01 * jax.random.normal(key, (top_width, n_classes), jnp.float32),
            jnp.zeros(n_classes, jnp.float32))

    data = jnp.asarray(data, jnp.float32)
    labels = jnp.asarray(labels, jnp.int32)
    n, nb = _batched(batch_size, data.shape[0])
    xb = data[:n].reshape(nb, batch_size, -1)
    yb = labels[:n].reshape(nb, batch_size)

    def forward(params, x):
        stack_p, head_p = params
        return _forward_logits(stack_p, head_p, cfgs, x)

    params = (stack, head)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        params, (xb, yb) = dp_put_finetune(mesh, params, (xb, yb))
    (stack, head), history = _sgd(params, forward, xb, yb, epochs, lr)
    return stack, head, history


def finetune_mdbn(
    towers,  # {name: [(RBMParams, RBMConfig), ...]} in modality order
    joint,  # (RBMParams, RBMConfig)
    modalities,  # {name: [N, d] array}
    labels,
    n_classes: int,
    epochs: int = 10,
    lr: float = 0.1,
    batch_size: int = 20,
    seed: int = 0,
    mesh=None,
):
    """Multimodal supervised fine-tuning: backprop through every tower, the
    concat, and the joint RBM layer into a softmax head. Returns
    (tuned towers dict, tuned joint params, head, per-epoch loss history).
    ``mesh``: GSPMD data-parallel epochs."""
    _check_labels(labels, n_classes)
    names = list(towers)
    tower_cfgs = {m: tuple(cfg for _, cfg in towers[m]) for m in names}
    joint_params, joint_cfg = joint
    key = jax.random.PRNGKey(seed)
    head = (0.01 * jax.random.normal(key, (joint_cfg.n_hidden, n_classes), jnp.float32),
            jnp.zeros(n_classes, jnp.float32))

    labels = jnp.asarray(labels, jnp.int32)
    for m in names:
        if modalities[m].shape[0] != labels.shape[0]:
            raise ValueError(
                f"modality {m!r} has {modalities[m].shape[0]} rows but labels "
                f"has {labels.shape[0]}")
    n, nb = _batched(batch_size, labels.shape[0])
    xb = {m: jnp.asarray(modalities[m], jnp.float32)[:n].reshape(nb, batch_size, -1)
          for m in names}
    yb = labels[:n].reshape(nb, batch_size)

    def forward(params, xs):
        tower_p, joint_p, head_p = params
        return _mdbn_logits(tower_p, tower_cfgs, joint_p, joint_cfg, head_p,
                            names, xs)

    params = ({m: [p_l for p_l, _ in towers[m]] for m in names}, joint_params, head)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        params, (xb, yb) = dp_put_finetune(mesh, params, (xb, yb))
    (tower_p, joint_p, head), history = _sgd(params, forward, xb, yb, epochs, lr)
    return ({m: list(tower_p[m]) for m in names}, joint_p, head, history)


def _mdbn_logits(tower_p, tower_cfgs, joint_p, joint_cfg, head, names, xs):
    from ..ops.transform import stack_hidden

    codes = [stack_hidden(tower_p[m], tower_cfgs[m], xs[m]) for m in names]
    h = hidden_mean(joint_p, jnp.concatenate(codes, axis=1), joint_cfg)
    Wh, bh = head
    return h @ Wh + bh


def predict_mdbn(towers, joint, head, modalities) -> jax.Array:
    names = list(towers)
    tower_p = {m: [p_l for p_l, _ in towers[m]] for m in names}
    tower_cfgs = {m: tuple(cfg for _, cfg in towers[m]) for m in names}
    joint_params, joint_cfg = joint
    xs = {m: jnp.asarray(modalities[m], jnp.float32) for m in names}
    return jnp.argmax(
        _mdbn_logits(tower_p, tower_cfgs, joint_params, joint_cfg, head, names, xs),
        axis=1)


def predict_stack(layers, head, x) -> jax.Array:
    cfgs = tuple(cfg for _, cfg in layers)
    logits = _forward_logits([p for p, _ in layers], head, cfgs,
                             jnp.asarray(x, jnp.float32))
    return jnp.argmax(logits, axis=1)
