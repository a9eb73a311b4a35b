"""Associative label-top RBM: the Hinton-Osindero-Teh 2006 generative
classifier (section 4 / figure 1 of "A fast learning algorithm for deep
belief nets").

The 2006 MNIST architecture attaches the labels to the TOP RBM: its visible
layer is the concatenation [penultimate code ; one-hot label], so the top
RBM learns a joint associative memory over codes and classes. Two payoffs
the backprop head (train.finetune) doesn't give:

- **free-energy classification**: p(y | v) ∝ exp(-F_top([code(v); e_y])) —
  an exactly computable posterior over classes under the generative model,
  no separate discriminative parameters;
- a **class-conditional generative model**: clamp the label units and Gibbs
  in the top RBM to dream codes (and, via the down-pass, inputs) of a
  chosen class.

During CD the label block of the visible layer is sampled as a SOFTMAX
group (one categorical draw per row), not independent Bernoullis — the
one-hot support is part of the model. The whole per-epoch loop is one
jitted ``lax.scan``; classification is one fused pass (free energies of all
classes by broadcasting the label rows of W).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig
from ..core.rbm_math import RBMParams, hidden_mean
from ..ops.transform import stack_transform


def _softmax_sample(key, logits):
    """One-hot categorical sample per row (Gumbel-max, fully vectorized)."""
    g = -jnp.log(-jnp.log(jax.random.uniform(
        key, logits.shape, jnp.float32, 1e-20, 1.0)))
    idx = jnp.argmax(logits + g, axis=1)
    return jax.nn.one_hot(idx, logits.shape[1], dtype=jnp.float32)


def _class_logits(params: RBMParams, codes: jax.Array, n_code: int) -> jax.Array:
    """Class-dependent part of -F([codes ; e_y]) for every y: [B, C].

    Softmaxing these gives the EXACT posterior p(y | code) under the
    associative top (terms independent of y — the code-bias energy — cancel
    across classes, so they are omitted). Used by the semi-supervised paths
    to impute the label block of UNLABELED rows with a posterior draw."""
    Wc, Wl = params.W[:n_code], params.W[n_code:]            # [V,H], [C,H]
    bl = params.b[n_code:]
    pre = codes @ Wc + params.c                              # [B, H]
    hid = jax.nn.softplus(pre[:, None, :] + Wl[None, :, :]).sum(axis=2)
    return bl[None, :] + hid                                 # [B, C]


def _posterior_label_fill(key, params: RBMParams, codes, onehot, mask,
                          n_code: int) -> jax.Array:
    """Label block for the positive phase under PARTIAL labels: the true
    one-hot where ``mask`` is 1, a posterior sample y ~ p(y | code) where 0.

    This is the stochastic-EM treatment of the unlabeled rows: CD on the
    marginal p(code) with the label treated as a latent softmax group,
    sampled EXACTLY from its conditional (enumerable over C classes)."""
    y_s = _softmax_sample(key, _class_logits(params, codes, n_code))
    return jnp.where(mask[:, None] > 0, onehot, y_s)


def _validate_partial_labels(labels, n_classes: int) -> Tuple[jax.Array, bool]:
    """Validate class labels where -1 means UNLABELED. Returns
    (int32 labels, semi) with semi = True iff any row is unlabeled."""
    labels = jnp.asarray(labels, jnp.int32)
    if labels.ndim != 1:
        raise ValueError(f"labels must be 1-D class indices, got {labels.shape}")
    lo, hi = int(labels.min()), int(labels.max())
    if lo < -1 or hi >= n_classes:
        raise ValueError(f"labels out of range for n_classes={n_classes} "
                         "(use -1 for unlabeled rows)")
    if hi < 0:
        raise ValueError("every label is -1 (unlabeled) — semi-supervised "
                         "training needs at least one labeled row; for a "
                         "fully unsupervised top, train a plain RBM on the "
                         "codes instead")
    return labels, lo < 0


@lru_cache(maxsize=None)
def _label_top_epoch_fn(n_code: int, n_classes: int, lr: float, k: int,
                        momentum: float, l2: float, semi: bool = False):
    """One jitted epoch of CD-k on the associative top RBM. The visible
    vector is [code (Bernoulli block) ; label (softmax block)]; positive
    phase clamps the true one-hot label, negative phase Gibbs-samples the
    code block as Bernoullis and the label block as a softmax group.

    ``semi``: each minibatch additionally carries a [B] 0/1 labeled-row
    mask; unlabeled rows get their positive-phase label block drawn from
    the exact posterior p(y | code) under the CURRENT params
    (_posterior_label_fill) — CD on the marginal for those rows."""

    def step(carry, xs):
        p, vel = carry
        if semi:
            codes, onehot, mask, key = xs
        else:
            codes, onehot, key = xs
        B = codes.shape[0]
        keys = jax.random.split(key, 3 * k + 1 + semi)
        if semi:
            onehot = _posterior_label_fill(keys[3 * k + 1], p, codes, onehot,
                                           mask, n_code)
        v0 = jnp.concatenate([codes, onehot], axis=1)

        h0p = jax.nn.sigmoid(v0 @ p.W + p.c)
        h = (jax.random.uniform(keys[0], h0p.shape) < h0p).astype(jnp.float32)
        vneg, hkp = v0, h0p
        for t in range(k):
            pre = h @ p.W.T + p.b
            code_mean = jax.nn.sigmoid(pre[:, :n_code])
            code_s = (jax.random.uniform(keys[3 * t + 1], code_mean.shape)
                      < code_mean).astype(jnp.float32)
            label_s = _softmax_sample(keys[3 * t + 2], pre[:, n_code:])
            vneg = jnp.concatenate([code_s, label_s], axis=1)
            hkp = jax.nn.sigmoid(vneg @ p.W + p.c)
            h = (jax.random.uniform(keys[3 * t + 3], hkp.shape)
                 < hkp).astype(jnp.float32)

        grads = RBMParams(
            W=(v0.T @ h0p - vneg.T @ hkp) / B,
            b=(v0 - vneg).mean(axis=0),
            c=(h0p - hkp).mean(axis=0),
        )
        vel = RBMParams(
            W=momentum * vel.W + lr * (grads.W - l2 * p.W),
            b=momentum * vel.b + lr * grads.b,
            c=momentum * vel.c + lr * grads.c,
        )
        p = RBMParams(W=p.W + vel.W, b=p.b + vel.b, c=p.c + vel.c)
        d = v0[:, :n_code] - jax.nn.sigmoid(
            (h @ p.W.T + p.b)[:, :n_code])
        return (p, vel), jnp.mean(d * d)

    if semi:
        @jax.jit
        def epoch(carry, codes_b, onehot_b, mask_b, keys):
            carry, errs = jax.lax.scan(step, carry,
                                       (codes_b, onehot_b, mask_b, keys))
            return carry, errs.mean()
    else:
        @jax.jit
        def epoch(carry, codes_b, onehot_b, keys):
            carry, errs = jax.lax.scan(step, carry, (codes_b, onehot_b, keys))
            return carry, errs.mean()

    return epoch


def fit_label_top(
    layers: Sequence[Tuple[RBMParams, RBMConfig]],
    data: jax.Array,
    labels,
    n_classes: int,
    n_hidden: int = 64,
    epochs: int = 20,
    lr: float = 0.1,
    k: int = 1,
    batch_size: int = 20,
    momentum: float = 0.0,
    l2: float = 0.0,
    seed: int = 0,
    params: Optional[RBMParams] = None,
    mesh=None,
) -> Tuple[RBMParams, List[float]]:
    """Train the associative top RBM over [stack codes ; one-hot labels].

    ``layers`` is the pretrained stack (may be empty: the RBM then sits
    directly on the data). Pass a previous run's ``params`` to RESUME.
    Returns (top RBMParams with W [n_code + n_classes, n_hidden], per-epoch
    code-block reconstruction mse). With a ``mesh`` the CD epochs run
    data-parallel via GSPMD (parallel/dp.dp_put_finetune), same math.

    **Semi-supervised**: rows with label ``-1`` are UNLABELED — their
    positive-phase label block is drawn from the exact posterior
    p(y | code) under the current params each step (stochastic-EM CD on the
    marginal), so scarce clinical labels still shape the associative memory
    while every unlabeled patient contributes to the code model."""
    labels, semi = _validate_partial_labels(labels, n_classes)
    codes = (stack_transform(list(layers), jnp.asarray(data, jnp.float32))
             if layers else jnp.asarray(data, jnp.float32))
    if codes.shape[0] != labels.shape[0]:
        raise ValueError(f"data rows {codes.shape[0]} != labels {labels.shape[0]}")
    n_code = codes.shape[1]

    n = (codes.shape[0] // batch_size) * batch_size
    nb = n // batch_size
    if nb == 0:
        raise ValueError(f"dataset has {codes.shape[0]} samples — fewer than "
                         f"one minibatch (batch_size={batch_size})")
    # one_hot maps -1 (unlabeled) to an all-zero row; the semi step replaces
    # those rows with a posterior draw before the positive phase
    onehot = jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)
    codes_b = codes[:n].reshape(nb, batch_size, n_code)
    onehot_b = onehot[:n].reshape(nb, batch_size, n_classes)
    mask_b = ((labels[:n] >= 0).astype(jnp.float32)
              .reshape(nb, batch_size) if semi else None)

    key = jax.random.PRNGKey(seed)
    if params is None:
        key, kinit = jax.random.split(key)
        params = RBMParams(
            W=0.01 * jax.random.normal(kinit, (n_code + n_classes, n_hidden),
                                       jnp.float32),
            b=jnp.zeros((n_code + n_classes,), jnp.float32),
            c=jnp.zeros((n_hidden,), jnp.float32),
        )
    elif params.W.shape != (n_code + n_classes, n_hidden):
        raise ValueError(f"resume params have W {params.W.shape}, expected "
                         f"{(n_code + n_classes, n_hidden)}")
    vel = RBMParams(W=jnp.zeros_like(params.W), b=jnp.zeros_like(params.b),
                    c=jnp.zeros_like(params.c))
    epoch = _label_top_epoch_fn(n_code, n_classes, float(lr), int(k),
                                float(momentum), float(l2), semi)
    history = []
    carry = (params, vel)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        if semi:
            carry, (codes_b, onehot_b, mask_b) = dp_put_finetune(
                mesh, carry, (codes_b, onehot_b, mask_b))
        else:
            carry, (codes_b, onehot_b) = dp_put_finetune(
                mesh, carry, (codes_b, onehot_b))
    for _ in range(epochs):
        key, kep = jax.random.split(key)
        if semi:
            carry, err = epoch(carry, codes_b, onehot_b, mask_b,
                               jax.random.split(kep, nb))
        else:
            carry, err = epoch(carry, codes_b, onehot_b,
                               jax.random.split(kep, nb))
        history.append(float(err))
    return carry[0], history


@lru_cache(maxsize=None)
def _class_free_energy_fn(n_code: int, n_classes: int):
    @jax.jit
    def neg_f(params, codes):
        """-F([codes ; e_y]) for every class y in one broadcast pass: [N, C]."""
        Wc, Wl = params.W[:n_code], params.W[n_code:]        # [V,H], [C,H]
        bc, bl = params.b[:n_code], params.b[n_code:]
        pre = codes @ Wc + params.c                          # [N, H]
        hid = jax.nn.softplus(pre[:, None, :] + Wl[None, :, :]).sum(axis=2)
        return codes @ bc[:, None] + bl[None, :] + hid       # [N, C]

    return neg_f


def label_top_logits(params: RBMParams, layers, x, n_classes: int) -> jax.Array:
    """Unnormalized log p(y | x) = -F_top([code(x); e_y]) for every class.

    Softmaxing these gives the EXACT class posterior under the associative
    model (the code-marginal term cancels across classes)."""
    codes = (stack_transform(list(layers), jnp.asarray(x, jnp.float32))
             if layers else jnp.asarray(x, jnp.float32))
    n_code = params.W.shape[0] - n_classes
    if codes.shape[1] != n_code:
        raise ValueError(f"codes width {codes.shape[1]} != model's {n_code}")
    return _class_free_energy_fn(n_code, n_classes)(params, codes)


def predict_label_top(params: RBMParams, layers, x, n_classes: int) -> jax.Array:
    """argmax_y -F_top([code(x); e_y]) — 2006-style free-energy classification."""
    return jnp.argmax(label_top_logits(params, layers, x, n_classes), axis=1)


@lru_cache(maxsize=None)
def _labeled_dream_fn(n_code: int, n_gibbs: int):
    """Jitted Gibbs dream in the associative top with the label block
    softmax-sampled. Cached per (n_code, n_gibbs) so repeated generate
    calls reuse one compiled scan instead of re-tracing per call."""

    @jax.jit
    def run(params, code, label, key):
        def one(carry, k):
            code, label = carry
            k1, k2, k3 = jax.random.split(k, 3)
            v = jnp.concatenate([code, label], axis=1)
            hp = jax.nn.sigmoid(v @ params.W + params.c)
            h = (jax.random.uniform(k1, hp.shape) < hp).astype(jnp.float32)
            pre = h @ params.W.T + params.b
            cm = jax.nn.sigmoid(pre[:, :n_code])
            code = (jax.random.uniform(k2, cm.shape) < cm).astype(jnp.float32)
            label = _softmax_sample(k3, pre[:, n_code:])
            return (code, label), cm

        _, cms = jax.lax.scan(one, (code, label),
                              jax.random.split(key, n_gibbs))
        return cms[-1]

    return run


@lru_cache(maxsize=None)
def _clamped_dream_fn(n_code: int, n_gibbs: int):
    """Jitted Gibbs dream with the label block CLAMPED (passed as an
    argument, so one compilation serves every class)."""

    @jax.jit
    def run(params, code, onehot, key):
        def one(carry, k):
            code, = carry
            k1, k2 = jax.random.split(k)
            v = jnp.concatenate([code, onehot], axis=1)
            hp = jax.nn.sigmoid(v @ params.W + params.c)
            h = (jax.random.uniform(k1, hp.shape) < hp).astype(jnp.float32)
            pre = h @ params.W.T + params.b
            cm = jax.nn.sigmoid(pre[:, :n_code])
            code = (jax.random.uniform(k2, cm.shape) < cm).astype(jnp.float32)
            return (code,), cm

        (_,), cms = jax.lax.scan(one, (code,), jax.random.split(key, n_gibbs))
        return cms[-1]

    return run


def generate_labeled_model(
    params: RBMParams,
    layers,
    n_classes: int,
    n_samples: int = 16,
    n_gibbs: int = 200,
    seed: int = 0,
) -> jax.Array:
    """Unconditional dreams from the COMPLETE labeled 2006 model (after
    finetune_updown_labeled every stack layer is directed and the label top
    is the only undirected module): Gibbs over (code, label, hidden) in the
    associative top with the label block softmax-sampled — the same negative
    dynamics labeled up-down's sleep phase uses — then the mean-field
    down-pass through ALL generative layers. Returns
    [n_samples, n_visible_bottom]."""
    n_code = params.W.shape[0] - n_classes
    key = jax.random.PRNGKey(seed)
    key, kinit, klab = jax.random.split(key, 3)
    code = (jax.random.uniform(kinit, (n_samples, n_code)) < 0.5).astype(
        jnp.float32)
    label = _softmax_sample(klab, jnp.zeros((n_samples, n_classes)))
    code_mean = _labeled_dream_fn(int(n_code), int(n_gibbs))(
        params, code, label, key)
    if not layers:
        return code_mean
    from ..ops.sample import _down_pass_fn

    params_list = [p for p, _ in reversed(list(layers))]
    cfgs = tuple(c for _, c in reversed(list(layers)))
    return _down_pass_fn(cfgs)(params_list, code_mean)


def generate_class_conditional(
    params: RBMParams,
    layers,
    label: int,
    n_classes: int,
    n_samples: int = 16,
    n_gibbs: int = 200,
    seed: int = 0,
) -> jax.Array:
    """Dream inputs of ONE class: clamp the label block to e_y, Gibbs over
    (code, hidden) in the top RBM, then mean-field down-pass through the
    stack's generative weights. Returns [n_samples, n_visible_bottom]."""
    if not (0 <= label < n_classes):
        raise ValueError(f"label {label} out of range for {n_classes} classes")
    n_code = params.W.shape[0] - n_classes
    onehot = jnp.tile(jax.nn.one_hot(label, n_classes, dtype=jnp.float32),
                      (n_samples, 1))
    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    code = (jax.random.uniform(kinit, (n_samples, n_code)) < 0.5).astype(
        jnp.float32)
    code_mean = _clamped_dream_fn(int(n_code), int(n_gibbs))(
        params, code, onehot, key)
    if not layers:
        return code_mean
    from ..ops.sample import _down_pass_fn

    params_list = [p for p, _ in reversed(list(layers))]
    cfgs = tuple(c for _, c in reversed(list(layers)))
    return _down_pass_fn(cfgs)(params_list, code_mean)
