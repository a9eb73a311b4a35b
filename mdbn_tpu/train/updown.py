"""Generative DBN fine-tuning: the up-down (contrastive wake-sleep)
algorithm of Hinton, Osindero & Teh 2006 ("A fast learning algorithm for
deep belief nets", appendix B).

Greedy pretraining leaves a DBN whose lower layers are directed sigmoid
belief layers with TIED recognition/generative weights and whose top RBM is
undirected. Up-down unties them and fine-tunes all three groups jointly:

- **wake**: a stochastic up-pass through the recognition weights produces
  sampled states s_0..s_{L-1}; each directed layer's GENERATIVE weights are
  nudged so its down-prediction of s_l from s_{l+1} improves
  (delta-rule: dG_l ∝ (s_l - p_down_l)' s_{l+1}).
- **top**: a standard CD-k update of the top RBM at the wake states.
- **sleep**: the top RBM's negative sample is propagated DOWN through the
  generative weights; each layer's RECOGNITION weights are nudged so its
  up-prediction of the dreamed s'_{l+1} from s'_l improves.

The whole per-epoch loop is one jitted ``lax.scan`` over minibatches; the
three weight groups live in one pytree. Unsupervised variant (the 2006
paper adds label softmax units at the top; the classifier path here is
``train.finetune``).

After this phase the stack is the 2006 directed generative model: the
up-pass (transform) uses the recognition weights, generation uses the top
RBM + generative down weights. Single-RBM energy tools (free_energy, AIS on
a mid-layer) refer to the pretrained semantics this phase leaves behind —
the DBN's generative quality is what improves (validated against the exact
enumerated DBN likelihood in tests/test_updown.py).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import RBMConfig
from ..core.rbm_math import (RBMParams, check_fixed_variance_layers,
                             hidden_mean, visible_mean)
from .labeled import _softmax_sample


def _bern(key, p):
    return (jax.random.uniform(key, p.shape) < p).astype(jnp.float32)


def _down_mean(gen: Tuple[jax.Array, jax.Array], h: jax.Array,
               cfg: RBMConfig) -> jax.Array:
    """Generative down-prediction through one directed layer."""
    W, b = gen
    pre = h @ W.T + b
    return jax.nn.sigmoid(pre) if cfg.visible == "bernoulli" else pre


@lru_cache(maxsize=None)
def _updown_epoch_fn(cfgs: Tuple[RBMConfig, ...], top_cfg: RBMConfig,
                     lr: float, k: int):
    """One jitted epoch of up-down. ``cfgs`` are the directed layers'
    (pretraining) configs bottom-up — cfg.visible of layer 0 selects the
    bottom down-prediction/sleep-sampling family, exactly as in CD."""
    L = len(cfgs)

    def step(params, xs):
        rec, gen, top = params
        v0, key = xs
        B = v0.shape[0]
        keys = jax.random.split(key, 2 * L + 2 * k + 2)

        # --- wake: stochastic up-pass through recognition weights ---
        s = [v0]
        for l in range(L):
            p_up = hidden_mean(rec[l], s[l], cfgs[l])
            s.append(_bern(keys[l], p_up))

        # generative-weight delta rule from the wake states
        new_gen = []
        wake_err = None
        for l in range(L):
            p_down = _down_mean(gen[l], s[l + 1], cfgs[l])
            resid = s[l] - p_down
            W, b = gen[l]
            new_gen.append((W + (lr / B) * (resid.T @ s[l + 1]),
                            b + lr * resid.mean(axis=0)))
            if l == 0:
                d = v0 - p_down
                wake_err = jnp.mean(d * d)

        # --- top RBM: CD-k at the wake top states (house conventions:
        # probabilities in the statistics, samples through the chain) ---
        vt = s[L]
        h0p = hidden_mean(top, vt, top_cfg)
        h = _bern(keys[L], h0p)
        vneg = vt
        hkp = h0p
        for t in range(k):
            vmean = visible_mean(top, h, top_cfg)
            vneg = _bern(keys[L + 1 + 2 * t], vmean)
            hkp = hidden_mean(top, vneg, top_cfg)
            h = _bern(keys[L + 2 + 2 * t], hkp)
        top = RBMParams(
            W=top.W + (lr / B) * (vt.T @ h0p - vneg.T @ hkp),
            b=top.b + lr * (vt - vneg).mean(axis=0),
            c=top.c + lr * (h0p - hkp).mean(axis=0),
        )

        # --- sleep: dream DOWN from the top RBM's negative sample, then
        # nudge recognition weights toward the dreamed states ---
        sp = [None] * (L + 1)
        sp[L] = vneg
        for l in range(L - 1, -1, -1):
            p_down = _down_mean(new_gen[l], sp[l + 1], cfgs[l])
            if cfgs[l].visible == "bernoulli":
                sp[l] = _bern(keys[L + 1 + 2 * k + l], p_down)
            elif cfgs[l].resolved_sample_visible:
                sp[l] = p_down + jax.random.normal(
                    keys[L + 1 + 2 * k + l], p_down.shape, jnp.float32)
            else:
                sp[l] = p_down
        new_rec = []
        for l in range(L):
            q_up = hidden_mean(rec[l], sp[l], cfgs[l])
            resid = sp[l + 1] - q_up
            new_rec.append(RBMParams(
                W=rec[l].W + (lr / B) * (sp[l].T @ resid),
                b=rec[l].b,  # unused on the up-pass; kept for structure
                c=rec[l].c + lr * resid.mean(axis=0),
            ))

        return (new_rec, new_gen, top), wake_err

    @jax.jit
    def epoch(params, xb, keys):
        params, errs = jax.lax.scan(step, params, (xb, keys))
        return params, errs.mean()

    return epoch


def finetune_updown_stack(
    layers: Sequence[Tuple[RBMParams, RBMConfig]],
    data: jax.Array,
    epochs: int = 10,
    lr: float = 0.01,
    k: int = 1,
    batch_size: int = 20,
    seed: int = 0,
    gen: Optional[List[Tuple[jax.Array, jax.Array]]] = None,
    mesh=None,
) -> Tuple[List[RBMParams], List[Tuple[jax.Array, jax.Array]], RBMParams, List[float]]:
    """Up-down fine-tuning of a pretrained stack (bottom-up ``layers``; the
    last entry is the undirected top RBM, the rest become directed).

    Returns (recognition layer params, generative (W, b) per directed layer,
    top RBM params, per-epoch wake reconstruction mse). Pass a previous run's
    ``gen`` to RESUME with the already-untied generative weights. With a
    ``mesh`` the epoch runs data-parallel via GSPMD (minibatch rows sharded,
    params replicated — parallel/dp.dp_put_finetune), same math.
    """
    if len(layers) < 2:
        raise ValueError("up-down fine-tuning needs >= 2 layers (directed "
                         "layers below an undirected top RBM); a single RBM "
                         "has nothing to untie")
    check_fixed_variance_layers(layers, "up-down fine-tuning")
    *directed, (top_params, top_cfg) = layers
    cfgs = tuple(cfg for _, cfg in directed)
    rec = [p for p, _ in directed]
    if gen is None:
        # tied start: the pretrained weights serve both roles (Hinton 2006)
        gen = [(p.W, p.b) for p, _ in directed]
    elif len(gen) != len(directed):
        raise ValueError(f"gen has {len(gen)} layers, stack has {len(directed)} "
                         "directed layers")

    data = jnp.asarray(data, jnp.float32)
    n = (data.shape[0] // batch_size) * batch_size
    nb = n // batch_size
    if nb == 0:
        raise ValueError(f"dataset has {data.shape[0]} samples — fewer than "
                         f"one minibatch (batch_size={batch_size})")
    xb = data[:n].reshape(nb, batch_size, -1)

    epoch = _updown_epoch_fn(cfgs, top_cfg, float(lr), int(k))
    params = (rec, [(jnp.asarray(W, jnp.float32), jnp.asarray(b, jnp.float32))
                    for W, b in gen], top_params)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        params, xb = dp_put_finetune(mesh, params, xb)
    key = jax.random.PRNGKey(seed)
    history = []
    for _ in range(epochs):
        key, kepoch = jax.random.split(key)
        params, err = epoch(params, xb, jax.random.split(kepoch, nb))
        history.append(float(err))
    rec, gen, top_params = params
    return list(rec), list(gen), top_params, history


# --- labeled up-down: the COMPLETE Hinton-Osindero-Teh 2006 algorithm --------
#
# The 2006 MNIST network fine-tunes the whole stack with the labels attached
# to the associative top RBM (visible = [top code ; one-hot label]): wake
# clamps the TRUE label while the top RBM does CD, sleep dreams both the
# code and the label. Every stack layer is directed below the label top.
# After this phase the free-energy classifier (train.labeled) reads the
# tuned associative memory, and class-conditional generation dreams through
# the untied generative weights.


@lru_cache(maxsize=None)
def _updown_labeled_epoch_fn(cfgs: Tuple[RBMConfig, ...], n_code: int,
                             n_classes: int, lr: float, k: int,
                             semi: bool = False):
    """One jitted epoch of labeled up-down. ``cfgs`` = ALL stack layers'
    configs bottom-up (all directed); the label top is the undirected top.

    ``semi``: minibatches carry a [B] 0/1 labeled-row mask; unlabeled rows
    wake with a posterior label draw p(y | wake code) instead of a clamped
    truth (train.labeled._posterior_label_fill)."""
    L = len(cfgs)

    def step(params, xs):
        rec, gen, top = params
        if semi:
            v0, onehot, mask, key = xs
        else:
            v0, onehot, key = xs
        B = v0.shape[0]
        keys = jax.random.split(key, L + 3 * k + 1 + L + semi)

        # --- wake: stochastic up-pass through recognition weights ---
        s = [v0]
        for l in range(L):
            p_up = hidden_mean(rec[l], s[l], cfgs[l])
            s.append(_bern(keys[l], p_up))
        new_gen = []
        wake_err = None
        for l in range(L):
            p_down = _down_mean(gen[l], s[l + 1], cfgs[l])
            resid = s[l] - p_down
            W, b = gen[l]
            new_gen.append((W + (lr / B) * (resid.T @ s[l + 1]),
                            b + lr * resid.mean(axis=0)))
            if l == 0:
                d = v0 - p_down
                wake_err = jnp.mean(d * d)

        # --- associative top RBM: CD-k with the true label CLAMPED in the
        # positive phase and the label block softmax-dreamed in the negative
        if semi:
            from .labeled import _posterior_label_fill

            onehot = _posterior_label_fill(keys[L + 3 * k + 1 + L], top,
                                           s[L], onehot, mask, n_code)
        vt = jnp.concatenate([s[L], onehot], axis=1)
        h0p = jax.nn.sigmoid(vt @ top.W + top.c)
        h = _bern(keys[L], h0p)
        vneg, hkp = vt, h0p
        for t in range(k):
            pre = h @ top.W.T + top.b
            code_mean = jax.nn.sigmoid(pre[:, :n_code])
            code_s = _bern(keys[L + 1 + 3 * t], code_mean)
            # one-hot draw of the dreamed label (bit-identical to the
            # inline Gumbel-max this replaces)
            label_s = _softmax_sample(keys[L + 2 + 3 * t], pre[:, n_code:])
            vneg = jnp.concatenate([code_s, label_s], axis=1)
            hkp = jax.nn.sigmoid(vneg @ top.W + top.c)
            h = _bern(keys[L + 3 + 3 * t], hkp)
        top = RBMParams(
            W=top.W + (lr / B) * (vt.T @ h0p - vneg.T @ hkp),
            b=top.b + lr * (vt - vneg).mean(axis=0),
            c=top.c + lr * (h0p - hkp).mean(axis=0),
        )

        # --- sleep: dream down from the negative CODE block ---
        sp = [None] * (L + 1)
        sp[L] = vneg[:, :n_code]
        base = L + 3 * k + 1
        for l in range(L - 1, -1, -1):
            p_down = _down_mean(new_gen[l], sp[l + 1], cfgs[l])
            if cfgs[l].visible == "bernoulli":
                sp[l] = _bern(keys[base + l], p_down)
            elif cfgs[l].resolved_sample_visible:
                sp[l] = p_down + jax.random.normal(
                    keys[base + l], p_down.shape, jnp.float32)
            else:
                sp[l] = p_down
        new_rec = []
        for l in range(L):
            q_up = hidden_mean(rec[l], sp[l], cfgs[l])
            resid = sp[l + 1] - q_up
            new_rec.append(RBMParams(
                W=rec[l].W + (lr / B) * (sp[l].T @ resid),
                b=rec[l].b,
                c=rec[l].c + lr * resid.mean(axis=0),
            ))
        return (new_rec, new_gen, top), wake_err

    if semi:
        @jax.jit
        def epoch(params, xb, yb, mb, keys):
            params, errs = jax.lax.scan(step, params, (xb, yb, mb, keys))
            return params, errs.mean()
    else:
        @jax.jit
        def epoch(params, xb, yb, keys):
            params, errs = jax.lax.scan(step, params, (xb, yb, keys))
            return params, errs.mean()

    return epoch


def finetune_updown_labeled(
    layers: Sequence[Tuple[RBMParams, RBMConfig]],
    label_top: RBMParams,
    data: jax.Array,
    labels,
    n_classes: int,
    epochs: int = 10,
    lr: float = 0.01,
    k: int = 1,
    batch_size: int = 20,
    seed: int = 0,
    gen: Optional[List[Tuple[jax.Array, jax.Array]]] = None,
    mesh=None,
) -> Tuple[List[RBMParams], List[Tuple[jax.Array, jax.Array]], RBMParams, List[float]]:
    """Labeled up-down over a full stack + associative label top (the
    complete 2006 algorithm). ALL ``layers`` become directed; ``label_top``
    (from train.labeled.fit_label_top) is the undirected top over
    [top code ; one-hot label]. ``mesh``: GSPMD data-parallel epochs.

    Returns (recognition params per layer, generative (W, b) per layer,
    tuned label-top RBMParams, per-epoch wake reconstruction mse).

    **Semi-supervised**: rows with label ``-1`` wake with a posterior label
    draw p(y | wake code) in place of the clamped truth (see
    train.labeled.fit_label_top)."""
    from .labeled import _validate_partial_labels

    if not layers:
        raise ValueError("labeled up-down needs >= 1 stack layer below the "
                         "label top")
    check_fixed_variance_layers(layers, "labeled up-down fine-tuning")
    labels, semi = _validate_partial_labels(labels, n_classes)
    n_code = layers[-1][0].W.shape[1]
    if label_top.W.shape[0] != n_code + n_classes:
        raise ValueError(f"label top has visible {label_top.W.shape[0]}, "
                         f"expected code {n_code} + {n_classes} classes")
    cfgs = tuple(cfg for _, cfg in layers)
    rec = [p for p, _ in layers]
    if gen is None:
        gen = [(p.W, p.b) for p, _ in layers]
    elif len(gen) != len(layers):
        raise ValueError(f"gen has {len(gen)} layers, stack has {len(layers)}")

    data = jnp.asarray(data, jnp.float32)
    if data.shape[0] != labels.shape[0]:
        raise ValueError(f"data rows {data.shape[0]} != labels {labels.shape[0]}")
    n = (data.shape[0] // batch_size) * batch_size
    nb = n // batch_size
    if nb == 0:
        raise ValueError(f"dataset has {data.shape[0]} samples — fewer than "
                         f"one minibatch (batch_size={batch_size})")
    xb = data[:n].reshape(nb, batch_size, -1)
    # one_hot maps -1 (unlabeled) to an all-zero row; the semi wake replaces
    # those rows with a posterior draw
    yb = jax.nn.one_hot(labels[:n], n_classes,
                        dtype=jnp.float32).reshape(nb, batch_size, n_classes)
    mb = ((labels[:n] >= 0).astype(jnp.float32)
          .reshape(nb, batch_size) if semi else None)

    epoch = _updown_labeled_epoch_fn(cfgs, int(n_code), int(n_classes),
                                     float(lr), int(k), semi)
    params = (rec, [(jnp.asarray(W, jnp.float32), jnp.asarray(b, jnp.float32))
                    for W, b in gen], label_top)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        if semi:
            params, (xb, yb, mb) = dp_put_finetune(mesh, params, (xb, yb, mb))
        else:
            params, (xb, yb) = dp_put_finetune(mesh, params, (xb, yb))
    key = jax.random.PRNGKey(seed)
    history = []
    for _ in range(epochs):
        key, kepoch = jax.random.split(key)
        if semi:
            params, err = epoch(params, xb, yb, mb,
                                jax.random.split(kepoch, nb))
        else:
            params, err = epoch(params, xb, yb, jax.random.split(kepoch, nb))
        history.append(float(err))
    rec, gen, label_top = params
    return list(rec), list(gen), label_top, history


# --- multimodal (MDBN) up-down -----------------------------------------------
#
# The MDBN generative model is a TREE-structured 2006 DBN: the joint RBM is
# the undirected top over the concatenated tower codes, and EVERY tower layer
# (including each tower's pretrained top RBM) becomes a directed sigmoid
# layer below it. Up-down generalizes directly: wake runs a stochastic
# recognition up-pass per tower and a CD-k update of the joint RBM at the
# concatenated wake codes; sleep dreams down from the joint RBM's negative
# sample, splitting the concat back into tower slices.


@lru_cache(maxsize=None)
def _updown_mdbn_epoch_fn(tower_cfgs, joint_cfg: RBMConfig, lr: float, k: int):
    """``tower_cfgs``: tuple of (name, (cfg, ...)) in modality order."""
    names = [n for n, _ in tower_cfgs]
    cfg_of = dict(tower_cfgs)

    def step(params, xs):
        rec, gen, joint = params
        batches, key = xs
        B = next(iter(batches.values())).shape[0]
        nk = sum(2 * len(cfg_of[n]) for n in names) + 2 * k + 1
        keys = iter(jax.random.split(key, nk))

        # --- wake: per-tower stochastic recognition up-pass ---
        wakes = {}
        new_gen = {}
        wake_err = 0.0
        for n in names:
            s = [batches[n]]
            for l, cfg in enumerate(cfg_of[n]):
                p_up = hidden_mean(rec[n][l], s[l], cfg)
                s.append(_bern(next(keys), p_up))
            wakes[n] = s
            ng = []
            for l, cfg in enumerate(cfg_of[n]):
                p_down = _down_mean(gen[n][l], s[l + 1], cfg)
                resid = s[l] - p_down
                W, b = gen[n][l]
                ng.append((W + (lr / B) * (resid.T @ s[l + 1]),
                           b + lr * resid.mean(axis=0)))
                if l == 0:
                    d = batches[n] - p_down
                    wake_err = wake_err + jnp.mean(d * d)
            new_gen[n] = ng
        wake_err = wake_err / len(names)

        # --- joint RBM: CD-k at the concatenated wake codes ---
        vt = jnp.concatenate([wakes[n][-1] for n in names], axis=1)
        h0p = hidden_mean(joint, vt, joint_cfg)
        h = _bern(next(keys), h0p)
        vneg = vt
        hkp = h0p
        for _ in range(k):
            vmean = visible_mean(joint, h, joint_cfg)
            vneg = _bern(next(keys), vmean)
            hkp = hidden_mean(joint, vneg, joint_cfg)
            h = _bern(next(keys), hkp)
        joint = RBMParams(
            W=joint.W + (lr / B) * (vt.T @ h0p - vneg.T @ hkp),
            b=joint.b + lr * (vt - vneg).mean(axis=0),
            c=joint.c + lr * (h0p - hkp).mean(axis=0),
        )

        # --- sleep: dream down per tower from the joint negative sample ---
        new_rec = {}
        offset = 0
        for n in names:
            L = len(cfg_of[n])
            width = rec[n][-1].W.shape[1]
            sp = [None] * (L + 1)
            sp[L] = jax.lax.dynamic_slice_in_dim(vneg, offset, width, axis=1)
            offset += width
            for l in range(L - 1, -1, -1):
                cfg = cfg_of[n][l]
                p_down = _down_mean(new_gen[n][l], sp[l + 1], cfg)
                if cfg.visible == "bernoulli":
                    sp[l] = _bern(next(keys), p_down)
                elif cfg.resolved_sample_visible:
                    sp[l] = p_down + jax.random.normal(
                        next(keys), p_down.shape, jnp.float32)
                else:
                    sp[l] = p_down
            nr = []
            for l, cfg in enumerate(cfg_of[n]):
                q_up = hidden_mean(rec[n][l], sp[l], cfg)
                resid = sp[l + 1] - q_up
                nr.append(RBMParams(
                    W=rec[n][l].W + (lr / B) * (sp[l].T @ resid),
                    b=rec[n][l].b,
                    c=rec[n][l].c + lr * resid.mean(axis=0),
                ))
            new_rec[n] = nr

        return (new_rec, new_gen, joint), wake_err

    @jax.jit
    def epoch(params, xb, keys):
        params, errs = jax.lax.scan(step, params, (xb, keys))
        return params, errs.mean()

    return epoch


def finetune_updown_mdbn(
    towers,  # {name: [(RBMParams, RBMConfig)] bottom-up, ALL directed}
    joint: Tuple[RBMParams, RBMConfig],
    modalities,  # {name: [n, features]}
    epochs: int = 10,
    lr: float = 0.01,
    k: int = 1,
    batch_size: int = 20,
    seed: int = 0,
    gen=None,  # {name: [(W, b)]} to resume with untied generative weights
    mesh=None,
):
    """Up-down fine-tuning of a full MDBN (towers + joint RBM).

    Returns (recognition {name: [RBMParams]}, generative {name: [(W, b)]},
    joint RBMParams, per-epoch mean wake reconstruction mse). Modality order
    follows ``towers`` insertion order and must match the concat layout the
    joint RBM was trained on (models/mdbn.py uses config insertion order).
    ``mesh``: GSPMD data-parallel epochs (parallel/dp.dp_put_finetune).
    """
    if set(towers) != set(modalities):
        raise ValueError(f"towers {sorted(towers)} and modalities "
                         f"{sorted(modalities)} disagree")
    for tname, tl in towers.items():
        check_fixed_variance_layers(tl, f"up-down fine-tuning (tower {tname!r})")
    joint_params, joint_cfg = joint
    names = list(towers)
    rows = {n: int(jnp.shape(modalities[n])[0]) for n in names}
    if len(set(rows.values())) != 1:
        raise ValueError(f"modalities disagree on rows: {rows}")
    n_rows = next(iter(rows.values()))
    nb = (n_rows // batch_size)
    if nb == 0:
        raise ValueError(f"dataset has {n_rows} samples — fewer than one "
                         f"minibatch (batch_size={batch_size})")

    rec = {n: [p for p, _ in towers[n]] for n in names}
    if gen is None:
        gen = {n: [(p.W, p.b) for p, _ in towers[n]] for n in names}
    else:
        for n in names:
            if n not in gen or len(gen[n]) != len(towers[n]):
                raise ValueError(f"gen for tower {n!r} missing or wrong depth")
        gen = {n: [(jnp.asarray(W, jnp.float32), jnp.asarray(b, jnp.float32))
                   for W, b in gen[n]] for n in names}

    xb = {}
    for n in names:
        d = jnp.asarray(modalities[n], jnp.float32)
        xb[n] = d[: nb * batch_size].reshape(nb, batch_size, -1)

    tower_cfgs = tuple((n, tuple(cfg for _, cfg in towers[n])) for n in names)
    epoch = _updown_mdbn_epoch_fn(tower_cfgs, joint_cfg, float(lr), int(k))
    params = (rec, gen, joint_params)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        params, xb = dp_put_finetune(mesh, params, xb)
    key = jax.random.PRNGKey(seed)
    history = []
    for _ in range(epochs):
        key, kepoch = jax.random.split(key)
        params, err = epoch(params, xb, jax.random.split(kepoch, nb))
        history.append(float(err))
    rec, gen, joint_params = params
    return ({n: list(v) for n, v in rec.items()},
            {n: list(v) for n, v in gen.items()}, joint_params, history)


# --- labeled multimodal up-down: the complete 2006 algorithm on the tree -----
#
# With an associative label top fitted over the JOINT codes
# (models/mdbn.fit_label_top), the complete labeled MDBN generative model
# makes the label top the only undirected module: every tower layer AND the
# joint layer become directed sigmoid layers. Wake adds a recognition
# up-sample through the joint layer plus its generative delta-rule toward
# the wake concat; the label-top CD clamps the true patient label; sleep
# dreams (joint code, label), reconstitutes the concat through the joint
# generative weights, and dreams down each tower.


@lru_cache(maxsize=None)
def _updown_mdbn_labeled_epoch_fn(tower_cfgs, n_code: int, n_classes: int,
                                  lr: float, k: int, semi: bool = False):
    """``tower_cfgs``: tuple of (name, (cfg, ...)) in modality order;
    ``n_code``: the joint layer's hidden width (= the label top's code
    block). ``semi``: minibatches carry a [B] 0/1 labeled-row mask;
    unlabeled rows wake with a posterior label draw p(y | joint wake code)
    instead of a clamped truth."""
    names = [n for n, _ in tower_cfgs]
    cfg_of = dict(tower_cfgs)

    def step(params, xs):
        rec, gen, jrec, jgen, top = params
        if semi:
            batches, onehot, mask, key = xs
        else:
            batches, onehot, key = xs
        B = onehot.shape[0]
        nk = sum(2 * len(cfg_of[n]) for n in names) + 3 * k + 3 + semi
        keys = iter(jax.random.split(key, nk))

        # --- wake per tower + tower generative updates (the unlabeled tree's
        # recipe unchanged) ---
        wakes, new_gen = {}, {}
        wake_err = 0.0
        for n in names:
            s = [batches[n]]
            for l, cfg in enumerate(cfg_of[n]):
                p_up = hidden_mean(rec[n][l], s[l], cfg)
                s.append(_bern(next(keys), p_up))
            wakes[n] = s
            ng = []
            for l, cfg in enumerate(cfg_of[n]):
                p_down = _down_mean(gen[n][l], s[l + 1], cfg)
                resid = s[l] - p_down
                W, b = gen[n][l]
                ng.append((W + (lr / B) * (resid.T @ s[l + 1]),
                           b + lr * resid.mean(axis=0)))
                if l == 0:
                    d = batches[n] - p_down
                    wake_err = wake_err + jnp.mean(d * d)
            new_gen[n] = ng
        wake_err = wake_err / len(names)

        # --- the joint layer is DIRECTED here: recognition up-sample to the
        # joint code, generative delta-rule toward the wake concat ---
        vt_c = jnp.concatenate([wakes[n][-1] for n in names], axis=1)
        pj = jax.nn.sigmoid(vt_c @ jrec.W + jrec.c)
        s_j = _bern(next(keys), pj)
        Wjg, bjg = jgen
        p_down_c = jax.nn.sigmoid(s_j @ Wjg.T + bjg)
        resid_c = vt_c - p_down_c
        new_jgen = (Wjg + (lr / B) * (resid_c.T @ s_j),
                    bjg + lr * resid_c.mean(axis=0))

        # --- associative label top: CD-k with the true label CLAMPED in the
        # positive phase, code + softmax label dreamed in the negative ---
        if semi:
            from .labeled import _posterior_label_fill

            onehot = _posterior_label_fill(next(keys), top, s_j, onehot,
                                           mask, n_code)
        vt = jnp.concatenate([s_j, onehot], axis=1)
        h0p = jax.nn.sigmoid(vt @ top.W + top.c)
        h = _bern(next(keys), h0p)
        vneg, hkp = vt, h0p
        for _ in range(k):
            pre = h @ top.W.T + top.b
            code_s = _bern(next(keys), jax.nn.sigmoid(pre[:, :n_code]))
            label_s = _softmax_sample(next(keys), pre[:, n_code:])
            vneg = jnp.concatenate([code_s, label_s], axis=1)
            hkp = jax.nn.sigmoid(vneg @ top.W + top.c)
            h = _bern(next(keys), hkp)
        top = RBMParams(
            W=top.W + (lr / B) * (vt.T @ h0p - vneg.T @ hkp),
            b=top.b + lr * (vt - vneg).mean(axis=0),
            c=top.c + lr * (h0p - hkp).mean(axis=0),
        )

        # --- sleep: dream the concat from the negative joint code, update
        # the joint recognition, then dream down each tower ---
        sp_j = vneg[:, :n_code]
        pc = jax.nn.sigmoid(sp_j @ new_jgen[0].T + new_jgen[1])
        s_c = _bern(next(keys), pc)
        q = jax.nn.sigmoid(s_c @ jrec.W + jrec.c)
        resid_j = sp_j - q
        new_jrec = RBMParams(W=jrec.W + (lr / B) * (s_c.T @ resid_j),
                             b=jrec.b, c=jrec.c + lr * resid_j.mean(axis=0))

        new_rec = {}
        offset = 0
        for n in names:
            L = len(cfg_of[n])
            width = rec[n][-1].W.shape[1]
            sp = [None] * (L + 1)
            sp[L] = jax.lax.dynamic_slice_in_dim(s_c, offset, width, axis=1)
            offset += width
            for l in range(L - 1, -1, -1):
                cfg = cfg_of[n][l]
                p_down = _down_mean(new_gen[n][l], sp[l + 1], cfg)
                if cfg.visible == "bernoulli":
                    sp[l] = _bern(next(keys), p_down)
                elif cfg.resolved_sample_visible:
                    sp[l] = p_down + jax.random.normal(
                        next(keys), p_down.shape, jnp.float32)
                else:
                    sp[l] = p_down
            nr = []
            for l, cfg in enumerate(cfg_of[n]):
                q_up = hidden_mean(rec[n][l], sp[l], cfg)
                resid = sp[l + 1] - q_up
                nr.append(RBMParams(
                    W=rec[n][l].W + (lr / B) * (sp[l].T @ resid),
                    b=rec[n][l].b,
                    c=rec[n][l].c + lr * resid.mean(axis=0),
                ))
            new_rec[n] = nr

        return (new_rec, new_gen, new_jrec, new_jgen, top), wake_err

    if semi:
        @jax.jit
        def epoch(params, xb, yb, mb, keys):
            params, errs = jax.lax.scan(step, params, (xb, yb, mb, keys))
            return params, errs.mean()
    else:
        @jax.jit
        def epoch(params, xb, yb, keys):
            params, errs = jax.lax.scan(step, params, (xb, yb, keys))
            return params, errs.mean()

    return epoch


def finetune_updown_mdbn_labeled(
    towers,  # {name: [(RBMParams, RBMConfig)] bottom-up, ALL directed}
    joint: Tuple[RBMParams, RBMConfig],
    label_top: RBMParams,
    modalities,  # {name: [n, features]}
    labels,
    n_classes: int,
    epochs: int = 10,
    lr: float = 0.01,
    k: int = 1,
    batch_size: int = 20,
    seed: int = 0,
    gen=None,  # {name: [(W, b)]} tower generative resume
    joint_gen: Optional[Tuple[jax.Array, jax.Array]] = None,
    mesh=None,
):
    """Labeled up-down over a full MDBN: towers + joint layer all directed,
    the associative label top (MDBN.fit_label_top) undirected.
    ``mesh``: GSPMD data-parallel epochs.

    Returns (recognition {name: [RBMParams]}, generative {name: [(W, b)]},
    joint recognition RBMParams, joint generative (W, b), tuned label-top
    RBMParams, per-epoch mean wake reconstruction mse).

    **Semi-supervised**: rows with label ``-1`` (unlabeled patients) wake
    with a posterior label draw p(y | joint wake code) in place of the
    clamped truth (see train.labeled.fit_label_top)."""
    from .labeled import _validate_partial_labels

    if set(towers) != set(modalities):
        raise ValueError(f"towers {sorted(towers)} and modalities "
                         f"{sorted(modalities)} disagree")
    joint_params, joint_cfg = joint
    if joint_cfg.visible != "bernoulli":
        raise ValueError("the joint RBM is Bernoulli-visible by construction")
    n_code = joint_params.W.shape[1]
    if label_top.W.shape[0] != n_code + n_classes:
        raise ValueError(f"label top has visible {label_top.W.shape[0]}, "
                         f"expected joint code {n_code} + {n_classes} classes")
    labels, semi = _validate_partial_labels(labels, n_classes)
    for tname, tl in towers.items():
        check_fixed_variance_layers(
            tl, f"labeled up-down fine-tuning (tower {tname!r})")
    names = list(towers)
    rows = {n: int(jnp.shape(modalities[n])[0]) for n in names}
    if len(set(rows.values())) != 1:
        raise ValueError(f"modalities disagree on rows: {rows}")
    n_rows = next(iter(rows.values()))
    if n_rows != labels.shape[0]:
        raise ValueError(f"data rows {n_rows} != labels {labels.shape[0]}")
    nb = n_rows // batch_size
    if nb == 0:
        raise ValueError(f"dataset has {n_rows} samples — fewer than one "
                         f"minibatch (batch_size={batch_size})")

    rec = {n: [p for p, _ in towers[n]] for n in names}
    if gen is None:
        gen = {n: [(p.W, p.b) for p, _ in towers[n]] for n in names}
    else:
        for n in names:
            if n not in gen or len(gen[n]) != len(towers[n]):
                raise ValueError(f"gen for tower {n!r} missing or wrong depth")
        gen = {n: [(jnp.asarray(W, jnp.float32), jnp.asarray(b, jnp.float32))
                   for W, b in gen[n]] for n in names}
    if joint_gen is None:
        joint_gen = (joint_params.W, joint_params.b)
    else:
        joint_gen = (jnp.asarray(joint_gen[0], jnp.float32),
                     jnp.asarray(joint_gen[1], jnp.float32))
        if joint_gen[0].shape != joint_params.W.shape:
            raise ValueError(f"joint_gen W {joint_gen[0].shape} != joint "
                             f"{joint_params.W.shape}")

    xb = {}
    for n in names:
        d = jnp.asarray(modalities[n], jnp.float32)
        xb[n] = d[: nb * batch_size].reshape(nb, batch_size, -1)
    # one_hot maps -1 (unlabeled) to an all-zero row; the semi wake replaces
    # those rows with a posterior draw
    yb = jax.nn.one_hot(labels[: nb * batch_size], n_classes,
                        dtype=jnp.float32).reshape(nb, batch_size, n_classes)
    mb = ((labels[: nb * batch_size] >= 0).astype(jnp.float32)
          .reshape(nb, batch_size) if semi else None)

    tower_cfgs = tuple((n, tuple(cfg for _, cfg in towers[n])) for n in names)
    epoch = _updown_mdbn_labeled_epoch_fn(tower_cfgs, int(n_code),
                                          int(n_classes), float(lr), int(k),
                                          semi)
    params = (rec, gen, joint_params, joint_gen, label_top)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        if semi:
            params, (xb, yb, mb) = dp_put_finetune(mesh, params, (xb, yb, mb))
        else:
            params, (xb, yb) = dp_put_finetune(mesh, params, (xb, yb))
    key = jax.random.PRNGKey(seed)
    history = []
    for _ in range(epochs):
        key, kepoch = jax.random.split(key)
        if semi:
            params, err = epoch(params, xb, yb, mb,
                                jax.random.split(kepoch, nb))
        else:
            params, err = epoch(params, xb, yb, jax.random.split(kepoch, nb))
        history.append(float(err))
    rec, gen, joint_params, joint_gen, label_top = params
    return ({n: list(v) for n, v in rec.items()},
            {n: list(v) for n, v in gen.items()},
            joint_params, joint_gen, label_top, history)
