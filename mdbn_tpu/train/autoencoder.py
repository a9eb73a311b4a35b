"""Deep-autoencoder unsupervised fine-tuning (Hinton & Salakhutdinov 2006).

The classic companion to greedy DBN pretraining: unroll the stack into an
encoder (the pretrained up-pass) and a decoder initialized with the
transposed weights, untie them, and fine-tune the whole autoencoder by
reconstruction backprop. The reference lineage pretrains only; this phase is
what the Science-paper pipeline does next to sharpen the latent codes.

TPU shape: one jitted ``lax.scan`` over minibatches per epoch, Adam (optax),
XLA differentiates the unrolled stack — no hand-written backward pass.
Activations: sigmoid everywhere except the bottom reconstruction of a
Gaussian-visible layer (linear, matching the RBM's conditional mean); loss is
cross-entropy for Bernoulli data, MSE for Gaussian (the same dichotomy as the
RBM error monitors).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import RBMConfig
from ..core.rbm_math import RBMParams, check_fixed_variance_layers
from .finetune import _batched


def _recon_loss(x, pre, visible: str):
    """Per-sample mean loss at the data layer: xent (on logits) for Bernoulli
    inputs, MSE for Gaussian (z-scored) inputs."""
    if visible == "bernoulli":
        # numerically stable cross-entropy on the pre-activation
        return jnp.mean(jnp.sum(jax.nn.softplus(pre) - x * pre, axis=1))
    d = x - pre
    return jnp.mean(jnp.sum(d * d, axis=1))


def unroll_stack(layers: List[Tuple[RBMParams, RBMConfig]]):
    """(encoder, decoder) pytrees from a pretrained stack. Encoder layer i is
    (W_i, c_i); decoder layer i is (W_i^T copy, b_i) — untied from here on."""
    enc = [(p.W, p.c) for p, _ in layers]
    dec = [(p.W.T, p.b) for p, _ in layers]
    return enc, dec


def _encode(enc, x):
    h = x
    for W, c in enc:
        h = jax.nn.sigmoid(h @ W + c)
    return h


def _decode_pre(dec, h):
    """Top-down decode; returns the BOTTOM pre-activation (the caller applies
    the data-layer activation/loss) with sigmoids at the intermediate
    layers."""
    for i in range(len(dec) - 1, 0, -1):
        D, b = dec[i]
        h = jax.nn.sigmoid(h @ D + b)
    D, b = dec[0]
    return h @ D + b


def _adam_epochs(params, loss_of_batch, batches, epochs: int, lr: float):
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def epoch(carry, _):
        params, opt_state = carry

        def step(carry, xb):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_of_batch)(params, xb)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state),
                                                   batches)
        return (params, opt_state), losses.mean()

    history = []
    carry = (params, opt_state)
    for _ in range(epochs):
        carry, mean_loss = epoch(carry, None)
        history.append(float(mean_loss))
    return carry[0], history


def finetune_autoencoder_stack(
    layers: List[Tuple[RBMParams, RBMConfig]],
    data: jax.Array,
    epochs: int = 10,
    lr: float = 1e-3,
    batch_size: int = 20,
    decoder: List[jax.Array] = None,
    mesh=None,
) -> Tuple[List[RBMParams], List[jax.Array], List[float]]:
    """Unroll + reconstruction fine-tuning of a DBN stack. With a ``mesh``
    the Adam epochs run data-parallel via GSPMD (minibatch rows sharded,
    params + optimizer state replicated — parallel/dp.dp_put_finetune).

    Returns (tuned layer params, untied decoder weight list bottom-up,
    per-epoch mean reconstruction loss). Tuned layer i packs the encoder's
    (W, c) and the decoder's visible bias into the usual RBMParams triple;
    the untied decoder weights come back separately (transform stays the
    plain up-pass; reconstruction uses them). Pass the previous call's
    ``decoder`` to RESUME fine-tuning instead of re-initializing the decoder
    from the current encoder's W^T."""
    check_fixed_variance_layers(layers, "autoencoder fine-tuning")
    visible = layers[0][1].visible
    data = jnp.asarray(data, jnp.float32)
    n, nb = _batched(batch_size, data.shape[0])
    xb = data[:n].reshape(nb, batch_size, -1)
    enc, dec = unroll_stack(layers)
    if decoder is not None:
        dec = [(D, b) for D, (_, b) in zip(decoder, dec)]

    def loss_of_batch(params, x):
        enc, dec = params
        return _recon_loss(x, _decode_pre(dec, _encode(enc, x)), visible)

    params = (enc, dec)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        params, xb = dp_put_finetune(mesh, params, xb)
    (enc, dec), history = _adam_epochs(params, loss_of_batch, xb, epochs, lr)
    tuned = [RBMParams(W=W, b=b, c=c) for (W, c), (_, b) in zip(enc, dec)]
    return tuned, [D for D, _ in dec], history


def reconstruct_stack(layers, decoder: List[jax.Array], v) -> jax.Array:
    """Deterministic encode->decode with the (possibly fine-tuned, untied)
    decoder; with ``decoder=None`` falls back to the tied W^T down-pass."""
    enc = [(p.W, p.c) for p, _ in layers]
    if decoder is None:
        dec = [(p.W.T, p.b) for p, _ in layers]
    else:
        dec = [(D, p.b) for D, (p, _) in zip(decoder, layers)]
    pre = _decode_pre(dec, _encode(enc, jnp.asarray(v, jnp.float32)))
    return jax.nn.sigmoid(pre) if layers[0][1].visible == "bernoulli" else pre


def finetune_autoencoder_mdbn(
    towers: Dict[str, list],  # {name: [(RBMParams, RBMConfig), ...]}
    joint: Tuple[RBMParams, RBMConfig],
    modalities: Dict[str, jax.Array],
    epochs: int = 10,
    lr: float = 1e-3,
    batch_size: int = 20,
    decoder: Dict[str, list] = None,
    mesh=None,
):
    """Multimodal deep autoencoder: per-tower encoders -> concat -> joint
    code -> mirrored decode back to every modality; loss is the sum of the
    per-modality reconstruction losses. Returns
    (tuned towers, tuned joint params, decoder dict, history). Pass the
    previous call's ``decoder`` dict to RESUME fine-tuning.
    ``mesh``: GSPMD data-parallel epochs."""
    for tname, tl in towers.items():
        check_fixed_variance_layers(
            tl, f"autoencoder fine-tuning (tower {tname!r})")
    names = list(towers)
    widths = {m: towers[m][-1][1].n_hidden for m in names}
    visibles = {m: towers[m][0][1].visible for m in names}
    joint_params, joint_cfg = joint

    n_rows = next(iter(modalities.values())).shape[0]
    n, nb = _batched(batch_size, n_rows)
    xb = {m: jnp.asarray(modalities[m], jnp.float32)[:n].reshape(nb, batch_size, -1)
          for m in names}

    enc = {m: unroll_stack(towers[m])[0] for m in names}
    dec = {m: unroll_stack(towers[m])[1] for m in names}
    jenc = (joint_params.W, joint_params.c)
    jdec = (joint_params.W.T, joint_params.b)
    if decoder is not None:
        dec = {m: [(D, b) for D, (_, b) in zip(decoder[m], dec[m])]
               for m in names}
        jdec = (decoder["__joint__"][0], jdec[1])

    def loss_of_batch(params, x):
        enc, dec, jenc, jdec = params
        codes = jnp.concatenate([_encode(enc[m], x[m]) for m in names], axis=1)
        top = jax.nn.sigmoid(codes @ jenc[0] + jenc[1])
        back = jax.nn.sigmoid(top @ jdec[0] + jdec[1])
        total = 0.0
        lo = 0
        for m in names:
            h_m = back[:, lo:lo + widths[m]]
            lo += widths[m]
            total = total + _recon_loss(x[m], _decode_pre(dec[m], h_m),
                                        visibles[m])
        return total

    params = (enc, dec, jenc, jdec)
    if mesh is not None:
        from ..parallel.dp import dp_put_finetune

        params, xb = dp_put_finetune(mesh, params, xb)
    (enc, dec, jenc, jdec), history = _adam_epochs(
        params, loss_of_batch, xb, epochs, lr)

    tuned_towers = {
        m: [RBMParams(W=W, b=b, c=c) for (W, c), (_, b) in zip(enc[m], dec[m])]
        for m in names}
    tuned_joint = RBMParams(W=jenc[0], b=jdec[1], c=jenc[1])
    decoder = {m: [D for D, _ in dec[m]] for m in names}
    decoder["__joint__"] = [jdec[0]]
    return tuned_towers, tuned_joint, decoder, history


def reconstruct_mdbn(towers, joint, decoder, modalities) -> Dict[str, jax.Array]:
    """Deterministic multimodal encode->decode (untied decoder if given)."""
    names = list(towers)
    joint_params, joint_cfg = joint
    widths = {m: towers[m][-1][1].n_hidden for m in names}
    xs = {m: jnp.asarray(modalities[m], jnp.float32) for m in names}
    codes = jnp.concatenate(
        [_encode([(p.W, p.c) for p, _ in towers[m]], xs[m]) for m in names],
        axis=1)
    top = jax.nn.sigmoid(codes @ joint_params.W + joint_params.c)
    Dj = (decoder["__joint__"][0] if decoder is not None
          else joint_params.W.T)
    back = jax.nn.sigmoid(top @ Dj + joint_params.b)
    out = {}
    lo = 0
    for m in names:
        h_m = back[:, lo:lo + widths[m]]
        lo += widths[m]
        if decoder is None:
            dec = [(p.W.T, p.b) for p, _ in towers[m]]
        else:
            dec = [(D, p.b) for D, (p, _) in zip(decoder[m], towers[m])]
        pre = _decode_pre(dec, h_m)
        out[m] = (jax.nn.sigmoid(pre)
                  if towers[m][0][1].visible == "bernoulli" else pre)
    return out
