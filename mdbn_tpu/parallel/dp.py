"""Explicit data-parallel CD training via ``jax.shard_map`` + ``lax.psum``.

Two DP implementations exist (SURVEY.md §2.4):

1. **GSPMD (default, in train.trainer):** jit the single-device program with
   the batch dimension sharded; XLA's partitioner inserts the gradient
   all-reduce. Bit-identical to the single-device program (jax.random draws
   are sharding-invariant).
2. **This module:** the same math written with explicit per-shard code and a
   ``lax.pmean`` per step — the "manual collectives" variant, used to
   validate DP semantics on an 8-device CPU mesh (SURVEY.md §4.5) and as the
   template for future Pallas-side collectives.

Both preserve single-chip math: the *global* minibatch (cfg.batch_size) is
split across shards, and the pmean-of-local-means equals the global batch
mean, so DP changes throughput, not the update rule.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RBMConfig
from ..core.rbm_math import RBMParams, apply_update, cd_step_stats
from ..core.state import TrainState
from ..ops.cd_step import draw_uniforms


def train_rbm_shard_map(
    state: TrainState,
    data: jax.Array,
    cfg: RBMConfig,
    mesh: Mesh,
    n_epochs: int,
    pallas_step: bool = False,
) -> Tuple[TrainState, jax.Array]:
    if cfg.error_metric == "pseudo":
        raise ValueError("error_metric='pseudo' is not computed on the "
                         "shard_map DP path (the per-step kernels monitor "
                         "mse/xent); use the DP mega-kernel (engine='pallas' "
                         "via train_rbm) or engine='xla' without a mesh")
    if cfg.pt_temps > 1 and pallas_step:
        # the per-step grads kernel carries plain-CD chain state only; the
        # fused PT path is the DP mega-kernel (engine='pallas' via train_rbm)
        raise ValueError("pt_temps > 1 with pallas_step=True is not "
                         "supported (the per-step grads kernel has no "
                         "tempering ladder); use pallas_step=False or the "
                         "DP mega-kernel via train_rbm")
    if cfg.gradient == "enhanced":
        raise ValueError("gradient='enhanced' is not supported on the "
                         "shard_map DP path: the recombination is nonlinear "
                         "in the batch means, so pmean of per-shard enhanced "
                         "grads is not the global-batch enhanced grad. Use "
                         "the GSPMD dp path (train_rbm with a mesh), where "
                         "the global-batch means are exact by construction")
    if pallas_step and cfg.param_dtype != "float32":
        raise ValueError("pallas_step=True requires param_dtype='float32' "
                         "(the grads kernel's refs are f32); use the XLA "
                         "step for bfloat16 storage")
    if pallas_step and cfg.learn_variance:
        raise ValueError("learn_variance=True is not supported by the "
                         "per-step grads kernel (fixed-variance state "
                         "tensors); use pallas_step=False or the GSPMD "
                         "path (train_rbm with a mesh)")
    usable = (data.shape[0] // cfg.batch_size) * cfg.batch_size
    if usable == 0:
        raise ValueError(f"dataset has {data.shape[0]} samples — fewer than "
                         f"one global minibatch (batch_size={cfg.batch_size})")
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    B = cfg.batch_size
    local_b = -(-B // ndev)  # ceil: uneven batches pad + mask the tail shards
    pad = local_b * ndev - B
    nb = usable // B
    # pre-batch on host: [nb, ndev, local_b, V], each global minibatch's rows
    # split contiguously across shards; pad rows (if B doesn't divide) are
    # zeros that the masked statistics exclude
    batches = jnp.asarray(data[:usable], jnp.dtype(cfg.param_dtype)).reshape(
        nb, B, data.shape[1])
    if pad:
        batches = jnp.pad(batches, ((0, 0), (0, pad), (0, 0)))
    batches = batches.reshape(nb, ndev, local_b, data.shape[1])
    fused = _build_shard_map_train(cfg, mesh, n_epochs, pallas_step,
                                   usable, data.shape[1])
    # chain state must be laid out over the mesh before entering shard_map.
    # Tempering: the global [M*B, H] rung-major ladder resorts to
    # PARTICLE-major [ndev, M, local_b, H] so each shard owns its batch
    # rows' complete ladders (replica swaps are per-particle, so ladders
    # shard with the batch; only rung-0 statistics cross ICI).
    M = cfg.pt_temps
    chain = state.chain_h
    H_ = chain.shape[1]
    if M > 1:
        ch = chain.reshape(M, B, H_)
        if pad:
            ch = jnp.pad(ch, ((0, 0), (0, pad), (0, 0)))
        chain = ch.reshape(M, ndev, local_b, H_).transpose(
            1, 0, 2, 3).reshape(ndev * M * local_b, H_)
    elif pad:
        chain = jnp.pad(chain, ((0, pad), (0, 0)))
    state = state._replace(chain_h=chain)
    repl = NamedSharding(mesh, P())
    z_sh = repl if cfg.learn_variance else None
    state = jax.device_put(
        state,
        TrainState(
            params=RBMParams(W=repl, b=repl, c=repl, z=z_sh),
            velocity=RBMParams(W=repl, b=repl, c=repl, z=z_sh),
            chain_h=NamedSharding(mesh, P(axis)),
            key=repl,
            epoch=repl,
        ),
    )
    batches = jax.device_put(batches, NamedSharding(mesh, P(None, axis)))
    new_state, errs = fused(state, batches)
    if M > 1:  # invert the particle-major ladder layout, drop pad particles
        ch = new_state.chain_h.reshape(ndev, M, local_b, H_).transpose(
            1, 0, 2, 3).reshape(M, ndev * local_b, H_)[:, :B]
        return new_state._replace(chain_h=ch.reshape(M * B, H_)), errs
    return new_state._replace(chain_h=new_state.chain_h[:B]), errs


@lru_cache(maxsize=512)
def _build_shard_map_train(cfg: RBMConfig, mesh: Mesh, n_epochs: int,
                           pallas_step: bool, n_samples: int, n_features: int):
    """Run ``n_epochs`` epochs of CD-k/PCD with explicit DP collectives.

    ``data``: [n_samples, V]. The global minibatch is split evenly across the
    mesh's devices; gradients and the error monitor are ``pmean``-allreduced
    over ICI each step. Returns (state, per-epoch errors [n_epochs]).

    With ``pallas_step=True`` each shard's CD step runs as the fused Pallas
    gradients kernel (matmuls + sigmoids + on-chip-PRNG sampling in one pass)
    and only the (dW, db, dc) statistics cross ICI — the north-star
    combination of BASELINE.json:5 (fused kernels + DP allreduce).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    B = cfg.batch_size
    local_b = -(-B // ndev)  # ceil: uneven batches pad + mask the tail shards
    uneven = local_b * ndev != B
    # per-shard stats are masked SUMS over valid rows scaled by ndev/B, so
    # their pmean is the exact global-batch mean even when B % ndev != 0
    norm = B / ndev
    local_cfg = cfg.replace(batch_size=local_b)
    if pallas_step:
        from ..ops.cd_epoch_pallas import make_pallas_grads_fn

        grads_fn = make_pallas_grads_fn(local_cfg, norm=norm,
                                        with_mask=uneven)
    else:
        grads_fn = None

    n = n_samples
    nb = n // cfg.batch_size
    V = n_features

    z_spec = P() if cfg.learn_variance else None
    state_specs = TrainState(
        params=RBMParams(W=P(), b=P(), c=P(), z=z_spec),
        velocity=RBMParams(W=P(), b=P(), c=P(), z=z_spec),
        chain_h=P(axis),  # PCD chains live with their batch shard
        key=P(),
        epoch=P(),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(state_specs, P(None, axis, None, None)),
        out_specs=(state_specs, P()),
        # pallas_call emits ShapeDtypeStructs without vma annotations
        check_vma=not pallas_step,
    )
    def run(st: TrainState, batches: jax.Array):
        # batches (local view): [nb, 1, local_b, V]
        my = jax.lax.axis_index(axis)
        mask = None
        if uneven:
            # valid rows: my*local_b + i < B (pad rows sit on the tail shards)
            mask = ((my * local_b + jnp.arange(local_b)) < B).astype(
                jnp.float32)[:, None]

        def step(carry, xs):
            params, vel, chain = carry
            v0 = xs["batch"][0]
            k = jax.random.fold_in(xs["key"], my)  # distinct stream per shard
            if grads_fn is not None:
                seed = jax.random.randint(k, (2,), 0, jnp.iinfo(jnp.int32).max,
                                          jnp.int32)
                # non-persistent configs: the kernel passes chain through
                grads, new_chain, err = grads_fn(seed, v0, params, chain,
                                                 mask=mask)
            elif cfg.pt_temps > 1:
                # the local chain rows are this shard's particles' complete
                # [M, local_b, H] ladders (particle-major layout set up by
                # train_rbm_shard_map); swaps are per-particle so the step is
                # shard-local, and the masked rung-0 stats pmean exactly
                from ..core.rbm_math import pt_step_stats
                from ..ops.cd_step import draw_pt_uniforms

                chains = chain.reshape(cfg.pt_temps, local_b, cfg.n_hidden)
                grads, new_chains, err = pt_step_stats(
                    params, v0, chains, draw_pt_uniforms(local_cfg, local_b, k),
                    local_cfg, row_mask=mask, norm=norm)
                new_chain = new_chains.reshape(chain.shape)
            else:
                grads, new_chain, err = cd_step_stats(
                    params, v0, chain if cfg.persistent else None,
                    draw_uniforms(local_cfg, local_b, k), local_cfg,
                    row_mask=mask, norm=norm)
            grads = jax.lax.pmean(grads, axis)  # ONE allreduce of (dW, db, dc)
            err = jax.lax.pmean(err, axis)
            params, vel = apply_update(params, vel, grads, cfg, epoch=xs["epoch"])
            return (params, vel, new_chain), err

        def epoch_body(carry, xs_e):
            kperm, ksteps = jax.random.split(xs_e["key"])
            keys = jax.random.split(ksteps, nb)
            if cfg.shuffle:
                # batch-order shuffle (minibatch blocks, like the Pallas
                # engine's super-batch shuffle). kperm derives from the
                # replicated key, so every shard applies the same permutation
                # and global minibatches stay consistent across shards.
                batches_e = batches[jax.random.permutation(kperm, nb)]
            else:
                batches_e = batches
            epochs_v = jnp.full((nb,), xs_e["epoch"], jnp.int32)
            carry, errs = jax.lax.scan(
                step, carry, {"batch": batches_e, "key": keys, "epoch": epochs_v})
            return carry, errs.mean()

        key, kepochs = jax.random.split(st.key)
        (params, vel, chain), errs = jax.lax.scan(
            epoch_body, (st.params, st.velocity, st.chain_h),
            {"key": jax.random.split(kepochs, n_epochs),
             "epoch": st.epoch + jnp.arange(n_epochs, dtype=jnp.int32)})
        new_st = TrainState(params, vel, chain, key,
                            st.epoch + jnp.int32(n_epochs))
        return new_st, errs

    @jax.jit
    def fused(st: TrainState, batches: jax.Array):
        # batches: [nb, ndev, local_b, V], pre-padded by the caller
        return run(st, batches)

    return fused


def dp_put_finetune(mesh: Mesh, params, batches):
    """GSPMD data-parallel placement for a fine-tuning epoch.

    The phase-2 loops (backprop head, deep autoencoder, up-down, label-top
    CD — train/finetune.py, autoencoder.py, updown.py, labeled.py) all scan
    a jitted step over [nb, B, ...] minibatch arrays with a replicated
    parameter pytree. Committing the inputs — minibatch ROW dim (axis 1 of
    every batch leaf) sharded over the mesh's first axis, parameters
    replicated — makes the existing jitted epoch compile to a partitioned
    program with XLA-inserted collectives: the GSPMD variant of SURVEY.md
    §2.4, bit-identical math to the single-device run (jax.random draws are
    sharding-invariant), no per-driver rewrites.

    Returns (params, batches) committed to the mesh.

    ``jax.device_put`` needs the row dim divisible by the mesh axis; when it
    is not (e.g. the default batch_size 20 on 8 devices), a 1-D mesh
    degrades to its first g devices where g is the largest divisor of the
    row count — same math (GSPMD semantics are sharding-invariant), fewer
    shards, no crash. Multi-axis meshes get a clear error instead.
    """
    axis = mesh.axis_names[0]
    rows = jax.tree.leaves(batches)[0].shape[1]
    ndev = mesh.shape[axis]
    if rows % ndev != 0:
        if len(mesh.axis_names) > 1:
            raise ValueError(
                f"fine-tuning batch rows ({rows}) not divisible by mesh axis "
                f"'{axis}' ({ndev}); pick a batch_size divisible by the mesh "
                "or a 1-D mesh (which degrades to a compatible device subset)")
        g = max(d for d in range(1, min(rows, ndev) + 1) if rows % d == 0)
        mesh = Mesh(np.asarray(mesh.devices).flatten()[:g], (axis,))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(None, axis))
    return (jax.device_put(params, repl),
            jax.tree.map(lambda a: jax.device_put(a, bsh), batches))
