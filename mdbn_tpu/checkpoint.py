"""Checkpoint / resume via orbax (SURVEY.md §5).

The checkpointable unit is the full ``TrainState`` — params + momentum
velocities + PCD chain state + RNG key + epoch counter — so a resumed run
continues the exact same trajectory. Greedy layer-wise training makes layer
boundaries the natural resume points: DBN/MDBN checkpoints store one state per
completed layer plus the stack structure.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import jax
import numpy as np

from .config import RBMConfig, load_config, save_config
from .core.rbm_math import RBMParams
from .core.state import TrainState


def _state_to_pytree(state: TrainState) -> dict:
    # drop absent optional leaves (the learned-variance z when not learned)
    # so checkpoints of fixed-variance models keep their round-1 structure
    return {
        "params": {k: v for k, v in state.params._asdict().items()
                   if v is not None},
        "velocity": {k: v for k, v in state.velocity._asdict().items()
                     if v is not None},
        "chain_h": state.chain_h,
        "key": state.key,
        "epoch": state.epoch,
    }


def _state_from_pytree(tree: dict) -> TrainState:
    import jax.numpy as jnp

    def params(d: dict) -> RBMParams:
        return RBMParams(**{k: jnp.asarray(v) for k, v in d.items()
                            if v is not None})

    return TrainState(
        params=params(tree["params"]),
        velocity=params(tree["velocity"]),
        chain_h=jnp.asarray(tree["chain_h"]),
        key=jnp.asarray(tree["key"]),
        epoch=jnp.asarray(tree["epoch"]),
    )


def save_state(state: TrainState, path: str) -> None:
    """Save one TrainState to ``path`` (an orbax checkpoint directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(_state_to_pytree(state)), force=True)


def restore_state(path: str) -> TrainState:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    return _state_from_pytree(tree)


class LayerCheckpointer:
    """Layer-boundary checkpointing for DBN/MDBN greedy pretraining.

    Directory layout:
        <dir>/manifest.json           completed layer names, in order
        <dir>/<name>/                 orbax state for that layer
        <dir>/<name>.config.json      the layer's RBMConfig
    """

    def __init__(self, directory: str):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._manifest_path = os.path.join(self.dir, "manifest.json")

    def completed(self) -> List[str]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)["completed"]

    def save_layer(self, name: str, state: TrainState, cfg: RBMConfig) -> None:
        save_state(state, os.path.join(self.dir, name))
        save_config(cfg, os.path.join(self.dir, f"{name}.config.json"))
        done = self.completed()
        if name not in done:
            done.append(name)
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"completed": done}, f)
        os.replace(tmp, self._manifest_path)  # atomic: no torn manifests

    def load_layer(self, name: str):
        state = restore_state(os.path.join(self.dir, name))
        cfg = load_config(os.path.join(self.dir, f"{name}.config.json"))
        return state, cfg

    def has_layer(self, name: str) -> bool:
        return name in self.completed()
