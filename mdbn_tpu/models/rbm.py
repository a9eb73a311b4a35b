"""User-facing RBM — mirrors the reference notebook's ``RBM`` entry points
(``train`` / ``transform``, BASELINE.json:5) on top of the TPU-native stack.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import RBMConfig, TrainRuntimeConfig
from ..core.rbm_math import RBMParams, free_energy
from ..core.state import TrainState, init_train_state
from ..ops import transform as tops
from ..train.trainer import EpochMetrics, train_rbm


class RBM:
    """Restricted Boltzmann machine (Bernoulli or Gaussian-Bernoulli visible).

    >>> rbm = RBM(RBMConfig(n_visible=784, n_hidden=500, epochs=5))
    >>> rbm.train(data)              # data: [n_samples, 784]
    >>> codes = rbm.transform(data)  # mean-field hidden probabilities
    """

    def __init__(self, cfg: RBMConfig, key: Optional[jax.Array] = None,
                 state: Optional[TrainState] = None):
        self.cfg = cfg
        self.state: TrainState = state if state is not None else init_train_state(cfg, key)
        self.metrics: Optional[EpochMetrics] = None
        # a caller-supplied state (e.g. a checkpoint restore) counts as
        # trained; a fresh random init does not — transform() on it would
        # silently hand back noise codes (same guard as DBN.transform)
        self._trained = state is not None

    # -- reference API ------------------------------------------------------

    def train(self, data, mesh: Optional[Mesh] = None,
              runtime: Optional[TrainRuntimeConfig] = None, epoch_callback=None) -> "RBM":
        self.state, self.metrics = train_rbm(
            data, self.cfg, state=self.state, mesh=mesh, runtime=runtime,
            epoch_callback=epoch_callback,
        )
        self._trained = True
        return self

    def transform(self, v) -> jax.Array:
        if not self._trained:
            raise RuntimeError(
                "RBM.transform called before train(): the codes would be "
                "random-init noise. Call train(data) first (or construct "
                "with state= from a checkpoint).")
        return tops.transform(self.params, jnp.asarray(v, self._dtype), self.cfg)

    # -- extras -------------------------------------------------------------

    def reconstruct(self, v) -> jax.Array:
        return tops.reconstruct(self.params, jnp.asarray(v, self._dtype), self.cfg)

    def free_energy(self, v) -> jax.Array:
        return free_energy(self.params, jnp.asarray(v, self._dtype), self.cfg)

    def free_energy_gap(self, train_v, valid_v) -> float:
        """Hinton practical-guide overfitting monitor: mean free energy of a
        held-out subset minus a training subset. The gap growing over
        training means the model is overfitting the training data (the
        unknown log Z cancels in the difference)."""
        return float(jnp.mean(self.free_energy(valid_v))
                     - jnp.mean(self.free_energy(train_v)))

    def sample(self, n_samples: int = 16, n_gibbs: int = 200,
               v_init=None, seed: int = 0) -> jax.Array:
        """Generate samples by prolonged Gibbs chains ("daydreaming").
        Returns mean-field visible probabilities [n_samples, n_visible]."""
        from ..ops.sample import gibbs_sample

        key = jax.random.PRNGKey(seed)
        if v_init is None:
            kinit, key = jax.random.split(key)
            v_init = (jax.random.uniform(kinit, (n_samples, self.cfg.n_visible))
                      < 0.5).astype(self._dtype)
        else:
            v_init = jnp.asarray(v_init, self._dtype)
        vmean, _ = gibbs_sample(self.params, v_init, key, self.cfg, n_gibbs)
        return vmean

    @property
    def params(self) -> RBMParams:
        return self.state.params

    @property
    def history(self) -> list:
        return list(self.metrics.errors) if self.metrics else []

    @property
    def _dtype(self):
        return jnp.dtype(self.cfg.param_dtype)

    @property
    def sigma(self) -> Optional[jax.Array]:
        """[n_visible] learned visible std-devs (exp(z/2)); None unless
        cfg.learn_variance."""
        z = self.state.params.z
        return None if z is None else jnp.exp(0.5 * z)

    def params_numpy(self) -> dict:
        return {k: np.asarray(v)
                for k, v in self.state.params._asdict().items()
                if v is not None}

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        """Save full train state (orbax dir) + config JSON next to it."""
        from ..checkpoint import save_state
        from ..config import save_config

        save_state(self.state, path)
        save_config(self.cfg, path.rstrip("/") + ".config.json")

    @classmethod
    def load(cls, path: str) -> "RBM":
        from ..checkpoint import restore_state
        from ..config import load_config

        return cls(load_config(path.rstrip("/") + ".config.json"),
                   state=restore_state(path))
