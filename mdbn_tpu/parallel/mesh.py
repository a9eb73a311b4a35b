"""Device-mesh utilities (SURVEY.md §2.3/§2.4).

The rebuild's entire communication layer is XLA collectives over ICI on a 1-D
``('dp',)`` mesh: one psum of the (dW, db, dc) statistics per CD step plus
psum of the reconstruction-error scalar. DCN is out of scope (single host).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp",
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(dp: int, tp: int, axes=("dp", "tp"),
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D mesh: batch data-parallel x tensor-parallel (W sharded over the
    hidden dim — the optional stretch for very wide omics layers, SURVEY.md
    §2.3). GSPMD inserts the psum over 'tp' for the h @ W.T contraction."""
    if devices is None:
        devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"requested {dp}x{tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), axes)

