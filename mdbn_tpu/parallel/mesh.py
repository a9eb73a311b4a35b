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


def interpret_safe_ndev(requested: int = 8) -> int:
    """Largest simulated-device count for INTERPRET-mode runs of the
    manual-DMA (hbm_state / chunk-update / W-blocked) DP mega-kernel tiers.

    The TPU interpret machinery executes each simulated device's kernel
    body inside an io_callback; the hbm-state tiers' callbacks block
    materializing in-program values (scratch inits, gathered slots), and on
    low-core hosts XLA:CPU has too few live executor threads to keep N such
    blocking callbacks plus their producer thunks progressing. Measured on
    a 1-vCPU VM (2026-08-20, jax 0.9.0): 8 simulated devices deadlock
    DETERMINISTICALLY — every device thread parked in the interpreter's
    ``_allocate_buffer`` on ``np.array(val)``, 0% CPU — and 4 devices
    deadlock INTERMITTENTLY on the callback-heaviest variants (velocity
    streaming, chunked factor exchange: observed ~2/7 runs), while 2
    devices never did; raising ``--xla_force_host_platform_device_count``
    to 16 does not help, so the limit tracks physical cores, not virtual
    devices. The arithmetic: the deadlock needs EVERY free executor thread
    parked in a blocking callback at once, and the observed flaky/always
    boundary puts the pool at ~4 threads on this host — at 2 simulated
    devices at most 2 callbacks can ever block, so two threads always
    remain for the producer thunks. Const-block interpret DP (no manual
    DMA) is unaffected at 8. Real-hardware paths are unaffected. Tests and
    the multichip dryrun size their hbm-tier meshes through this helper so
    the suite cannot hang on single-core machines; multi-core hosts keep
    the full 8-device meshes.
    """
    import os

    ncpu = os.cpu_count() or 1
    return requested if ncpu >= 2 else min(requested, 2)


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

