"""mdbn-tpu: a TPU-native multimodal deep-belief-network framework.

Built from scratch in JAX/Pallas with the capabilities of glgerard/MDBN
(reference mount empty at build time — capability contract: BASELINE.json,
blueprint: SURVEY.md). Public API mirrors the reference's RBM/DBN/MDBN
train/transform entry points.
"""

from .config import (
    DBNConfig,
    MDBNConfig,
    RBMConfig,
    TrainRuntimeConfig,
    load_config,
    save_config,
)
from .models.dbn import DBN
from .models.mdbn import MDBN
from .models.rbm import RBM

__version__ = "0.1.0"

__all__ = [
    "RBM", "DBN", "MDBN",
    "RBMConfig", "DBNConfig", "MDBNConfig", "TrainRuntimeConfig",
    "load_config", "save_config",
]
