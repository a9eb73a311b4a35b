"""Real-data loaders behind the same interface as the synthetic generators.

No network in this environment (SURVEY.md §7): these load from local files
when present and raise a clear error otherwise; tests and the graded configs
use ``data.synthetic``.
"""

from __future__ import annotations

import gzip
import os
import struct
from typing import Dict

import numpy as np

from .synthetic import zscore


def load_mnist_images(path: str, binarize: str = "threshold", threshold: float = 0.5,
                      seed: int = 0) -> np.ndarray:
    """Load an IDX-format MNIST image file (optionally .gz) and binarize.

    Binarization method is a knob because the reference's choice is unverified
    (SURVEY.md §7 hard-part #5): "threshold" (p > 0.5), "sample"
    (pixel-probability Bernoulli draw), or "none" (raw [0, 1] intensities,
    e.g. for mean-field experiments).
    """
    if binarize not in ("threshold", "sample", "none"):
        raise ValueError(f"binarize must be 'threshold', 'sample', or 'none', "
                         f"got {binarize!r}")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"MNIST file not found: {path}. This sandbox has no network; "
            "use mdbn_tpu.data.synthetic.mnist_like for a local stand-in."
        )
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        if magic != 2051:
            raise ValueError(f"not an IDX image file (magic={magic})")
        raw = np.frombuffer(f.read(), np.uint8).reshape(n, rows * cols)
    probs = raw.astype(np.float32) / 255.0
    if binarize == "none":
        return probs
    if binarize == "sample":
        rng = np.random.default_rng(seed)
        return (rng.random(probs.shape) < probs).astype(np.float32)
    return (probs > threshold).astype(np.float32)


def load_omics_csv(paths: Dict[str, str], zscore_features: bool = True) -> Dict[str, np.ndarray]:
    """Load {modality: csv_path} matrices (patients x features), z-scoring
    continuous features as the reference does (BASELINE.json config 2)."""
    out = {}
    for name, path in paths.items():
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"omics file not found: {path}. Use mdbn_tpu.data.synthetic.tcga_like "
                "for a local stand-in."
            )
        # ndmin=2: a single-row CSV must stay [1, features], not collapse
        # to 1-D (which would z-score across features)
        mat = np.loadtxt(path, delimiter=",", dtype=np.float32, ndmin=2)
        out[name] = zscore(mat) if zscore_features else mat
    return out
