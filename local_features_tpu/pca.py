"""PCA whitening models for the MKD descriptor.

The three models (liberty / notredame / yosemite — named after the UBC
Phototour training sets) are stored as .npz with keys mean[238],
eigvals[238], eigvecs[238, 238].  They are converted weight *data* from the
reference's embedded safetensors (reference: mkd_ref.rs:26-31,
models/mkd/concat-pca-*.safetensors); the loading/attenuation code here is
original.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np

from . import constants

_MODELS_DIR = os.path.join(os.path.dirname(__file__), "models", "mkd")

PCA_NAMES = ("liberty", "notredame", "yosemite")


@dataclass(frozen=True)
class PCAModel:
    """Raw PCA model (mean / eigenvalues / eigenvectors of 238-D raw MKD)."""

    mean: np.ndarray     # [238]
    eigvals: np.ndarray  # [238]
    eigvecs: np.ndarray  # [238, 238], columns are eigenvectors

    @property
    def attenuated(self) -> tuple[np.ndarray, np.ndarray]:
        """(mean[238], proj[238, 128]) with eigval^-0.35 attenuation."""
        return constants.attenuate_pca(self.mean, self.eigvals, self.eigvecs)


@functools.lru_cache(maxsize=None)
def load_pca(name: str = "liberty") -> PCAModel:
    name = name.lower()
    if name not in PCA_NAMES:
        raise ValueError(f"unknown PCA model {name!r}; choose from {PCA_NAMES}")
    path = os.path.join(_MODELS_DIR, f"concat-pca-{name}.npz")
    with np.load(path) as f:
        return PCAModel(
            mean=f["mean"].astype(np.float32),
            eigvals=f["eigvals"].astype(np.float32),
            eigvecs=f["eigvecs"].astype(np.float32),
        )
