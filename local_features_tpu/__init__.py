"""local_features_tpu — a TPU-native local image feature framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
Rust/Vulkan `local-features` library (scale-space blob detection via a
stationary wavelet transform + MKD descriptors + matching), redesigned
TPU-first: batched static-shape tensor pipelines, MXU matmuls for the
kernelized pooling, mask/top_k compaction instead of atomics, and
`jax.sharding` data parallelism for multi-chip scaling.
"""

from .api import LocalFeatures
from .types import FeaturesResult, Keypoint
from .pca import load_pca, PCAModel
from .ops.index import DescriptorIndex
from . import constants, ops, golden

__version__ = "0.1.0"

__all__ = [
    "LocalFeatures",
    "DescriptorIndex",
    "FeaturesResult",
    "Keypoint",
    "load_pca",
    "PCAModel",
    "constants",
    "ops",
    "golden",
]
