"""JAX/XLA/Pallas TPU compute path.

Every stage is a pure, jit-compatible function over statically-shaped
arrays; variable-size results (blobs, keypoints) use fixed capacities with
validity masks and drop counters — the TPU-native equivalent of the
reference's fixed GPU buffers + atomic counters.
"""

from . import scale_space, detect, pyramid, orientation, descriptor, matching, frontend, index
from .detect import detect_blobs, BlobArrays
from .index import DescriptorIndex, IndexMatches
from .orientation import keypoints_from_blobs, KeypointArrays
from .descriptor import sample_patches, mkd_descriptors, raw_mkd_descriptors
from .matching import match_descriptors, mutual_match
from .frontend import detect_extract, FrontendConfig, FrontendResult

__all__ = [
    "scale_space",
    "detect",
    "pyramid",
    "orientation",
    "descriptor",
    "matching",
    "frontend",
    "index",
    "DescriptorIndex",
    "IndexMatches",
    "detect_blobs",
    "BlobArrays",
    "keypoints_from_blobs",
    "KeypointArrays",
    "sample_patches",
    "mkd_descriptors",
    "raw_mkd_descriptors",
    "match_descriptors",
    "mutual_match",
    "detect_extract",
    "FrontendConfig",
    "FrontendResult",
]
