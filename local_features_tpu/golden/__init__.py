"""NumPy golden models — slow, simple oracles for every TPU kernel.

This mirrors the reference's golden-model pattern: the Rust CPU MKD
implementation (mkd_ref.rs) is the oracle for its GPU kernels; here a NumPy
implementation of every pipeline stage is the oracle for the JAX/Pallas
path.  Tests assert tolerance-based parity stage by stage and end to end.
"""

from .mkd import mkd_raw_descriptor, mkd_descriptor, patch_mag_angle
from .scale_space import (
    scale_space,
    fine_volume,
    scan_extrema,
    patch_pyramid,
)
from .orientation import keypoint_orientations
from .pipeline import detect_and_extract, GoldenParams

__all__ = [
    "mkd_raw_descriptor",
    "mkd_descriptor",
    "patch_mag_angle",
    "scale_space",
    "fine_volume",
    "scan_extrema",
    "patch_pyramid",
    "keypoint_orientations",
    "detect_and_extract",
    "GoldenParams",
]
