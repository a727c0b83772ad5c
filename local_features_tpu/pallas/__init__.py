"""Pallas TPU kernels for the gather-heavy pipeline stages.

XLA's batched scalar gather runs at ~100M elem/s on TPU, which makes the
naive patch-sampling path (65M gathered elements per 8-frame batch) the
dominant cost of the whole front-end.  These kernels replace scalar
gathers with the TPU-native pattern: dynamic-window DMA into VMEM +
one-hot matmuls on the MXU.
"""

from .sampling import sample_patches_pallas, build_canvas

__all__ = ["sample_patches_pallas", "build_canvas"]
