"""Constant tables for the MKD descriptor and the scale-space detector.

Everything here is plain NumPy, computed once at import/build time.  These
tables are shared by the NumPy golden model (`local_features_tpu.golden`) and
the JAX/TPU compute path (`local_features_tpu.ops`), exactly like the
reference shares its CPU constant generators with the GPU constant upload
(reference: local_features/src/mkd_ref.rs:173-267, vulkan/mod.rs:1614-1619).

Parity notes (reference file:line):
- von Mises Fourier coefficient tables: mkd_ref.rs:7-9
- mesh grid convention:                 mkd_ref.rs:173-185
- cart2pol with negated atan2:          mkd_ref.rs:133-144
- spatial kernels (cart 9 / polar 25):  mkd_ref.rs:210-257
- Gaussian weighting sigma=1:           mkd_ref.rs:259-267
- detector sigma constants:             shaders/common.glsl:15-17
- base blur sigma=0.6 bilinear taps:    shaders/blur.glsl:20-27
- SWT dilated kernel [1,4,6,4,1]/16:    shaders/swt.glsl:19
- patch pyramid binomial kernel:        shaders/blur_pyramid.glsl:19-20
- MKD patch blur sigma=0.7 kernel:      shaders/mkd/patch_gradients.glsl:22-28
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Dimensions (reference: lib.rs:10-15)
# ---------------------------------------------------------------------------
PATCH_SIZE = 32
DIMS_INPUT = 7
DIMS_EMB_CARTESIAN = 9
DIMS_EMB_POLAR = 25
RAW_DESCRIPTOR_LEN = DIMS_INPUT * (DIMS_EMB_CARTESIAN + DIMS_EMB_POLAR)  # 238
DESCRIPTOR_LEN = 128

# ---------------------------------------------------------------------------
# Detector constants
# ---------------------------------------------------------------------------
# Blob radius factor (common.glsl:15-17).
DOG_FIRST_SCALE_SIGMA = 0.82
DOG_SIGMA_RADIUS_FACTOR = float(np.sqrt(2.0))
# Contrast threshold for the extremum scan (vulkan/mod.rs:76).
CONTRAST_THRESHOLD = 0.035
# Pixel border excluded from the extremum scan (vulkan/mod.rs detect(): border=5).
DETECT_BORDER = 5
# Curvature-anisotropy ("edgeness") rejection band (scan_extrema.glsl:220-228).
CM_TAU_LOW = 0.7
CM_TAU_HIGH = 1.5
# Orientation histogram (keypoint_orientation.glsl).
N_ORI_BINS = 36
ORI_PEAK_RATIO = 0.8
ORI_PATCH_RADIUS = 7  # 15x15 neighborhood
ORI_SIGMA_FACTOR = 1.5
ORI_RADIUS_FACTOR = 3.0 * 1.5
# Sector boundaries for transcendental-free orientation binning:
# bin(g) = round(atan2(gy, gx) * 36 / 2pi) mod 36 realized as half-plane
# tests against the 18 boundary directions (k - 0.5) * 10 deg (the other
# 18 follow by point symmetry).  Mosaic TPU has no atan2 lowering, and
# the reference itself bins through an atan2 POLYNOMIAL
# (vulkan/shaders/atan2.glsl), so sector tests are at least as faithful; see
# ops/orientation.py:gradient_bin for the exact-diagonal tie rule.
_ORI_BK = (np.arange(1, 19, dtype=np.float64) - 0.5) * (2.0 * np.pi / 36.0)
ORI_BIN_BOUND_COS = np.cos(_ORI_BK).astype(np.float32)  # [18]
ORI_BIN_BOUND_SIN = np.sin(_ORI_BK).astype(np.float32)  # [18]
# Default runtime patch scaling (lib.rs:46).
DEFAULT_PATCH_SCALE_FACTOR = 24.0

# ---------------------------------------------------------------------------
# Separable convolution kernels
# ---------------------------------------------------------------------------
# Base Gaussian blur sigma=0.6 of the input image.  The reference implements
# a 5-tap kernel with the hardware-bilinear 2-tap trick (blur.glsl:20-27):
# center weight 0.66381836 and side samples of weight 0.16809084 at offset
# 1.015267163 px.  A bilinear sample at offset 1+f mixes pixels 1 and 2 with
# weights (1-f, f), so the effective 5-tap kernel is exactly:
_BW = 0.16809084
_BF = 0.015267163
BASE_BLUR_KERNEL = np.array(
    [_BW * _BF, _BW * (1.0 - _BF), 0.66381836, _BW * (1.0 - _BF), _BW * _BF],
    dtype=np.float32,
)

# A-trous stationary wavelet kernel (swt.glsl:19), dilated by 2^level at use.
SWT_KERNEL = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0

# Patch-pyramid downsampling kernel (blur_pyramid.glsl:19-20): weights
# {0.375, 0.3125} at offsets {0, +-1.2}; bilinear at 1.2 mixes pixels 1 and 2
# with weights (0.8, 0.2): 0.3125*0.8 = 0.25, 0.3125*0.2 = 0.0625, i.e. the
# binomial kernel [1, 4, 6, 4, 1] / 16.
PYRAMID_BLUR_KERNEL = np.array([0.0625, 0.25, 0.375, 0.25, 0.0625], dtype=np.float32)

# MKD patch pre-blur, sigma=0.7 (patch_gradients.glsl:22-28, mkd_ref.rs:101).
# NOTE: deliberately not normalized (sums to 0.9999) to match the reference.
PATCH_BLUR_KERNEL = np.array(
    [0.0096, 0.2054, 0.5699, 0.2054, 0.0096], dtype=np.float32
)

# ---------------------------------------------------------------------------
# Von Mises Fourier coefficient tables (mkd_ref.rs:7-9)
# ---------------------------------------------------------------------------
VM_FOURIER_N3_K8 = np.array(
    [0.37872374, 0.51796234, 0.46882015, 0.39798096], dtype=np.float32
)
VM_FOURIER_N1_K1 = np.array([0.618176, 0.6934725], dtype=np.float32)
VM_FOURIER_N2_K8 = np.array([0.37872374, 0.51796234, 0.46882015], dtype=np.float32)


def mesh_grid() -> np.ndarray:
    """[2, 32, 32] grid of (x, y) in [-1, 1] (mkd_ref.rs:173-185)."""
    n = PATCH_SIZE
    r = 2.0 * np.arange(n, dtype=np.float32) / (n - 1.0) - 1.0
    gx = np.broadcast_to(r[None, :], (n, n))
    gy = np.broadcast_to(r[:, None], (n, n))
    return np.stack([gx, gy]).astype(np.float32)


def cart2pol(arr: np.ndarray) -> np.ndarray:
    """[2,H,W] (x,y) -> [2,H,W] (mag, -atan2(y,x)) (mkd_ref.rs:133-144).

    Note the *negated* angle; this convention threads through the whole
    descriptor pipeline.
    """
    x, y = arr[0], arr[1]
    mag = np.sqrt(x * x + y * y + 1e-8)
    ang = -np.arctan2(y, x)
    return np.stack([mag, ang]).astype(np.float32)


def von_mises(arr: np.ndarray, coeffs: np.ndarray) -> np.ndarray:
    """Von Mises kernel embedding of an angle field (mkd_ref.rs:146-171).

    arr: [H, W] angles; coeffs: [n+1] Fourier coefficients.
    Returns [2n+1, H, W]: [c0*1, c1*cos(a), .., cn*cos(na),
                           c1*sin(a), .., cn*sin(na)].
    """
    n = len(coeffs) - 1
    freqs = np.arange(1, n + 1, dtype=np.float32).reshape(n, 1, 1)
    fa = freqs * arr[None]
    ones = np.ones((1,) + arr.shape, dtype=np.float32)
    cat = np.concatenate([ones, np.cos(fa), np.sin(fa)], axis=0)
    weights = np.concatenate([coeffs, coeffs[1:]]).reshape(2 * n + 1, 1, 1)
    return (cat * weights).astype(np.float32)


def spatial_kernel_embedding_cart() -> np.ndarray:
    """[9, 32, 32] cartesian spatial kernel (mkd_ref.rs:210-231)."""
    grid = mesh_grid() * (np.pi / 2.0)
    emb_a = von_mises(grid[0], VM_FOURIER_N1_K1)  # x -> [3,32,32]
    emb_b = von_mises(grid[1], VM_FOURIER_N1_K1)  # y -> [3,32,32]
    out = emb_a[:, None] * emb_b[None, :]  # [3,3,32,32]
    return out.reshape(9, PATCH_SIZE, PATCH_SIZE).astype(np.float32)


def spatial_kernel_embedding_polar() -> np.ndarray:
    """[25, 32, 32] polar spatial kernel (mkd_ref.rs:233-257)."""
    pol = cart2pol(mesh_grid())
    rho = pol[0] * (np.pi / np.sqrt(2.0))
    phi = -pol[1]  # == +atan2(y, x)
    emb_a = von_mises(phi.astype(np.float32), VM_FOURIER_N2_K8)  # [5,32,32]
    emb_b = von_mises(rho.astype(np.float32), VM_FOURIER_N2_K8)  # [5,32,32]
    out = emb_a[:, None] * emb_b[None, :]
    return out.reshape(25, PATCH_SIZE, PATCH_SIZE).astype(np.float32)


def gaussian_weighting() -> np.ndarray:
    """[32, 32] radial Gaussian weighting, sigma=1 over normalized radius
    (mkd_ref.rs:259-267).  Note exp(-r^2 / sigma^2), *not* 2 sigma^2."""
    grid = mesh_grid()
    norm = np.sqrt((grid**2).sum(axis=0))
    norm = norm / norm.max()
    return np.exp(-(norm**2)).astype(np.float32)


def gradient_angle_table() -> np.ndarray:
    """[32, 32] per-pixel angle added in the polar ("relative gradients")
    embedding (mkd_ref.rs:197-201, uploaded at vulkan/mod.rs:1618)."""
    return cart2pol(mesh_grid())[1]


def polar_embedding_planes() -> np.ndarray:
    """[25, 32, 32]: polar spatial kernel x Gaussian weighting.

    This is the constant actually used by the pooling stage
    (vulkan/mod.rs:1614-1617, mkd_ref.rs:284)."""
    return (spatial_kernel_embedding_polar() * gaussian_weighting()).astype(np.float32)


def cart_embedding_planes() -> np.ndarray:
    """[9, 32, 32]: cartesian spatial kernel x Gaussian weighting."""
    return (spatial_kernel_embedding_cart() * gaussian_weighting()).astype(np.float32)


def attenuate_pca(
    mean: np.ndarray, eigvals: np.ndarray, eigvecs: np.ndarray, t: float = 0.7
) -> tuple[np.ndarray, np.ndarray]:
    """Attenuated-PCA projection used for whitening (mkd_ref.rs:57-77).

    Returns (mean[238], proj[238, 128]) with
    proj = eigvecs[:, :128] * eigvals[:128]^(-t/2); descriptor = l2((raw - mean) @ proj).
    """
    m = -0.5 * t
    proj = eigvecs[:, :DESCRIPTOR_LEN] * (eigvals[:DESCRIPTOR_LEN] ** m)[None, :]
    return mean.astype(np.float32), proj.astype(np.float32)
