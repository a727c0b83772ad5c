"""Golden NumPy keypoint orientation assignment.

Oracle for the TPU orientation stage (shaders/keypoint_orientation.glsl):
SIFT-style 36-bin gradient orientation histogram over a 15x15 dilated
neighborhood of the coarse scale-space layer; every smoothed-histogram
local maximum >= 0.8 * peak emits one keypoint (multi-orientation).
"""

from __future__ import annotations

import numpy as np

from .. import constants as C

_R = C.ORI_PATCH_RADIUS  # 7 -> 15x15 patch


def gradient_bin(gx: np.float32, gy: np.float32) -> int:
    """Scalar mirror of ops/orientation.py:gradient_bin (shared sector
    rule; see its docstring for the derivation and the exact-diagonal
    tie convention).  Replaces round(arctan2 * 36/2pi) % 36 — the old
    f64-promoted NumPy form disagreed with the f32 XLA path at exact
    -+135 deg diagonals; one definition now serves golden/XLA/Pallas."""
    if abs(gx) == abs(gy) and gx != 0.0:
        if gy >= 0.0:
            return 4 if gx > 0.0 else 14
        return 32 if gx > 0.0 else 22
    b = 0
    if gy >= 0.0:
        for k in range(18):
            if C.ORI_BIN_BOUND_COS[k] * gy - C.ORI_BIN_BOUND_SIN[k] * gx >= 0.0:
                b += 1
    else:
        for k in range(18):
            if C.ORI_BIN_BOUND_COS[k] * gy + C.ORI_BIN_BOUND_SIN[k] * gx <= 0.0:
                b -= 1
    return b % C.N_ORI_BINS


def keypoint_orientations(
    coarse: np.ndarray, kp_x: float, kp_y: float, kp_size: float
) -> list[float]:
    """Orientations (degrees) for one extremum.

    coarse: [n_coarse, H, W] scale-space stack; (kp_x, kp_y, kp_size) is a
    refined blob.  Follows keypoint_orientation.glsl:40-173.
    """
    _, H, W = coarse.shape
    level = int(np.round(np.log2(
        kp_size / (C.DOG_FIRST_SCALE_SIGMA * C.DOG_SIGMA_RADIUS_FACTOR))))
    level = max(0, min(level, coarse.shape[0] - 1))
    step = 1 << level
    radius = int(np.round(C.ORI_RADIUS_FACTOR * kp_size / C.DOG_SIGMA_RADIUS_FACTOR))
    sigma = C.ORI_SIGMA_FACTOR * kp_size / C.DOG_SIGMA_RADIUS_FACTOR
    xi, yi = int(kp_x), int(kp_y)

    # Load the 15x15 dilated patch; out-of-image samples are zero
    # (keypoint_orientation.glsl:77-83).
    size = 2 * _R + 1
    patch = np.zeros((size, size), dtype=np.float32)
    for ly in range(size):
        for lx in range(size):
            x_img = xi + (lx - _R) * step
            y_img = yi + (ly - _R) * step
            if 0 <= x_img < W and 0 <= y_img < H:
                patch[ly, lx] = coarse[level, y_img, x_img]

    raw_hist = np.zeros(C.N_ORI_BINS, dtype=np.float32)
    for ly in range(size):
        for lx in range(size):
            xp, yp = lx - _R, ly - _R
            x_img, y_img = xi + xp * step, yi + yp * step
            valid = 0 <= x_img < W and 0 <= y_img < H
            in_grad = (valid and abs(xp * step) <= radius
                       and abs(yp * step) <= radius)
            if not in_grad:
                continue
            gx = patch[ly, lx + 1] - patch[ly, lx - 1]
            gy = patch[ly - 1, lx] - patch[ly + 1, lx]
            if gx == 0.0 and gy == 0.0:
                continue
            mag = np.sqrt(gx * gx + gy * gy)
            dist = (xp * step) ** 2 + (yp * step) ** 2
            weight = np.exp(-dist / (2.0 * sigma * sigma))
            raw_hist[gradient_bin(gx, gy)] += weight * mag

    # Circular [1,4,6,4,1]/16 smoothing (keypoint_orientation.glsl:135-140).
    hist = np.zeros_like(raw_hist)
    for i in range(C.N_ORI_BINS):
        hist[i] = (
            (raw_hist[(i - 2) % 36] + raw_hist[(i + 2) % 36]) / 16.0
            + (raw_hist[(i - 1) % 36] + raw_hist[(i + 1) % 36]) * 4.0 / 16.0
            + raw_hist[i] * 6.0 / 16.0
        )

    thresh = hist.max() * C.ORI_PEAK_RATIO
    angles = []
    for i in range(C.N_ORI_BINS):
        left = hist[(i - 1) % 36]
        right = hist[(i + 1) % 36]
        v = hist[i]
        if left < v and right < v and v >= thresh:
            interp = (left - right) / (left - 2.0 * v + right)
            bin_f = i + interp / 2.0
            if bin_f < 0:
                bin_f += C.N_ORI_BINS
            elif bin_f > C.N_ORI_BINS:
                bin_f -= C.N_ORI_BINS
            angles.append(360.0 - (360.0 / C.N_ORI_BINS) * bin_f)
    return angles
