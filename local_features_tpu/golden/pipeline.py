"""Golden end-to-end pipeline: detect -> filter -> orient -> describe.

Slow NumPy oracle for the full `detect_top_n` path
(reference: vulkan/mod.rs:363-594 and python/src/lib.rs:86-149).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .. import constants as C
from ..pca import load_pca
from .mkd import mkd_raw_descriptor
from .orientation import keypoint_orientations
from .scale_space import fine_volume, patch_pyramid, scale_space, scan_extrema


@dataclass
class GoldenParams:
    n_scales: int = 4
    patch_scale_factor: float = C.DEFAULT_PATCH_SCALE_FACTOR
    pca: str = "liberty"
    border: int = C.DETECT_BORDER
    contrast_threshold: float = C.CONTRAST_THRESHOLD


@dataclass
class GoldenResult:
    # keypoints, one row per (extremum, orientation) pair
    x: np.ndarray
    y: np.ndarray
    size: np.ndarray
    angle: np.ndarray
    response: np.ndarray
    descriptors: np.ndarray  # [N, 128]
    raw_descriptors: np.ndarray = field(default=None)  # [N, 238]


def _mirror_index(i: np.ndarray, n: int) -> np.ndarray:
    """MirroredRepeat (symmetric, edge-repeated) index wrap into [0, n)."""
    period = 2 * n
    m = np.mod(i, period)
    return np.where(m >= n, period - 1 - m, m)


def _bilinear_mirror(img: np.ndarray, sx: np.ndarray, sy: np.ndarray) -> np.ndarray:
    """Bilinear sample at pixel-center coords with mirror border."""
    h, w = img.shape
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    x0m = _mirror_index(x0, w)
    x1m = _mirror_index(x0 + 1, w)
    y0m = _mirror_index(y0, h)
    y1m = _mirror_index(y0 + 1, h)
    v00 = img[y0m, x0m]
    v01 = img[y0m, x1m]
    v10 = img[y1m, x0m]
    v11 = img[y1m, x1m]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11)).astype(np.float32)


def sample_patch(
    mips: list[np.ndarray],
    kp_x: float,
    kp_y: float,
    kp_size: float,
    angle_deg: float,
    patch_scale_factor: float,
) -> np.ndarray:
    """Rotated/scaled 32x32 patch from the mip pyramid
    (shaders/mkd/patch_gradients.glsl:40-70)."""
    scale = kp_size * patch_scale_factor / C.PATCH_SIZE
    log2_scale = np.log2(scale)
    level = int(np.floor(log2_scale))
    level = max(0, min(level, len(mips) - 1))
    rem = 2.0 ** (log2_scale - level)
    theta = np.deg2rad(angle_deg)
    ps2 = C.PATCH_SIZE / 2.0
    lx = np.arange(C.PATCH_SIZE, dtype=np.float32)[None, :] - ps2
    ly = np.arange(C.PATCH_SIZE, dtype=np.float32)[:, None] - ps2
    ct, st = np.cos(theta), np.sin(theta)
    xx = lx * ct - ly * st
    yy = lx * st + ly * ct
    sx = xx * rem + kp_x / (2.0**level)
    sy = yy * rem + kp_y / (2.0**level)
    return _bilinear_mirror(mips[level], sx, sy)


def detect_and_extract(
    img: np.ndarray,
    params: GoldenParams | None = None,
    top_n: int | None = None,
    min_size: float = 0.0,
) -> GoldenResult:
    params = params or GoldenParams()
    coarse = scale_space(img, params.n_scales)
    fine = fine_volume(coarse)
    blobs = scan_extrema(fine, params.border, params.contrast_threshold)

    # Top-n filter by |contrast| with min-size gate (TopKContrastFilter,
    # vulkan/mod.rs:1753-1786).
    keep = np.flatnonzero(blobs.size >= min_size)
    if top_n is not None and len(keep) > top_n:
        order = np.argsort(-blobs.contrast[keep], kind="stable")
        keep = keep[order[:top_n]]
        keep.sort()

    n_pyr_levels = int(np.ceil(np.log2(min(img.shape))))
    mips = patch_pyramid(coarse, n_pyr_levels)

    mean, proj = load_pca(params.pca).attenuated

    xs, ys, sizes, angles, responses, descs, raws = [], [], [], [], [], [], []
    for i in keep:
        bx, by = float(blobs.x[i]), float(blobs.y[i])
        bsize, bcontrast = float(blobs.size[i]), float(blobs.contrast[i])
        for ang in keypoint_orientations(coarse, bx, by, bsize):
            patch = sample_patch(mips, bx, by, bsize, ang,
                                 params.patch_scale_factor)
            raw = mkd_raw_descriptor(patch)
            d = (raw - mean) @ proj
            d = d / np.sqrt((d * d).sum())
            xs.append(bx)
            ys.append(by)
            sizes.append(bsize)
            angles.append(ang)
            responses.append(bcontrast)
            descs.append(d)
            raws.append(raw)

    return GoldenResult(
        x=np.array(xs, dtype=np.float32),
        y=np.array(ys, dtype=np.float32),
        size=np.array(sizes, dtype=np.float32),
        angle=np.array(angles, dtype=np.float32),
        response=np.array(responses, dtype=np.float32),
        descriptors=(np.stack(descs) if descs
                     else np.zeros((0, C.DESCRIPTOR_LEN), np.float32)),
        raw_descriptors=(np.stack(raws) if raws
                         else np.zeros((0, C.RAW_DESCRIPTOR_LEN), np.float32)),
    )
