"""Golden NumPy scale-space detector.

Oracle for the TPU detect phase.  Semantics follow the reference GPU
kernels:

- base blur sigma=0.6            (shaders/blur.glsl)
- a-trous SWT levels             (shaders/swt.glsl, dilation 2^level)
- fine = coarse[l] - coarse[l+1] (shaders/swt_sub.glsl)
- 26-neighbor extremum scan + quadratic refinement + edge rejection
                                 (shaders/scan_extrema.glsl)
- patch pyramid for descriptor sampling
                                 (vulkan/patch_pyramid.rs, blur_pyramid.glsl)

Border mode everywhere in the detect phase is mirror ("symmetric" in NumPy
terms), matching the MirroredRepeat sampler (vulkan/mod.rs:940-943).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .. import constants as C


def _sep_conv_mirror(arr: np.ndarray, kernel: np.ndarray, dilation: int = 1) -> np.ndarray:
    """Separable conv with symmetric (mirror, edge-repeated) border.

    Taps at offsets dilation * {-r..r}.  Matches sampling with a
    MirroredRepeat sampler at pixel centers.
    """
    rad = (len(kernel) - 1) // 2
    pad = rad * dilation
    h, w = arr.shape
    padded = np.pad(arr, pad, mode="symmetric")
    # horizontal
    tmp = np.zeros((h, w), dtype=np.float64)
    for i, k in enumerate(kernel):
        off = (i - rad) * dilation
        tmp += k * padded[pad : pad + h, pad + off : pad + off + w]
    # vertical
    padded2 = np.pad(tmp, pad, mode="symmetric")
    out = np.zeros((h, w), dtype=np.float64)
    for i, k in enumerate(kernel):
        off = (i - rad) * dilation
        out += k * padded2[pad + off : pad + off + h, pad : pad + w]
    return out.astype(np.float32)


def scale_space(img: np.ndarray, n_scales: int) -> np.ndarray:
    """[n_scales+3, H, W] coarse scale-space stack.

    Layer 0 is the sigma=0.6 blurred input (blur.glsl); layer l+1 is the
    SWT smoothing of layer l with dilation 2^l (swt.glsl, driven for
    n_scales+2 levels at vulkan/mod.rs:1093-1144).
    """
    n_coarse = n_scales + 3
    h, w = img.shape
    coarse = np.zeros((n_coarse, h, w), dtype=np.float32)
    coarse[0] = _sep_conv_mirror(img.astype(np.float32), C.BASE_BLUR_KERNEL)
    for lvl in range(n_coarse - 1):
        coarse[lvl + 1] = _sep_conv_mirror(coarse[lvl], C.SWT_KERNEL, dilation=1 << lvl)
    return coarse


def fine_volume(coarse: np.ndarray) -> np.ndarray:
    """[n_fine, H, W] detail ("fine") coefficients: coarse[l] - coarse[l+1]
    (swt_sub.glsl:24-30).  n_fine = n_coarse - 1 = n_scales + 2."""
    return (coarse[:-1] - coarse[1:]).astype(np.float32)


@dataclass
class Blobs:
    """Candidate blobs in reference order-free form (SoA)."""

    x: np.ndarray         # [N] refined x (float)
    y: np.ndarray         # [N] refined y (float)
    size: np.ndarray      # [N] blob radius
    contrast: np.ndarray  # [N] refined |contrast| (response)
    level: np.ndarray     # [N] integer fine level of the unrefined extremum


def scan_extrema(
    fine: np.ndarray,
    border: int = C.DETECT_BORDER,
    contrast_threshold: float = C.CONTRAST_THRESHOLD,
) -> Blobs:
    """3D 26-neighbor extremum scan + refinement (scan_extrema.glsl).

    A voxel (z, y, x) with z in [1, n_fine-2], x/y in [border, dim-border)
    is a candidate when |v| > threshold and sign(v)*v >= sign(v)*neighbor
    for all 26 neighbors.  Candidates get a 3x3 Hessian quadratic
    refinement; any |offset| > 0.5 drops the candidate
    (scan_extrema.glsl:198-202 — the re-rounded branch never appends).
    Edge-like blobs are rejected via the curvature-anisotropy criterion
    cm = 1 - 4*det/tr^2 of the spatial Hessian inside [0.7, 1.5].

    Vectorized (dense window max/min + fancy-indexed refinement) so full
    resolution real-image e2e parity is tractable; emission order is the
    loop's (z, y, x) raster order.  `_scan_extrema_loop` keeps the
    literal per-voxel transcription as a cross-check oracle
    (tests/test_detect.py::test_vectorized_scan_matches_loop).
    """
    L, H, W = fine.shape
    b = max(border, 1)
    if L < 3 or H <= 2 * b or W <= 2 * b:
        return Blobs(*(np.array([], dt) for dt in
                       (np.float32, np.float32, np.float32, np.float32,
                        np.int32)))

    # 3x3x3 window max/min (center included — v>=v is vacuous), then the
    # candidate mask on the interior region.
    wmax = fine.copy()
    wmin = fine.copy()
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == dy == dx == 0:
                    continue
                sl_dst = (slice(max(0, -dz), L - max(0, dz)),
                          slice(max(0, -dy), H - max(0, dy)),
                          slice(max(0, -dx), W - max(0, dx)))
                sl_src = (slice(max(0, dz), L - max(0, -dz)),
                          slice(max(0, dy), H - max(0, -dy)),
                          slice(max(0, dx), W - max(0, -dx)))
                np.maximum(wmax[sl_dst], fine[sl_src], out=wmax[sl_dst])
                np.minimum(wmin[sl_dst], fine[sl_src], out=wmin[sl_dst])

    mask = np.zeros((L, H, W), dtype=bool)
    core = (slice(1, L - 1), slice(b, H - b), slice(b, W - b))
    vc = fine[core]
    mask[core] = (np.abs(vc) > contrast_threshold) & (
        ((vc > 0) & (vc >= wmax[core])) | ((vc < 0) & (vc <= wmin[core])))

    z, y, x = np.nonzero(mask)  # C-order == the loop's (z, y, x) order
    if len(z) == 0:
        return Blobs(*(np.array([], dt) for dt in
                       (np.float32, np.float32, np.float32, np.float32,
                        np.int32)))

    f = fine
    v = f[z, y, x]
    dds = (f[z + 1, y, x] - f[z - 1, y, x]) / 2.0
    ddy = (f[z, y + 1, x] - f[z, y - 1, x]) / 2.0
    ddx = (f[z, y, x + 1] - f[z, y, x - 1]) / 2.0
    v2 = v * 2.0
    h11 = f[z + 1, y, x] + f[z - 1, y, x] - v2
    h22 = f[z, y + 1, x] + f[z, y - 1, x] - v2
    h33 = f[z, y, x + 1] + f[z, y, x - 1] - v2
    h12 = (f[z + 1, y + 1, x] - f[z - 1, y + 1, x]
           - f[z + 1, y - 1, x] + f[z - 1, y - 1, x]) / 4.0
    h13 = (f[z + 1, y, x + 1] - f[z - 1, y, x + 1]
           - f[z + 1, y, x - 1] + f[z - 1, y, x - 1]) / 4.0
    h23 = (f[z, y + 1, x + 1] - f[z, y + 1, x - 1]
           - f[z, y - 1, x + 1] + f[z, y - 1, x - 1]) / 4.0
    with np.errstate(divide="ignore", invalid="ignore"):
        det = (h11 * h22 * h33 - h11 * h23 * h23 - h12 * h12 * h33
               + 2.0 * h12 * h13 * h23 - h13 * h13 * h22)
        hi11 = (h22 * h33 - h23 * h23) / det
        hi12 = (h13 * h23 - h12 * h33) / det
        hi13 = (h12 * h23 - h13 * h22) / det
        hi22 = (h11 * h33 - h13 * h13) / det
        hi23 = (h12 * h13 - h11 * h23) / det
        hi33 = (h11 * h22 - h12 * h12) / det
        off_s = -(hi11 * dds + hi12 * ddy + hi13 * ddx)
        off_y = -(hi12 * dds + hi22 * ddy + hi23 * ddx)
        off_x = -(hi13 * dds + hi23 * ddy + hi33 * ddx)
        # NaN offsets compare False (like the scalar loop) — kept.
        drop = ((np.abs(off_x) > 0.5) | (np.abs(off_y) > 0.5)
                | (np.abs(off_s) > 0.5))
        interp = off_s * dds + off_y * ddy + off_x * ddx
        contrast = np.abs(v + interp / 2.0)
        denom = (h22 + h33) ** 2
        cm = 1.0 - 4.0 * (h22 * h33 - h23 * h23) / denom
        drop |= denom == 0
        drop |= (C.CM_TAU_LOW <= cm) & (cm <= C.CM_TAU_HIGH)

    keep = ~drop
    # size semantics: double-precision exp2, ONE rounding to f32 (numpy's
    # f32 scalar-vs-array pow paths differ by ulps; pin it explicitly).
    # Survivors only — dropped rows can hold inf/NaN offsets.
    size = (C.DOG_FIRST_SCALE_SIGMA * C.DOG_SIGMA_RADIUS_FACTOR
            * 2.0 ** (z[keep].astype(np.float64)
                      + off_s[keep].astype(np.float64)))
    return Blobs(
        x=(x + off_x)[keep].astype(np.float32),
        y=(y + off_y)[keep].astype(np.float32),
        size=size.astype(np.float32),
        contrast=contrast[keep].astype(np.float32),
        level=z[keep].astype(np.int32),
    )


def _scan_extrema_loop(
    fine: np.ndarray,
    border: int = C.DETECT_BORDER,
    contrast_threshold: float = C.CONTRAST_THRESHOLD,
) -> Blobs:
    """Literal per-voxel transcription of scan_extrema.glsl (slow oracle
    for the vectorized `scan_extrema`)."""
    L, H, W = fine.shape
    xs, ys, sizes, contrasts, levels = [], [], [], [], []
    b = max(border, 1)
    for z in range(1, L - 1):
        for y in range(b, H - b):
            for x in range(b, W - b):
                v = fine[z, y, x]
                if abs(v) <= contrast_threshold:
                    continue
                sgn = np.sign(v)
                nb = fine[z - 1 : z + 2, y - 1 : y + 2, x - 1 : x + 2]
                if not np.all(sgn * v >= sgn * nb):
                    continue
                # gradient
                dds = (fine[z + 1, y, x] - fine[z - 1, y, x]) / 2.0
                ddy = (fine[z, y + 1, x] - fine[z, y - 1, x]) / 2.0
                ddx = (fine[z, y, x + 1] - fine[z, y, x - 1]) / 2.0
                v2 = v * 2.0
                h11 = fine[z + 1, y, x] + fine[z - 1, y, x] - v2
                h22 = fine[z, y + 1, x] + fine[z, y - 1, x] - v2
                h33 = fine[z, y, x + 1] + fine[z, y, x - 1] - v2
                h12 = (fine[z + 1, y + 1, x] - fine[z - 1, y + 1, x]
                       - fine[z + 1, y - 1, x] + fine[z - 1, y - 1, x]) / 4.0
                h13 = (fine[z + 1, y, x + 1] - fine[z - 1, y, x + 1]
                       - fine[z + 1, y, x - 1] + fine[z - 1, y, x - 1]) / 4.0
                h23 = (fine[z, y + 1, x + 1] - fine[z, y + 1, x - 1]
                       - fine[z, y - 1, x + 1] + fine[z, y - 1, x - 1]) / 4.0
                det = (h11 * h22 * h33 - h11 * h23 * h23 - h12 * h12 * h33
                       + 2.0 * h12 * h13 * h23 - h13 * h13 * h22)
                hi11 = (h22 * h33 - h23 * h23) / det
                hi12 = (h13 * h23 - h12 * h33) / det
                hi13 = (h12 * h23 - h13 * h22) / det
                hi22 = (h11 * h33 - h13 * h13) / det
                hi23 = (h12 * h13 - h11 * h23) / det
                hi33 = (h11 * h22 - h12 * h12) / det
                off_s = -(hi11 * dds + hi12 * ddy + hi13 * ddx)
                off_y = -(hi12 * dds + hi22 * ddy + hi23 * ddx)
                off_x = -(hi13 * dds + hi23 * ddy + hi33 * ddx)
                if abs(off_x) > 0.5 or abs(off_y) > 0.5 or abs(off_s) > 0.5:
                    continue
                interp = off_s * dds + off_y * ddy + off_x * ddx
                contrast = abs(v + interp / 2.0)
                denom = (h22 + h33) ** 2
                if denom == 0:
                    continue
                cm = 1.0 - 4.0 * (h22 * h33 - h23 * h23) / denom
                if C.CM_TAU_LOW <= cm <= C.CM_TAU_HIGH:
                    continue
                size = (C.DOG_FIRST_SCALE_SIGMA * C.DOG_SIGMA_RADIUS_FACTOR
                        * 2.0 ** (float(z) + float(off_s)))
                xs.append(x + off_x)
                ys.append(y + off_y)
                sizes.append(size)
                contrasts.append(contrast)
                levels.append(z)
    return Blobs(
        x=np.array(xs, dtype=np.float32),
        y=np.array(ys, dtype=np.float32),
        size=np.array(sizes, dtype=np.float32),
        contrast=np.array(contrasts, dtype=np.float32),
        level=np.array(levels, dtype=np.int32),
    )


def patch_pyramid(coarse: np.ndarray, n_levels: int) -> list[np.ndarray]:
    """Mip pyramid for descriptor patch sampling (vulkan/patch_pyramid.rs).

    - mip 0: coarse layer 0 (the sigma=0.6 blurred image), full resolution.
    - mip 1: coarse layer 1, nearest-decimated by 2 (blit picks odd samples:
      dst(x,y) <- src(2x+1, 2y+1), patch_pyramid.rs:232-289).
    - mip l+1 (l >= 1): binomial [1,4,6,4,1]/16 blur of mip l (mirror
      border) then even-sample decimation (blur_pyramid.glsl; vertical pass
      samples column 2x, row 2y).
    """
    h, w = coarse.shape[1:]
    mips = [coarse[0].copy(), coarse[1][1::2, 1::2].copy()]
    for lvl in range(1, n_levels - 1):
        cur = mips[lvl]
        blurred = _sep_conv_mirror(cur, C.PYRAMID_BLUR_KERNEL)
        # output size is floor(in/2) (blur_pyramid.glsl: out_width = in_width/2)
        oh, ow = h >> (lvl + 1), w >> (lvl + 1)
        mips.append(blurred[::2, ::2][:oh, :ow].copy())
    return mips
