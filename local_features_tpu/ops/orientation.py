"""Keypoint orientation assignment on TPU.

TPU-first redesign of shaders/keypoint_orientation.glsl: the GPU launches
one 16x16 workgroup per extremum with shared-memory histograms and atomic
keypoint append.  Here everything is batched over the fixed [F] filtered
blob slots: the 15x15 dilated neighborhoods become one flat gather from
the coarse stack, the 36-bin histograms a masked one-hot contraction, and
the multi-orientation append ("every local max >= 0.8 peak emits a
keypoint", keypoint_orientation.glsl:147-173) becomes a [F, 36] peak mask
compacted to [max_keypoints] slots by an order-preserving top_k — the
atomic-free TPU equivalent of stream compaction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

_R = C.ORI_PATCH_RADIUS  # 7
_PS = 2 * _R + 1         # 15


class KeypointArrays(NamedTuple):
    """Fixed-capacity keypoints (one slot per (blob, orientation) pair)."""

    x: jnp.ndarray         # [K] f32
    y: jnp.ndarray         # [K] f32
    size: jnp.ndarray      # [K] f32
    angle: jnp.ndarray     # [K] f32 degrees
    response: jnp.ndarray  # [K] f32 (blob contrast)
    blob_idx: jnp.ndarray  # [K] i32 index into the blob slots
    valid: jnp.ndarray     # [K] bool
    n_total: jnp.ndarray   # [] i32 keypoints pre-capacity
    n_dropped: jnp.ndarray  # [] i32


def orientation_histograms(
    coarse: jnp.ndarray,
    bx: jnp.ndarray,
    by: jnp.ndarray,
    bsize: jnp.ndarray,
    bvalid: jnp.ndarray,
):
    """Peak orientations for each blob slot.

    Returns (angles[F, 36] degrees, peak_mask[F, 36]).
    """
    nC, H, W = coarse.shape
    F = bx.shape[0]

    level = jnp.round(jnp.log2(
        bsize / (C.DOG_FIRST_SCALE_SIGMA * C.DOG_SIGMA_RADIUS_FACTOR)))
    level = jnp.clip(level, 0, nC - 1).astype(jnp.int32)
    step = jnp.left_shift(1, level)                       # [F]
    radius = jnp.round(C.ORI_RADIUS_FACTOR * bsize / C.DOG_SIGMA_RADIUS_FACTOR)
    sigma = C.ORI_SIGMA_FACTOR * bsize / C.DOG_SIGMA_RADIUS_FACTOR

    xi = jnp.floor(bx).astype(jnp.int32)
    yi = jnp.floor(by).astype(jnp.int32)

    offs = jnp.arange(-_R, _R + 1, dtype=jnp.int32)       # [15]
    x_img = xi[:, None] + offs[None, :] * step[:, None]   # [F, 15]
    y_img = yi[:, None] + offs[None, :] * step[:, None]
    vx = (x_img >= 0) & (x_img < W)
    vy = (y_img >= 0) & (y_img < H)
    valid_px = vx[:, None, :] & vy[:, :, None]            # [F, 15, 15]

    xc = jnp.clip(x_img, 0, W - 1)
    yc = jnp.clip(y_img, 0, H - 1)
    flat_idx = (level[:, None, None] * (H * W)
                + yc[:, :, None] * W + xc[:, None, :])    # [F, 15, 15]
    patch = jnp.take(coarse.reshape(-1), flat_idx.reshape(-1), axis=0)
    patch = jnp.where(valid_px, patch.reshape(F, _PS, _PS), 0.0)

    # central-difference gradients on the interior 13x13
    gx = patch[:, 1:-1, 2:] - patch[:, 1:-1, :-2]
    gy = patch[:, :-2, 1:-1] - patch[:, 2:, 1:-1]

    ioffs = offs[1:-1].astype(jnp.float32)                # [-6..6]
    dx = ioffs[None, :] * step[:, None].astype(jnp.float32)  # [F, 13]
    dy = dx
    in_grad = ((jnp.abs(dx) <= radius[:, None])[:, None, :]
               & (jnp.abs(dy) <= radius[:, None])[:, :, None]
               & valid_px[:, 1:-1, 1:-1])
    contrib_mask = in_grad & ((gx != 0.0) | (gy != 0.0)) & bvalid[:, None, None]

    mag = jnp.sqrt(gx * gx + gy * gy)
    dist = dx[:, None, :] ** 2 + dy[:, :, None] ** 2
    weight = jnp.exp(-dist / (2.0 * sigma * sigma)[:, None, None])
    contrib = jnp.where(contrib_mask, weight * mag, 0.0)  # [F, 13, 13]

    ang = jnp.arctan2(gy, gx)
    b = jnp.round(ang * (C.N_ORI_BINS / (2.0 * np.pi))).astype(jnp.int32)
    b = jnp.mod(b, C.N_ORI_BINS)

    onehot = (b[..., None] == jnp.arange(C.N_ORI_BINS)[None, None, None, :])
    raw_hist = jnp.sum(contrib[..., None] * onehot, axis=(1, 2))  # [F, 36]

    # circular [1,4,6,4,1]/16 smoothing
    r = lambda s: jnp.roll(raw_hist, s, axis=-1)
    hist = ((r(2) + r(-2)) * (1.0 / 16.0)
            + (r(1) + r(-1)) * (4.0 / 16.0)
            + raw_hist * (6.0 / 16.0))

    left = jnp.roll(hist, 1, axis=-1)
    right = jnp.roll(hist, -1, axis=-1)
    thresh = jnp.max(hist, axis=-1, keepdims=True) * C.ORI_PEAK_RATIO
    peak = (left < hist) & (right < hist) & (hist >= thresh) & bvalid[:, None]

    denom = left - 2.0 * hist + right
    interp = jnp.where(peak, (left - right) / jnp.where(denom == 0, 1.0, denom), 0.0)
    bin_f = jnp.arange(C.N_ORI_BINS, dtype=jnp.float32)[None, :] + interp / 2.0
    bin_f = jnp.where(bin_f < 0, bin_f + C.N_ORI_BINS, bin_f)
    bin_f = jnp.where(bin_f > C.N_ORI_BINS, bin_f - C.N_ORI_BINS, bin_f)
    angles = 360.0 - (360.0 / C.N_ORI_BINS) * bin_f
    return angles, peak


def keypoints_from_blobs(
    coarse: jnp.ndarray,
    blobs,
    max_keypoints: int,
) -> KeypointArrays:
    """Assign orientations and compact (blob, peak) pairs into keypoint slots.

    Order-preserving compaction: keypoint slots are filled in
    (blob, bin) lexical order via top_k on a descending index score —
    deterministic, unlike the reference's atomic append order.
    """
    angles, peak = orientation_histograms(
        coarse, blobs.x, blobs.y, blobs.size, blobs.valid
    )
    F = angles.shape[0]
    n_flat = F * C.N_ORI_BINS
    flat_peak = peak.reshape(-1)
    n_total = jnp.sum(flat_peak, dtype=jnp.int32)

    score = jnp.where(flat_peak, n_flat - jnp.arange(n_flat, dtype=jnp.int32), 0)
    top_score, top_idx = jax.lax.top_k(score, max_keypoints)
    kp_valid = top_score > 0
    blob_idx = top_idx // C.N_ORI_BINS

    pick = lambda a: a[blob_idx]
    return KeypointArrays(
        x=pick(blobs.x),
        y=pick(blobs.y),
        size=pick(blobs.size),
        angle=angles.reshape(-1)[top_idx],
        response=pick(blobs.contrast),
        blob_idx=blob_idx,
        valid=kp_valid,
        n_total=n_total,
        n_dropped=jnp.maximum(n_total - max_keypoints, 0),
    )
