"""Scale-space extremum detection on TPU.

TPU-first redesign of shaders/scan_extrema.glsl: instead of workgroup tiles
with shared memory and atomic stream compaction (TPU has neither), the scan
is a *dense* computation over the whole fine volume — a boolean 26-neighbor
extremum mask, quadratic subpixel refinement and edge rejection evaluated
at every voxel as fused elementwise ops — followed by compaction without
atomics via `jax.lax.top_k` on the masked |contrast| score.  Capacity
overflow keeps the *strongest* `max_blobs` candidates (the reference's
atomic append drops an arbitrary subset; ours is deterministic and at
least as good) and reports the drop count, preserving the
dropped-blobs contract (vulkan/mod.rs:627-637).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C


class BlobArrays(NamedTuple):
    """Fixed-capacity SoA of candidate blobs + validity mask.

    TPU analog of the reference's ExtremumLocations buffer
    (shaders/common.glsl) with its blocked-SoA layout collapsed to plain
    dense arrays.
    """

    x: jnp.ndarray         # [K] f32 refined x
    y: jnp.ndarray         # [K] f32 refined y
    size: jnp.ndarray      # [K] f32 blob radius
    contrast: jnp.ndarray  # [K] f32 refined |contrast|
    level: jnp.ndarray     # [K] i32 fine level of the unrefined extremum
    valid: jnp.ndarray     # [K] bool
    n_total: jnp.ndarray   # [] i32 total candidates pre-capacity
    n_dropped: jnp.ndarray  # [] i32 candidates dropped at capacity


def _shift3(vol: jnp.ndarray, dz: int, dy: int, dx: int) -> jnp.ndarray:
    """Interior view of `vol` shifted by (dz, dy, dx); shape [L-2, H-2, W-2]."""
    L, H, W = vol.shape
    return jax.lax.slice(
        vol, (1 + dz, 1 + dy, 1 + dx), (L - 1 + dz, H - 1 + dy, W - 1 + dx)
    )


def dense_candidates(
    fine: jnp.ndarray,
    border: int = C.DETECT_BORDER,
    contrast_threshold: float = C.CONTRAST_THRESHOLD,
    extent=None,
):
    """Dense candidate fields over the interior of the fine volume.

    Returns (valid, x, y, size, contrast) with shape [L-2, H-2, W-2]
    (voxel (z, y, x) of the interior corresponds to fine[z+1, y+1, x+1]).
    All of scan_extrema.glsl's tests run vectorized:
      - |v| > threshold, 26-neighbor `sign(v)*v >= sign(v)*nb`
      - 3x3 Hessian quadratic refinement; any |offset| > 0.5 rejects
      - curvature-anisotropy edge rejection, cm in [0.7, 1.5]

    `extent` = traced (h, w): the ACTUAL image extent for the
    pad-to-max single-compile mode — the border mask is evaluated
    against it instead of the (padded) static shape, so candidates in
    the pad region are rejected exactly as the reference rejects
    candidates outside [border, dim - border).
    """
    L, H, W = fine.shape
    v = _shift3(fine, 0, 0, 0)
    sgn = jnp.sign(v)
    is_ext = jnp.abs(v) > contrast_threshold
    sv = sgn * v
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == 0 and dy == 0 and dx == 0:
                    continue
                is_ext &= sv >= sgn * _shift3(fine, dz, dy, dx)

    # border mask (x, y in [border, dim - border); z interior already)
    b = max(border, 1)
    h_act = H if extent is None else extent[0]
    w_act = W if extent is None else extent[1]
    ys = jnp.arange(1, H - 1)
    xs = jnp.arange(1, W - 1)
    in_border = ((ys >= b) & (ys < h_act - b))[None, :, None] & (
        (xs >= b) & (xs < w_act - b)
    )[None, None, :]
    is_ext &= in_border

    # quadratic refinement (scan_extrema.glsl:168-196)
    zp = _shift3(fine, 1, 0, 0)
    zm = _shift3(fine, -1, 0, 0)
    yp = _shift3(fine, 0, 1, 0)
    ym = _shift3(fine, 0, -1, 0)
    xp = _shift3(fine, 0, 0, 1)
    xm = _shift3(fine, 0, 0, -1)
    dds = (zp - zm) / 2.0
    ddy = (yp - ym) / 2.0
    ddx = (xp - xm) / 2.0
    v2 = v * 2.0
    h11 = zp + zm - v2
    h22 = yp + ym - v2
    h33 = xp + xm - v2
    h12 = (_shift3(fine, 1, 1, 0) - _shift3(fine, -1, 1, 0)
           - _shift3(fine, 1, -1, 0) + _shift3(fine, -1, -1, 0)) / 4.0
    h13 = (_shift3(fine, 1, 0, 1) - _shift3(fine, -1, 0, 1)
           - _shift3(fine, 1, 0, -1) + _shift3(fine, -1, 0, -1)) / 4.0
    h23 = (_shift3(fine, 0, 1, 1) - _shift3(fine, 0, 1, -1)
           - _shift3(fine, 0, -1, 1) + _shift3(fine, 0, -1, -1)) / 4.0
    det = (h11 * h22 * h33 - h11 * h23 * h23 - h12 * h12 * h33
           + 2.0 * h12 * h13 * h23 - h13 * h13 * h22)
    det = jnp.where(det == 0.0, 1e-30, det)
    hi11 = (h22 * h33 - h23 * h23) / det
    hi12 = (h13 * h23 - h12 * h33) / det
    hi13 = (h12 * h23 - h13 * h22) / det
    hi22 = (h11 * h33 - h13 * h13) / det
    hi23 = (h12 * h13 - h11 * h23) / det
    hi33 = (h11 * h22 - h12 * h12) / det
    off_s = -(hi11 * dds + hi12 * ddy + hi13 * ddx)
    off_y = -(hi12 * dds + hi22 * ddy + hi23 * ddx)
    off_x = -(hi13 * dds + hi23 * ddy + hi33 * ddx)

    small = ((jnp.abs(off_x) <= 0.5) & (jnp.abs(off_y) <= 0.5)
             & (jnp.abs(off_s) <= 0.5))

    interp = off_s * dds + off_y * ddy + off_x * ddx
    contrast = jnp.abs(v + interp / 2.0)

    denom = (h22 + h33) * (h22 + h33)
    cm = 1.0 - 4.0 * (h22 * h33 - h23 * h23) / jnp.where(denom == 0.0, 1.0, denom)
    not_edge = (denom != 0.0) & ~((cm >= C.CM_TAU_LOW) & (cm <= C.CM_TAU_HIGH))

    valid = is_ext & small & not_edge

    zz = jnp.arange(1, L - 1, dtype=jnp.float32)[:, None, None]
    size = (C.DOG_FIRST_SCALE_SIGMA * C.DOG_SIGMA_RADIUS_FACTOR
            * jnp.exp2(zz + off_s))
    x = xs.astype(jnp.float32)[None, None, :] + off_x
    y = ys.astype(jnp.float32)[None, :, None] + off_y
    return valid, x, y, size, contrast


def hierarchical_top_k(
    score: jnp.ndarray, k: int, chunk: int = 4096, chunk_cap: int = 64,
    rescue: int = 6,
):
    """Two-level top_k over a large flat score array.

    A flat `lax.top_k` over ~2M elements costs ~28 ms/8-frame batch on
    v5e; chunking to per-chunk top-`chunk_cap` first cuts the second
    level to `n_chunks * chunk_cap` elements.  The capped pool alone is
    exact whenever no chunk holds more than `chunk_cap` positive-score
    entries — strict 26-neighbor extrema can't exceed 1/8 voxel density,
    and measured real-image densities are far lower still (bird.jpg
    full-res: max 9 per 4096-voxel chunk; houses.jpg at 4096x3072 with
    30.5k candidates: max 32 — so 64 keeps 2x headroom while shrinking
    both sort levels 4x vs the round-1 cap of 256).  Because the
    extremum test allows ties (`>=`, scan_extrema.glsl semantics), a
    degenerate above-threshold plateau *can* make whole regions
    extremal and saturate a chunk.

    Plateau rescue: the `rescue` chunks with the highest positive-entry
    counts contribute their FULL contents to the second-level pool
    (their capped rows are masked out so nothing is double-counted).
    Saturated chunks always out-count unsaturated ones, so the result is
    exact for up to `rescue` simultaneously saturated chunks.  This is
    branch-free (a `lax.cond` fallback turns into a both-branches
    `select` under vmap, re-paying the full flat top_k every batch);
    beyond `rescue` saturated chunks the per-chunk strongest still
    survive and callers account the loss exactly via their kept-count
    (see detect_blobs: n_dropped = n_total - n_kept).

    Returns (values[k], flat_indices[k]).
    """
    n = score.shape[0]
    if n <= 4 * chunk or k >= n:
        return jax.lax.top_k(score, min(k, n))
    n_chunks = -(-n // chunk)
    # adaptive cap: few chunks (small images, large k) need a larger
    # per-chunk cap so the pool can still source k survivors with 2x
    # slack; rounded to 8 for layout.  Every clamp preserves
    # n_chunks * cap >= k (max-term -> >= 2k; chunk -> n_chunks*chunk
    # >= n > k; k -> n_chunks*k >= k), so the pool can always source k.
    cap = max(chunk_cap, -(-2 * k // n_chunks // 8) * 8)
    cap = min(cap, chunk, k)
    assert n_chunks * cap >= k
    # finite pad: 0 * pad must stay finite in the rescue one-hot matmul,
    # and callers treat scores <= 0 as invalid anyway
    padded = jnp.pad(score, (0, n_chunks * chunk - n), constant_values=-1.0)
    s2 = padded.reshape(n_chunks, chunk)

    v1, i1 = jax.lax.top_k(s2, cap)                       # [n_chunks, cap]
    flat_i = i1 + (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[:, None]

    r = min(rescue, n_chunks)
    counts = jnp.sum(s2 > 0.0, axis=1, dtype=jnp.int32)   # [n_chunks]
    _, c_idx = jax.lax.top_k(counts, r)                   # suspect chunks
    onehot = (c_idx[:, None] == jnp.arange(n_chunks)[None, :])  # [r, nc]
    v1 = jnp.where(onehot.any(axis=0)[:, None], -jnp.inf, v1)
    # full contents of the suspect chunks, gathered as an exact one-hot
    # matmul (scalar gathers are ~100M elem/s on TPU; this is free)
    rescue_v = jnp.einsum("rc,cj->rj", onehot.astype(jnp.float32), s2,
                          precision=jax.lax.Precision.HIGHEST)  # [r, chunk]
    rescue_i = (c_idx[:, None] * chunk
                + jnp.arange(chunk, dtype=jnp.int32)[None, :])

    pool_v = jnp.concatenate([v1.reshape(-1), rescue_v.reshape(-1)])
    pool_i = jnp.concatenate([flat_i.reshape(-1), rescue_i.reshape(-1)])
    v2, i2 = jax.lax.top_k(pool_v, k)
    return v2, pool_i[i2]


def detect_blobs(
    fine: jnp.ndarray,
    max_blobs: int,
    min_size: jnp.ndarray | float = 0.0,
    border: int = C.DETECT_BORDER,
    contrast_threshold: float = C.CONTRAST_THRESHOLD,
    select_cap: int | None = None,
    extent=None,
) -> BlobArrays:
    """Detect + compact candidate blobs to a fixed capacity.

    Compaction keeps the strongest candidates by refined |contrast|
    (deterministic), with a runtime `min_size` gate — fusing the detect
    capacity and the TopKContrastFilter min-size semantics
    (vulkan/mod.rs:1753-1786) into one on-device top_k.

    `select_cap` (default `max_blobs`) is the number of slots actually
    materialized.  The fused front-end passes `max_filtered` here: when
    the built-in top-n filter immediately truncates to `max_filtered`
    slots, selecting the top `max_blobs` first is wasted sort + gather
    work — the top `select_cap` by contrast are the same either way.
    Drop accounting stays in ENGINE terms (vs `max_blobs`, the
    reference's atomic-append capacity): n_dropped = n_total -
    min(n_total, max_blobs).  (The uncapped path counts kept slots
    exactly instead, which can differ only under >rescue plateau
    saturation of the hierarchical top_k.)
    """
    L, H, W = fine.shape
    valid, x, y, size, contrast = dense_candidates(
        fine, border, contrast_threshold, extent=extent
    )
    valid &= size >= jnp.asarray(min_size, jnp.float32)
    n_total = jnp.sum(valid, dtype=jnp.int32)

    k_sel = max_blobs if select_cap is None else min(select_cap, max_blobs)
    score = jnp.where(valid, contrast, -1.0).reshape(-1)
    top_scores, top_idx = hierarchical_top_k(score, k_sel)
    sel_valid = top_scores > 0.0
    if select_cap is None:
        # exact even under >rescue plateau saturation, where fewer than
        # min(n_total, max_blobs) candidates can survive the capped pool
        n_kept = jnp.sum(sel_valid, dtype=jnp.int32)
    else:
        n_kept = jnp.minimum(n_total, max_blobs)

    # Invalid slots MUST be zeroed, not left with whatever the gather
    # returns: the dense refine computes x/y/size at EVERY voxel, and on
    # rejected candidates the near-singular Hessian solve yields wild
    # values (offsets ~1e30, size=inf).  Downstream stages compute
    # window-DMA offsets for all slots (validity only masks
    # contributions), and a wild offset is an out-of-bounds async copy —
    # a worker-killing TPU fault, not an exception.  This was the root
    # cause of every "vmapped Pallas kernel fault" seen on v5e (the
    # crash depended on whether the OOB read escaped the allocation,
    # hence the shape/batching flakiness).
    flat = lambda a, fill=0: jnp.where(sel_valid, a.reshape(-1)[top_idx],
                                       fill)
    # contrast = the top_k score itself; level = flat-index arithmetic —
    # both avoid a scalar gather (~100M elem/s on TPU; 3 gathers instead
    # of 5 for the slot payload)
    plane = (H - 2) * (W - 2)
    lvl = jnp.where(sel_valid, 1 + (top_idx // plane).astype(jnp.int32), 1)
    return BlobArrays(
        x=flat(jnp.broadcast_to(x, valid.shape)),
        y=flat(jnp.broadcast_to(y, valid.shape)),
        size=flat(jnp.broadcast_to(size, valid.shape)),
        contrast=jnp.where(sel_valid, top_scores, 0.0),
        level=lvl,
        valid=sel_valid,
        n_total=n_total,
        n_dropped=n_total - n_kept,
    )
