"""The full detect -> filter -> orient -> describe front-end as one
jit-able function.

TPU-first structural shift vs the reference: the GPU version needs 3
submits with host sync points (detect graph -> host blob filter -> extract
graph, vulkan/mod.rs:363-594) because the blob filter runs on the CPU.
On TPU the default top-n-by-contrast filter runs on device
(jax.lax.top_k), so the WHOLE per-frame pipeline is a single compiled XLA
program with zero host round-trips.  The host-callback filter escape hatch
(`FilterBlobs`) is preserved at the API layer (api.py) by splitting at the
same two-phase boundary.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Window-key sort for the Pallas sample+describe chain (see
# _finish_extract): makes cross-blob duplicate sampler windows adjacent
# so the kernel's run-head dedup collapses them (~5x fewer window DMAs
# at the bench workload).  Default OFF: measured end-to-end NEUTRAL on
# v5e (220.4-221.5 fps across sort on/off/KB=8 vs 219-222 baseline,
# same session) — the sampler's window DMAs are already fully hidden
# behind its per-item tent/matmul compute by the double-buffered
# pipeline, so halving DMA issue buys nothing while the sort+one-hot
# unsort adds machinery.  The kernel-side run-head dedup itself stays
# always-on (same-blob multi-orientation runs, ~1.65x fewer copies —
# free HBM-traffic reduction).  Read once at import — baked into every
# cached trace.
_SAMPLER_SORT = os.environ.get("LF_SAMPLER_SORT", "0") == "1"

from .. import constants as C
from .descriptor import mkd_descriptors, sample_patches
from .detect import BlobArrays, detect_blobs
from .orientation import KeypointArrays, keypoints_from_blobs
from .pyramid import flat_pyramid, patch_pyramid_mips


@dataclass(frozen=True)
class FrontendConfig:
    """Static (jit-time) configuration — the analog of BuildTimeParams
    (lib.rs:55-75) + the fixed algorithm constants."""

    n_scales: int = 4
    max_blobs: int = 8000
    max_keypoints: int = 2000
    # capacity of the filtered-blob set fed to orientation;
    # detect_top_n only ever needs max_keypoints slots, detect-all needs
    # max_blobs.
    max_filtered: int = 2000
    border: int = C.DETECT_BORDER
    contrast_threshold: float = C.CONTRAST_THRESHOLD
    # "pallas" = TPU window-DMA + one-hot-matmul sampler (bf16 pyramid,
    # ~50x faster than the XLA gather); "xla" = exact f32 gather fallback;
    # "auto" = pallas on TPU, xla on CPU — resolved at trace time so
    # composing detect_extract directly (as __graft_entry__ does) gets
    # the flagship kernel path on real hardware.
    sampler: str = "auto"
    # run Pallas kernels in interpret mode (CPU debugging/parity only)
    interpret: bool = False
    # static upper bound on the RUNTIME patch_scale_factor tweak: the
    # Pallas sampler canvas only carries mip levels reachable at this
    # bound (level = floor(log2(size * psf / 32)); a runtime psf beyond
    # the bound clamps to the deepest carried level).  The default mip
    # chain (ceil(log2(min(H, W))) = 9 levels at 640x480) carried 3
    # never-addressable levels of full-size bf16 phase planes — dead
    # HBM writes every frame.
    max_patch_scale_factor: float = C.DEFAULT_PATCH_SCALE_FACTOR


def _use_pallas(cfg: "FrontendConfig") -> bool:
    """Resolve cfg.sampler to a concrete choice.  "auto" picks the Pallas
    sampler on any non-CPU backend.  Read at trace time: the backend is
    process-stable (tests pin CPU in conftest before the first trace)."""
    if cfg.sampler == "auto":
        return jax.default_backend() != "cpu"
    if cfg.sampler not in ("pallas", "xla"):
        raise ValueError(f"unknown sampler {cfg.sampler!r}")
    return cfg.sampler == "pallas"


class FrontendResult(NamedTuple):
    x: jnp.ndarray          # [K]
    y: jnp.ndarray          # [K]
    size: jnp.ndarray       # [K]
    angle: jnp.ndarray      # [K]
    response: jnp.ndarray   # [K]
    valid: jnp.ndarray      # [K] bool
    descriptors: jnp.ndarray  # [K, 128]
    n_keypoints: jnp.ndarray  # [] i32 (capped)
    n_blobs: jnp.ndarray      # [] i32 blobs pre-capacity
    dropped_blobs: jnp.ndarray    # [] i32
    dropped_features: jnp.ndarray  # [] i32


def _truncate_blobs(blobs: BlobArrays, n_slots: int, top_n) -> BlobArrays:
    """Keep the first n_slots blob slots (they are sorted by |contrast|
    desc) and mask to the runtime top_n count."""
    cut = lambda a: a[:n_slots]
    rank_ok = jnp.arange(n_slots) < top_n
    return BlobArrays(
        x=cut(blobs.x), y=cut(blobs.y), size=cut(blobs.size),
        contrast=cut(blobs.contrast), level=cut(blobs.level),
        valid=cut(blobs.valid) & rank_ok,
        n_total=blobs.n_total, n_dropped=blobs.n_dropped,
    )


def detect_phase(
    img: jnp.ndarray,
    cfg: FrontendConfig,
    min_size: jnp.ndarray | float = 0.0,
):
    """Detect phase only: (coarse stack, candidate blobs).

    Used by the host blob-filter escape hatch (the reference's
    FilterBlobs trait, vulkan/mod.rs:125-131): the caller filters the
    blob arrays on host and feeds them to `extract_from_blobs`.
    """
    from .scale_space import fine_volume, scale_space

    coarse = scale_space(img, cfg.n_scales)
    fine = fine_volume(coarse)
    blobs = detect_blobs(
        fine, cfg.max_blobs, min_size, cfg.border, cfg.contrast_threshold
    )
    return coarse, blobs


def extract_from_blobs(
    coarse: jnp.ndarray,
    filtered: BlobArrays,
    cfg: FrontendConfig,
    pca_mean: jnp.ndarray,
    pca_proj: jnp.ndarray,
    patch_scale_factor: jnp.ndarray | float = C.DEFAULT_PATCH_SCALE_FACTOR,
) -> FrontendResult:
    """Extract phase: orientation + patches + descriptors from a filtered
    blob set (parity with the reference's extract taskgraph)."""
    kps = keypoints_from_blobs(coarse, filtered, cfg.max_keypoints,
                               use_pallas=_use_pallas(cfg),
                               interpret=cfg.interpret)
    return _finish_extract(coarse, filtered, kps, cfg, pca_mean, pca_proj,
                           patch_scale_factor)


def mip_extents(h, w, n_levels: int):
    """Traced per-level ACTUAL mip extents for an (h, w) image under the
    padded-canvas construction: mip 0 is (h, w) and mip l (l >= 1) is
    (h >> l, w >> l) — identical to the dims an exact-shape run would
    produce (mip 1 keeps odd samples: count = h // 2; deeper mips crop
    to h >> (l+1), pyramid.py:patch_pyramid_mips)."""
    hs = [h] + [h >> l for l in range(1, n_levels)]
    ws = [w] + [w >> l for l in range(1, n_levels)]
    return (jnp.stack([jnp.asarray(v, jnp.int32) for v in hs]),
            jnp.stack([jnp.asarray(v, jnp.int32) for v in ws]))


def detect_extract(
    img: jnp.ndarray,
    cfg: FrontendConfig,
    pca_mean: jnp.ndarray,
    pca_proj: jnp.ndarray,
    top_n: jnp.ndarray | int,
    min_size: jnp.ndarray | float,
    patch_scale_factor: jnp.ndarray | float = C.DEFAULT_PATCH_SCALE_FACTOR,
    extent=None,
) -> FrontendResult:
    """Full single-image front-end.  `top_n`, `min_size` and
    `patch_scale_factor` are runtime (traced) values; everything in `cfg`
    is compile-time static.

    `extent` = traced (h, w) for the pad-to-max single-compile mode
    (api.py:LocalFeatures with max_image_* set): `img` is a max-size
    canvas holding an (h, w) image at the origin, mirror-extended by
    the scale-space footprint (api.py:_prepad_canvas) so every value
    inside the actual extent is exact; detection, orientation masks and
    sampler mirror folds all evaluate against (h, w)."""
    from .scale_space import fine_volume, scale_space

    coarse = scale_space(img, cfg.n_scales)
    # built-in top-n filter fuses with the detect compaction: only the
    # top max_filtered slots are ever used downstream, so selection is
    # capped there (detect_blobs keeps drop accounting vs max_blobs);
    # detect_phase (the host-filter escape hatch) materializes all
    # max_blobs slots instead
    blobs = detect_blobs(
        fine_volume(coarse), cfg.max_blobs, min_size, cfg.border,
        cfg.contrast_threshold, select_cap=cfg.max_filtered, extent=extent,
    )
    filtered = _truncate_blobs(blobs, min(cfg.max_filtered, cfg.max_blobs),
                               top_n)

    kps = keypoints_from_blobs(coarse, filtered, cfg.max_keypoints,
                               use_pallas=_use_pallas(cfg),
                               interpret=cfg.interpret, extent=extent)

    return _finish_extract(coarse, blobs, kps, cfg, pca_mean, pca_proj,
                           patch_scale_factor, extent=extent)


def _finish_extract(coarse, blobs, kps, cfg, pca_mean, pca_proj,
                    patch_scale_factor, extent=None) -> FrontendResult:
    use_pallas = _use_pallas(cfg)
    n_lv = None
    if use_pallas:
        # cap the mip chain at the deepest REACHABLE level: every
        # canvas level costs N_PHASE full-size bf16 planes of HBM
        # writes per frame, and levels beyond
        # floor(log2(max_size * psf / 32)) can never be addressed
        # (max blob size is a static function of n_scales:
        # 0.82 * sqrt(2) * 2^(n_scales + 1.5))
        from .pyramid import pyramid_levels_for

        max_size = (C.DOG_FIRST_SCALE_SIGMA * C.DOG_SIGMA_RADIUS_FACTOR
                    * 2.0 ** (cfg.n_scales + 1.5))
        l_need = 1 + int(np.floor(np.log2(max(
            max_size * cfg.max_patch_scale_factor / C.PATCH_SIZE, 1.0))))
        n_lv = max(2, min(l_need,
                          pyramid_levels_for(*coarse.shape[1:])))
    mips = patch_pyramid_mips(coarse, n_levels=n_lv, extent=extent)
    if extent is not None:
        act_h, act_w = mip_extents(extent[0], extent[1], len(mips))
    if use_pallas:
        from ..pallas.sampling import (build_canvas, sample_patches_pallas,
                                       window_sort_key)

        canvas = build_canvas(mips)
        if extent is None:
            widths = jnp.asarray([m.shape[1] for m in mips], dtype=jnp.int32)
            heights = jnp.asarray([m.shape[0] for m in mips], dtype=jnp.int32)
        else:
            # the kernel uses widths/heights ONLY for mirror folds; the
            # canvas layout stays the static padded one
            widths, heights = act_w, act_h
        if _SAMPLER_SORT:
            # run the sample+describe chain in window-key order so the
            # kernel's run-head DMA dedup sees cross-blob duplicate
            # windows adjacent (~5x fewer window DMAs at the bench
            # workload), then restore keypoint order on the [K, 128]
            # descriptors with an exact one-hot matmul (HIGHEST: the
            # TPU default would round the f32 values to bf16).  The
            # permutation never changes the public result: descriptors
            # are per-slot functions of (x, y, size, angle, valid).
            K = kps.x.shape[0]
            key = window_sort_key(kps.x, kps.y, kps.size, kps.valid,
                                  canvas.shape[0], patch_scale_factor)
            pos = jnp.arange(K, dtype=jnp.int32)
            _, pos_s, x_s, y_s, sz_s, an_s, v_s = jax.lax.sort(
                (key, pos, kps.x, kps.y, kps.size, kps.angle,
                 kps.valid.astype(jnp.int32)), num_keys=1, is_stable=True)
            valid_s = v_s > 0
            patches = sample_patches_pallas(
                canvas, widths, heights, x_s, y_s, sz_s, an_s, valid_s,
                patch_scale_factor, interpret=cfg.interpret,
            )
            desc_s = mkd_descriptors(patches, pca_mean, pca_proj, valid_s,
                                     fast=True)
            unsort = (pos_s[None, :] == pos[:, None]).astype(jnp.float32)
            desc = jnp.dot(unsort, desc_s,
                           precision=jax.lax.Precision.HIGHEST)
        else:
            patches = sample_patches_pallas(
                canvas, widths, heights, kps.x, kps.y, kps.size, kps.angle,
                kps.valid, patch_scale_factor, interpret=cfg.interpret,
            )
            desc = mkd_descriptors(patches, pca_mean, pca_proj, kps.valid,
                                   fast=True)
    else:
        pyr = flat_pyramid(mips)
        patches = sample_patches(
            pyr, kps.x, kps.y, kps.size, kps.angle, kps.valid,
            patch_scale_factor,
            act_widths=None if extent is None else act_w,
            act_heights=None if extent is None else act_h,
        )
        desc = mkd_descriptors(patches, pca_mean, pca_proj, kps.valid,
                               fast=False)

    return FrontendResult(
        x=kps.x, y=kps.y, size=kps.size, angle=kps.angle,
        response=kps.response, valid=kps.valid, descriptors=desc,
        n_keypoints=jnp.sum(kps.valid, dtype=jnp.int32),
        n_blobs=blobs.n_total,
        dropped_blobs=blobs.n_dropped,
        dropped_features=kps.n_dropped,
    )
