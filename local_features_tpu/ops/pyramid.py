"""Patch mip pyramid on TPU, flattened for single-gather patch sampling.

TPU-first redesign of vulkan/patch_pyramid.rs + blur_pyramid.glsl: the GPU
version is a mip-mapped image sampled with textureLod at a per-keypoint
level.  TPUs have no texture units, so the pyramid is stored as ONE flat
f32 buffer (all mips concatenated) plus static per-level offset/shape
tables; per-keypoint bilinear sampling at a dynamic level becomes flat-index
arithmetic + a single gather (see ops/descriptor.py).

Level semantics (parity with the reference):
- mip 0: coarse layer 0 (sigma=0.6 blurred image), full resolution.
- mip 1: coarse layer 1 nearest-decimated by 2 taking odd samples
  (the Vulkan blit maps dst (x,y) -> src (2x+1, 2y+1)).
- mip l+1 (l>=1): binomial [1,4,6,4,1]/16 blur of mip l, mirror border,
  then even-sample decimation to floor(size/2).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from .scale_space import sep_conv_mirror


class FlatPyramid(NamedTuple):
    flat: jnp.ndarray      # [total_px] f32, all mips concatenated
    offsets: jnp.ndarray   # [n_levels] i32 start of each mip in `flat`
    heights: jnp.ndarray   # [n_levels] i32
    widths: jnp.ndarray    # [n_levels] i32
    n_levels: int          # static


def pyramid_levels_for(height: int, width: int) -> int:
    """ceil(log2(min(H, W))) — matches vulkan/mod.rs:271-277 / :374-375."""
    return int(np.ceil(np.log2(min(height, width))))


def _mirror_src(i, m):
    """MirroredRepeat source index of out-of-extent index i given traced
    extent m (same formula as scale_space.mirror_index_np, traced)."""
    r = jnp.mod(i, 2 * m)
    return jnp.where(r >= m, 2 * m - 1 - r, r)


def _refresh_extension(mip: jnp.ndarray, m_h, m_w, n: int = 2):
    """Overwrite `n` rows/cols just past the traced actual extent
    (m_h, m_w) with the symmetric extension of the ACTUAL content.

    Pad-to-max mode: decimation does not commute with mirroring, so the
    mip content a padded canvas inherits past the actual border differs
    from what an exact-shape run's mirror-pad would read — this restores
    it level by level (each level reads at most 2 extension rows of its
    predecessor, and rewrites its own, so the requirement never
    compounds).  Writes that would fall off the padded mip are replaced
    by the row already there (deep mips whose pad slack has shrunk
    below n; their borders stay approximate — sub-bf16 at the tiny
    scales that sample them)."""
    H, W = mip.shape
    for d in range(n):
        i = m_h + d
        src = jnp.clip(_mirror_src(i, jnp.maximum(m_h, 1)), 0, H - 1)
        c = jnp.minimum(i, H - 1)
        row = jax.lax.dynamic_slice(mip, (src, 0), (1, W))
        cur = jax.lax.dynamic_slice(mip, (c, 0), (1, W))
        mip = jax.lax.dynamic_update_slice(
            mip, jnp.where(i <= H - 1, row, cur), (c, 0))
    for d in range(n):
        i = m_w + d
        src = jnp.clip(_mirror_src(i, jnp.maximum(m_w, 1)), 0, W - 1)
        c = jnp.minimum(i, W - 1)
        col = jax.lax.dynamic_slice(mip, (0, src), (H, 1))
        cur = jax.lax.dynamic_slice(mip, (0, c), (H, 1))
        mip = jax.lax.dynamic_update_slice(
            mip, jnp.where(i <= W - 1, col, cur), (0, c))
    return mip


def patch_pyramid_mips(
    coarse: jnp.ndarray, n_levels: int | None = None, extent=None
) -> list[jnp.ndarray]:
    """Mip list from the coarse scale-space stack.

    `extent` = traced (h, w) actual image extent (pad-to-max mode): each
    mip's border extension is refreshed from its own actual content so
    the next level's blur reads exactly what an exact-shape run's
    mirror-pad would (see _refresh_extension).  Mip 0 needs no refresh:
    the prepad canvas extension is the symmetric extension of the
    blurred signal already (blur preserves mirror symmetry)."""
    _, h, w = coarse.shape
    if n_levels is None:
        n_levels = pyramid_levels_for(h, w)
    mips = [coarse[0], coarse[1, 1::2, 1::2]]
    if extent is not None:
        act_h, act_w = extent
        mips[1] = _refresh_extension(mips[1], act_h >> 1, act_w >> 1)
    for lvl in range(1, n_levels - 1):
        blurred = sep_conv_mirror(mips[lvl], C.PYRAMID_BLUR_KERNEL)
        oh, ow = h >> (lvl + 1), w >> (lvl + 1)
        nxt = blurred[::2, ::2][:oh, :ow]
        if extent is not None:
            nxt = _refresh_extension(nxt, act_h >> (lvl + 1),
                                     act_w >> (lvl + 1))
        mips.append(nxt)
    return mips


def patch_pyramid(coarse: jnp.ndarray, n_levels: int | None = None) -> FlatPyramid:
    """Build the flat mip pyramid from the coarse scale-space stack."""
    return flat_pyramid(patch_pyramid_mips(coarse, n_levels))


def flat_pyramid(mips: list[jnp.ndarray]) -> FlatPyramid:
    shapes = [(int(m.shape[0]), int(m.shape[1])) for m in mips]
    offsets = np.zeros(len(mips), dtype=np.int32)
    for i in range(1, len(mips)):
        offsets[i] = offsets[i - 1] + shapes[i - 1][0] * shapes[i - 1][1]
    flat = jnp.concatenate([m.reshape(-1) for m in mips])
    return FlatPyramid(
        flat=flat,
        offsets=jnp.asarray(offsets),
        heights=jnp.asarray([s[0] for s in shapes], dtype=jnp.int32),
        widths=jnp.asarray([s[1] for s in shapes], dtype=jnp.int32),
        n_levels=len(mips),
    )
