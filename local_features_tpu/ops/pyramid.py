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


def patch_pyramid_mips(
    coarse: jnp.ndarray, n_levels: int | None = None
) -> list[jnp.ndarray]:
    """Mip list from the coarse scale-space stack."""
    _, h, w = coarse.shape
    if n_levels is None:
        n_levels = pyramid_levels_for(h, w)
    mips = [coarse[0], coarse[1, 1::2, 1::2]]
    for lvl in range(1, n_levels - 1):
        blurred = sep_conv_mirror(mips[lvl], C.PYRAMID_BLUR_KERNEL)
        oh, ow = h >> (lvl + 1), w >> (lvl + 1)
        mips.append(blurred[::2, ::2][:oh, :ow])
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
