"""Scale-space construction on TPU: base blur + a-trous SWT levels.

TPU-first design: the whole stack is built with shifted-add separable
convolutions on [H, W] f32 arrays (VPU-friendly, fully fused by XLA) —
there is no reason to burn MXU cycles on 5-tap depthwise filters.  Border
handling is mirror ("symmetric"), matching the reference's MirroredRepeat
sampler (vulkan/mod.rs:940-943).

Reference semantics: shaders/blur.glsl (sigma=0.6 base blur),
shaders/swt.glsl ([1,4,6,4,1]/16 with dilation 2^level, driven for
n_scales+2 levels at vulkan/mod.rs:1093-1144), shaders/swt_sub.glsl.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C


def mirror_index_np(i: np.ndarray, n: int) -> np.ndarray:
    """MirroredRepeat (symmetric, edge-repeated) wrap of indices into [0, n).

    Pixel -1 maps to 0, -2 to 1, n to n-1, ... — the behavior of a Vulkan
    MirroredRepeat sampler at pixel centers, for arbitrarily large offsets.
    """
    m = np.mod(i, 2 * n)
    return np.where(m >= n, 2 * n - 1 - m, m)


def mirror_pad(x: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    """Symmetric (edge-repeated mirror) pad along one axis, supporting
    pad >= dim by tiling flipped copies.  Pure flips/concats/slices —
    no gathers, so XLA lowers it to cheap copies."""
    n = x.shape[axis]
    if pad < n:
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (pad, pad)
        return jnp.pad(x, cfg, mode="symmetric")
    flipped = jnp.flip(x, axis=axis)
    # infinite MirroredRepeat extension is ... x, flipped, [x], flipped, x ...
    left = jnp.concatenate([x, flipped], axis=axis)
    right = jnp.concatenate([flipped, x], axis=axis)
    reps = -(-pad // (2 * n))
    big = jnp.concatenate([left] * reps + [x] + [right] * reps, axis=axis)
    # `x` starts at reps * 2n; window [reps*2n - pad, reps*2n + n + pad)
    start = reps * 2 * n - pad
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, start + n + 2 * pad)
    return big[tuple(idx)]


def sep_conv_mirror(
    img: jnp.ndarray, kernel: np.ndarray, dilation: int = 1
) -> jnp.ndarray:
    """Separable conv with mirror border on the last two axes of `img`.

    Horizontal pass then vertical pass, matching the reference kernel
    order.  `kernel` is a static numpy array; taps land at
    dilation * {-r..r}.  Implemented as one mirror-pad + static slices
    per pass (no gathers — static slices fuse into the shifted adds).
    """
    rad = (len(kernel) - 1) // 2
    pad = rad * dilation
    h, w = img.shape[-2], img.shape[-1]

    xp = mirror_pad(img, pad, img.ndim - 1)
    out = jnp.zeros_like(img)
    for i, k in enumerate(kernel):
        off = pad + (i - rad) * dilation
        out = out + float(k) * jax.lax.slice_in_dim(xp, off, off + w,
                                                    axis=img.ndim - 1)

    xp = mirror_pad(out, pad, img.ndim - 2)
    out = jnp.zeros_like(img)
    for i, k in enumerate(kernel):
        off = pad + (i - rad) * dilation
        out = out + float(k) * jax.lax.slice_in_dim(xp, off, off + h,
                                                    axis=img.ndim - 2)
    return out


def scale_space(img: jnp.ndarray, n_scales: int) -> jnp.ndarray:
    """[n_scales+3, H, W] coarse stack: sigma=0.6 blur then SWT levels."""
    img = img.astype(jnp.float32)
    levels = [sep_conv_mirror(img, C.BASE_BLUR_KERNEL)]
    n_coarse = n_scales + 3
    for lvl in range(n_coarse - 1):
        levels.append(sep_conv_mirror(levels[-1], C.SWT_KERNEL, dilation=1 << lvl))
    return jnp.stack(levels)


def fine_volume(coarse: jnp.ndarray) -> jnp.ndarray:
    """[n_fine, H, W] detail coefficients (swt_sub.glsl)."""
    return coarse[:-1] - coarse[1:]
