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


def sep_conv_mirror(
    img: jnp.ndarray, kernel: np.ndarray, dilation: int = 1
) -> jnp.ndarray:
    """Separable conv with mirror border on the last two axes of `img`.

    Horizontal pass then vertical pass, matching the reference kernel
    order.  `kernel` is a static numpy array; taps land at
    dilation * {-r..r}.  Tap index maps are static, so XLA sees plain
    gathers with constant indices and fuses the shifted adds.
    """
    rad = (len(kernel) - 1) // 2
    h, w = img.shape[-2], img.shape[-1]

    out = jnp.zeros_like(img)
    for i, k in enumerate(kernel):
        off = (i - rad) * dilation
        idx = mirror_index_np(np.arange(w) + off, w)
        out = out + float(k) * img[..., idx]

    img2 = out
    out = jnp.zeros_like(img)
    for i, k in enumerate(kernel):
        off = (i - rad) * dilation
        idx = mirror_index_np(np.arange(h) + off, h)
        out = out + float(k) * img2[..., idx, :]
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
