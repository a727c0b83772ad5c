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

import functools

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


def _sep_conv_valid(x: jnp.ndarray, kernel: np.ndarray,
                    dilation: int) -> jnp.ndarray:
    """Valid separable conv on the last two axes (no padding); the
    result shrinks by rad*dilation per side.  Same tap order as
    sep_conv_mirror so interior values are bit-identical."""
    rad = (len(kernel) - 1) // 2
    pad = rad * dilation
    hh = x.shape[-2] - 2 * pad
    ww = x.shape[-1] - 2 * pad
    out = None
    for i, k in enumerate(kernel):
        off = i * dilation
        term = float(k) * jax.lax.slice_in_dim(x, off, off + ww,
                                               axis=x.ndim - 1)
        out = term if out is None else out + term
    x = out
    out = None
    for i, k in enumerate(kernel):
        off = i * dilation
        term = float(k) * jax.lax.slice_in_dim(x, off, off + hh,
                                               axis=x.ndim - 2)
        out = term if out is None else out + term
    return out


def scale_space_prepad(img: jnp.ndarray, n_scales: int) -> jnp.ndarray:
    """[n_scales+3, H, W] coarse stack: sigma=0.6 blur then SWT levels.

    One mirror extension, then valid convs: the symmetric kernels
    preserve the MirroredRepeat symmetry of the extended signal, so
    every level of the once-extended input restricted to [H, W] equals
    the per-level mirror-pad construction (exactly for interior pixels,
    to f32 summation order near borders).  This removes n_levels*2 - 2
    pad materializations and lets XLA fuse the whole stack over one
    padded array — at the price of convolving ~2x the pixels (the pad
    region, 128/side at n_scales=4).  Whether that trades well is a
    bandwidth-vs-FLOPs question for the TPU profile: select with
    LF_SCALE_SPACE=prepad and A/B on hardware before making it the
    default.  Parity: tests/test_scale_space.py runs the golden suite
    against both implementations.
    """
    img = img.astype(jnp.float32)
    n_coarse = n_scales + 3
    h, w = img.shape[-2], img.shape[-1]
    pads = [2] + [2 * (1 << l) for l in range(n_coarse - 1)]
    kernels = [C.BASE_BLUR_KERNEL] + [C.SWT_KERNEL] * (n_coarse - 1)
    dils = [1] + [1 << l for l in range(n_coarse - 1)]
    total = sum(pads)
    cur = mirror_pad(mirror_pad(img, total, img.ndim - 1),
                     total, img.ndim - 2)
    rem = total
    levels = []
    for kern, dil, p in zip(kernels, dils, pads):
        cur = _sep_conv_valid(cur, kern, dil)
        rem -= p
        idx = [slice(None)] * (img.ndim - 2) + \
            [slice(rem, rem + h), slice(rem, rem + w)]
        levels.append(cur[tuple(idx)])
    return jnp.stack(levels, axis=-3)


@functools.lru_cache(maxsize=None)
def _conv_mirror_matrix(n: int, kernel: tuple, dilation: int) -> np.ndarray:
    """[n, n] constant applying the 1-D dilated kernel with mirror
    border as a single matmul: out[d] = sum_src in[src] * M[src, d],
    M[mirror(d + (i - rad) * dil), d] += k[i].  The mirror fold lives
    in the MATRIX, so the conv needs no pad materialization at all."""
    rad = (len(kernel) - 1) // 2
    M = np.zeros((n, n), np.float32)
    for i, kv in enumerate(kernel):
        src = mirror_index_np(
            np.arange(n) + (i - rad) * dilation, n)
        np.add.at(M, (src, np.arange(n)), np.float32(kv))
    return M


def scale_space_matmul(img: jnp.ndarray, n_scales: int) -> jnp.ndarray:
    """[n_scales+3, H, W] coarse stack via constant-matrix convs.

    Same per-level construction as the default, but each separable
    pass is one [n, n] band+mirror matmul (Precision.HIGHEST) instead
    of a mirror-pad + 5 shifted adds — candidate for the dgrad-style
    relayout win (ops/descriptor.py:_blurred_gradients); values agree
    with the default to f32 summation-order noise.  Env-gated
    (LF_SCALE_SPACE=matmul): A/B end-to-end on hardware before any
    default flip, and remember detection consumes these values through
    exact >=-tie comparisons.
    """
    img = img.astype(jnp.float32)
    n_coarse = n_scales + 3
    h, w = img.shape[-2], img.shape[-1]
    hp = jax.lax.Precision.HIGHEST
    specs = [(C.BASE_BLUR_KERNEL, 1)] + [
        (C.SWT_KERNEL, 1 << l) for l in range(n_coarse - 1)]
    levels = []
    cur = img
    for kern, dil in specs:
        kt = tuple(float(x) for x in kern)
        Mw = jnp.asarray(_conv_mirror_matrix(w, kt, dil))
        Mh = jnp.asarray(_conv_mirror_matrix(h, kt, dil))
        # horizontal then vertical, matching sep_conv_mirror's order
        cur = jnp.einsum("...yc,cw->...yw", cur, Mw, precision=hp)
        cur = jnp.einsum("...sx,sy->...yx", cur, Mh, precision=hp)
        levels.append(cur)
    return jnp.stack(levels, axis=-3)


def scale_space(img: jnp.ndarray, n_scales: int) -> jnp.ndarray:
    """[n_scales+3, H, W] coarse stack: sigma=0.6 blur then SWT levels.

    Default: per-level mirror-pad construction (proven on TPU).  For
    on-hardware A/Bs (end-to-end bench.py only — micro-benches lie on
    axon, CLAUDE.md): LF_SCALE_SPACE=prepad traces the one-shot-
    extension variant; LF_SCALE_SPACE=pallas traces the fused kernel
    (pallas/scale_space.py; check compile time first);
    LF_SCALE_SPACE=matmul traces the constant-matrix conv variant.
    """
    import os

    impl = os.environ.get("LF_SCALE_SPACE", "")
    if impl == "prepad":
        return scale_space_prepad(img, n_scales)
    if impl == "matmul":
        return scale_space_matmul(img, n_scales)
    if impl == "pallas":
        from ..pallas.scale_space import ScaleSpaceVmemError, scale_space_pallas

        try:
            return scale_space_pallas(img, n_scales,
                                      interpret=jax.default_backend() == "cpu")
        except ScaleSpaceVmemError as e:
            import logging

            logging.getLogger(__name__).warning(
                "LF_SCALE_SPACE=pallas unavailable for this shape (%s); "
                "using the default XLA construction", e)
    img = img.astype(jnp.float32)
    levels = [sep_conv_mirror(img, C.BASE_BLUR_KERNEL)]
    n_coarse = n_scales + 3
    for lvl in range(n_coarse - 1):
        levels.append(sep_conv_mirror(levels[-1], C.SWT_KERNEL,
                                      dilation=1 << lvl))
    return jnp.stack(levels, axis=-3)


def fine_volume(coarse: jnp.ndarray) -> jnp.ndarray:
    """[n_fine, H, W] detail coefficients (swt_sub.glsl)."""
    return coarse[:-1] - coarse[1:]
