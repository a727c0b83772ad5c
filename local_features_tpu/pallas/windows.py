"""Generic Pallas window fetchers: per-item dynamic-slice DMA from plane
canvases straight into the output — no compute in the kernel.

Used by the orientation stage: the 15x15 stride-2^l neighborhoods of
keypoint_orientation.glsl become contiguous 15x15 patches of
phase-decimated scale-space planes; these kernels fetch one aligned
[WIN_H, WIN_W] window per keypoint (the XLA side then extracts the exact
patch with batched one-hot matmuls, which the MXU eats for free).
Replaces a 3.6M-element XLA scalar gather (~33 ms per 8-frame batch on
v5e) with pure DMA traffic.

`fetch_windows` reads from one canvas; `fetch_windows_multi` selects one
of several canvases per item with predicated DMAs (used for the
per-level decimated plane stacks, whose plane sizes differ by level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel_single(plane_ref, oy_ref, ox_ref, canvas_ref, out_ref, sem, *,
                   kb, win_h, win_w):
    g = pl.program_id(0)

    def dma(j):
        idx = g * kb + j
        oy = pl.multiple_of(oy_ref[idx], 8)
        ox = pl.multiple_of(ox_ref[idx], 128)
        return pltpu.make_async_copy(
            canvas_ref.at[plane_ref[idx], pl.ds(oy, win_h),
                          pl.ds(ox, win_w)],
            out_ref.at[j],
            sem.at[j],
        )

    for j in range(kb):
        dma(j).start()
    for j in range(kb):
        dma(j).wait()


@functools.partial(jax.jit,
                   static_argnames=("win_h", "win_w", "kb", "interpret"))
def fetch_windows(
    canvas: jnp.ndarray,     # [n_planes, Hc, Wc]
    plane: jnp.ndarray,      # [F] i32
    oy: jnp.ndarray,         # [F] i32, multiples of 8
    ox: jnp.ndarray,         # [F] i32, multiples of 128
    win_h: int = 24,
    win_w: int = 256,
    kb: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """[F, win_h, win_w] windows canvas[plane[i], oy[i]:, ox[i]:]."""
    F = plane.shape[0]
    Fp = _round_up(max(F, kb), kb)
    pad = lambda a: jnp.pad(a, (0, Fp - F)) if Fp != F else a
    plane, oy, ox = map(pad, (plane, oy, ox))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Fp // kb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((kb, win_h, win_w), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((kb,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_single, kb=kb, win_h=win_h, win_w=win_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Fp, win_h, win_w), canvas.dtype),
        interpret=interpret,
    )(plane, oy, ox, canvas)
    return out[:F]


def _kernel_multi(sel_ref, plane_ref, oy_ref, ox_ref, *rest, kb, win_h,
                  win_w, n_canvases):
    canvases = rest[:n_canvases]
    out_ref = rest[n_canvases]
    sem = rest[n_canvases + 1]
    g = pl.program_id(0)

    def dma(c, canvas_ref, j):
        idx = g * kb + j
        oy = pl.multiple_of(oy_ref[idx], 8)
        ox = pl.multiple_of(ox_ref[idx], 128)
        return pltpu.make_async_copy(
            canvas_ref.at[plane_ref[idx], pl.ds(oy, win_h),
                          pl.ds(ox, win_w)],
            out_ref.at[j],
            sem.at[j],
        )

    for j in range(kb):
        for c, canvas_ref in enumerate(canvases):
            @pl.when(sel_ref[g * kb + j] == c)
            def _(c=c, canvas_ref=canvas_ref, j=j):
                dma(c, canvas_ref, j).start()
    for j in range(kb):
        for c, canvas_ref in enumerate(canvases):
            @pl.when(sel_ref[g * kb + j] == c)
            def _(c=c, canvas_ref=canvas_ref, j=j):
                dma(c, canvas_ref, j).wait()


@functools.partial(jax.jit,
                   static_argnames=("win_h", "win_w", "kb", "interpret"))
def fetch_windows_multi(
    canvases: tuple[jnp.ndarray, ...],  # each [n_planes_c, Hc_c, Wc_c]
    sel: jnp.ndarray,        # [F] i32 canvas selector in [0, len(canvases))
    plane: jnp.ndarray,      # [F] i32 plane within the selected canvas
    oy: jnp.ndarray,         # [F] i32, multiples of 8
    ox: jnp.ndarray,         # [F] i32, multiples of 128
    win_h: int = 24,
    win_w: int = 256,
    kb: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """[F, win_h, win_w] windows canvases[sel[i]][plane[i], oy[i]:, ox[i]:]."""
    F = plane.shape[0]
    Fp = _round_up(max(F, kb), kb)
    pad = lambda a: jnp.pad(a, (0, Fp - F)) if Fp != F else a
    sel, plane, oy, ox = map(pad, (sel, plane, oy, ox))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Fp // kb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(canvases),
        out_specs=pl.BlockSpec((kb, win_h, win_w), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((kb,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel_multi, kb=kb, win_h=win_h, win_w=win_w,
                          n_canvases=len(canvases)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Fp, win_h, win_w),
                                       canvases[0].dtype),
        interpret=interpret,
    )(sel, plane, oy, ox, *canvases)
    return out[:F]
