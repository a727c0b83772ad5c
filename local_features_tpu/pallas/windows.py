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

Batching: the pallas_call is wrapped in `jax.custom_batching.custom_vmap`
whose rule UNROLLS the vmapped batch dimension into B separate flat-grid
kernel calls (one per frame, identical shapes, one Mosaic compile).  Two
alternatives both fault on real v5e hardware:

- the default vmap lowering of pallas_call (batch dim prepended to the
  grid): "TPU backend error (Internal)" at 240x320 B=4 in the round-2
  stress sweep, and the round-1 B=8 worker crashes;
- a flat FOLD (batch folded into the plane dimension, one B*F-item
  kernel): passes standalone at every shape, but faults the worker when
  the resulting 16000-item kernel shares one XLA program with the patch
  sampler kernel at B=8 (the full front-end), while B=4 (8000 items)
  is fine.

Per-frame unroll sidesteps both: every kernel invocation has exactly the
standalone-verified shape, at ~launch-overhead cost (tens of us per
frame vs a ~12 ms stage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
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


def _broadcast_unbatched(axis_size, args, batched):
    return tuple(
        a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
        for a, b in zip(args, batched)
    )


@functools.lru_cache(maxsize=None)
def _single_core(win_h: int, win_w: int, kb: int, interpret: bool):
    """custom_vmap'd flat-grid kernel invocation (inputs pre-padded)."""

    @custom_vmap
    def core(plane, oy, ox, canvas):
        Fp = plane.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(Fp // kb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((kb, win_h, win_w),
                                   lambda g, *_: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((kb,))],
        )
        return pl.pallas_call(
            functools.partial(_kernel_single, kb=kb, win_h=win_h,
                              win_w=win_w),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Fp, win_h, win_w), canvas.dtype),
            interpret=interpret,
        )(plane, oy, ox, canvas)

    @core.def_vmap
    def _rule(axis_size, in_batched, plane, oy, ox, canvas):
        B = axis_size
        plane, oy, ox, canvas = _broadcast_unbatched(
            B, (plane, oy, ox, canvas), in_batched)
        out = jnp.stack([core(plane[b], oy[b], ox[b], canvas[b])
                         for b in range(B)])
        return out, True

    return core


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
    plane, oy, ox = _clamp_dma(canvas.shape, plane, oy, ox, win_h, win_w)
    out = _single_core(win_h, win_w, kb, interpret)(plane, oy, ox, canvas)
    return out[:F]


def _clamp_dma(shape, plane, oy, ox, win_h, win_w):
    """Belt-and-braces in-bounds clamp (alignment-preserving).

    Valid callers never go out of bounds; degenerate inputs must not
    either, because an OOB async copy is a worker-killing TPU fault.
    Upper bounds are rounded DOWN to the DMA alignment so the kernel's
    `pl.multiple_of` hints stay truthful.
    """
    P, Hc, Wc = shape[-3:]
    plane = jnp.clip(plane, 0, P - 1)
    # max(., 0): a canvas smaller than the window would otherwise give a
    # NEGATIVE upper bound, and clip(lo=0, hi<0) returns hi — reopening
    # the OOB hole this clamp exists to close
    oy = jnp.clip(oy, 0, max(((Hc - win_h) // 8) * 8, 0))
    ox = jnp.clip(ox, 0, max(((Wc - win_w) // 128) * 128, 0))
    return plane, oy, ox


def _kernel_multi(nv_ref, sel_ref, plane_ref, oy_ref, ox_ref, *rest, kb,
                  win_h, win_w, n_canvases):
    """DMA fetch into a double-buffered VMEM scratch, pipelined one
    chunk ahead: program g starts chunk g+1's copies before waiting on
    chunk g's, so the per-DMA latency (~the whole cost of this kernel;
    the transfers themselves are tiny) overlaps with the next chunk's
    issue instead of serializing at every program boundary.  The waited
    windows are then a plain VMEM->VMEM block copy to the output.
    (DMA-ing canvas->HBM output directly would skip that copy, but
    Mosaic faults at runtime on HBM->HBM copies from ANY-space outputs
    — measured on v5e, 480x640 B=8.)

    nv_ref[0] holds (last valid item index + 1): chunks entirely past it
    exit after ONE scalar compare instead of paying 2*kb per-item
    predicates + the out block copy.  Detect compaction puts valid slots
    first, so at typical workloads (~400 valid of 2000 capacity) ~80% of
    the grid takes this exit; their output blocks are left unwritten
    (arbitrary) and masked downstream.
    """
    canvases = rest[:n_canvases]
    out_ref = rest[n_canvases]
    win = rest[n_canvases + 1]
    sem = rest[n_canvases + 2]
    g = pl.program_id(0)
    n_g = pl.num_programs(0)

    def dma(canvas_ref, prog, slot, j):
        idx = prog * kb + j
        oy = pl.multiple_of(oy_ref[idx], 8)
        ox = pl.multiple_of(ox_ref[idx], 128)
        return pltpu.make_async_copy(
            canvas_ref.at[plane_ref[idx], pl.ds(oy, win_h),
                          pl.ds(ox, win_w)],
            win.at[slot, j],
            sem.at[slot, j],
        )

    def start_chunk(prog, slot):
        for j in range(kb):
            for c, canvas_ref in enumerate(canvases):
                @pl.when(sel_ref[prog * kb + j] == c)
                def _(canvas_ref=canvas_ref, j=j):
                    dma(canvas_ref, prog, slot, j).start()

    nv = nv_ref[0]

    @pl.when(g == 0)
    def _():
        start_chunk(0, 0)

    @pl.when((g + 1 < n_g) & ((g + 1) * kb < nv))
    def _():
        start_chunk(g + 1, (g + 1) % 2)

    @pl.when(g * kb < nv)
    def _():
        for j in range(kb):
            for c, canvas_ref in enumerate(canvases):
                @pl.when(sel_ref[g * kb + j] == c)
                def _(canvas_ref=canvas_ref, j=j):
                    dma(canvas_ref, g, g % 2, j).wait()
        out_ref[...] = win[g % 2]


@functools.lru_cache(maxsize=None)
def _multi_core(n_canvases: int, win_h: int, win_w: int, kb: int,
                interpret: bool):
    """custom_vmap'd flat-grid kernel invocation (inputs pre-padded)."""

    @custom_vmap
    def core(nv, sel, plane, oy, ox, *canvases):
        Fp = plane.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(Fp // kb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_canvases,
            out_specs=pl.BlockSpec((kb, win_h, win_w),
                                   lambda g, *_: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, kb, win_h, win_w), canvases[0].dtype),
                pltpu.SemaphoreType.DMA((2, kb)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_multi, kb=kb, win_h=win_h,
                              win_w=win_w, n_canvases=n_canvases),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Fp, win_h, win_w),
                                           canvases[0].dtype),
            interpret=interpret,
        )(nv, sel, plane, oy, ox, *canvases)

    @core.def_vmap
    def _rule(axis_size, in_batched, nv, sel, plane, oy, ox, *canvases):
        B = axis_size
        nv, sel, plane, oy, ox = _broadcast_unbatched(
            B, (nv, sel, plane, oy, ox), in_batched[:5])
        canvases = _broadcast_unbatched(B, canvases, in_batched[5:])
        out = jnp.stack([
            core(nv[b], sel[b], plane[b], oy[b], ox[b],
                 *(c[b] for c in canvases))
            for b in range(B)
        ])
        return out, True

    return core


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
    """[F, win_h, win_w] windows canvases[sel[i]][plane[i], oy[i]:, ox[i]:].

    sel[i] = -1 is a skip sentinel: no DMA is issued for that item and
    its output window is arbitrary (callers mask invalid slots anyway).
    The fetch is per-descriptor latency-bound, so skipping the
    capacity-padding slots is a large win — and the kernel additionally
    exits whole chunks past the LAST valid item after one compare
    (valid slots are compaction-ordered prefixes in every caller, so
    the all-sentinel tail is ~80% of capacity at typical workloads;
    correct for any mask shape, the tail exit just degrades to nothing
    when valid items are scattered).
    """
    F = plane.shape[0]
    Fp = _round_up(max(F, kb), kb)
    if Fp != F:
        sel = jnp.pad(sel, (0, Fp - F), constant_values=-1)  # skip pads
        plane, oy, ox = (jnp.pad(a, (0, Fp - F)) for a in (plane, oy, ox))
    # per-item bounds of the SELECTED canvas (arithmetic select over
    # <= 4 compares; see _clamp_dma for why clamping is load-bearing).
    # Sentinel items get bound 0; their clamped values are unused (the
    # kernel's sel==c predicates never fire for them).
    sel = jnp.clip(sel, -1, len(canvases) - 1)
    bound = lambda dim: sum(
        jnp.where(sel == c, jnp.int32(canv.shape[dim]), jnp.int32(0))
        for c, canv in enumerate(canvases)
    )
    plane = jnp.clip(plane, 0, jnp.maximum(bound(0) - 1, 0))
    oy = jnp.clip(oy, 0, jnp.maximum(((bound(1) - win_h) // 8) * 8, 0))
    ox = jnp.clip(ox, 0, jnp.maximum(((bound(2) - win_w) // 128) * 128, 0))
    # last-valid-item frontier (index + 1); chunks fully past it early-out
    nv = jnp.max(jnp.where(
        sel >= 0, jnp.arange(1, Fp + 1, dtype=jnp.int32), 0),
        keepdims=True)
    core = _multi_core(len(canvases), win_h, win_w, kb, interpret)
    out = core(nv, sel, plane, oy, ox, *canvases)
    return out[:F]
