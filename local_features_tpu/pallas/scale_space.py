"""Fused Pallas scale-space: the whole coarse stack in one kernel.

Reference semantics: shaders/blur.glsl + shaders/swt.glsl driven for
n_scales+2 levels (vulkan/mod.rs:1093-1144) — see ops/scale_space.py,
whose per-level XLA construction is the proven default and the parity
oracle for this kernel.

Design (the prepad trick, ops/scale_space.py:scale_space_prepad): the
input is mirror-extended ONCE by the total receptive radius T; symmetric
kernels preserve the MirroredRepeat symmetry, so valid convs thereafter
reproduce per-level mirror padding exactly.  The kernel then:

- grids over row blocks of the output (VMEM budget: a whole padded
  640x480 frame + 7-level f32 output would need ~17 MB);
- DMAs one [Hb + 2T, Wp] slab of the padded plane into VMEM;
- runs all levels as unrolled static shifted-add separable convs,
  ping-ponging between two VMEM scratch buffers (horizontal pass a->b,
  vertical pass b->a, so each level ends anchored in `a`);
- writes each level's central [Hb, W] crop into the [L, Hb, W] output
  block as soon as it is computed.

Everything is static: slice offsets, level sizes, tap weights.  The one
dynamic offset (the slab row origin g*Hb) is a multiple of 8 by
construction.  HBM traffic per frame: ~2x slab in + L*H*W out, vs the
XLA default's per-level materializations.

Batching follows pallas/windows.py: custom_vmap unrolls the batch into
per-frame calls (the vmap lowering of pallas_call faults on v5e — see
that module's failure matrix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..ops.scale_space import mirror_pad


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _levels_spec(n_scales: int):
    """[(taps, dilation, pad_per_side)] for base blur + SWT levels."""
    n_coarse = n_scales + 3
    spec = [(tuple(float(k) for k in C.BASE_BLUR_KERNEL), 1, 2)]
    for lvl in range(n_coarse - 1):
        d = 1 << lvl
        spec.append((tuple(float(k) for k in C.SWT_KERNEL), d, 2 * d))
    return spec


def _kernel(in_hbm, out_ref, a, b, sem, *, levels, Hb, W_out, T):
    g = pl.program_id(0)
    rows_in = Hb + 2 * T
    cp = pltpu.make_async_copy(
        in_hbm.at[pl.ds(pl.multiple_of(g * Hb, 8), rows_in), :], a, sem)
    cp.start()
    cp.wait()

    rows = rows_in
    cols = a.shape[1]
    consumed = 0
    for lvl, (taps, dil, p) in enumerate(levels):
        rad = (len(taps) - 1) // 2
        # horizontal pass: a -> b, cols shrink by 2*p
        cols_new = cols - 2 * p
        acc = None
        for i, k in enumerate(taps):
            off = i * dil
            term = k * a[0:rows, off:off + cols_new]
            acc = term if acc is None else acc + term
        b[0:rows, 0:cols_new] = acc
        cols = cols_new
        # vertical pass: b -> a, rows shrink by 2*p
        rows_new = rows - 2 * p
        acc = None
        for i, k in enumerate(taps):
            off = i * dil
            term = k * b[off:off + rows_new, 0:cols]
            acc = term if acc is None else acc + term
        a[0:rows_new, 0:cols] = acc
        rows = rows_new
        consumed += p
        rem = T - consumed
        out_ref[lvl, :, :] = a[rem:rem + Hb, rem:rem + W_out]


@functools.lru_cache(maxsize=None)
def _core(n_scales: int, Hb: int, W_out: int, Wp: int, T: int,
          interpret: bool):
    levels = tuple(_levels_spec(n_scales))
    L = len(levels)

    @custom_vmap
    def core(plane):
        n_blocks = (plane.shape[0] - 2 * T) // Hb
        return pl.pallas_call(
            functools.partial(_kernel, levels=levels, Hb=Hb,
                              W_out=W_out, T=T),
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((L, Hb, W_out), lambda g: (0, g, 0)),
            out_shape=jax.ShapeDtypeStruct((L, n_blocks * Hb, W_out),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((Hb + 2 * T, Wp), jnp.float32),
                pltpu.VMEM((Hb + 2 * T, Wp), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(plane)

    @core.def_vmap
    def _rule(axis_size, in_batched, plane):
        if not in_batched[0]:
            plane = jnp.broadcast_to(plane, (axis_size,) + plane.shape)
        out = jnp.stack([core(plane[i]) for i in range(axis_size)])
        return out, True

    return core


_VMEM_BUDGET = 10 * 1024 * 1024  # scoped-vmem is 16M; leave headroom


class ScaleSpaceVmemError(ValueError):
    """The fused kernel's minimum VMEM footprint exceeds the scoped
    budget for this shape; callers should fall back to the XLA path."""


def _pick_block_rows(h: int, w_out: int, wp: int, n_levels: int,
                     T: int) -> int:
    """Largest row block whose VMEM footprint fits the scoped budget:
    2x (Hb+2T, Wp) f32 scratch + the (L, Hb, W_out) f32 output block,
    which Mosaic buffers ~3x for grid pipelining (measured on v5e at
    Hb=240, 640x480 L=7: 18.1M scoped allocation vs the 16M limit —
    2x scratch + 2x out would only be 12.2M, so the out block must be
    carried ~3x; budget 10M keeps ~1.5x slack against that model)."""
    hb = min(_round_up(h, 8), 240)
    while hb > 8:
        footprint = 4 * (2 * (hb + 2 * T) * wp + 3 * n_levels * hb * w_out)
        if footprint <= _VMEM_BUDGET:
            break
        hb -= 8
    footprint = 4 * (2 * (hb + 2 * T) * wp + 3 * n_levels * hb * w_out)
    if footprint > _VMEM_BUDGET:
        # the scratch term 2*(hb+2T)*wp is ~fixed in hb, so for very wide
        # images / large n_scales even hb=8 can exceed the scoped-VMEM
        # budget — surface it instead of letting Mosaic fault at compile
        raise ScaleSpaceVmemError(
            f"fused scale-space kernel cannot fit VMEM: min footprint "
            f"{footprint / 1e6:.1f}M > budget {_VMEM_BUDGET / 1e6:.1f}M "
            f"(w_out={w_out}, wp={wp}, L={n_levels}, T={T}); use the "
            f"default XLA construction for this shape")
    return hb


def scale_space_pallas(img: jnp.ndarray, n_scales: int,
                       block_rows: int | None = None,
                       interpret: bool = False) -> jnp.ndarray:
    """[n_scales+3, H, W] coarse stack — fused Pallas variant.

    Parity: tests/test_pallas_scale_space.py (interpret mode vs the XLA
    construction); select in the front-end with LF_SCALE_SPACE=pallas
    after an on-hardware A/B (compile time first — CLAUDE.md rules).
    """
    img = img.astype(jnp.float32)
    h, w = img.shape[-2], img.shape[-1]
    spec = _levels_spec(n_scales)
    T = _round_up(sum(p for _, _, p in spec), 8)
    if block_rows is None:
        w_out_est = _round_up(w, 128)
        wp_est = _round_up(w_out_est + 2 * T, 128)
        block_rows = _pick_block_rows(h, w_out_est, wp_est, len(spec), T)
    Hb = min(_round_up(h, 8), _round_up(block_rows, 8))
    n_blocks = -(-h // Hb)
    W_out = _round_up(w, 128)
    # the level-l crop reads cols [T-consumed, T-consumed+W_out) of a
    # buffer that has shrunk by 2*consumed: needs Wp >= W_out + 2T
    Wp = _round_up(W_out + 2 * T, 128)

    # mirror-extend by T (exact per-level-mirror semantics — see
    # ops/scale_space.py:scale_space_prepad), then zero-fill to the
    # aligned kernel footprint; the fill region only feeds outputs that
    # are cropped away below.
    xp = mirror_pad(mirror_pad(img, T, img.ndim - 1), T, img.ndim - 2)
    rows_needed = n_blocks * Hb + 2 * T
    pad_cfg = [(0, 0)] * (img.ndim - 2) + [
        (0, rows_needed - xp.shape[-2]), (0, Wp - xp.shape[-1])]
    xp = jnp.pad(xp, pad_cfg)

    core = _core(n_scales, Hb, W_out, Wp, T, interpret)
    if img.ndim == 2:
        out = core(xp)
    else:
        out = jax.vmap(core)(xp.reshape((-1,) + xp.shape[-2:]))
        out = out.reshape(img.shape[:-2] + out.shape[-3:])
    return out[..., :h, :w]
