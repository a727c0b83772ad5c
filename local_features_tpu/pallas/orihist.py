"""Fused orientation-histogram kernel: window DMA + gradient math +
36-bin histogram in ONE Pallas kernel.

Motivation (round-3 end-to-end ablations, scripts/bench_ablate.py): the
orientation stage cost 15.5 ms/8-frame batch, of which the XLA side —
one-hot patch extraction (~2-4 ms) and especially the [F,169,36]
one-hot bin contraction (~4.5 ms) — dominated the actual window DMA
fetch (3.9 ms).  The fetch kernel is scalar-issue-bound with the VPU
idle, so the whole per-item histogram pipeline runs here for ~free,
and the HBM round trip of [F, 24, 128] windows shrinks to [F, 128]
histograms (12x less output traffic).

Per item (all [24, 128] vector ops from prefetched scalars — no
extraction step at all; the patch lives WHERE IT IS in the window and
masks select it):
    x_img(col) = xi + (col - x_local - 7) * step     (same for y)
    val  = win * [0 <= x_img < W] * [0 <= y_img < H]  (zero-fill mask)
    gx   = roll(val, -1, lanes) - roll(val, +1, lanes)
    gy   = roll(val, +1, rows)  - roll(val, -1, rows)
    bin  = round(atan2(gy, gx) * 36 / 2pi) mod 36    (sector tests —
           ops/orientation.py:gradient_bin; Mosaic has no atan2)
    w    = exp(-(dx^2 + dy^2) / (2 sigma^2))
    c    = [interior 13x13] [|dx|,|dy| <= radius] [g != 0] * w * |g|
    hist[b] = sum(c * [bin == b])            (36 masked reduces)

Semantics match ops/orientation.py:orientation_histograms bit-for-bit
up to f32 reduction order (parity: tests/test_orientation.py interpret
mode); levels >= _DECIM_LEVELS use the XLA gather fallback path as
before (ops/orientation.py merges).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_H = 24
WIN_W = 128
N_BINS = 36
_R = 7
_PS = 15


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(nv_ref, sel_ref, oy_ref, ox_ref, fp_ref, canvas_ref, out_ref,
            win, sem, *, kb):
    """fp_ref rows: 0 y_local, 1 x_local, 2 xi, 3 yi, 4 step, 5 radius,
    6 -1/(2 sigma^2), 7 w_act, 8 h_act (all f32, per item)."""
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    nv = nv_ref[0]

    def dma(prog, slot, j):
        idx = prog * kb + j
        oy = pl.multiple_of(oy_ref[idx], 8)
        ox = pl.multiple_of(ox_ref[idx], 128)
        return pltpu.make_async_copy(
            canvas_ref.at[0, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
            win.at[slot, j],
            sem.at[slot, j],
        )

    def start_chunk(prog, slot):
        for j in range(kb):
            @pl.when(sel_ref[prog * kb + j] >= 0)
            def _(j=j):
                dma(prog, slot, j).start()

    @pl.when(g == 0)
    def _():
        start_chunk(0, 0)

    @pl.when((g + 1 < n_g) & ((g + 1) * kb < nv))
    def _():
        start_chunk(g + 1, (g + 1) % 2)

    rows = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_H, WIN_W), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_H, WIN_W), 1).astype(jnp.float32)
    lane36 = jax.lax.broadcasted_iota(jnp.int32, (1, WIN_W), 1)

    def body(j, k):
        yl = fp_ref[0, k]
        xl = fp_ref[1, k]
        xi = fp_ref[2, k]
        yi = fp_ref[3, k]
        step = fp_ref[4, k]
        radius = fp_ref[5, k]
        nis2 = fp_ref[6, k]
        w_act = fp_ref[7, k]
        h_act = fp_ref[8, k]

        @pl.when(sel_ref[g * kb + j] >= 0)
        def _():
            dma(g, g % 2, j).wait()
            w0 = win[g % 2, j]                       # [24, 128] f32

            # patch-relative coordinates of every window pixel
            pr = rows - yl                           # patch row (f32)
            pc = cols - xl
            x_img = xi + (pc - _R) * step
            y_img = yi + (pr - _R) * step
            # zero-fill out-of-image BEFORE gradients (reference
            # semantics; also masks pad-region mirror content in the
            # pad-to-max engine).  ALSO zero everything outside the
            # 15x15 patch: blobs near the top edge get y_local < 0
            # (window origin clamped to 0), and the gradient rolls then
            # WRAP to far window rows — the XLA path reads the patch's
            # zero padding there, so the wrapped lanes must be zero.
            inside = ((x_img >= 0.0) & (x_img < w_act)
                      & (y_img >= 0.0) & (y_img < h_act)
                      & (pr >= 0.0) & (pr <= 14.0)
                      & (pc >= 0.0) & (pc <= 14.0))
            val = jnp.where(inside, w0, 0.0)

            # negated-central-difference gradients (lane/sublane rolls;
            # pltpu.roll needs non-negative shifts: -1 == size-1;
            # wraparound rows/cols fall outside the interior mask)
            gx = (pltpu.roll(val, WIN_W - 1, 1) - pltpu.roll(val, 1, 1))
            gy = (pltpu.roll(val, 1, 0) - pltpu.roll(val, WIN_H - 1, 0))

            dx = (pc - _R) * step
            dy = (pr - _R) * step
            interior = ((pr >= 1.0) & (pr <= 13.0)
                        & (pc >= 1.0) & (pc <= 13.0))
            in_grad = (interior & inside
                       & (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
                       & ((gx != 0.0) | (gy != 0.0)))
            mag = jnp.sqrt(gx * gx + gy * gy)
            weight = jnp.exp((dx * dx + dy * dy) * nis2)
            contrib = jnp.where(in_grad, weight * mag, 0.0)

            # transcendental-free sector binning (Mosaic has no atan2);
            # shared rule => bit-identical to the XLA path and golden
            from ..ops.orientation import gradient_bin
            b = gradient_bin(gx, gy)

            acc = jnp.zeros((1, WIN_W), jnp.float32)
            for bb in range(N_BINS):
                s = jnp.sum(jnp.where(b == bb, contrib, 0.0))
                acc = acc + jnp.where(lane36 == bb, s, 0.0)
            out_ref[j, :] = acc[0]

    for j in range(kb):
        @pl.when(g * kb < nv)
        def _(j=j):
            body(j, g * kb + j)


@functools.lru_cache(maxsize=None)
def _core(kb: int, interpret: bool):
    @custom_vmap
    def core(nv, sel, oy, ox, fp, canvas):
        Fp = sel.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(Fp // kb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((kb, WIN_W), lambda g, *_: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, kb, WIN_H, WIN_W), jnp.float32),
                pltpu.SemaphoreType.DMA((2, kb)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel, kb=kb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Fp, WIN_W), jnp.float32),
            interpret=interpret,
        )(nv, sel, oy, ox, fp, canvas)

    @core.def_vmap
    def _rule(axis_size, in_batched, nv, sel, oy, ox, fp, canvas):
        B = axis_size
        args = tuple(
            a if bt else jnp.broadcast_to(a, (B,) + a.shape)
            for a, bt in zip((nv, sel, oy, ox, fp, canvas), in_batched))
        out = jnp.stack([core(*(a[b] for a in args)) for b in range(B)])
        return out, True

    return core


def _kernel_packed(nv_ref, sel_ref, oy_ref, ox_ref, fp_ref, canvas_ref,
                   out_ref, win, hist, sem, *, kb):
    """Lane-packed variant: per chunk, the kb=8 patches are aligned with
    dynamic rolls and packed side by side across the 128 lanes (16 lanes
    each), so every mask / sector-test / per-bin reduce instruction
    serves 8 items at once instead of 1 — the [24, 128] window layout
    wastes 113 of 128 lanes on DMA alignment slack, and the per-item
    kernel was bound by exactly that (measured 13.9 ms/batch end to end;
    the VPU instruction count per item is ~8x this variant's).

    Output block is bins-major [40, 128]: row b, lane 16*j = item j's
    hist[b] (the in-kernel result of the segment reduction lives in lane
    16*j; a transpose to [kb, 36] would need per-(j, b) lane moves).
    The XLA caller untangles with a strided slice + transpose.
    """
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    nv = nv_ref[0]

    def dma(prog, slot, j):
        idx = prog * kb + j
        oy = pl.multiple_of(oy_ref[idx], 8)
        ox = pl.multiple_of(ox_ref[idx], 128)
        return pltpu.make_async_copy(
            canvas_ref.at[0, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
            win.at[slot, j],
            sem.at[slot, j],
        )

    def start_chunk(prog, slot):
        for j in range(kb):
            @pl.when(sel_ref[prog * kb + j] >= 0)
            def _(j=j):
                dma(prog, slot, j).start()

    @pl.when(g == 0)
    def _():
        start_chunk(0, 0)

    @pl.when((g + 1 < n_g) & ((g + 1) * kb < nv))
    def _():
        start_chunk(g + 1, (g + 1) % 2)

    lane = jax.lax.broadcasted_iota(jnp.int32, (16, WIN_W), 1)
    seg = lane // 16                                   # item within chunk
    pc = (lane - seg * 16).astype(jnp.float32)         # patch col 0..15
    pr = jax.lax.broadcasted_iota(
        jnp.int32, (16, WIN_W), 0).astype(jnp.float32)  # patch row

    @pl.when(g * kb < nv)
    def _():
        # ---- pack: align each window's 15x15 patch to rows 0.. /
        # lanes 16j.. with dynamic rolls, select into one [16, 128]
        packed = jnp.zeros((16, WIN_W), jnp.float32)
        for j in range(kb):
            k = g * kb + j
            valid_j = sel_ref[k] >= 0

            @pl.when(valid_j)
            def _(j=j, k=k):
                dma(g, g % 2, j).wait()

            yl = fp_ref[0, k].astype(jnp.int32)
            xl = fp_ref[1, k].astype(jnp.int32)
            w = win[g % 2, j]                          # [24, 128]
            # rows: result[pr] = w[yl + pr]  (yl in (-8, 8); wrapped
            # rows land outside the image mask below)
            w = pltpu.roll(w, jnp.mod(24 - yl, 24), 0)[:16, :]
            # lanes: result[16j + pc] = w[xl + pc]
            w = pltpu.roll(w, jnp.mod(16 * j - xl, WIN_W), 1)
            packed = jnp.where((seg == j) & valid_j, w, packed)

        # ---- per-lane params from per-item scalars
        def lane_param(row):
            v = jnp.zeros((16, WIN_W), jnp.float32)
            for j in range(kb):
                v = jnp.where(seg == j, fp_ref[row, g * kb + j], v)
            return v

        xi = lane_param(2)
        yi = lane_param(3)
        step = lane_param(4)
        radius = lane_param(5)
        nis2 = lane_param(6)
        w_act = lane_param(7)
        h_act = lane_param(8)

        dx = (pc - _R) * step
        dy = (pr - _R) * step
        x_img = xi + dx
        y_img = yi + dy
        inside = ((x_img >= 0.0) & (x_img < w_act)
                  & (y_img >= 0.0) & (y_img < h_act)
                  & (pr <= 14.0) & (pc <= 14.0))
        val = jnp.where(inside, packed, 0.0)

        # gradients: neighbor reads crossing a 16-lane segment boundary
        # only occur at pc = 0/15, which the interior mask excludes
        gx = (pltpu.roll(val, WIN_W - 1, 1) - pltpu.roll(val, 1, 1))
        gy = (pltpu.roll(val, 1, 0) - pltpu.roll(val, 15, 0))

        interior = ((pr >= 1.0) & (pr <= 13.0)
                    & (pc >= 1.0) & (pc <= 13.0))
        in_grad = (interior & inside
                   & (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
                   & ((gx != 0.0) | (gy != 0.0)))
        mag = jnp.sqrt(gx * gx + gy * gy)
        weight = jnp.exp((dx * dx + dy * dy) * nis2)
        contrib = jnp.where(in_grad, weight * mag, 0.0)

        from ..ops.orientation import gradient_bin
        b = gradient_bin(gx, gy)

        for bb in range(N_BINS):
            r1 = jnp.sum(jnp.where(b == bb, contrib, 0.0), axis=0,
                         keepdims=True)                # [1, 128]
            # segment suffix-sum: lane 16j accumulates lanes 16j..16j+15
            for sh in (1, 2, 4, 8):
                r1 = r1 + pltpu.roll(r1, WIN_W - sh, 1)
            hist[bb, :] = r1[0]
        out_ref[:, :] = hist[:, :]


@functools.lru_cache(maxsize=None)
def _core_packed(kb: int, interpret: bool):
    @custom_vmap
    def core(nv, sel, oy, ox, fp, canvas):
        Fp = sel.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(Fp // kb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((_HROWS, WIN_W), lambda g, *_: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, kb, WIN_H, WIN_W), jnp.float32),
                pltpu.VMEM((_HROWS, WIN_W), jnp.float32),
                pltpu.SemaphoreType.DMA((2, kb)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_packed, kb=kb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Fp // kb * _HROWS, WIN_W),
                                           jnp.float32),
            interpret=interpret,
        )(nv, sel, oy, ox, fp, canvas)

    @core.def_vmap
    def _rule(axis_size, in_batched, nv, sel, oy, ox, fp, canvas):
        B = axis_size
        args = tuple(
            a if bt else jnp.broadcast_to(a, (B,) + a.shape)
            for a, bt in zip((nv, sel, oy, ox, fp, canvas), in_batched))
        out = jnp.stack([core(*(a[b] for a in args)) for b in range(B)])
        return out, True

    return core


def _kernel_packed2(nv_ref, sel_ref, oy_ref, ox_ref, fp_ref, canvas_ref,
                    fpl_ref, out_ref, win, sem, *, kb):
    """Packed v2: two VPU-count reductions over _kernel_packed, same
    semantics and output layout.

    1. Lane params come in pre-expanded: fpl_ref is a [1, 16, 128]
       VMEM block per chunk with row p = fparams[p] repeated 16x per
       lane segment — the v1 kernel rebuilt each of the 9 params with
       8 in-kernel selects (72 [16,128] ops/chunk); here they are
       [1, 128] rows that broadcast for free in the elementwise math.
    2. The 36-bin histogram is accumulated bins-major directly: for
       each of the 16 patch rows, a [40, 128] one-hot select against a
       sublane iota scatters that row's contributions onto its bin row
       (16 x ~3 ops on [40, 128]), followed by ONE 4-step segment
       suffix-sum — v1 did 36 x (mask + full reduce + 4-step suffix
       sum) (~600 vreg-ops vs ~280).

    Bin rows 36..39 stay zero (gradient_bin < 36), so the padded
    [40, 128] block needs no masking and the caller's untangle is
    unchanged."""
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    nv = nv_ref[0]

    def dma(prog, slot, j):
        idx = prog * kb + j
        oy = pl.multiple_of(oy_ref[idx], 8)
        ox = pl.multiple_of(ox_ref[idx], 128)
        return pltpu.make_async_copy(
            canvas_ref.at[0, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)],
            win.at[slot, j],
            sem.at[slot, j],
        )

    def start_chunk(prog, slot):
        for j in range(kb):
            @pl.when(sel_ref[prog * kb + j] >= 0)
            def _(j=j):
                dma(prog, slot, j).start()

    @pl.when(g == 0)
    def _():
        start_chunk(0, 0)

    @pl.when((g + 1 < n_g) & ((g + 1) * kb < nv))
    def _():
        start_chunk(g + 1, (g + 1) % 2)

    lane = jax.lax.broadcasted_iota(jnp.int32, (16, WIN_W), 1)
    seg = lane // 16                                   # item within chunk
    pc = (lane - seg * 16).astype(jnp.float32)         # patch col 0..15
    pr = jax.lax.broadcasted_iota(
        jnp.int32, (16, WIN_W), 0).astype(jnp.float32)  # patch row

    @pl.when(g * kb < nv)
    def _():
        packed = jnp.zeros((16, WIN_W), jnp.float32)
        for j in range(kb):
            k = g * kb + j
            valid_j = sel_ref[k] >= 0

            @pl.when(valid_j)
            def _(j=j, k=k):
                dma(g, g % 2, j).wait()

            yl = fp_ref[0, k].astype(jnp.int32)
            xl = fp_ref[1, k].astype(jnp.int32)
            w = win[g % 2, j]                          # [24, 128]
            w = pltpu.roll(w, jnp.mod(24 - yl, 24), 0)[:16, :]
            w = pltpu.roll(w, jnp.mod(16 * j - xl, WIN_W), 1)
            packed = jnp.where((seg == j) & valid_j, w, packed)

        # per-lane params: [1, 128] rows broadcast in the math below
        fpl = fpl_ref[0]                               # [16, 128]
        xi = fpl[2:3, :]
        yi = fpl[3:4, :]
        step = fpl[4:5, :]
        radius = fpl[5:6, :]
        nis2 = fpl[6:7, :]
        w_act = fpl[7:8, :]
        h_act = fpl[8:9, :]

        dx = (pc - _R) * step
        dy = (pr - _R) * step
        x_img = xi + dx
        y_img = yi + dy
        inside = ((x_img >= 0.0) & (x_img < w_act)
                  & (y_img >= 0.0) & (y_img < h_act)
                  & (pr <= 14.0) & (pc <= 14.0))
        val = jnp.where(inside, packed, 0.0)

        gx = (pltpu.roll(val, WIN_W - 1, 1) - pltpu.roll(val, 1, 1))
        gy = (pltpu.roll(val, 1, 0) - pltpu.roll(val, 15, 0))

        interior = ((pr >= 1.0) & (pr <= 13.0)
                    & (pc >= 1.0) & (pc <= 13.0))
        in_grad = (interior & inside
                   & (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
                   & ((gx != 0.0) | (gy != 0.0)))
        mag = jnp.sqrt(gx * gx + gy * gy)
        weight = jnp.exp((dx * dx + dy * dy) * nis2)
        contrib = jnp.where(in_grad, weight * mag, 0.0)

        from ..ops.orientation import gradient_bin
        b = gradient_bin(gx, gy)

        # bins-major accumulation: row r's bins scatter onto sublane b
        # via a [40, 128] one-hot select (f32 sums in a different order
        # than v1's per-bin reduction — both reduce 13 interior rows
        # per (item, bin) so parity holds to reduction-order anyway)
        iota40 = jax.lax.broadcasted_iota(jnp.int32, (_HROWS, WIN_W), 0)
        acc = jnp.zeros((_HROWS, WIN_W), jnp.float32)
        for r in range(1, 14):                  # interior rows only
            acc = acc + jnp.where(iota40 == b[r:r+1, :],
                                  contrib[r:r+1, :], 0.0)
        # segment suffix-sum: lane 16j accumulates lanes 16j..16j+15
        for sh in (1, 2, 4, 8):
            acc = acc + pltpu.roll(acc, WIN_W - sh, 1)
        out_ref[:, :] = acc


@functools.lru_cache(maxsize=None)
def _core_packed2(kb: int, interpret: bool):
    @custom_vmap
    def core(nv, sel, oy, ox, fp, canvas, fpl):
        Fp = sel.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(Fp // kb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 16, WIN_W), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_HROWS, WIN_W), lambda g, *_: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, kb, WIN_H, WIN_W), jnp.float32),
                pltpu.SemaphoreType.DMA((2, kb)),
            ],
        )
        return pl.pallas_call(
            functools.partial(_kernel_packed2, kb=kb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Fp // kb * _HROWS, WIN_W),
                                           jnp.float32),
            interpret=interpret,
        )(nv, sel, oy, ox, fp, canvas, fpl)

    @core.def_vmap
    def _rule(axis_size, in_batched, nv, sel, oy, ox, fp, canvas, fpl):
        B = axis_size
        args = tuple(
            a if bt else jnp.broadcast_to(a, (B,) + a.shape)
            for a, bt in zip((nv, sel, oy, ox, fp, canvas, fpl),
                             in_batched))
        out = jnp.stack([core(*(a[b] for a in args)) for b in range(B)])
        return out, True

    return core


_HROWS = 40  # 36 bins padded to a sublane multiple


@functools.partial(jax.jit, static_argnames=("kb", "interpret"))
def fetch_histograms_packed(
    arena: jnp.ndarray,
    sel: jnp.ndarray,
    oy: jnp.ndarray,
    ox: jnp.ndarray,
    fparams: jnp.ndarray,
    kb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """[F, 36] raw orientation histograms (lane-packed kernel)."""
    assert kb == 8, "packed layout is 8 items x 16 lanes"
    F = sel.shape[0]
    Fp = _round_up(max(F, kb), kb)
    if Fp != F:
        sel = jnp.pad(sel, (0, Fp - F), constant_values=-1)
        oy = jnp.pad(oy, (0, Fp - F))
        ox = jnp.pad(ox, (0, Fp - F))
        fparams = jnp.pad(fparams, ((0, 0), (0, Fp - F)))
    _, Ha, Wa = arena.shape
    oy = jnp.clip(oy, 0, max(((Ha - WIN_H) // 8) * 8, 0))
    ox = jnp.clip(ox, 0, max(((Wa - WIN_W) // 128) * 128, 0))
    nv = jnp.max(jnp.where(
        sel >= 0, jnp.arange(1, Fp + 1, dtype=jnp.int32), 0), keepdims=True)
    out = _core_packed(kb, interpret)(nv, sel, oy, ox, fparams, arena)
    G = Fp // kb
    # untangle bins-major blocks: out[g*40 + b, 16*j] = hist[g*8+j, b].
    # A strided lane slice ([:, :, ::16]) lowers to a GATHER on TPU
    # (measured 2.0 ms/batch); a one-hot selection matmul is exact
    # under HIGHEST and rides the MXU instead.
    sel_m = (jnp.arange(WIN_W)[:, None] ==
             jnp.arange(kb)[None, :] * 16).astype(jnp.float32)  # [128, 8]
    h = jnp.dot(out, sel_m, precision=jax.lax.Precision.HIGHEST)
    h = h.reshape(G, _HROWS, kb).transpose(0, 2, 1)       # [G, 8, 40]
    return h.reshape(Fp, _HROWS)[:F, :N_BINS]


@functools.partial(jax.jit, static_argnames=("kb", "interpret"))
def fetch_histograms_packed2(
    arena: jnp.ndarray,
    sel: jnp.ndarray,
    oy: jnp.ndarray,
    ox: jnp.ndarray,
    fparams: jnp.ndarray,
    kb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """[F, 36] raw orientation histograms (packed v2 kernel: hoisted
    lane params + bins-major one-hot accumulation)."""
    assert kb == 8, "packed layout is 8 items x 16 lanes"
    F = sel.shape[0]
    Fp = _round_up(max(F, kb), kb)
    if Fp != F:
        sel = jnp.pad(sel, (0, Fp - F), constant_values=-1)
        oy = jnp.pad(oy, (0, Fp - F))
        ox = jnp.pad(ox, (0, Fp - F))
        fparams = jnp.pad(fparams, ((0, 0), (0, Fp - F)))
    _, Ha, Wa = arena.shape
    oy = jnp.clip(oy, 0, max(((Ha - WIN_H) // 8) * 8, 0))
    ox = jnp.clip(ox, 0, max(((Wa - WIN_W) // 128) * 128, 0))
    nv = jnp.max(jnp.where(
        sel >= 0, jnp.arange(1, Fp + 1, dtype=jnp.int32), 0), keepdims=True)
    G = Fp // kb
    # pre-expanded per-lane params: fpl[g, p, 16*j + c] = fparams[p, g*8+j]
    fpl = jnp.repeat(fparams.reshape(9, G, kb), 16, axis=2)   # [9, G, 128]
    fpl = jnp.pad(fpl.transpose(1, 0, 2), ((0, 0), (0, 16 - 9), (0, 0)))
    out = _core_packed2(kb, interpret)(nv, sel, oy, ox, fparams, arena, fpl)
    sel_m = (jnp.arange(WIN_W)[:, None] ==
             jnp.arange(kb)[None, :] * 16).astype(jnp.float32)  # [128, 8]
    h = jnp.dot(out, sel_m, precision=jax.lax.Precision.HIGHEST)
    h = h.reshape(G, _HROWS, kb).transpose(0, 2, 1)       # [G, 8, 40]
    return h.reshape(Fp, _HROWS)[:F, :N_BINS]


@functools.partial(jax.jit, static_argnames=("kb", "interpret"))
def fetch_histograms(
    arena: jnp.ndarray,      # [1, Ha, Wa] f32 (ops/orientation._arena_canvas)
    sel: jnp.ndarray,        # [F] i32, -1 = skip
    oy: jnp.ndarray,         # [F] i32 multiples of 8 (arena-global)
    ox: jnp.ndarray,         # [F] i32 multiples of 128
    fparams: jnp.ndarray,    # [9, F] f32 (see _kernel)
    kb: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """[F, 36] raw orientation histograms."""
    F = sel.shape[0]
    Fp = _round_up(max(F, kb), kb)
    if Fp != F:
        sel = jnp.pad(sel, (0, Fp - F), constant_values=-1)
        oy = jnp.pad(oy, (0, Fp - F))
        ox = jnp.pad(ox, (0, Fp - F))
        fparams = jnp.pad(fparams, ((0, 0), (0, Fp - F)))
    # in-bounds clamp (alignment-preserving) — an OOB async copy is a
    # worker-killing fault (see pallas/windows.py:_clamp_dma)
    _, Ha, Wa = arena.shape
    oy = jnp.clip(oy, 0, max(((Ha - WIN_H) // 8) * 8, 0))
    ox = jnp.clip(ox, 0, max(((Wa - WIN_W) // 128) * 128, 0))
    nv = jnp.max(jnp.where(
        sel >= 0, jnp.arange(1, Fp + 1, dtype=jnp.int32), 0), keepdims=True)
    out = _core(kb, interpret)(nv, sel, oy, ox, fparams, arena)
    return out[:F, :N_BINS]
