"""Pallas patch-sampling kernel: rotated/scaled 32x32 bilinear patches.

TPU-first replacement for the textureLod sampling of
shaders/mkd/patch_gradients.glsl:40-70 and for the XLA fallback in
ops/descriptor.py:sample_patches.  The XLA fallback lowers to a batched
scalar gather (4 taps x 1024 samples x K keypoints) which runs at
~100M elements/s on TPU — ~640 ms for an 8-frame 2k-keypoint batch.

Kernel strategy (no scalar gathers anywhere):

- The mip pyramid is stored as one TRANSPOSED, padded, bf16 3D canvas
  [n_levels * N_PHASE, Wc, Hc] (x on sublanes, y on lanes).  Each mip
  appears N_PHASE=4 times, y-shifted by PHASE_STEP=32 lanes per copy:
  for ANY keypoint one of the copies puts the desired window start
  within 32 lanes of a 128-aligned offset, so the y window shrinks to
  128 lanes (vs 256 with a single copy, where the 128-lane DMA
  alignment forces 128 lanes of slack).  A keypoint's sampling window
  is then a single tile-aligned dynamic-slice DMA
      winT = canvasT[level*4 + phase, x0:x0+112, y0:y0+128].
  The 4x HBM cost is ~35 MB/frame at 640x480 — noise next to the VPU
  time it buys back (the y one-hot build halves).
- A 32x32 patch at mip level floor(log2(scale)) has residual scale
  rem in [1, 2), so its rotated footprint spans at most
  2 * 16 * sqrt(2) * 2 = 90.6 px: it fits 112 sublanes (16-aligned
  origin) x 128 lanes (32-phase-aligned origin; window-local y spans
  [1.2, 126.8] incl. mirror folds — see _phase_origin).
- All 1024 samples live LANE-MAJOR ([1, 1024]) so every coordinate op
  runs on full vector registers; bilinear sampling with MirroredRepeat
  borders becomes two one-hot contractions:
      YohT[128, 1024] = onehot(y0)*(1-fy) + onehot(y1)*fy   (VPU, bf16)
      S1T  = winT[112, 128] @ YohT                           (MXU, bf16)
      out[1, 1024] = sum(S1T * XohT[112, 1024], axis=0)      (VPU)
  i.e. the gather IS a matmul — the MXU does it at speed of light.
- Window DMAs are double-buffered across grid steps: program k kicks off
  the DMA for keypoint k+1 while computing on k's window.
- Outputs land in [K, 1024] sample-lane-major rows (no relayout);
  8 consecutive programs share one (8, 1024) output block.

Precision: the canvas and one-hot weights are bf16 (2^-9 relative
subtexel precision) — comparable to the 8-bit subtexel precision of the
GPU texture units the reference relies on.

Mirror correctness: window origins are chosen so that any sample whose
mirrored coordinate folds back into the mip still lands inside the
window (mirror reflection preserves distance to the border, so folded
coordinates stay within the keypoint's footprint interval clamped to
[0, mh); the 47.5-lane left reach covers the worst single-top-fold
case at py -> mh by a 0.25-lane margin, and for mh <= 49 the whole mip
fits in the window).  The canvas is padded (64 sublanes / 240 lanes
incl. the phase shifts) so aligned windows never run off the canvas
(see build_canvas / _aligned_origin / _phase_origin).
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

WIN_X = 112   # 90.6 px footprint + 16-sublane (bf16 tile) alignment slack
WIN_Y = 128   # 90.6 px footprint + 32-lane phase-copy alignment slack
N_PHASE = 4       # y-shifted canvas copies per mip
PHASE_STEP = 32   # lane shift between copies (4 * 32 = 128 = lane align)
PADT = 64         # top canvas padding so phase origins never go negative
_PS = C.PATCH_SIZE  # 32
_NS = _PS * _PS     # 1024
# keypoints per grid program (amortizes per-step overhead; env knob for
# experiments — must divide or be divided by 8 for the out-block tiling)
KB = int(__import__("os").environ.get("LF_SAMPLER_KB", "4"))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def build_canvas(mips: list[jnp.ndarray]) -> jnp.ndarray:
    """[n_levels * N_PHASE, Wc, Hc] bf16 canvas of TRANSPOSED mips
    (x-major), with N_PHASE y-shifted copies per mip.

    Plane l*N_PHASE + k holds mip l at lane offset PADT + k*PHASE_STEP:
    canvas[l*4+k][x, lane] = mip_l[lane - 64 - 32*k, x].  Padded so
    every tile-aligned sampling window stays in bounds: Wc >= w0 + 64
    (x on sublanes, 16-aligned origins), Hc >= h0 + 240 (y on lanes,
    128-aligned origins picked by _phase_origin).
    """
    h0, w0 = mips[0].shape
    Wc = max(WIN_X, _round_up(w0 + 64, 16))
    Hc = _round_up(h0 + PADT + (N_PHASE - 1) * PHASE_STEP + WIN_Y, 128)
    out = []
    for m in mips:
        mh, mw = m.shape
        # transpose + per-phase lane placement in ONE offset-one-hot
        # matmul per copy: out_k[w, y'] = sum_h m[h, w] E_k[h, y'],
        # E_k[h, PADT + k*PHASE_STEP + h] = 1 — exact (one 1.0 x value
        # product per output) and writes each copy's [mw, Hc] plane
        # once, padded lanes included.  The earlier two-step form
        # (identity-matmul transpose, then N_PHASE jnp.pads) re-passed
        # every plane through a pad materialization; an XLA relayout
        # transpose of the f32 mips is slower still (same trick as
        # ops/orientation.py:_decimated_canvases).  bf16-converting
        # before the matmul == after (elementwise cast commutes).
        mb = m.astype(jnp.bfloat16)
        for k in range(N_PHASE):
            top = PADT + k * PHASE_STEP
            E = np.zeros((mh, Hc), np.float32)
            E[np.arange(mh), top + np.arange(mh)] = 1.0
            mt = jax.lax.dot_general(
                mb, jnp.asarray(E, jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16)       # [mw, Hc]
            out.append(jnp.pad(mt, ((0, Wc - mw), (0, 0))))
    return jnp.stack(out)


def _mirror(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """MirroredRepeat fold of integer coords i into [0, n) — computed in
    f32 with a reciprocal multiply.

    Vectorized integer `lax.rem` with a RUNTIME divisor has no native
    TPU instruction and lowers to a long scalar-ish sequence — switching
    the 4 mirror folds here from int rem to this f32 form took the whole
    sampler kernel from 43.6 to 19.6 ms/batch on v5e (2.2x).  Exactness:
    all values are integers < 2^13 (exact in f32); the quotient error of
    the reciprocal multiply is < 2^-10 of a step, so after the two wrap
    fixups r is the exact integer modulo.
    """
    nf = n.astype(jnp.float32)
    two_n = 2.0 * nf
    fi = i.astype(jnp.float32)
    r = fi - two_n * jnp.floor(fi * (1.0 / two_n))
    r = jnp.where(r >= two_n, r - two_n, r)
    r = jnp.where(r < 0.0, r + two_n, r)
    return jnp.where(r >= nf, two_n - 1.0 - r, r)


def _kernel(nv_ref, plane_ref, srcj_ref, ox_ref, oy_ref, oyl_ref, hw_ref,
            fparams_ref, canvas_ref, out_ref, win, sem):
    g = pl.program_id(0)
    n_g = pl.num_programs(0)
    # last-valid frontier: programs fully past it run ONE compare
    # instead of KB per-item predicates (valid keypoints are a
    # compaction-ordered prefix; ~80% of capacity is tail at typical
    # workloads).  Their output rows stay unwritten — masked by kvalid.
    nv = nv_ref[0]

    def start_dmas(prog, slot):
        for j in range(KB):
            idx = prog * KB + j

            # plane=-1: invalid slot, skip.  srcj != j: this item shares
            # its window with an earlier chunk-mate (same (plane, ox,
            # oy) — multi-orientation keypoints of one blob, or window-
            # key-sorted neighbors); only the run head issues the DMA
            # and the rest read its VMEM slot (the fetch is issue-
            # latency bound, so skipped copies are the whole win).
            @pl.when((plane_ref[idx] >= 0) & (srcj_ref[idx] == j))
            def _(idx=idx, j=j):
                ox = pl.multiple_of(ox_ref[idx], 16)
                oy = pl.multiple_of(oy_ref[idx], 128)
                pltpu.make_async_copy(
                    canvas_ref.at[plane_ref[idx], pl.ds(ox, WIN_X),
                                  pl.ds(oy, WIN_Y)],
                    win.at[slot, j],
                    sem.at[slot, j],
                ).start()

    def wait_dma(prog, slot, j):
        idx = prog * KB + j

        @pl.when((plane_ref[idx] >= 0) & (srcj_ref[idx] == j))
        def _():
            ox = pl.multiple_of(ox_ref[idx], 16)
            oy = pl.multiple_of(oy_ref[idx], 128)
            pltpu.make_async_copy(
                canvas_ref.at[plane_ref[idx], pl.ds(ox, WIN_X),
                              pl.ds(oy, WIN_Y)],
                win.at[slot, j],
                sem.at[slot, j],
            ).wait()

    # warm-up: program 0 starts its own DMAs
    @pl.when(g == 0)
    def _():
        start_dmas(0, 0)

    # prefetch next program's windows
    @pl.when((g + 1 < n_g) & ((g + 1) * KB < nv))
    def _():
        start_dmas(g + 1, (g + 1) % 2)

    # shared per-program constants
    flat_i = jax.lax.broadcasted_iota(jnp.int32, (1, _NS), 1)
    lx = jax.lax.rem(flat_i, _PS).astype(jnp.float32) - _PS / 2.0
    ly = (flat_i // _PS).astype(jnp.float32) - _PS / 2.0
    # f32 row iotas: tent math in f32 then one convert to bf16 for the
    # MXU benches ~10% faster than bf16-native tent arithmetic on v5e
    # (and is the more accurate order: round once, at the end).
    rows_y = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_Y, _NS), 0).astype(jnp.float32)
    rows_x = jax.lax.broadcasted_iota(
        jnp.int32, (WIN_X, _NS), 0).astype(jnp.float32)

    def onehot_lerp(rows, i0, i1, frac):
        # Signed-tent bilinear weights, one fused expression instead of
        # two arithmetic one-hots:
        #     w(row) = max(0, 1 - |row - (i0 + s*frac)|),  s = i1 - i0.
        # Exactly equals onehot(i0)*(1-frac) + onehot(i1)*frac for the
        # three cases the mirror produces: s=+1 (interior ascending),
        # s=-1 (descending mirror branch), s=0 (fold: both taps land on
        # the same row, total weight 1).  The tent only needs sub-ulp
        # accuracy within |d| <= 2, where the final bf16 rounding
        # (2^-8 resolution) matches the GPU texture units' 8-bit
        # subtexel precision.  (No boolean vectors — Mosaic relayout of
        # broadcast i1 masks is unsupported.)
        t = i0 + (i1 - i0) * frac              # [1, NS] f32
        w = jnp.maximum(1.0 - jnp.abs(rows - t), 0.0)
        return w.astype(jnp.bfloat16)

    def body(j, k):
        px = fparams_ref[0, k]
        py = fparams_ref[1, k]
        rem = fparams_ref[2, k]
        ct = fparams_ref[3, k]
        st = fparams_ref[4, k]
        mw = hw_ref[2 * k]      # mip width
        mh = hw_ref[2 * k + 1]  # mip height
        ox = ox_ref[k]
        oy = oyl_ref[k]         # window origin in MIP y coords (may be <0)

        sx = (lx * ct - ly * st) * rem + px
        sy = (lx * st + ly * ct) * rem + py
        x0 = jnp.floor(sx)                  # f32 integer-valued
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0

        oxf = ox.astype(jnp.float32)
        oyf = oy.astype(jnp.float32)
        x0m = _mirror(x0, mw) - oxf         # [1, 1024] window-local f32
        x1m = _mirror(x0 + 1.0, mw) - oxf
        y0m = _mirror(y0, mh) - oyf
        y1m = _mirror(y0 + 1.0, mh) - oyf

        yoht = onehot_lerp(rows_y, y0m, y1m, fy)   # [128, 1024] bf16
        xoht = onehot_lerp(rows_x, x0m, x1m, fx)   # [112, 1024] bf16

        wait_dma(g, g % 2, j)
        # window of this item's run head (== own slot when srcj == j);
        # its DMA was waited in the head's (earlier or this) iteration
        s1t = jnp.dot(win[g % 2, srcj_ref[k]], yoht,
                      preferred_element_type=jnp.float32)  # [112, 1024]
        row = (g % max(8 // KB, 1)) * KB + j
        out_ref[row, :] = jnp.sum(s1t * xoht.astype(jnp.float32), axis=0)

    @pl.when(g * KB < nv)
    def _():
        for j in range(KB):
            k = g * KB + j

            # plane=-1 marks an invalid/padding slot: skip its DMA wait
            # AND its whole tent/matmul chain (slots are valid-first
            # compacted, so typically >half the capacity is skipped).
            # Its output row stays unwritten (arbitrary);
            # sample_patches_pallas masks by kvalid.
            @pl.when(plane_ref[k] >= 0)
            def _(j=j, k=k):
                body(j, k)


def _aligned_origin(c, align, margin):
    """Tile-aligned window origin covering [c - margin, c + margin)."""
    o = jnp.round(c).astype(jnp.int32) - margin
    o = (o // align) * align
    return jnp.maximum(0, o)


def _window_geometry(L, kx, ky, ksize, psf):
    """Shared mip/window addressing for one keypoint set: (level, rem,
    px, py, ox, plane, oy, oyl).  Single source of truth for both the
    kernel invocation (sample_patches_pallas) and the dedup sort key
    (window_sort_key) — the two must agree or sorting silently loses
    its DMA dedup value."""
    scale = jnp.maximum(ksize, 1e-6) * psf / _PS
    log2s = jnp.log2(scale)
    # double clamp (float then int) so NaN sizes cannot yield an
    # out-of-range plane index after the astype
    level = jnp.clip(jnp.clip(jnp.floor(log2s), 0, L - 1)
                     .astype(jnp.int32), 0, L - 1)
    rem = jnp.exp2(log2s - level.astype(jnp.float32))
    inv = jnp.exp2(-level.astype(jnp.float32))
    px = kx * inv
    py = ky * inv
    ox = _aligned_origin(px, 16, 48)
    plane, oy, oyl = _phase_origin(py, level)
    return level, rem, px, py, ox, plane, oy, oyl


def window_sort_key(kx, ky, ksize, kvalid, n_planes: int,
                    patch_scale_factor=C.DEFAULT_PATCH_SCALE_FACTOR):
    """[K] i32 key grouping keypoints that share a sampler window.

    Equal key == equal (plane, ox, oy) DMA source in
    sample_patches_pallas; sorting keypoints by it makes cross-blob
    duplicate windows adjacent so the kernel's run-head dedup collapses
    them to one DMA each (multi-orientation keypoints of a single blob
    are already adjacent; the window origins are so coarsely quantized
    — 16 sublanes x 128 lanes — that a 640x480 frame has only ~64
    distinct windows for ~700 keypoints).  Invalid slots key to
    i32-max, keeping the valid prefix contract after sorting.
    `n_planes` = canvas.shape[0] (L * N_PHASE).
    """
    psf = jnp.asarray(patch_scale_factor, jnp.float32)
    L = n_planes // N_PHASE
    _, _, _, _, ox, plane, oy, _ = _window_geometry(L, kx, ky, ksize, psf)
    # bit-packed (plane | ox/16 | oy/128): 5 + 13 + 12 bits < i32
    key = (((plane << 13) | (ox >> 4)) << 12) | (oy >> 7)
    return jnp.where(kvalid, key, jnp.int32(np.iinfo(np.int32).max))


def _phase_origin(py, level):
    """(plane, oy_dma, oy_loc) for the y window via phase-copy selection.

    Picks the canvas copy k whose PHASE_STEP*k shift puts the desired
    window start (round(py) - 48 in mip coords) within PHASE_STEP lanes
    BELOW a 128-aligned lane offset, i.e. py - oy_loc in [47.5, 80.5).
    Left reach 47.5 >= 46.25 footprint (16*sqrt(2)*2*rem + floor tap);
    right reach 128 - 80.5 - 0.5 + 33.25 ... max local tap
    (py - oy_loc) + 46.25 < 126.8 < 128.  Mirror folds stay in range
    (see module docstring).
    """
    yi = jnp.round(py).astype(jnp.int32)
    basey = yi + (PADT - 48)       # desired start, copy-0 lane coords
    k = jnp.mod(-(basey // PHASE_STEP), N_PHASE)
    pyc = basey + PHASE_STEP * k   # desired start, copy-k lane coords
    m = jnp.mod(pyc, 128)          # in [0, PHASE_STEP) by choice of k
    oy = pyc - m                   # 128-aligned DMA lane offset, >= 0
    oy_loc = oy - PHASE_STEP * k - PADT  # same origin in mip y coords
    plane = level * N_PHASE + k
    return plane, oy, oy_loc


@functools.lru_cache(maxsize=None)
def _sampler_core(interpret: bool):
    """custom_vmap'd flat-grid kernel invocation (params pre-computed).

    The batching rule UNROLLS the vmapped batch dimension into B
    per-frame kernel calls (identical shapes, one Mosaic compile) — the
    default vmapped pallas lowering (batch dim prepended to the grid)
    faulted Mosaic on real v5e; see pallas/windows.py for the failure
    matrix.
    """

    @custom_vmap
    def core(nv, plane, srcj, ox, oy, oyl, hw, fparams, canvas):
        Kp = plane.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,  # nv, plane, srcj, ox, oy, oyl, hw, fparams
            grid=(Kp // KB,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # canvas (stays in HBM)
            ],
            out_specs=pl.BlockSpec((max(KB, 8), _NS),
                                   lambda g, *_: (g * KB // max(KB, 8), 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, KB, WIN_X, WIN_Y), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, KB)),
            ],
        )
        return pl.pallas_call(
            _kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Kp, _NS), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * Kp * _NS * WIN_X * WIN_Y,
                bytes_accessed=Kp * (WIN_X * WIN_Y + _NS) * 4,
                transcendentals=0,
            ),
        )(nv, plane, srcj, ox, oy, oyl, hw, fparams, canvas)

    @core.def_vmap
    def _rule(axis_size, in_batched, nv, plane, srcj, ox, oy, oyl, hw,
              fparams, canvas):
        B = axis_size
        nv, plane, srcj, ox, oy, oyl, hw, fparams, canvas = tuple(
            a if b else jnp.broadcast_to(a, (B,) + a.shape)
            for a, b in zip((nv, plane, srcj, ox, oy, oyl, hw, fparams,
                             canvas), in_batched)
        )
        out = jnp.stack([
            core(nv[b], plane[b], srcj[b], ox[b], oy[b], oyl[b], hw[b],
                 fparams[b], canvas[b])
            for b in range(B)
        ])
        return out, True

    return core


def _run_head_srcj(kb: int, plane, ox, oy):
    """Within-chunk run-head slot for window-DMA dedup.

    srcj[i] = j-index (within i's kb-chunk) of the FIRST item of the
    maximal run of chunk-mates preceding i with the same (plane, ox,
    oy) window; == i % kb when i starts its own run (invalid slots
    always do — they never share).  The kernel issues one DMA per run
    head and every member reads the head's VMEM slot.  Effective on
    adjacent duplicates only: multi-orientation keypoints of one blob
    are emitted adjacent by compaction, and the caller can sort by
    window key to make cross-blob duplicates adjacent too
    (ops/frontend.py:_finish_extract).
    """
    idx = jnp.arange(plane.shape[0], dtype=jnp.int32)
    prev = lambda a: jnp.roll(a, 1)
    same = ((plane == prev(plane)) & (ox == prev(ox)) & (oy == prev(oy))
            & (plane >= 0) & (prev(plane) >= 0) & (idx % kb != 0))
    head = jax.lax.associative_scan(jnp.maximum, jnp.where(same, 0, idx))
    return (head - (idx // kb) * kb).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sample_patches_pallas(
    canvas: jnp.ndarray,      # [L*N_PHASE, Wc, Hc] bf16 (build_canvas)
    widths: jnp.ndarray,      # [L] i32 true mip widths
    heights: jnp.ndarray,     # [L] i32
    kx: jnp.ndarray,          # [K]
    ky: jnp.ndarray,
    ksize: jnp.ndarray,
    kangle_deg: jnp.ndarray,
    kvalid: jnp.ndarray,
    patch_scale_factor=C.DEFAULT_PATCH_SCALE_FACTOR,
    interpret: bool = False,
) -> jnp.ndarray:
    """[K, 32, 32] patches; same semantics as ops.descriptor.sample_patches."""
    if canvas.dtype != jnp.bfloat16:
        raise TypeError(
            f"canvas must be bfloat16 (see build_canvas), got {canvas.dtype}")
    K = kx.shape[0]
    Kp = _round_up(max(K, 8), max(KB, 8))
    L = canvas.shape[0] // N_PHASE   # true mip count
    psf = jnp.asarray(patch_scale_factor, jnp.float32)

    def pad(a):
        return jnp.pad(a, (0, Kp - K)) if Kp != K else a

    kx, ky, ksize, kangle_deg = map(pad, (kx, ky, ksize, kangle_deg))

    level, rem, px, py, ox, plane, oy, oyl = _window_geometry(
        L, kx, ky, ksize, psf)
    theta = jnp.deg2rad(kangle_deg)

    mw = widths[level]
    mh = heights[level]
    # skip sentinel: invalid/padding slots issue no DMA and run no
    # tent/matmul chain in the kernel (their output rows are arbitrary
    # and masked by kvalid below)
    plane = jnp.where(pad(kvalid), plane, -1)
    # belt-and-braces: valid keypoints are always in bounds (see
    # _phase_origin); clamp so degenerate inputs can never DMA
    # off-canvas (an OOB async copy is a worker-killing fault, not an
    # exception)
    ox = jnp.minimum(ox, canvas.shape[1] - WIN_X)
    oy = jnp.clip(oy, 0, canvas.shape[2] - WIN_Y)

    fparams = jnp.stack(
        [px, py, rem, jnp.cos(theta), jnp.sin(theta)], axis=0
    )  # [5, Kp] f32, scalar-prefetched (SMEM)
    hw = jnp.stack([mw, mh], axis=1).reshape(-1)  # [2Kp] interleaved w, h

    # last-valid frontier (index + 1): grid programs fully past it exit
    # after one compare (see _kernel); correct for any validity mask
    nv = jnp.max(jnp.where(
        plane >= 0, jnp.arange(1, Kp + 1, dtype=jnp.int32), 0),
        keepdims=True)
    # window-DMA dedup: computed from the CLAMPED origins (equal keys
    # must mean equal DMA source)
    srcj = _run_head_srcj(KB, plane, ox, oy)

    out = _sampler_core(interpret)(nv, plane, srcj, ox, oy, oyl, hw,
                                   fparams, canvas)

    patches = out[:K].reshape(K, _PS, _PS)
    return jnp.where(kvalid[:, None, None], patches, 0.0)
