"""Keypoint orientation assignment on TPU.

TPU-first redesign of shaders/keypoint_orientation.glsl: the GPU launches
one 16x16 workgroup per extremum with shared-memory histograms and atomic
keypoint append.  Here everything is batched over the fixed [F] filtered
blob slots: the 15x15 dilated neighborhoods become one flat gather from
the coarse stack, the 36-bin histograms a masked one-hot contraction, and
the multi-orientation append ("every local max >= 0.8 peak emits a
keypoint", keypoint_orientation.glsl:147-173) becomes a [F, 36] peak mask
compacted to [max_keypoints] slots by an order-preserving top_k — the
atomic-free TPU equivalent of stream compaction.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

_R = C.ORI_PATCH_RADIUS  # 7
_PS = 2 * _R + 1         # 15

# Window-DMA batching knob for the orientation arena kernel.  Read ONCE
# at import: the value is baked into every cached trace, so setting the
# env var after the first trace would silently do nothing — fail fast on
# nonsense instead.
_OWIN_KB = int(os.environ.get("LF_OWIN_KB", "16"))
if _OWIN_KB < 1:
    raise ValueError(f"LF_OWIN_KB must be >= 1, got {_OWIN_KB}")

# Fused orientation-histogram kernel (pallas/orihist.py): DMA + masks +
# gradients + binning in one kernel.  Default ON for the Pallas path;
# LF_ORI_FUSED=0 falls back to windows-fetch + XLA math (the A/B
# baseline).  Read once at import (baked into cached traces).
_ORI_FUSED = os.environ.get("LF_ORI_FUSED", "1") == "1"
# Lane-packed fused kernel (pallas/orihist.py:_kernel_packed): 8 items
# share every VPU instruction.  Values: 0 = per-item fused kernel,
# 1 = lane-packed v1 (196.8 fps vs 192.7 per-item vs 189.9 unfused,
# v5e 640x480 B=8), 2 = packed v2 (hoisted lane params + bins-major
# one-hot accumulation, pallas/orihist.py:_kernel_packed2).  Read once
# at import (baked into cached traces).
try:
    _ORI_PACKED = int(os.environ.get("LF_ORI_PACKED", "1"))
except ValueError:
    _ORI_PACKED = 1
# Static kill-switch for the big-blob (level >= _DECIM_LEVELS) gather
# fallback in the Pallas path: LF_ORI_BIGBLOB=0 makes big blobs yield
# empty histograms (no keypoints) instead of exact ones.  Measurement
# gate only — the fallback subgraph (~_BIG_CAP x 225 scalar gathers +
# two HIGHEST einsums) runs every frame whether or not big blobs
# exist, and this isolates its end-to-end cost.  Read once at import.
_ORI_BIGBLOB = os.environ.get("LF_ORI_BIGBLOB", "1") == "1"


class KeypointArrays(NamedTuple):
    """Fixed-capacity keypoints (one slot per (blob, orientation) pair)."""

    x: jnp.ndarray         # [K] f32
    y: jnp.ndarray         # [K] f32
    size: jnp.ndarray      # [K] f32
    angle: jnp.ndarray     # [K] f32 degrees
    response: jnp.ndarray  # [K] f32 (blob contrast)
    blob_idx: jnp.ndarray  # [K] i32 index into the blob slots
    valid: jnp.ndarray     # [K] bool
    n_total: jnp.ndarray   # [] i32 keypoints pre-capacity
    n_dropped: jnp.ndarray  # [] i32


_DECIM_LEVELS = 4   # phase-decimated plane canvases for levels 0..3
_BIG_CAP = 64       # gather-fallback capacity for level >= 4 blobs (rare)
_OWIN_H = 24        # window rows (15 + 8-row alignment slack, mult of 8)
_OWIN_W = 128       # window lanes (15 + x-phase-copy alignment slack)
_XPHASE = 2         # x-shifted copies per decimated plane
_XSTEP = 64         # lane shift between copies (2 * 64 = 128 = lane align)


def _gather_patches(coarse, xi, yi, level):
    """[F, 15, 15] dilated neighborhoods via XLA scalar gather (exact but
    ~10 ns/element on TPU — used on CPU and as the big-blob fallback)."""
    nC, H, W = coarse.shape
    F = xi.shape[0]
    step = jnp.left_shift(1, level)
    offs = jnp.arange(-_R, _R + 1, dtype=jnp.int32)
    x_img = xi[:, None] + offs[None, :] * step[:, None]
    y_img = yi[:, None] + offs[None, :] * step[:, None]
    xc = jnp.clip(x_img, 0, W - 1)
    yc = jnp.clip(y_img, 0, H - 1)
    flat_idx = (level[:, None, None] * (H * W)
                + yc[:, :, None] * W + xc[:, None, :])
    patch = jnp.take(coarse.reshape(-1), flat_idx.reshape(-1), axis=0)
    return patch.reshape(F, _PS, _PS)


def _gather_patches_mm(coarse, xi, yi, level):
    """[F, 15, 15] dilated neighborhoods for BIG blobs (level >=
    _DECIM_LEVELS) via one-hot selection matmuls.

    Exact same values as _gather_patches, but the ~F*225 scalar gathers
    (~100M elem/s on TPU — the measured 1.2 ms/batch fallback cost)
    become two MXU one-hot contractions: a [F*15, nBig*H] row pick from
    the big-level slab of the coarse stack, then a per-slot [W -> 15]
    column pick.  Only levels >= _DECIM_LEVELS are addressable (the
    contraction dim stays nBig*H, not nC*H); callers guarantee live
    slots satisfy that, and other slots' outputs are masked downstream.
    Precision.HIGHEST keeps the 0/1 selection exact (TPU default matmul
    precision rounds f32 operands to bf16).
    """
    nC, H, W = coarse.shape
    F = xi.shape[0]
    lv = jnp.clip(level, _DECIM_LEVELS, nC - 1)
    step = jnp.left_shift(1, lv)
    offs = jnp.arange(-_R, _R + 1, dtype=jnp.int32)
    x_img = jnp.clip(xi[:, None] + offs[None, :] * step[:, None], 0, W - 1)
    y_img = jnp.clip(yi[:, None] + offs[None, :] * step[:, None], 0, H - 1)
    nBig = nC - _DECIM_LEVELS
    row_idx = (lv - _DECIM_LEVELS)[:, None] * H + y_img      # [F, 15]
    Ry = (row_idx.reshape(-1)[:, None]
          == jnp.arange(nBig * H, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)                              # [F*15, nBig*H]
    rows = jnp.dot(Ry, coarse[_DECIM_LEVELS:].reshape(nBig * H, W),
                   precision=jax.lax.Precision.HIGHEST)      # [F*15, W]
    Cx = (jnp.arange(W, dtype=jnp.int32)[None, :, None]
          == x_img[:, None, :]).astype(jnp.float32)          # [F, W, 15]
    return jnp.einsum("frw,fwc->frc", rows.reshape(F, _PS, W), Cx,
                      precision=jax.lax.Precision.HIGHEST)   # [F, 15, 15]


def _phase_k_threshold() -> int:
    """x-phase copy selection boundary: copy 1 is used iff
    mod(xd - _R, 128) > 128 - _PS (window start too close to the lane
    boundary for the 15-col patch to fit below it; jnp.mod is
    non-negative, so xd - _R < 0 lands here too via mod in [121, 128)).
    Shared by _arena_offsets (traced) and _cell_w (static) — the two
    MUST agree or windows escape their plane cells."""
    return 128 - _PS


def _cell_w(Wl: int) -> int:
    """Tightest plane-cell width for a level with decimated width Wl:
    the max window end (ox + _OWIN_W) over every valid xd under the
    min-ox phase rule.  Static trace-time search — exact by
    construction, and pixel-exhaustively re-asserted by
    tests/test_orientation.py::test_arena_window_containment."""
    thr = _phase_k_threshold()
    mx = _OWIN_W
    for xd in range(Wl):
        basex = xd - _R
        if basex % 128 > thr or basex < 0:
            basex += _XSTEP
        mx = max(mx, (basex // 128) * 128 + _OWIN_W)
    return mx


def _decimated_canvases(coarse):
    """Per-level stacks of phase-decimated planes for levels
    0.._DECIM_LEVELS-1, with _XPHASE x-shifted copies of each plane:
    canvas_l[p*s*s + py*s + px][yd, xd + p*_XSTEP] =
        coarse[l][py+yd*s, px+xd*s],
    zero padded (= the reference's out-of-image zero fill).  The x-phase
    copies let the window fetch use a 128-lane window (one copy always
    puts the desired start with the whole patch below the next
    128-aligned offset), halving window-DMA bytes vs a single 256-lane
    window."""
    nC, H, W = coarse.shape
    out = []
    for l in range(min(_DECIM_LEVELS, nC)):
        sstep = 1 << l
        Hl, Wl = -(-H // sstep), -(-W // sstep)
        # Tight per-plane slack (the arena is HBM-traffic bound: its
        # construction measured 3.3 ms/8-frame batch at the loose
        # round-3 widths — the whole area is written every frame):
        # rows: oy = max8(yd - _R) <= Hl - 8, window end oy + _OWIN_H
        #   <= Hl + _OWIN_H - 8;
        # cols: exact max window end under the min-ox phase rule
        #   (_cell_w): x_local is allowed up to 128 - _PS, so the
        #   common case keeps ox one 128-granule lower than the old
        #   "x_local < _XSTEP" rule and the cell sheds 128-256 lanes
        #   per level (e.g. 640x480: level-3 cells 384 -> 128 lanes).
        #   Phase-copy-1 content past Wc is truncated below — provably
        #   unread: _cell_w maximizes over the same rule that decides
        #   when copy 1 is fetched.
        # Both bounds are asserted pixel-exhaustively by
        # tests/test_orientation.py::test_arena_window_containment.
        Hc = -(-(Hl + _OWIN_H - 8) // 8) * 8
        Wc = _cell_w(Wl)
        c = jnp.pad(coarse[l], ((0, Hl * sstep - H), (0, Wl * sstep - W)))
        if sstep == 1:
            d = c[None]
        else:
            # phase decimation as one-hot selection MATMULS (the MXU is
            # idle here): d[py*s+px] = Ay_py @ c @ Bx_px with
            # Ay_py[yd, yd*s+py] = 1, Bx_px[xd*s+px, xd] = 1.  Both the
            # reshape(Hl,s,Wl,s).transpose(1,3,0,2) form and a strided
            # one-hot conv lower to interleaved relayouts/gathers the
            # TPU executes ~10 ms/batch slow (measured end to end);
            # one-hot matmuls are ~0.5 GMAC here — microseconds on the
            # MXU.  Precision.HIGHEST keeps the 0/1 selection exact.
            hi = jnp.arange(Hl)
            wi = jnp.arange(Wl)
            Ay = (hi[None, :, None] * sstep + jnp.arange(sstep)[:, None, None]
                  == jnp.arange(Hl * sstep)[None, None, :]
                  ).astype(jnp.float32)            # [s, Hl, Hl*s]
            Bx = (wi[None, None, :] * sstep + jnp.arange(sstep)[:, None, None]
                  == jnp.arange(Wl * sstep)[None, :, None]
                  ).astype(jnp.float32)            # [s, Wl*s, Wl]
            hp = jax.lax.Precision.HIGHEST
            rows = jnp.einsum("phy,yx->phx", Ay, c, precision=hp)
            d = jnp.einsum("phx,qxw->pqhw", rows, Bx, precision=hp)
            d = d.reshape(sstep * sstep, Hl, Wl)
        copies = []
        for p in range(_XPHASE):
            keep = min(Wl, Wc - p * _XSTEP)  # truncate unread overflow
            copies.append(jnp.pad(
                d[:, :, :keep],
                ((0, 0), (0, Hc - Hl), (p * _XSTEP, Wc - keep - p * _XSTEP))))
        out.append(jnp.concatenate(copies, axis=0))
    return tuple(out)


def _arena_canvas(coarse):
    """One tall 2-D arena holding every phase-decimated plane of every
    level, planes packed into row-bands of `ncol` side-by-side columns
    and zero-padded to a common width.

    Folding the plane AND level selection into (row, col) offsets lets
    the window fetch run as a single-canvas kernel: one `sel >= 0`
    predicate per DMA instead of a 4-way canvas dispatch per item — the
    fetch is scalar-issue-bound, so predication count is the cost that
    matters.  Column packing keeps the deeper levels (whose planes are
    narrow but numerous — 4^l * XPHASE of them) from inflating the
    arena ~(Wa/Wc_l)x when the image is wide.

    Returns (arena[1, Ha, Wa], layout) with layout[l] =
    (row_base, plane_h, ncol, col_w): plane p of level l lives at
    rows [row_base + (p // ncol) * plane_h, ...) and cols
    [(p % ncol) * col_w, ...).  col_w is a multiple of 128 and each
    plane keeps >= OWIN_H rows / >= OWIN_W lanes of zero padding inside
    its own cell (see _decimated_canvases), so clamped windows never
    cross into a neighboring plane.
    """
    canvases = _decimated_canvases(coarse)
    # Arena width: any Wa >= max plane width works; wider arenas pack
    # more deep-level planes side by side (ncol = Wa // Wc), trading
    # row count against lane waste.  The arena is written (and its
    # zero fill paid) every frame, so pick the Wa minimizing total
    # AREA by direct search over 128-lane candidates (static, trace
    # time only).  At 640x480 this roughly halves the arena vs
    # Wa = max(Wc).
    Wmin = max(c.shape[2] for c in canvases)

    def _area(wa):
        rows = 0
        for c in canvases:
            P, Hc, Wc = c.shape
            rows += -(-P // max(1, wa // Wc)) * Hc
        return rows * wa

    Wa = min((-(-Wmin // 128) * 128 + 128 * i for i in range(17)),
             key=_area)
    strips = []
    layout = []
    acc = 0
    for c in canvases:
        P, Hc, Wc = c.shape
        ncol = max(1, Wa // Wc)
        nrow = -(-P // ncol)
        pad_p = nrow * ncol - P
        grid = jnp.pad(c, ((0, pad_p), (0, 0), (0, 0)))
        # [nrow, ncol, Hc, Wc] -> [nrow*Hc, ncol*Wc]: column j gets
        # planes p with p % ncol == j, stacked vertically.  Built from
        # static per-column slices + an axis-1 concat — identical
        # layout to reshape(nrow, ncol, Hc, Wc).transpose(0, 2, 1, 3)
        # but with no 4-D relayout (the transpose materialized the
        # full ~50 MB/frame arena through a slow interleave pass).
        grid = grid.reshape(nrow, ncol, Hc, Wc)
        cols = [grid[:, j].reshape(nrow * Hc, Wc) for j in range(ncol)]
        grid = cols[0] if ncol == 1 else jnp.concatenate(cols, axis=1)
        strips.append(jnp.pad(grid, ((0, 0), (0, Wa - ncol * Wc))))
        layout.append((acc, Hc, ncol, Wc))
        acc += nrow * Hc
    return jnp.concatenate(strips, axis=0)[None], tuple(layout)


def _arena_offsets(coarse, xi, yi, level, bvalid):
    """Window-fetch coordinates into the plane arena for each blob slot.

    Returns (arena, sel, plane0, oy_glob, ox_glob, y_local, x_local):
    the fetch_windows_multi arguments plus the in-window coordinates of
    the 15x15 patch origin.  Shared by the production path and the
    stage profiler (scripts/profile_pallas.py) so the two cannot drift.
    """
    arena, layout = _arena_canvas(coarse)
    _probe = os.environ.get("LF_PROBE_ARENA2", "0")
    if _probe == "1":
        # measurement-only: build the arena a second time from perturbed
        # input (no CSE) and fold it in at zero weight — the bench delta
        # vs default is the marginal arena-construction cost
        arena2, _ = _arena_canvas(coarse * (1.0 + 1e-7))
        arena = arena + 0.0 * arena2
    elif _probe == "2":
        # decimation-only marginal (no packing): splits the arena cost
        # between _decimated_canvases and the strip/concat packing
        cs = _decimated_canvases(coarse * (1.0 + 1e-7))
        arena = arena + 0.0 * sum(jnp.sum(c) for c in cs)

    lv = jnp.minimum(level, _DECIM_LEVELS - 1)
    sstep = jnp.left_shift(1, lv)
    plane = jnp.mod(yi, sstep) * sstep + jnp.mod(xi, sstep)
    yd = jnp.right_shift(yi, lv)
    xd = jnp.right_shift(xi, lv)
    oy = jnp.maximum(((yd - _R) // 8) * 8, 0)
    # x-phase selection, min-ox rule: stay on copy 0 (k=0) whenever the
    # whole 15-col patch fits below the next 128-aligned boundary
    # (x_local <= 128 - _PS); shift to copy 1 only when it does not —
    # including basex < 0, where jnp.mod lands in [121, 128).  Keeping
    # ox one granule lower than the old "x_local < _XSTEP" rule is what
    # lets _cell_w shed 128-256 lanes per plane cell (arena area — and
    # its per-frame construction traffic — roughly halves at 640x480).
    basex = xd - _R
    k = (jnp.mod(basex, 128) > _phase_k_threshold()).astype(jnp.int32)
    shifted = basex + _XSTEP * k
    ox = (shifted // 128) * 128
    plane = k * sstep * sstep + plane
    # level -> arena cell: arithmetic 4-way selects (no gather); row
    # terms are multiples of 8 and col terms multiples of 128, so the
    # DMA alignment hints stay truthful
    pick = lambda f: sum(jnp.where(lv == l, jnp.int32(f(layout[l])), 0)
                         for l in range(len(layout)))
    base = pick(lambda t: t[0])
    ph = pick(lambda t: t[1])
    ncol = pick(lambda t: t[2])
    colw = pick(lambda t: t[3])
    oy_glob = base + (plane // ncol) * ph + oy
    ox_glob = (plane % ncol) * colw + ox
    sel = jnp.where(bvalid, 0, -1)
    return (arena, sel, jnp.zeros_like(plane), oy_glob, ox_glob,
            yd - _R - oy, shifted - ox)


def _sample_ori_patches_pallas(coarse, xi, yi, level, bvalid,
                               interpret=False):
    """[F, 15, 15] neighborhoods via a phase-decimated plane arena +
    Pallas window DMA + batched one-hot extraction matmuls.

    Invalid slots pass the sel=-1 sentinel so the kernel skips their
    DMAs entirely (the fetch is per-descriptor latency-bound, and at
    capacity padding typically >half the slots are invalid); their
    window contents are arbitrary and masked downstream via bvalid.

    Levels >= _DECIM_LEVELS (blob radius >= ~19 px — rare) fall back to
    the scalar gather on up to _BIG_CAP compacted slots; big blobs past
    that capacity yield empty histograms (and thus no keypoints).
    """
    from ..pallas.windows import fetch_windows_multi

    nC, H, W = coarse.shape
    F = xi.shape[0]
    (arena, sel, plane0, oy_glob, ox,
     y_local, x_local) = _arena_offsets(coarse, xi, yi, level, bvalid)

    win = fetch_windows_multi((arena,), sel, plane0, oy_glob, ox,
                              win_h=_OWIN_H, win_w=_OWIN_W,
                              kb=_OWIN_KB,
                              interpret=interpret)        # [F, 24, 128]

    # batched one-hot extraction: patch[f, r, c] = win[f, yl+r, xl+c].
    # Precision.HIGHEST keeps the 0/1 selection exact (the TPU default
    # matmul precision would round the window values to bf16).
    # y_local in [-_R, 8) (negative at the clamped top edge — those
    # rows zero-fill via the one-hot no-match); x_local in
    # [0, 128 - _PS] under the min-ox phase rule (_arena_offsets) —
    # do NOT shrink Bx below the full _OWIN_W columns
    rows = jnp.arange(_OWIN_H, dtype=jnp.int32)
    cols = jnp.arange(_OWIN_W, dtype=jnp.int32)
    r15 = jnp.arange(_PS, dtype=jnp.int32)
    By = (rows[None, None, :] == (y_local[:, None] + r15[None, :])[..., None]
          ).astype(jnp.float32)                             # [F, 15, 24]
    Bx = (cols[None, :, None] == (x_local[:, None] + r15[None, :])[:, None, :]
          ).astype(jnp.float32)                             # [F, 128, 15]
    patch = jnp.einsum("fri,fij,fjc->frc", By, win, Bx,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)  # [F, 15, 15]

    # big-blob fallback (level >= _DECIM_LEVELS): exact gather on a
    # compacted subset.  Statically dead only when the scale space is
    # so shallow (nC <= _DECIM_LEVELS, i.e. n_scales <= 1) that the
    # nC-1 level clip makes levels >= _DECIM_LEVELS unreachable.  At
    # the default n_scales=4 (nC=7) the fallback IS live and runs every
    # frame; its cost is bounded by the _BIG_CAP compaction.
    if nC <= _DECIM_LEVELS or not _ORI_BIGBLOB:
        return patch
    big = level >= _DECIM_LEVELS
    cap = min(_BIG_CAP, F)
    score = jnp.where(big, F - jnp.arange(F, dtype=jnp.int32), 0)
    top_s, bidx = jax.lax.top_k(score, cap)
    slot_valid = top_s > 0
    patch_big_c = _gather_patches_mm(coarse, xi[bidx], yi[bidx], level[bidx])
    scatter = ((bidx[None, :] == jnp.arange(F)[:, None]) & slot_valid[None, :]
               ).astype(jnp.float32)                        # [F, cap]
    patch_big = jnp.einsum("fs,src->frc", scatter, patch_big_c,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    return jnp.where(big[:, None, None], patch_big, patch)


def gradient_bin(gx, gy):
    """36-sector orientation bin == round(atan2(gy, gx) * 36/2pi) mod 36,
    transcendental-free (Mosaic TPU has no atan2 lowering; the reference
    bins through an atan2 POLYNOMIAL, vulkan/shaders/atan2.glsl +
    keypoint_orientation.glsl:102-104, so exact sector membership is at
    least as faithful as any approximation).

    Half-plane construction: boundaries lie at a_k = (k - 0.5) * 10 deg,
    k = 1..18 (the negative half mirrors).  For theta in (-pi, pi]:
        signed = sum_k [theta >= a_k] - sum_k [theta <= -a_k]
    where [theta >= a_k] = (gy >= 0) & (cos(a_k) gy - sin(a_k) gx >= 0)
    and   [theta <= -a_k] = (gy < 0) & (cos(a_k) gy + sin(a_k) gx <= 0),
    each a single f32 cross-product sign.  The 18 steps are unrolled so
    the SAME op sequence runs in XLA and inside the Pallas kernel.

    Exact-diagonal gradients (|gx| == |gy|, common on integer-ish image
    data) land exactly ON the +-45/+-135 deg boundaries, where the f32
    atan2 product hits 4.5/13.5 and banker's rounding decides; they are
    overridden explicitly to the values the previous XLA-f32 atan2 path
    produced (4 / 14 / 32 / 22), keeping golden == XLA == Pallas
    bit-exact.  Ties elsewhere require an f32 cross-product to round to
    exactly 0 — the same measure-zero ambiguity the old NumPy-vs-XLA
    atan2 pair already carried (those two in fact DISAGREED at exact
    -+135 diagonals through f64-promotion quirks; this rule supersedes
    both with one shared definition).
    """
    pos = gy >= 0.0
    neg = jnp.logical_not(pos)
    b = jnp.zeros(jnp.broadcast_shapes(gx.shape, gy.shape), jnp.int32)
    one = jnp.int32(1)
    zero = jnp.int32(0)
    for k in range(18):
        ck = float(C.ORI_BIN_BOUND_COS[k])
        sk = float(C.ORI_BIN_BOUND_SIN[k])
        b = b + jnp.where(pos & (ck * gy - sk * gx >= 0.0), one, zero)
        b = b - jnp.where(neg & (ck * gy + sk * gx <= 0.0), one, zero)
    b = jnp.where(b < 0, b + C.N_ORI_BINS, b)
    diag = (jnp.abs(gx) == jnp.abs(gy)) & (gx != 0.0)
    bdiag = jnp.where(pos, jnp.where(gx > 0.0, 4, 14),
                      jnp.where(gx > 0.0, 32, 22))
    return jnp.where(diag, bdiag, b)


def _raw_hist_from_patches(patch, valid_px, step, radius, sigma, bvalid):
    """[F, 36] raw orientation histogram from masked [F, 15, 15]
    patches (the XLA math; the fused kernel reproduces it in-kernel —
    pallas/orihist.py keeps a pointer back here for parity)."""
    offs = jnp.arange(-_R, _R + 1, dtype=jnp.int32)
    # central-difference gradients on the interior 13x13
    gx = patch[:, 1:-1, 2:] - patch[:, 1:-1, :-2]
    gy = patch[:, :-2, 1:-1] - patch[:, 2:, 1:-1]

    ioffs = offs[1:-1].astype(jnp.float32)                # [-6..6]
    dx = ioffs[None, :] * step[:, None].astype(jnp.float32)  # [F, 13]
    dy = dx
    in_grad = ((jnp.abs(dx) <= radius[:, None])[:, None, :]
               & (jnp.abs(dy) <= radius[:, None])[:, :, None]
               & valid_px[:, 1:-1, 1:-1])
    contrib_mask = (in_grad & ((gx != 0.0) | (gy != 0.0))
                    & bvalid[:, None, None])

    mag = jnp.sqrt(gx * gx + gy * gy)
    dist = dx[:, None, :] ** 2 + dy[:, :, None] ** 2
    weight = jnp.exp(-dist / (2.0 * sigma * sigma)[:, None, None])
    contrib = jnp.where(contrib_mask, weight * mag, 0.0)  # [F, 13, 13]

    b = gradient_bin(gx, gy)

    onehot = (b[..., None] == jnp.arange(C.N_ORI_BINS)[None, None, None, :])
    return jnp.sum(contrib[..., None] * onehot, axis=(1, 2))  # [F, 36]


def _fused_hist(coarse, xi, yi, level, bvalid, radius, sigma, h_act, w_act,
                interpret):
    """[F, 36] raw histograms via the fused Pallas kernel (decimated
    levels only — big blobs handled by the caller's fallback merge)."""
    from ..pallas.orihist import (fetch_histograms, fetch_histograms_packed,
                                  fetch_histograms_packed2)
    if _ORI_PACKED == 2:
        fetch_histograms = fetch_histograms_packed2
    elif _ORI_PACKED:
        fetch_histograms = fetch_histograms_packed

    (arena, sel, plane0, oy_glob, ox,
     y_local, x_local) = _arena_offsets(coarse, xi, yi, level, bvalid)
    step = jnp.left_shift(1, jnp.minimum(level, _DECIM_LEVELS - 1))
    f32 = lambda a: a.astype(jnp.float32)
    fparams = jnp.stack([
        f32(y_local), f32(x_local), f32(xi), f32(yi), f32(step),
        radius, -1.0 / jnp.maximum(2.0 * sigma * sigma, 1e-20),
        jnp.broadcast_to(jnp.asarray(w_act, jnp.float32), xi.shape),
        jnp.broadcast_to(jnp.asarray(h_act, jnp.float32), xi.shape),
    ])                                                    # [9, F]
    return fetch_histograms(arena, sel, oy_glob, ox, fparams,
                            interpret=interpret)


def orientation_histograms(
    coarse: jnp.ndarray,
    bx: jnp.ndarray,
    by: jnp.ndarray,
    bsize: jnp.ndarray,
    bvalid: jnp.ndarray,
    use_pallas: bool = False,
    interpret: bool = False,
    extent=None,
):
    """Peak orientations for each blob slot.

    Returns (angles[F, 36] degrees, peak_mask[F, 36]).

    `extent` = traced (h, w) actual image extent (pad-to-max mode): the
    out-of-image zero-fill mask is evaluated against it, so patch
    pixels beyond the actual border contribute nothing — exactly the
    reference's out-of-image semantics at the true image size.  Window
    fetches may read (finite) pad content; it is masked here before the
    gradient math.
    """
    nC, H, W = coarse.shape
    F = bx.shape[0]

    level = jnp.round(jnp.log2(
        bsize / (C.DOG_FIRST_SCALE_SIGMA * C.DOG_SIGMA_RADIUS_FACTOR)))
    level = jnp.clip(level, 0, nC - 1).astype(jnp.int32)
    step = jnp.left_shift(1, level)                       # [F]
    radius = jnp.round(C.ORI_RADIUS_FACTOR * bsize / C.DOG_SIGMA_RADIUS_FACTOR)
    sigma = C.ORI_SIGMA_FACTOR * bsize / C.DOG_SIGMA_RADIUS_FACTOR

    xi = jnp.floor(bx).astype(jnp.int32)
    yi = jnp.floor(by).astype(jnp.int32)

    offs = jnp.arange(-_R, _R + 1, dtype=jnp.int32)       # [15]
    x_img = xi[:, None] + offs[None, :] * step[:, None]   # [F, 15]
    y_img = yi[:, None] + offs[None, :] * step[:, None]
    h_act = H if extent is None else extent[0]
    w_act = W if extent is None else extent[1]
    vx = (x_img >= 0) & (x_img < w_act)
    vy = (y_img >= 0) & (y_img < h_act)
    valid_px = vx[:, None, :] & vy[:, :, None]            # [F, 15, 15]

    if use_pallas and _ORI_FUSED:
        # fused kernel: window DMA + masks + gradients + binning all in
        # one Pallas kernel (pallas/orihist.py) — the [F,169,36] one-hot
        # bin contraction alone cost ~4.5 ms/batch in XLA
        raw_hist = _fused_hist(coarse, xi, yi, level, bvalid, radius,
                               sigma, h_act, w_act, interpret)
        # big-blob fallback (level >= _DECIM_LEVELS): gather + XLA math
        # on a compacted subset, merged by slot.  Statically dead only
        # when nC <= _DECIM_LEVELS (n_scales <= 1, level clipped to
        # nC-1 < _DECIM_LEVELS); at the default n_scales=4 (nC=7) big
        # blobs ARE reachable and this subgraph runs every frame,
        # bounded by the _BIG_CAP compaction.
        if nC > _DECIM_LEVELS and _ORI_BIGBLOB:
            big = level >= _DECIM_LEVELS
            cap = min(_BIG_CAP, F)
            score = jnp.where(big & bvalid,
                              F - jnp.arange(F, dtype=jnp.int32), 0)
            top_s, bidx = jax.lax.top_k(score, cap)
            slot_valid = top_s > 0
            patch_c = _gather_patches_mm(coarse, xi[bidx], yi[bidx],
                                         level[bidx])
            vp_c = jax.tree.map(lambda a: a[bidx], valid_px)
            patch_c = jnp.where(vp_c & slot_valid[:, None, None],
                                patch_c, 0.0)
            hist_c = _raw_hist_from_patches(
                patch_c, vp_c, step[bidx], radius[bidx], sigma[bidx],
                slot_valid)                                 # [cap, 36]
            scatter = ((bidx[None, :] == jnp.arange(F)[:, None])
                       & slot_valid[None, :]).astype(jnp.float32)
            raw_big = jnp.einsum("fs,sb->fb", scatter, hist_c,
                                 precision=jax.lax.Precision.HIGHEST)
            raw_hist = jnp.where(big[:, None], raw_big, raw_hist)
        raw_hist = jnp.where(bvalid[:, None], raw_hist, 0.0)
    else:
        if use_pallas:
            patch = _sample_ori_patches_pallas(coarse, xi, yi, level,
                                               bvalid, interpret)
        else:
            patch = _gather_patches(coarse, xi, yi, level)
        # mask BEFORE the gradient math: out-of-image pixels become the
        # reference's zero fill, and skipped-DMA windows (invalid slots)
        # can hold arbitrary scratch values incl. NaN
        patch = jnp.where(valid_px & bvalid[:, None, None], patch, 0.0)
        raw_hist = _raw_hist_from_patches(patch, valid_px, step, radius,
                                          sigma, bvalid)

    # circular [1,4,6,4,1]/16 smoothing
    r = lambda s: jnp.roll(raw_hist, s, axis=-1)
    hist = ((r(2) + r(-2)) * (1.0 / 16.0)
            + (r(1) + r(-1)) * (4.0 / 16.0)
            + raw_hist * (6.0 / 16.0))

    left = jnp.roll(hist, 1, axis=-1)
    right = jnp.roll(hist, -1, axis=-1)
    thresh = jnp.max(hist, axis=-1, keepdims=True) * C.ORI_PEAK_RATIO
    peak = (left < hist) & (right < hist) & (hist >= thresh) & bvalid[:, None]

    denom = left - 2.0 * hist + right
    interp = jnp.where(peak, (left - right) / jnp.where(denom == 0, 1.0, denom), 0.0)
    bin_f = jnp.arange(C.N_ORI_BINS, dtype=jnp.float32)[None, :] + interp / 2.0
    bin_f = jnp.where(bin_f < 0, bin_f + C.N_ORI_BINS, bin_f)
    bin_f = jnp.where(bin_f > C.N_ORI_BINS, bin_f - C.N_ORI_BINS, bin_f)
    angles = 360.0 - (360.0 / C.N_ORI_BINS) * bin_f
    return angles, peak


def keypoints_from_blobs(
    coarse: jnp.ndarray,
    blobs,
    max_keypoints: int,
    use_pallas: bool = False,
    interpret: bool = False,
    extent=None,
) -> KeypointArrays:
    """Assign orientations and compact (blob, peak) pairs into keypoint slots.

    Order-preserving compaction: keypoint slots are filled in
    (blob, bin) lexical order via top_k on a descending index score —
    deterministic, unlike the reference's atomic append order.
    """
    angles, peak = orientation_histograms(
        coarse, blobs.x, blobs.y, blobs.size, blobs.valid,
        use_pallas=use_pallas, interpret=interpret, extent=extent,
    )
    F = angles.shape[0]
    n_flat = F * C.N_ORI_BINS
    flat_peak = peak.reshape(-1)
    n_total = jnp.sum(flat_peak, dtype=jnp.int32)

    score = jnp.where(flat_peak, n_flat - jnp.arange(n_flat, dtype=jnp.int32), 0)
    # flat top_k measured EQUAL to a hierarchical two-level compaction
    # here (242.7 vs 243.6 fps end-to-end, round 4) — [F*36] = 72k
    # elements is below the ~2M scale where chunking pays (detect.py)
    top_score, top_idx = jax.lax.top_k(score, max_keypoints)
    kp_valid = top_score > 0
    blob_idx = top_idx // C.N_ORI_BINS

    pick = lambda a: a[blob_idx]
    return KeypointArrays(
        x=pick(blobs.x),
        y=pick(blobs.y),
        size=pick(blobs.size),
        angle=angles.reshape(-1)[top_idx],
        response=pick(blobs.contrast),
        blob_idx=blob_idx,
        valid=kp_valid,
        n_total=n_total,
        n_dropped=jnp.maximum(n_total - max_keypoints, 0),
    )
