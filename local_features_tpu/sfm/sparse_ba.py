"""Sparse, map-block-partitioned bundle adjustment (BASELINE.md config 5).

The dense formulation (ba.py / distributed.py) stores observations as a
[C, P] visibility mask — at 10k cameras x 1e5 landmarks the mask alone
is 1e9 entries, so it cannot be sharded out of memory, only OOM'd.  This
module is the at-scale formulation.  Reference counterpart: none (the
reference has no SfM layer); this is north-star scope.

TPU-first design — three ideas:

1. TRACK-BLOCKED STORAGE.  Observations live in fixed-capacity blocks
   keyed by track (landmark), not by (camera, landmark) pair:
   uv [B, T, K, 2], cam [B, T, K], X [B, T, 3] — B map blocks of T track
   slots with at most K observations each.  The landmark half of the
   normal equations (V_p, g_p, the landmark update) then needs NO
   scatter at all: every per-track quantity is a masked reduction over
   the K axis of its own block.  Scatter/gather — the TPU's weakest
   primitives — never touch per-observation data.

2. CAMERA-WINDOWED ONE-HOT MATMULS.  Each map block covers a contiguous
   camera window [win_start, win_start + c_win) (its own keyframes plus
   halo; odometry tracks are temporally local, so K-frame tracks fit a
   c_blk + 2*halo window).  Every camera-indexed operation — selecting
   poses per observation, accumulating U_c / g_c / Schur terms per
   camera — becomes a [T*K, c_win] one-hot matmul against the window
   (MXU work, Precision.HIGHEST for exact selection), followed by a
   static-shape window accumulation into the global [C, ...] arrays.
   Long-range (loop-closure) constraints are handled upstream at the
   Sim(3) pose-graph level (sfm/loops.py, sfm/sim3.py), which is where
   this framework closes loops; BA refines geometry inside and across
   adjacent windows.

3. ITERATIVE CAMERA SOLVE.  The reduced camera system S d = rhs is
   solved by block-Jacobi-preconditioned conjugate gradients with the
   Schur complement applied IMPLICITLY: S x = (U + lam) x - sum_p W_p
   V_p^-1 W_p^T x, each term a block-local einsum + window accumulation
   + psum.  No [C*6, C*6] dense matrix ever exists, so the camera count
   is bounded by [C, 6] vectors, not C^2 blocks.

Sharding: the block axis B is sharded over the mesh (map partitioning);
camera-side reductions ride the mesh axis as psums (ICI within a host,
DCN across hosts via parallel/multihost.py's hybrid mesh).  Landmark
state stays device-local forever.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ba import BAResult, BAState
from .geometry import hat, se3_retract

_HI = jax.lax.Precision.HIGHEST


class TrackBlocks(NamedTuple):
    """Fixed-capacity sparse observation storage (see module docstring).

    B = map blocks, T = track slots per block, K = obs slots per track.
    `cam` holds WINDOW-LOCAL camera indices (global = win_start[b] + cam);
    invalid obs/track slots are masked by `valid` / `tvalid` and carry
    in-range dummy indices (0).
    """

    uv: jnp.ndarray         # [B, T, K, 2] f32 pixel observations
    cam: jnp.ndarray        # [B, T, K] i32 window-local camera index
    valid: jnp.ndarray      # [B, T, K] bool
    X: jnp.ndarray          # [B, T, 3] f32 landmark positions
    tvalid: jnp.ndarray     # [B, T] bool track slot in use
    win_start: jnp.ndarray  # [B] i32 global index of window camera 0
    # sqrt-information weight per obs slot (default 1): a slot holding
    # the MERGED mean of n raw observations carries sqrt(n) — see
    # tracks.build_track_blocks_flat(subsample="merge")
    wobs: jnp.ndarray | None = None


class SparseBAResult(NamedTuple):
    R: jnp.ndarray            # [C, 3, 3]
    t: jnp.ndarray            # [C, 3]
    blocks: TrackBlocks       # X updated
    cost: jnp.ndarray         # masked mean squared reprojection error
    cost_history: jnp.ndarray  # [n_iters]


def build_track_blocks(
    track_cams: list[np.ndarray],
    track_uvs: list[np.ndarray],
    track_X: np.ndarray,
    n_cameras: int,
    c_blk: int = 32,
    halo: int = 16,
    max_obs: int = 8,
    block_capacity: int | None = None,
    n_blocks_multiple: int = 1,
) -> tuple[TrackBlocks, int, dict]:
    """Host-side builder: ragged track lists -> fixed TrackBlocks.

    track_cams[i]: [k_i] global camera ids of track i (sorted);
    track_uvs[i]: [k_i, 2]; track_X: [n_tracks, 3] initial positions.
    A track is assigned to the map block of its FIRST camera; its
    observations outside the block's camera window are dropped (counted
    in stats) — by construction of windowed odometry they are rare, and
    long-range constraints belong to the pose graph, not BA.

    Returns (blocks, c_win, stats).  Block/track capacities are padded
    to static shapes; n_blocks is padded to a multiple of
    `n_blocks_multiple` (set it to the mesh axis size).
    """
    c_win = c_blk + 2 * halo
    c_win = min(c_win, n_cameras)
    n_blocks = max(1, -(-n_cameras // c_blk))
    n_blocks = -(-n_blocks // n_blocks_multiple) * n_blocks_multiple

    per_block: list[list[int]] = [[] for _ in range(n_blocks)]
    for i, cams in enumerate(track_cams):
        if len(cams) == 0:
            continue
        b = min(int(cams[0]) // c_blk, n_blocks - 1)
        per_block[b].append(i)

    T = block_capacity or max(1, max(len(p) for p in per_block))
    K = max_obs
    uv = np.zeros((n_blocks, T, K, 2), np.float32)
    cam = np.zeros((n_blocks, T, K), np.int32)
    valid = np.zeros((n_blocks, T, K), bool)
    X = np.zeros((n_blocks, T, 3), np.float32)
    tvalid = np.zeros((n_blocks, T), bool)
    win_start = np.zeros((n_blocks,), np.int32)
    dropped_obs = 0
    dropped_tracks = 0
    for b in range(n_blocks):
        ws = int(np.clip(b * c_blk - halo, 0, n_cameras - c_win))
        win_start[b] = ws
        for s, i in enumerate(per_block[b]):
            if s >= T:
                dropped_tracks += len(per_block[b]) - T
                break
            cams = np.asarray(track_cams[i])
            uvs = np.asarray(track_uvs[i], np.float32)
            keep = (cams >= ws) & (cams < ws + c_win)
            dropped_obs += int((~keep).sum())
            cams, uvs = cams[keep][:K], uvs[keep][:K]
            dropped_obs += max(len(np.asarray(track_cams[i])[keep]) - K, 0)
            k = len(cams)
            if k < 2:          # a <2-view track constrains nothing
                dropped_tracks += 1
                continue
            uv[b, s, :k] = uvs
            cam[b, s, :k] = cams - ws
            valid[b, s, :k] = True
            X[b, s] = track_X[i]
            tvalid[b, s] = True

    blocks = TrackBlocks(
        uv=jnp.asarray(uv), cam=jnp.asarray(cam), valid=jnp.asarray(valid),
        X=jnp.asarray(X), tvalid=jnp.asarray(tvalid),
        win_start=jnp.asarray(win_start),
    )
    stats = {"n_blocks": n_blocks, "capacity": T, "c_win": c_win,
             "dropped_obs": dropped_obs, "dropped_tracks": dropped_tracks}
    return blocks, c_win, stats


def triangulate_blocks(R, t, blocks: TrackBlocks, intr, c_win):
    """[B, T, 3] multiview DLT re-triangulation of every track given
    the cameras — batched over all blocks/tracks at once.

    Each observation contributes two linear rows
      (x * r3 - r1) X = t1 - x * t3,  (y * r3 - r2) X = t2 - y * t3
    in normalized coords; the masked 3x3 normal equations are
    accumulated over the K axis (track-blocked storage needs no
    scatter).  Used to (re)initialize structure from chained pose
    estimates — per-pair triangulation at consecutive-frame baselines
    is depth-noisy, while a track's window spans a real baseline.
    """
    w = (blocks.valid & blocks.tvalid[..., None]).astype(jnp.float32)
    onehot = (blocks.cam[..., None]
              == jnp.arange(c_win, dtype=jnp.int32)).astype(jnp.float32)
    onehot = onehot * w[..., None]
    R_win = _window_slice(R, blocks.win_start, c_win)
    t_win = _window_slice(t, blocks.win_start, c_win)
    R_sel = jnp.einsum("btkw,bwij->btkij", onehot, R_win, precision=_HI)
    t_sel = jnp.einsum("btkw,bwi->btki", onehot, t_win, precision=_HI)

    if blocks.wobs is not None:
        # merged observations weigh their DLT rows by sqrt(n) (the
        # normal equations then carry n, matching the BA weighting)
        w = w * blocks.wobs
    xn = (blocks.uv[..., 0] - intr[2]) / intr[0]
    yn = (blocks.uv[..., 1] - intr[3]) / intr[1]
    r1, r2, r3 = R_sel[..., 0, :], R_sel[..., 1, :], R_sel[..., 2, :]
    t1, t2, t3 = t_sel[..., 0], t_sel[..., 1], t_sel[..., 2]
    A1 = (xn[..., None] * r3 - r1) * w[..., None]       # [B,T,K,3]
    A2 = (yn[..., None] * r3 - r2) * w[..., None]
    b1 = (t1 - xn * t3) * w
    b2 = (t2 - yn * t3) * w
    AtA = (jnp.einsum("btki,btkj->btij", A1, A1, precision=_HI)
           + jnp.einsum("btki,btkj->btij", A2, A2, precision=_HI))
    Atb = (jnp.einsum("btki,btk->bti", A1, b1, precision=_HI)
           + jnp.einsum("btki,btk->bti", A2, b2, precision=_HI))
    X = jnp.linalg.solve(AtA + 1e-8 * jnp.eye(3), Atb[..., None])[..., 0]
    # fall back to the existing init where the system is degenerate
    bad = (~jnp.isfinite(X).all(-1)) | (~blocks.tvalid)
    return jnp.where(bad[..., None], blocks.X, X)


def filter_block_outliers(R, t, blocks: TrackBlocks, intr, c_win,
                          max_px: float = 20.0,
                          min_depth_frac: float = 0.01):
    """Drop observations whose reprojection residual at the CURRENT
    estimate exceeds `max_px`, then drop tracks left with < 2
    observations.  Ratio-test-surviving mismatches produce residuals
    orders of magnitude above the inlier cloud (measured: median 0.1 px
    vs 4e4 px on rendered sequences); Huber bounds their gradient but a
    single 4e4-px observation still contributes ~2*delta*r to the cost
    the LM accept test uses — gate them out before adjusting, exactly
    as the dense pipeline drops never-triangulated tracks.

    Observations whose depth is below `min_depth_frac` x the median
    valid depth are dropped too: a degenerate DLT solution at a camera
    center projects with a SMALL residual (x, y, z all ~0) but an
    enormous Jacobian (fx/z), which destabilizes the f32 normal
    equations even with _obs_terms' hard zero-Jacobian guard.
    """
    w = blocks.valid & blocks.tvalid[..., None]
    onehot = ((blocks.cam[..., None]
               == jnp.arange(c_win, dtype=jnp.int32)).astype(jnp.float32)
              * w[..., None].astype(jnp.float32))
    R_win = _window_slice(R, blocks.win_start, c_win)
    t_win = _window_slice(t, blocks.win_start, c_win)
    R_sel = jnp.einsum("btkw,bwij->btkij", onehot, R_win, precision=_HI)
    t_sel = jnp.einsum("btkw,bwi->btki", onehot, t_win, precision=_HI)
    z = (jnp.einsum("btkij,btj->btki", R_sel, blocks.X, precision=_HI)
         + t_sel)[..., 2]
    z_med = jnp.nanmedian(jnp.where(w & (z > 0), z, jnp.nan))
    z_min = min_depth_frac * jnp.nan_to_num(z_med, nan=1.0)

    # PHYSICAL residual gate: strip the wobs scale (a sqrt(n)-weighted
    # merged observation must be gated at the same pixel threshold)
    _, r, *_ = _obs_terms(R, t, blocks._replace(wobs=None), intr, c_win,
                          None)
    ok = ((jnp.linalg.norm(r, axis=-1) <= max_px) & (z > z_min)
          & blocks.valid)
    tvalid = blocks.tvalid & (jnp.sum(ok, axis=-1) >= 2)
    return blocks._replace(valid=ok, tvalid=tvalid)


# ---------------------------------------------------------------------------
# Core (operates on a LOCAL shard of blocks; psums over `axis` if given)
# ---------------------------------------------------------------------------


def _window_slice(arr, win_start, c_win):
    """[C, ...] -> [B_loc, c_win, ...] per-block windows (tiny gather)."""
    take = lambda s: jax.lax.dynamic_slice_in_dim(arr, s, c_win, axis=0)
    return jax.vmap(take)(win_start)


def _scatter_windows(contrib, win_start, C):
    """Sum [B_loc, c_win, ...] window contributions into [C, ...]."""
    acc = jnp.zeros((C,) + contrib.shape[2:], contrib.dtype)

    def body(a, inp):
        c, s = inp
        cur = jax.lax.dynamic_slice_in_dim(a, s, c.shape[0], axis=0)
        return jax.lax.dynamic_update_slice_in_dim(a, cur + c, s, 0), None

    acc, _ = jax.lax.scan(body, acc, (contrib, win_start))
    return acc


def _inv_damped_equilibrated(A, ridge):
    """inv(A + ridge*I) for batched small symmetric PSD matrices,
    computed as inv(A/s + (ridge/s)*I)/s with s = mean diagonal —
    EXACTLY the same matrix, but the determinant of the scaled system
    stays O(1): near-degenerate observations (z -> 0) push diag(A) to
    ~1e16+, whose raw 3x3/6x6 determinant overflows f32 (~1e38) and
    NaN-poisons the whole LM step (measured on the 1k-frame chain)."""
    n = A.shape[-1]
    diag = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = jnp.maximum(jnp.mean(diag, axis=-1), 1e-12)[..., None, None]
    eye = jnp.eye(n, dtype=A.dtype)
    return jnp.linalg.inv(A / s + (ridge / s) * eye) / s


def _obs_terms(R, t, blocks: TrackBlocks, intr, c_win, huber_delta):
    """Per-observation residuals and Jacobians on the local blocks.

    Returns (onehot [B,T,K,c_win], r [B,T,K,2], Jc [B,T,K,2,6],
    Jp [B,T,K,2,3], w [B,T,K]).
    """
    w = (blocks.valid & blocks.tvalid[..., None]).astype(jnp.float32)
    onehot = (blocks.cam[..., None]
              == jnp.arange(c_win, dtype=jnp.int32)).astype(jnp.float32)
    onehot = onehot * w[..., None]

    R_win = _window_slice(R, blocks.win_start, c_win)   # [B, c_win, 3, 3]
    t_win = _window_slice(t, blocks.win_start, c_win)   # [B, c_win, 3]
    # pose selection per observation: exact one-hot matmuls (MXU)
    R_sel = jnp.einsum("btkw,bwij->btkij", onehot, R_win, precision=_HI)
    t_sel = jnp.einsum("btkw,bwi->btki", onehot, t_win, precision=_HI)

    Xc = jnp.einsum("btkij,btj->btki", R_sel, blocks.X, precision=_HI) + t_sel
    z = jnp.where(jnp.abs(Xc[..., 2]) > 1e-9, Xc[..., 2], 1e-9)
    u = intr[0] * Xc[..., 0] / z + intr[2]
    v = intr[1] * Xc[..., 1] / z + intr[3]
    r = (jnp.stack([u, v], axis=-1) - blocks.uv) * w[..., None]

    if huber_delta is not None:
        # IRLS sqrt-weighting (same scheme as ba.py:lm_bundle_adjust).
        # onehot stays BINARY: Jc/Jp carry hw via duv and r carries hw,
        # so accumulations match the dense path's hw^2 exactly.  The
        # Huber threshold applies to the PHYSICAL residual — before the
        # wobs sqrt-information scale below.
        rn = jnp.linalg.norm(r, axis=-1)
        hw = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-9)))
        w = w * hw
        r = r * hw[..., None]
    if blocks.wobs is not None:
        w = w * blocks.wobs
        r = r * blocks.wobs[..., None]

    x, y = Xc[..., 0], Xc[..., 1]
    fx, fy = intr[0], intr[1]
    zero = jnp.zeros_like(z)
    # Near-zero / negative depths get ZERO Jacobian (their clamped
    # residual still counts in the cost, bounded by the caller's
    # outlier gate): a point that drifts onto a camera center has
    # fx/z ~ 1e10+, one such observation overflows the f32 normal
    # equations and NaN-poisons the whole LM step — measured on the
    # 1k-frame chain, where DLT re-triangulation parks a handful of
    # degenerate tracks at camera centers with small residuals.
    jac_ok = (Xc[..., 2] > 1e-6).astype(jnp.float32)
    duv = jnp.stack([
        jnp.stack([fx / z, zero, -fx * x / (z * z)], axis=-1),
        jnp.stack([zero, fy / z, -fy * y / (z * z)], axis=-1),
    ], axis=-2) * (w * jac_ok)[..., None, None]          # [B,T,K,2,3]
    dxc_dxi = jnp.concatenate(
        [-hat(Xc), jnp.broadcast_to(jnp.eye(3), Xc.shape[:-1] + (3, 3))],
        axis=-1)                                         # [B,T,K,3,6]
    Jc = duv @ dxc_dxi                                   # [B,T,K,2,6]
    Jp = duv @ R_sel                                     # [B,T,K,2,3]
    return onehot, r, Jc, Jp, w


def sparse_bundle_adjust(
    R: jnp.ndarray,           # [C, 3, 3] (replicated)
    t: jnp.ndarray,           # [C, 3]
    blocks: TrackBlocks,      # block axis possibly sharded over `mesh`
    intr: jnp.ndarray,
    c_win: int,
    mesh=None,
    axis: str = "map",
    n_iters: int = 10,
    cg_iters: int = 20,
    lam0: float = 1e-3,
    fix_first_cam: bool = True,
    huber_delta: float | None = None,
    fixed_cams: np.ndarray | None = None,
    smooth_weight: float = 0.0,
) -> SparseBAResult:
    """LM bundle adjustment on TrackBlocks.  With `mesh`, the block axis
    is sharded over mesh axis `axis` (map partitioning) and camera
    reductions are psums; without, runs single-device (parity path).

    `fixed_cams`: optional [C] bool mask of cameras to HOLD FIXED
    (generalizes fix_first_cam's single gauge anchor).  The config-4/5
    chain anchors its keyframe cameras this way: the keyframe-level BA
    (sequence_init._keyframe_ba) has already placed them accurately,
    and with local (c_win-windowed) tracks the dense BA's
    low-frequency trajectory modes are nearly gauge — left free they
    drift (measured: dense BA at 1k frames RAISED Sim(3) ATE while
    reducing reprojection cost).  Anchoring pins the low-frequency
    shape while in-between cameras polish their interpolated inits.

    `smooth_weight` > 0 adds a SMOOTHNESS-SHAPED damping term to the
    camera system: w * D2^T D2 inside the Schur matvec, D2 the
    second-difference stencil over the camera index per xi component,
    w = smooth_weight * mean(diag(U)).  Dense video puts per-frame
    match flow BELOW detection noise (1k circuit: 0.24 px/frame flow
    vs ~0.4 px jitter), so reprojection alone cannot localize one
    camera between its neighbors — an unregularized step amplifies
    detection noise into per-camera zigzag (measured: trajectory
    second-difference RMS 7.3e-4 init -> 3.1e-2 after BA, 40x, while
    reprojection cost fell).  Like the Levenberg term this damps the
    STEP, not the state: a zero step costs zero, smooth corrections
    (interpolation-sag fixes) pass nearly freely, and per-camera
    noise-chasing steps are suppressed."""
    C = R.shape[0]

    gauge_np = np.ones((C, 1), np.float32)
    if fixed_cams is not None:
        gauge_np[np.asarray(fixed_cams, bool)] = 0.0
    if fix_first_cam:
        gauge_np[0] = 0.0
    any_fixed = bool((gauge_np == 0.0).any())
    gauge_const = jnp.asarray(gauge_np)

    allsum = (lambda v: jax.lax.psum(v, axis)) if mesh is not None \
        else (lambda v: v)

    def cost_of(Rg, tg, blk):
        """Mean robust cost — the OBJECTIVE the LM step minimizes.
        With huber_delta set this must be the Huber loss, not the raw
        squared residual: the IRLS-weighted step reduces the robust
        cost but can RAISE the raw one whenever the inlier gain is
        smaller than an outlier's growth, and a raw-cost accept test
        then rejects every step (measured on the keyframe-BA problem:
        cost history flat for 40 iterations with huber_delta=2, smooth
        convergence with the robust accept test).  Huber acts on the
        PHYSICAL residual; merged observations then weigh in with
        their wobs^2 = n raw-observation multiplicity."""
        on, r, *_ = _obs_terms(Rg, tg, blk._replace(wobs=None), intr,
                               c_win, None)
        w2 = (blk.valid & blk.tvalid[..., None]).astype(jnp.float32)
        if blk.wobs is not None:
            w2 = w2 * blk.wobs * blk.wobs
        n = allsum(jnp.sum(w2))
        if huber_delta is None:
            s = allsum(jnp.sum(w2 * jnp.sum(r * r, axis=-1)))
        else:
            rn = jnp.linalg.norm(r, axis=-1)   # 0 at masked slots
            s = allsum(jnp.sum(w2 * jnp.where(
                rn <= huber_delta, rn * rn,
                huber_delta * (2.0 * rn - huber_delta))))
        return s / jnp.maximum(n, 1.0)

    def lm_step(carry, _):
        Rg, tg, X, lam, nu = carry
        blk = blocks._replace(X=X)
        onehot, r, Jc, Jp, w = _obs_terms(Rg, tg, blk, intr, c_win,
                                          huber_delta)

        # landmark blocks: pure per-track reductions (no scatter)
        V = jnp.einsum("btkri,btkrj->btij", Jp, Jp, precision=_HI)      # [B,T,3,3]
        gp = -jnp.einsum("btkri,btkr->bti", Jp, r, precision=_HI)       # [B,T,3]
        Vinv = _inv_damped_equilibrated(V, lam + 1e-9)
        Wm = jnp.einsum("btkri,btkrj->btkij", Jc, Jp, precision=_HI)    # [B,T,K,6,3]

        # camera blocks: one-hot window accumulation + psum
        JcJc = jnp.einsum("btkri,btkrj->btkij", Jc, Jc, precision=_HI)  # [B,T,K,6,6]
        U_win = jnp.einsum("btkw,btkij->bwij", onehot, JcJc, precision=_HI)
        gc_win = -jnp.einsum("btkw,btkri,btkr->bwi", onehot, Jc, r,
                             precision=_HI)
        U = allsum(_scatter_windows(U_win, blk.win_start, C))   # [C,6,6]
        gc = allsum(_scatter_windows(gc_win, blk.win_start, C))  # [C,6]
        U_d = U + lam * jnp.eye(6)

        # Schur rhs = gc - W Vinv gp (per-obs, window-accumulated)
        WVg = jnp.einsum("btkij,btjl,btl->btki", Wm, Vinv, gp, precision=_HI)
        rhs = gc - allsum(_scatter_windows(
            jnp.einsum("btkw,btki->bwi", onehot, WVg, precision=_HI),
            blk.win_start, C))

        gauge = gauge_const
        rhs = rhs * gauge

        # smoothness damping weight, scaled to the problem's curvature
        ws = None
        if smooth_weight > 0.0 and C >= 3:
            ws = smooth_weight * jnp.mean(
                jnp.diagonal(U_d, axis1=-2, axis2=-1))

        def _d2td2(x):
            """D2^T D2 x over the camera axis, per xi component (x is
            the replicated [C, 6] step — static slices, no psum)."""
            y = x[:-2] - 2.0 * x[1:-1] + x[2:]          # [C-2, 6]
            out = jnp.zeros_like(x)
            out = out.at[:-2].add(y)
            out = out.at[1:-1].add(-2.0 * y)
            out = out.at[2:].add(y)
            return out

        def S_matvec(x):
            """(U + lam) x - W Vinv W^T x (+ smoothness), gauge-masked."""
            x = x * gauge
            ux = jnp.einsum("cij,cj->ci", U_d, x, precision=_HI)
            x_win = _window_slice(x, blk.win_start, c_win)
            x_sel = jnp.einsum("btkw,bwi->btki", onehot, x_win,
                               precision=_HI)
            y = jnp.einsum("btkij,btki->btj", Wm, x_sel, precision=_HI)      # W^T x
            z2 = jnp.einsum("btij,btj->bti", Vinv, y, precision=_HI)
            q = jnp.einsum("btkij,btj->btki", Wm, z2, precision=_HI)         # W Vinv W^T x
            q_win = jnp.einsum("btkw,btki->bwi", onehot, q, precision=_HI)
            wx = allsum(_scatter_windows(q_win, blk.win_start, C))
            out = ux - wx
            if ws is not None:
                out = out + ws * _d2td2(x)
            if any_fixed:
                out = out * gauge + x * (1.0 - gauge)
            return out

        # block-Jacobi preconditioner on the EXACT Schur diagonal
        # S_cc = U_d - sum_p W_cp Vinv_p W_cp^T (each track sees a
        # camera at most once, so the per-obs quadratic form is the
        # whole diagonal contribution) — much stronger than U_d alone
        # when cameras are weakly constrained (f32 CG needs the help)
        Dq = jnp.einsum("btkij,btjl,btkml->btkim", Wm, Vinv, Wm, precision=_HI)
        D_win = jnp.einsum("btkw,btkij->bwij", onehot, Dq, precision=_HI)
        S_diag = U_d - allsum(_scatter_windows(D_win, blk.win_start, C))
        if ws is not None:
            # interior diagonal of D2^T D2 is 6 (1+4+1); close enough
            # at the two boundary rows for a preconditioner
            S_diag = S_diag + (6.0 * ws) * jnp.eye(6)
        Minv = _inv_damped_equilibrated(S_diag, 1e-6)
        prec = lambda v: jnp.einsum("cij,cj->ci", Minv, v, precision=_HI) * gauge

        def cg_body(carry, _):
            x, res, p, rz = carry
            Sp = S_matvec(p)
            denom = jnp.sum(p * Sp)
            alpha = rz / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
            x = x + alpha * p
            res = res - alpha * Sp
            z2 = prec(res)
            rz_new = jnp.sum(res * z2)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            p = z2 + beta * p
            return (x, res, p, rz_new), rz_new

        x0 = jnp.zeros((C, 6))
        z0 = prec(rhs)
        (d_xi, *_), _ = jax.lax.scan(
            cg_body, (x0, rhs, z0, jnp.sum(rhs * z0)), None, length=cg_iters)
        d_xi = d_xi * gauge

        # landmark update (local)
        dxi_win = _window_slice(d_xi, blk.win_start, c_win)
        dxi_sel = jnp.einsum("btkw,bwi->btki", onehot, dxi_win, precision=_HI)
        rhs_p = gp - jnp.einsum("btkij,btki->btj", Wm, dxi_sel, precision=_HI)
        d_X = jnp.einsum("btij,btj->bti", Vinv, rhs_p, precision=_HI)
        d_X = d_X * blk.tvalid[..., None]

        R_new, t_new = se3_retract(Rg, tg, d_xi)
        X_new = X + d_X
        c_old = cost_of(Rg, tg, blk)
        c_new = cost_of(R_new, t_new, blk._replace(X=X_new))
        accept = c_new < c_old

        # Nielsen lam schedule, driven by the gain ratio rho = actual /
        # predicted cost decrease.  The old fixed x0.5 / x4 rule paid
        # full Jacobian+CG cost for long reject runs (CONFIG5_r04: ~3
        # accepted of 20 iterations — each accept halved lam straight
        # back into the reject zone).  Nielsen decreases lam gently
        # when rho is small (max 1/3 factor only for excellent steps)
        # and escalates geometrically on consecutive rejects (nu
        # doubles), so plateaus cost O(log) iterations, not O(n).
        # Predicted decrease of 0.5*sum(r_w^2) for the LM system
        # (H + lam*I) d = g  is  0.5 * d^T (lam*d + g); cost_of is a
        # MEAN of squared residuals, so scale by n to compare.
        n_obs = allsum(jnp.sum(blk.valid & blk.tvalid[..., None])
                       ).astype(jnp.float32)
        pred = 0.5 * (jnp.sum(d_xi * (lam * d_xi + gc))
                      + allsum(jnp.sum(d_X * (lam * d_X + gp))))
        rho = (c_old - c_new) * jnp.maximum(n_obs, 1.0) \
            / jnp.maximum(2.0 * pred, 1e-20)
        Rg = jnp.where(accept, R_new, Rg)
        tg = jnp.where(accept, t_new, tg)
        X = jnp.where(accept, X_new, X)
        shrink = jnp.maximum(1.0 / 3.0,
                             1.0 - (2.0 * rho - 1.0) ** 3)
        lam = jnp.where(accept,
                        jnp.maximum(lam * shrink, 1e-9),
                        jnp.minimum(lam * nu, 1e8))
        nu = jnp.where(accept, jnp.float32(2.0),
                       jnp.minimum(nu * 2.0, 64.0))
        return (Rg, tg, X, lam, nu), jnp.where(accept, c_new, c_old)

    def run(Rg, tg, uv, cam, valid, X, tvalid, win_start, wobs):
        nonlocal blocks
        blocks = TrackBlocks(uv, cam, valid, X, tvalid, win_start, wobs)
        (Rg, tg, X, _, _), hist = jax.lax.scan(
            lm_step, (Rg, tg, blocks.X, jnp.float32(lam0),
                      jnp.float32(2.0)), None,
            length=n_iters)
        cost = cost_of(Rg, tg, blocks._replace(X=X))
        return Rg, tg, X, cost, hist

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        shard = functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis)),
            out_specs=(P(), P(), P(axis), P(), P()),
            check_vma=False,
        )
        fn = jax.jit(shard(run))
    else:
        fn = jax.jit(run)

    orig = blocks
    if orig.wobs is None:
        orig = orig._replace(
            wobs=jnp.ones(orig.valid.shape, jnp.float32))
    Rg, tg, X, cost, hist = fn(R, t, orig.uv, orig.cam, orig.valid, orig.X,
                               orig.tvalid, orig.win_start, orig.wobs)
    return SparseBAResult(R=Rg, t=tg, blocks=orig._replace(X=X), cost=cost,
                          cost_history=hist)
