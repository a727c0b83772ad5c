"""Batched sequence pose initialization (config-5 scale).

`pipeline.py:reconstruct_sequence` initializes poses with a per-pair
host loop: one RANSAC dispatch + one triangulation dispatch + several
host fetches per frame — ~3 device round trips x F.  At config-5 scale
(1k-10k frames) that loop IS the pipeline cost, so this module batches
it the TPU way:

1. every consecutive pair's essential-matrix RANSAC runs under ONE
   vmapped jit (chunked to bound memory) — same estimator
   (two_view.estimate_relative_pose), same hypothesis count, F-1 pairs
   per dispatch instead of 1;
2. triangulation of every pair is fused into the same program;
3. the only remaining per-frame host work is the monocular scale chain
   — pure O(F) NumPy arithmetic on prefetched arrays (median depth
   ratios over keypoints shared by consecutive pairs), no device calls.

The result feeds tracks.build_track_blocks_flat + sparse_bundle_adjust
directly: (poses, per-track world points).

Reference counterpart: none (north-star scope, BASELINE.md config 5).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry as geo
from .two_view import (estimate_relative_pose, refine_pose_sampson,
                       triangulate)
from .tracks import FlatTracks


class PairArrays(NamedTuple):
    """Fixed-capacity per-pair correspondence arrays (P = F-1 pairs)."""

    x1: np.ndarray       # [P, M, 2] normalized coords in frame p
    x2: np.ndarray       # [P, M, 2] normalized coords in frame p+1
    mask: np.ndarray     # [P, M]
    src_kp: np.ndarray   # [P, M] i32 kp index in frame p (dummy 0 pad)
    dst_kp: np.ndarray   # [P, M] i32 kp index in frame p+1


def pair_correspondence_arrays(feats, pair_matches, intr,
                               cap: int | None = None) -> PairArrays:
    """Pack ragged per-pair matches into fixed-capacity arrays."""
    P = len(pair_matches)
    M = cap or max(64, 1 << max(
        (len(m) for m in pair_matches), default=1).bit_length())
    x1 = np.zeros((P, M, 2), np.float32)
    x2 = np.zeros((P, M, 2), np.float32)
    mask = np.zeros((P, M), bool)
    src = np.zeros((P, M), np.int32)
    dst = np.zeros((P, M), np.int32)
    fx, fy, cx, cy = [float(v) for v in np.asarray(intr)]
    for p, m in enumerate(pair_matches):
        m = np.asarray(m)[:M]
        k = len(m)
        if k == 0:
            continue
        src[p, :k] = m[:, 0]
        dst[p, :k] = m[:, 1]
        fa, fb = feats[p], feats[p + 1]
        x1[p, :k, 0] = (np.asarray(fa.x)[m[:, 0]] - cx) / fx
        x1[p, :k, 1] = (np.asarray(fa.y)[m[:, 0]] - cy) / fy
        x2[p, :k, 0] = (np.asarray(fb.x)[m[:, 1]] - cx) / fx
        x2[p, :k, 1] = (np.asarray(fb.y)[m[:, 1]] - cy) / fy
        mask[p, :k] = True
    return PairArrays(x1, x2, mask, src, dst)


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def _pose_chunk(x1, x2, mask, keys, n_hypotheses):
    def one(a, b, m, k):
        # consecutive video frames ARE the lateral-baseline regime the
        # rotation prior / adaptive threshold exist for (two_view.py
        # docstring: callers opt in where the regime is known); the
        # Sampson polish then recovers the 8-point estimate's bias —
        # without both, per-pair t directions on rendered sequences
        # erred up to ~60 deg with occasional sign flips (measured)
        res = estimate_relative_pose(a, b, m, k,
                                     n_hypotheses=n_hypotheses,
                                     rotation_prior=0.02,
                                     adaptive_threshold=True)
        w = res.inliers.astype(jnp.float32)
        R, t = refine_pose_sampson(res.R, res.t, a, b, w)
        # keep the polished pose only if it agrees with cheirality:
        # count front-of-both-cameras inliers before/after
        def front(Rc, tc):
            X = triangulate(jnp.eye(3), jnp.zeros(3), Rc, tc, a, b)
            z2 = X @ Rc[2] + tc[2]
            return jnp.sum((X[:, 2] > 0) & (z2 > 0) & res.inliers), X

        n0, X0 = front(res.R, res.t)
        n1, X1 = front(R, t)
        ok = n1 >= n0
        R = jnp.where(ok, R, res.R)
        t = jnp.where(ok, t, res.t)
        Xc = jnp.where(ok, X1, X0)
        return R, t, res.inliers, res.n_inliers, Xc

    return jax.vmap(one)(x1, x2, mask, keys)


def batched_relative_poses(pairs: PairArrays, seed: int = 0,
                           chunk: int = 64, n_hypotheses: int = 256):
    """(R_rel [P,3,3], t_rel [P,3], inl [P,M], n_inl [P], Xc [P,M,3]):
    every pair's RANSAC + triangulation in ceil(P/chunk) device calls."""
    P, M = pairs.mask.shape
    keys = jax.random.split(jax.random.PRNGKey(seed), max(P, 1))
    outs = []
    for s in range(0, P, chunk):
        e = min(s + chunk, P)
        pad = chunk - (e - s)
        pd = lambda a: np.concatenate(
            [a[s:e], np.repeat(a[e - 1:e], pad, axis=0)]) if pad else a[s:e]
        r = _pose_chunk(jnp.asarray(pd(pairs.x1)), jnp.asarray(pd(pairs.x2)),
                        jnp.asarray(pd(pairs.mask)), pd(np.asarray(keys)),
                        n_hypotheses)
        outs.append(tuple(np.asarray(v)[: e - s] for v in r))
    if not outs:
        z = np.zeros
        return (z((0, 3, 3), np.float32), z((0, 3), np.float32),
                z((0, M), bool), z((0,), np.int32), z((0, M, 3), np.float32))
    return tuple(np.concatenate([o[i] for o in outs]) for i in range(5))


def chain_sequence_poses(pairs: PairArrays, R_rel, t_rel, inl, n_inl, Xc,
                         n_kps: list[int], min_inliers: int = 12,
                         step_clamp: float = 3.0):
    """Absolute poses + per-pair global scales from relative estimates.

    Pure host arithmetic (no device calls): for each pair p >= 1, the
    global scale is chained by the median depth ratio over keypoints of
    frame p shared between pair p-1 (as dst) and pair p (as src), both
    triangulated at unit baseline.  Weak pairs (< min_inliers) reuse
    the previous relative motion (constant-velocity fallback), and each
    step length is clamped to [1/clamp, clamp] x the previous step —
    the same guards as reconstruct_sequence's loop.

    Returns (R [F,3,3], t [F,3], scale [P], t_rel, Xc) — the last two
    with per-pair t-sign corrections applied (see below), so callers
    must use THESE for structure initialization.
    """
    P = len(R_rel)
    F = P + 1
    Rs = np.zeros((F, 3, 3), np.float32)
    ts = np.zeros((F, 3), np.float32)
    Rs[0] = np.eye(3)
    scale = np.ones(P, np.float32)

    prev_R = np.eye(3, dtype=np.float32)
    prev_dir = None
    prev_step = None
    Xc = np.array(Xc)            # sign corrections below mutate depths
    t_rel = np.array(t_rel)
    # per-pair kp->row maps for the shared-depth lookup
    for p in range(P):
        Rr, tr = R_rel[p], t_rel[p]
        if int(n_inl[p]) < min_inliers and prev_dir is not None:
            Rr, tr = prev_R, prev_dir
        s = 1.0
        if p > 0:
            # depths of frame-p keypoints from BOTH pairs
            mprev = pairs.mask[p - 1]
            mcur = pairs.mask[p]
            # frame-p camera coords from pair p-1: R_rel x + t_rel
            Xp_prev = Xc[p - 1] @ R_rel[p - 1].T + t_rel[p - 1]
            kp_prev = pairs.dst_kp[p - 1]
            kp_cur = pairs.src_kp[p]
            good_prev = mprev & inl[p - 1] & (Xp_prev[:, 2] > 1e-3)
            # do NOT cheirality-gate the current pair here: a t-sign
            # flip makes ALL its depths negative, and the gate would
            # silently discard exactly the evidence that detects it
            good_cur = mcur & inl[p] & (np.abs(Xc[p][:, 2]) > 1e-3)
            zprev = np.full(n_kps[p], np.nan, np.float32)
            zprev[kp_prev[good_prev]] = Xp_prev[good_prev, 2]
            zc = Xc[p][good_cur, 2]
            zp = zprev[kp_cur[good_cur]]
            ok = np.isfinite(zp)
            if ok.sum() >= 3:
                med = float(np.median(zp[ok] / zc[ok]))
                if med < 0:
                    # structure votes the pair's t sign is FLIPPED
                    # (front-count near-ties can pick the wrong sign
                    # on small-baseline video): depths scale linearly
                    # in t, so flip t and the triangulation together
                    t_rel[p] = -t_rel[p]
                    Xc[p] = -Xc[p]
                    tr = t_rel[p] if int(n_inl[p]) >= min_inliers else tr
                    med = -med
                s = med * scale[p - 1]
            else:
                s = float(scale[p - 1])
        if prev_step is not None and np.isfinite(prev_step) and prev_step > 0:
            step_len = abs(s) * float(np.linalg.norm(tr))
            lo, hi = prev_step / step_clamp, prev_step * step_clamp
            if step_len < lo or step_len > hi:
                s = float(np.clip(step_len, lo, hi)) / max(
                    float(np.linalg.norm(tr)), 1e-9) * np.sign(s or 1.0)
        scale[p] = s
        t_sc = tr * s
        Rs[p + 1] = Rr @ Rs[p]
        ts[p + 1] = Rr @ ts[p] + t_sc
        prev_R = Rr
        prev_dir = t_sc / max(float(np.linalg.norm(t_sc)), 1e-9)
        prev_step = float(np.linalg.norm(t_sc))
    return Rs, ts, scale, t_rel, Xc


def init_track_points(flat: FlatTracks, pairs: PairArrays, Xc, inl, scale,
                      Rs, ts, n_kps: list[int],
                      pair_src: np.ndarray | None = None,
                      first_ray: np.ndarray | None = None):
    """[N, 3] world-point init per track from its FIRST pair's
    triangulation (a track's first observation is a match source by
    construction of build_tracks_flat).  Tracks whose first
    triangulation failed cheirality/inlier gates fall back to the
    median-depth point along the first observation ray.

    `pair_src[p]` is the frame id of pair p's SOURCE frame (default
    arange: consecutive pairs).  With keyframed init, only tracks whose
    first observation lands on a keyframe get a direct triangulation;
    the rest take the ray fallback (triangulate_blocks re-solves all of
    them from the interpolated poses anyway).

    Returns (X [N,3] f32, ok [N] bool)."""
    N = flat.n_tracks
    seg = np.flatnonzero(np.r_[True, flat.tid[1:] != flat.tid[:-1]]) \
        if len(flat.tid) else np.zeros(0, np.int64)
    f0 = np.zeros(N, np.int64)
    k0 = np.zeros(N, np.int64)
    f0[flat.tid[seg]] = flat.frame[seg]
    k0[flat.tid[seg]] = flat.kp[seg]

    P, M = pairs.mask.shape
    if pair_src is None:
        pair_src = np.arange(P, dtype=np.int64)
    F = len(n_kps)
    pair_of_frame = np.full(F, -1, np.int64)
    pair_of_frame[np.asarray(pair_src, np.int64)] = np.arange(P)

    # per-pair kp->match-row map
    rowmap = np.full((P, max(n_kps)), -1, np.int64)
    prow = np.broadcast_to(np.arange(M), (P, M))
    pidx = np.broadcast_to(np.arange(P)[:, None], (P, M))
    m = pairs.mask
    rowmap[pidx[m], pairs.src_kp[m]] = prow[m]

    p0 = pair_of_frame[f0]                              # [N] pair of f0
    rows = np.where(p0 >= 0, rowmap[np.maximum(p0, 0), k0], -1)
    good = rows >= 0
    r = np.where(good, rows, 0)
    p0c = np.maximum(p0, 0)
    Xci = Xc[p0c, r] * scale[p0c][:, None]              # frame-f0 cam coords
    ok = good & inl[p0c, r] & (Xc[p0c, r, 2] > 0.05)
    med = np.median(Xci[ok, 2]) if ok.any() else 1.0
    # fallback: median-depth point along the track's own first-
    # observation ray (pairs.x1 only covers tracks with a pair row)
    ray_xy = pairs.x1[p0c, r].copy()
    if first_ray is not None:
        ray_xy = np.where(good[:, None], ray_xy,
                          np.asarray(first_ray, np.float32))
    ray = np.concatenate([ray_xy, np.ones((N, 1), np.float32)], axis=1)
    Xci = np.where(ok[:, None], Xci, ray * med)
    # world: X_w = R^T (X_c - t)
    Xw = np.einsum("nij,nj->ni", Rs[f0].transpose(0, 2, 1), Xci - ts[f0])
    return Xw.astype(np.float32), ok


def median_match_flow(feats, pair_matches) -> float:
    """Median pixel MOTION of consecutive-frame matches — the
    baseline-adequacy signal the auto keyframe stride keys on.

    hypot of the per-pair medians of the SIGNED displacements, not the
    median of magnitudes: detection jitter (~0.3-0.5 px, zero-centered)
    floors the magnitude median, so at high frame rates the old form
    measured jitter instead of motion — a 10k-frame circuit (true
    motion 0.05 px/frame) read "0.37 px flow", the auto stride stopped
    at 64, true keyframe baselines were ~3 px, and chain drift blew
    ATE to 15% (round-4 10k run).  Signed medians cancel the jitter;
    pure camera ROTATION also produces signed flow, which is correct
    here — the stride only needs image motion, and the rotation prior
    in the pair estimator handles the rest."""
    meds = []
    for p, m in enumerate(pair_matches):
        m = np.asarray(m)
        if len(m) == 0:
            continue
        dx = np.asarray(feats[p].x)[m[:, 0]] \
            - np.asarray(feats[p + 1].x)[m[:, 1]]
        dy = np.asarray(feats[p].y)[m[:, 0]] \
            - np.asarray(feats[p + 1].y)[m[:, 1]]
        meds.append(float(np.hypot(np.median(dx), np.median(dy))))
    return float(np.median(meds)) if meds else 0.0


def interpolate_poses(Rk: np.ndarray, tk: np.ndarray, kf: np.ndarray,
                      n_frames: int) -> tuple[np.ndarray, np.ndarray]:
    """Interpolation of keyframe poses to every frame: rotations along
    the SO(3) geodesic (exp of scaled log), camera centers along a
    CATMULL-ROM cubic through the keyframe centers (tangents from
    central differences, one-sided at the ends).

    Centers are cubic, not linear, because smooth camera paths sampled
    at keyframe stride leave linear interpolation with an O(h^2) chord
    sag that DOMINATES the init error and that the dense BA cannot see
    (its tracks span a few frames; the sag mode is reprojection-quiet).
    Measured on the 1k-frame circuit cache: Sim(3) ATE 0.0124 linear
    -> 0.0064 cubic with identical keyframe poses."""
    import jax.numpy as jnp

    from .geometry import so3_exp, so3_log

    kf = np.asarray(kf, np.int64)
    centers_k = np.einsum("kji,kj->ki", Rk, -tk).astype(np.float64)
    seg = np.clip(np.searchsorted(kf, np.arange(n_frames), side="right")
                  - 1, 0, len(kf) - 2)
    f0, f1 = kf[seg], kf[seg + 1]
    alpha = ((np.arange(n_frames) - f0)
             / np.maximum(f1 - f0, 1)).astype(np.float32)
    dR = np.asarray(so3_log(jnp.einsum(
        "kij,klj->kil", jnp.asarray(Rk[1:]), jnp.asarray(Rk[:-1]))))
    R = np.asarray(so3_exp(jnp.asarray(alpha[:, None] * dR[seg]))
                   ) @ Rk[seg]
    tknot = kf.astype(np.float64)
    m = np.zeros_like(centers_k)
    if len(kf) >= 3:
        m[1:-1] = (centers_k[2:] - centers_k[:-2]) \
            / (tknot[2:] - tknot[:-2])[:, None]
    m[0] = (centers_k[1] - centers_k[0]) / max(tknot[1] - tknot[0], 1.0)
    m[-1] = (centers_k[-1] - centers_k[-2]) \
        / max(tknot[-1] - tknot[-2], 1.0)
    h = (tknot[seg + 1] - tknot[seg])[:, None]
    u = alpha.astype(np.float64)[:, None]
    h00 = 2 * u ** 3 - 3 * u ** 2 + 1
    h10 = u ** 3 - 2 * u ** 2 + u
    h01 = -2 * u ** 3 + 3 * u ** 2
    h11 = u ** 3 - u ** 2
    c = (h00 * centers_k[seg] + h10 * h * m[seg]
         + h01 * centers_k[seg + 1] + h11 * h * m[seg + 1])
    t = -np.einsum("fij,fj->fi", R, c)
    return R.astype(np.float32), t.astype(np.float32)


def _keyframe_ba(feats_kf, matches_kf, intr, Rk, tk, n_kps_kf,
                 seed: int = 0, n_iters: int = 12, cg_iters: int = 24,
                 schedule=((20.0, 2.0), (5.0, 1.0), (3.0, 0.5))):
    """Joint LM refinement of the KEYFRAME chain: chain the keyframe
    matches into tracks, pack them into TrackBlocks whose camera
    windows live in KEYFRAME-index space, then run ANNEALED rounds of
    (re-triangulate from the UNGATED packing -> outlier gate -> LM)
    with the (gate_px, huber_delta) schedule tightening each round —
    at C = n_keyframes the problem is tiny, so this is the cheap place
    to burn LM iterations.

    The annealing is what makes it both accurate and robust (measured
    on the 1k-frame circuit cache): a loose 20 px gate alone leaves
    the solution fitting a heavy mismatch tail (keyframe ATE 0.0176 ->
    0.0241, WORSE than the chain), a tight 3 px gate alone is fragile
    when the chain init is poor, while 20 -> 5 -> 3 px with fresh
    re-triangulation each round reached 0.0047 from a 0.0176 init and
    0.0114 from a deliberately broken 0.164 init (stride-25 probe).

    Returns (Rk, tk, stats).  Keyframe tracks typically span a handful
    of keyframes; windows are centered on the track span (assign=mid)
    and observations evenly subsampled, so nothing structural is
    dropped at realistic spans."""
    from .sparse_ba import (filter_block_outliers, sparse_bundle_adjust,
                            triangulate_blocks)
    from .tracks import build_tracks_flat, build_track_blocks_flat, \
        flat_observation_uv
    import jax.numpy as jnp

    n_kf = len(feats_kf)
    flat_kf = build_tracks_flat(matches_kf, n_kps_kf)
    stats = {"kf_ba_tracks": int(flat_kf.n_tracks)}
    if flat_kf.n_tracks < 24:
        return Rk, tk, stats
    uv_kf = flat_observation_uv(feats_kf, flat_kf)
    # small problem: one window covering every keyframe when possible
    c_blk = min(32, n_kf)
    halo = min(32, max(n_kf - c_blk, 0) // 2 + 1)
    blocks0, c_win, bstats = build_track_blocks_flat(
        flat_kf, uv_kf, np.zeros((flat_kf.n_tracks, 3), np.float32),
        n_kf, c_blk=c_blk, halo=halo, max_obs=8,
        assign="mid", subsample="even")
    stats["kf_ba_dropped_obs"] = bstats["dropped_obs"]

    Rj, tj = jnp.asarray(Rk), jnp.asarray(tk)
    intr_j = jnp.asarray(intr, jnp.float32)
    hist = []
    for gate_px, delta in schedule:
        X_tri = triangulate_blocks(Rj, tj, blocks0, intr_j, c_win)
        blocks = blocks0._replace(X=X_tri)
        blocks = filter_block_outliers(Rj, tj, blocks, intr_j, c_win,
                                       max_px=gate_px)
        res = sparse_bundle_adjust(Rj, tj, blocks, intr_j, c_win,
                                   n_iters=n_iters, cg_iters=cg_iters,
                                   huber_delta=delta)
        Rj, tj = res.R, res.t
        hist += [round(float(h), 4) for h in np.asarray(res.cost_history)]
    stats["kf_ba_cost_history"] = hist
    return (np.asarray(Rj, np.float32), np.asarray(tj, np.float32),
            stats)


def initialize_sequence(feats, pair_matches, intr, flat: FlatTracks,
                        seed: int = 0, chunk: int = 64,
                        n_hypotheses: int = 256,
                        kf_stride: int | str = 1,
                        min_flow_px: float = 24.0, max_stride: int = 512,
                        loop_correct: bool = True, kf_ba: bool = True):
    """Full batched init: (R [F,3,3], t [F,3], track_X [N,3], stats).

    kf_stride > 1 (or "auto") runs the pair RANSAC + scale chain on a
    KEYFRAME subsequence and interpolates the in-between poses.  Dense
    video shoots consecutive baselines far below the essential-matrix
    floor — measured on a 1,000-frame circuit (per-pair flow ~1 px),
    the consecutive-pair scale chain collapsed by e^-16 within 50
    pairs; keyframes restore the baseline the estimator needs.  "auto"
    picks the stride from the measured median match flow
    (ceil(min_flow_px / flow)), so well-spaced sequences keep stride 1.

    min_flow_px is a TARGET keyframe flow, not a bare floor: the
    10k-frame circuit under the old 6 px / max_stride 16 settings
    produced 626 keyframes whose baselines sat at the estimator's
    minimum — chain drift scaled with the step count and ATE blew out
    to 15.7% of trajectory (CONFIG5 10k run, round 4) vs 2.5% at 1k
    frames.  24 px target / cap 512 keeps the keyframe count (and so
    the scale-chain length) roughly sampling-rate-independent; the
    flow signal itself must be the jitter-immune signed-median form
    (median_match_flow) or dense sequences saturate it at the
    detection-noise floor.
    """
    n_kps = [len(np.asarray(f.x)) for f in feats]
    F = len(feats)
    if kf_stride == "auto":
        flow = median_match_flow(feats, pair_matches)
        stride = int(np.clip(int(np.ceil(min_flow_px / max(flow, 1e-6))),
                             1, max_stride))
    else:
        stride = max(1, int(kf_stride))
    stats = {"n_pairs": len(pair_matches), "kf_stride": stride}

    if stride == 1:
        pairs = pair_correspondence_arrays(feats, pair_matches, intr)
        R_rel, t_rel, inl, n_inl, Xc = batched_relative_poses(
            pairs, seed=seed, chunk=chunk, n_hypotheses=n_hypotheses)
        Rs, ts, scale, t_rel, Xc = chain_sequence_poses(
            pairs, R_rel, t_rel, inl, n_inl, Xc, n_kps)
        X, ok = init_track_points(flat, pairs, Xc, inl, scale, Rs, ts,
                                  n_kps)
    else:
        from ..ops.matching import match_consecutive, \
            pad_descriptor_sequence
        kf = list(range(0, F, stride))
        if kf[-1] != F - 1:
            kf.append(F - 1)
        kf = np.asarray(kf, np.int64)
        feats_kf = [feats[i] for i in kf]
        n_kps_kf = [n_kps[i] for i in kf]
        descs, dvalid = pad_descriptor_sequence(feats_kf)
        matches_kf = match_consecutive(descs, dvalid)
        pairs = pair_correspondence_arrays(feats_kf, matches_kf, intr)
        R_rel, t_rel, inl, n_inl, Xc = batched_relative_poses(
            pairs, seed=seed, chunk=chunk, n_hypotheses=n_hypotheses)
        Rk, tk, scale, t_rel, Xc = chain_sequence_poses(
            pairs, R_rel, t_rel, inl, n_inl, Xc, n_kps_kf)
        corrected = False
        if loop_correct and len(kf) >= 12:
            # Sim(3) de-drift of the KEYFRAME chain before
            # interpolation: at config-5 sequence lengths the chain's
            # accumulated scale/pose drift is exactly the slow-drift
            # regime the Strasdat graph is built for (sfm/loops.py
            # NOTE), and the blocked BA downstream cannot reach
            # loop-length constraints (its camera windows are local).
            from .loops import detect_loop_closures, \
                loop_sim3_measurements
            from . import sim3
            edges_kf = detect_loop_closures(
                feats_kf, intr,
                min_separation=max(len(kf) // 4, 8), seed=seed)
            stats["loop_edges_kf"] = len(edges_kf)
            meas = loop_sim3_measurements(feats_kf, intr, Rk, tk,
                                          matches_kf, edges_kf)
            stats["sim3_measurements"] = len(meas)
            if meas:
                g = sim3.chain_graph(Rk, tk, loop_edges=meas)
                g = sim3.optimize_robust(g, n_consecutive=len(kf) - 1)
                Rk2, tk2 = sim3.corrected_trajectory(g)
                Rk = np.asarray(Rk2, np.float32)
                tk = np.asarray(tk2, np.float32)
                corrected = True
        if kf_ba and len(kf) >= 6:
            # pre-BA trajectory for honest stage attribution: the
            # keyframe BA below IS bundle adjustment (it runs
            # sparse_bundle_adjust); artifacts report ATE at this
            # boundary as "init" and everything after as the BA
            # layer's gain.  Callers not JSON-ing arrays can pop it.
            R_pre, t_pre = interpolate_poses(Rk, tk, kf, F)
            stats["interp_chain_R"] = R_pre
            stats["interp_chain_t"] = t_pre
            # KEYFRAME bundle adjustment before interpolation: the
            # trajectory's remaining low-frequency error (chained-pair
            # drift, interpolation sag) lives at keyframe scale, where
            # the dense blocked BA downstream cannot see it (its
            # camera windows span ~c_win consecutive RAW frames while
            # keyframes sit kf_stride apart).  Keyframe pairs carry
            # real baselines (the stride targets ~24 px flow), so a
            # small joint LM over the keyframe cameras + keyframe
            # tracks is well-conditioned and cheap (C = n_keyframes).
            Rk, tk, kstats = _keyframe_ba(feats_kf, matches_kf, intr,
                                          Rk, tk, n_kps_kf, seed=seed)
            stats.update(kstats)
            corrected = True
        if corrected and len(kf) >= 2:
            # re-derive per-pair world scales from the (corrected,
            # adjusted) keyframe baselines — unit-baseline pair
            # triangulations scale linearly with the true baseline
            ck = np.einsum("kji,kj->ki", Rk, -tk)
            base = np.linalg.norm(np.diff(ck, axis=0), axis=1)
            scale = (base / np.maximum(
                np.linalg.norm(t_rel, axis=1), 1e-9)).astype(np.float32)
        Rs, ts = interpolate_poses(Rk, tk, kf, F)
        # first-observation rays for the (majority) fallback tracks
        N = flat.n_tracks
        seg0 = np.flatnonzero(np.r_[True, flat.tid[1:] != flat.tid[:-1]])
        fr = np.zeros((N, 2), np.float32)
        fx, fy, cx, cy = [float(v) for v in np.asarray(intr)]
        from .tracks import concat_gather_xy
        xy0 = concat_gather_xy(feats, flat.frame[seg0], flat.kp[seg0])
        fr[flat.tid[seg0], 0] = (xy0[:, 0] - cx) / fx
        fr[flat.tid[seg0], 1] = (xy0[:, 1] - cy) / fy
        X, ok = init_track_points(flat, pairs, Xc, inl, scale, Rs, ts,
                                  n_kps, pair_src=kf[:-1],
                                  first_ray=fr)
        stats["n_keyframes"] = len(kf)
        # raw-frame indices of the keyframes — the dense BA anchors
        # these cameras (sparse_ba fixed_cams); callers not JSON-ing
        # arrays can pop it
        stats["keyframes"] = np.asarray(kf, np.int64)
    stats.update({"weak_pairs": int((n_inl < 12).sum()),
                  "tracks_direct_init": int(ok.sum()),
                  "tracks_fallback_init": int((~ok).sum())})
    return Rs, ts, X, stats
