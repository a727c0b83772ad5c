"""Loop-closure detection for long-sequence odometry.

Reference counterpart: none — north-star scope (BASELINE.md config 4:
long-trajectory drift).  The windowed odometry's pose graph only carries
consecutive-frame edges, so drift grows unbounded with trajectory
length; revisits are the classic fix.

TPU-first design: candidate retrieval reuses the on-device
DescriptorIndex (ops/index.py — one MXU matmul per query instead of a
CPU vocabulary tree): frames stream into a global bank with a
`min_separation`-frame delay, each new frame 2-NN-queries the bank and
votes for past frames by matched-descriptor count.  Top-voted
candidates are verified geometrically with the existing RANSAC
essential-matrix estimator (two_view.estimate_relative_pose); the
verified inlier MATCHES of accepted pairs are fused into the global
bundle adjustment's tracks (see the integration NOTE at the bottom),
and the relative pose is reported on the LoopEdge for callers that
want graph-style constraints.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry as geo
from .two_view import estimate_relative_pose, sampson_distance, triangulate
from ..ops.index import DescriptorIndex
from ..ops.matching import mutual_match


def _pow2(n: int, lo: int = 64) -> int:
    """Shape bucket: every device call in the streaming loop pads its
    inputs to a power-of-two capacity with a validity mask, so the
    number of distinct traced shapes (= compiles) is logarithmic in the
    sequence's descriptor counts instead of one per candidate pair."""
    return max(lo, 1 << max(0, int(n) - 1).bit_length())


def _pad_rows(a: np.ndarray, cap: int) -> np.ndarray:
    out = np.zeros((cap,) + a.shape[1:], a.dtype)
    out[: len(a)] = a
    return out


class LoopEdge(NamedTuple):
    i: int                # earlier frame
    j: int                # later frame
    R_rel: np.ndarray     # [3, 3]: x_j = R_rel x_i + t_rel (unit t)
    t_rel: np.ndarray     # [3] unit norm
    matches: np.ndarray   # [M, 2] RANSAC-inlier (kp_i, kp_j) pairs
    n_inliers: int
    votes: int


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _vote_device(own, idx, mask, n_frames):
    """Per-query-frame revisit voting ON DEVICE: map bank-row hits to
    their owner frames and count votes with a fused one-hot reduction
    (the per-frame np.bincount host loop this replaces cost one fetch
    per frame).  own [N], idx/mask [Q, Kq].  Returns (best frame [Q],
    vote count [Q])."""
    hit_own = jnp.take(own, jnp.maximum(idx, 0), axis=0)       # [Q, Kq]
    frames = jnp.arange(n_frames, dtype=jnp.int32)
    votes = jnp.sum(
        jnp.where(mask[..., None], hit_own[..., None] == frames, False),
        axis=1, dtype=jnp.int32)                               # [Q, F]
    best = jnp.argmax(votes, axis=1).astype(jnp.int32)
    return best, jnp.take_along_axis(votes, best[:, None], axis=1)[:, 0]


def detect_loop_closures(
    feats,
    intr: np.ndarray,
    min_separation: int = 8,
    min_votes: int = 20,
    min_inliers: int = 20,
    ratio: float = 0.75,
    seed: int = 0,
    query_batch: int = 8,
) -> list[LoopEdge]:
    """Detect revisits in an ordered list of FeaturesResult.

    Chunked streaming retrieval: frames are processed `query_batch` at a
    time — ONE bank query + ONE on-device vote per chunk instead of one
    per frame (dispatch + ~30 ms tunnel fetch per call dominates at
    config-4 sequence lengths).  The bank for a chunk starting at s
    holds frames [0, s - min_separation]: each frame's effective
    separation is in [min_separation, min_separation + query_batch - 1]
    — slightly MORE conservative than per-frame streaming, never less
    (query_batch=1 reproduces it exactly).  The best-voted past frame
    per query is geometrically verified; at most one loop edge per
    query frame.
    """
    F = len(feats)
    index = DescriptorIndex(ratio=ratio)
    own = np.zeros(0, np.int32)     # bank row -> frame id (insertion order)
    key = jax.random.PRNGKey(seed)
    edges: list[LoopEdge] = []
    intr_j = jnp.asarray(intr, jnp.float32)
    # acceptance counts inliers at a FIXED pixel-calibrated gate (2.5 px
    # Sampson), NOT the estimator's adaptive one: the adaptive gate is
    # derived from the candidate's own residual median, which a garbage
    # candidate inflates until everything "inlies" — it helps the
    # estimator find the pose but must never be the verification bar
    f_mean = 0.5 * (float(intr[0]) + float(intr[1]))
    verify_thr = (2.5 / f_mean) ** 2

    Q = max(1, int(query_batch))
    next_past = 0                   # first frame not yet in the bank
    for s in range(0, F, Q):
        chunk = list(range(s, min(s + Q, F)))
        # bank frontier for this chunk: frames [0, s - min_separation]
        while next_past <= s - min_separation:
            d = np.asarray(feats[next_past].descriptors, np.float32)
            if len(d):
                index.add(d)
                own = np.concatenate(
                    [own, np.full(len(d), next_past, np.int32)])
            next_past += 1
        if len(index) == 0:
            continue

        # one padded batched query + one on-device vote for the chunk
        qs = [np.asarray(feats[i].descriptors, np.float32) for i in chunk]
        kq = _pow2(max((len(q) for q in qs), default=1))
        dim = next((q.shape[1] for q in qs if q.size), 128)
        qp = np.zeros((len(chunk), kq, dim), np.float32)
        qv = np.zeros((len(chunk), kq), bool)
        for b, q in enumerate(qs):
            qp[b, : len(q)] = q
            qv[b, : len(q)] = True
        m = index.search(jnp.asarray(qp.reshape(len(chunk) * kq, -1)),
                         valid=jnp.asarray(qv.reshape(-1)))
        best_j, n_votes = _vote_device(
            jnp.asarray(own), m.indices.reshape(len(chunk), kq),
            m.mask.reshape(len(chunk), kq), n_frames=F)
        best_j = np.asarray(best_j)
        n_votes = np.asarray(n_votes)

        for b, i in enumerate(chunk):
            if not len(qs[b]):
                continue
            j = int(best_j[b])
            v_j = int(n_votes[b])
            if v_j < min_votes:
                continue

            # geometric verification: mutual matches + essential RANSAC
            dj = np.asarray(feats[j].descriptors, np.float32)
            db = _pow2(len(dj))
            mm = mutual_match(jnp.asarray(_pad_rows(dj, db)),
                              jnp.asarray(qp[b]),
                              valid_a=jnp.asarray(np.arange(db) < len(dj)),
                              valid_b=jnp.asarray(qv[b]), ratio=0.8)
            sel = np.asarray(mm.mask)           # False on pad rows
            if sel.sum() < min_inliers:
                continue
            idx = np.asarray(mm.indices)
            kj = np.stack([feats[j].x[sel[: len(dj)]],
                           feats[j].y[sel[: len(dj)]]], axis=1)
            ki = np.stack([feats[i].x[idx[sel]],
                           feats[i].y[idx[sel]]], axis=1)
            M = len(kj)
            cap = _pow2(M)
            vmask = np.arange(cap) < M
            x1 = geo.normalize_points(jnp.asarray(_pad_rows(kj, cap)), intr_j)
            x2 = geo.normalize_points(jnp.asarray(_pad_rows(ki, cap)), intr_j)
            key, sub = jax.random.split(key)
            # revisits are the small-rotation / noisy regime the
            # bas-relief fixes exist for; opt in (see
            # estimate_relative_pose docstring)
            tv = estimate_relative_pose(x1, x2, jnp.asarray(vmask), sub,
                                        rotation_prior=10.0,
                                        adaptive_threshold=True)
            inl = (np.asarray(sampson_distance(tv.E, x1, x2))
                   < verify_thr)[:M] & vmask[:M]
            n_in = int(inl.sum())
            if n_in < min_inliers:
                continue
            kp_earlier = np.flatnonzero(sel)[inl]      # kp idx in frame j
            kp_later = idx[sel][inl]                   # kp idx in frame i
            edges.append(LoopEdge(
                i=j, j=i, R_rel=np.asarray(tv.R), t_rel=np.asarray(tv.t),
                matches=np.stack([kp_earlier, kp_later],
                                 axis=1).astype(np.int64),
                n_inliers=n_in, votes=v_j))
    return edges


def _local_depths(feats, intr_j, R, t, pair_matches, f, kp_ids):
    """Depths of keypoints `kp_ids` of frame f in frame f's camera, from
    triangulation against a CONSECUTIVE neighbor using the (drifted)
    trajectory poses — i.e. depths at frame f's LOCAL map scale.

    Returns (valid [K] bool, z [K] f32).
    """
    F = len(feats)
    kp_ids = np.asarray(kp_ids, np.int64)
    z = np.zeros(len(kp_ids), np.float32)
    valid = np.zeros(len(kp_ids), bool)
    # forward pair (f, f+1) keyed on column 0, else backward keyed on 1
    for g, col in ((f + 1, 0), (f - 1, 1)) if f + 1 < F else \
                  ((f - 1, 1),):
        if g < 0:
            break
        m = pair_matches[min(f, g)]
        lut = {int(row[col]): int(row[1 - col]) for row in m}
        need = [k for k, kp in enumerate(kp_ids)
                if not valid[k] and int(kp) in lut]
        if not need:
            continue
        kf = kp_ids[need]
        kg = np.array([lut[int(kp)] for kp in kf], np.int64)
        xf = np.stack([feats[f].x[kf], feats[f].y[kf]], axis=1)
        xg = np.stack([feats[g].x[kg], feats[g].y[kg]], axis=1)
        nf = geo.normalize_points(jnp.asarray(xf, jnp.float32), intr_j)
        ng = geo.normalize_points(jnp.asarray(xg, jnp.float32), intr_j)
        X = np.asarray(triangulate(
            jnp.asarray(R[f]), jnp.asarray(t[f]),
            jnp.asarray(R[g]), jnp.asarray(t[g]), nf, ng))
        zc = X @ R[f].T[:, 2] + t[f][2]           # depth in frame f
        z[need] = zc.astype(np.float32)
        valid[need] = zc > 1e-6
    return valid, z


def loop_sim3_measurements(
    feats,
    intr: np.ndarray,
    R: np.ndarray,
    t: np.ndarray,
    pair_matches: list[np.ndarray],
    edges: list[LoopEdge],
    min_support: int = 8,
) -> list[tuple]:
    """Sim(3) measurements for verified loop edges, via depth ratios.

    For a loop (a earlier, b later) the two-view pair gives depths at
    UNIT baseline; triangulating the same keypoints against consecutive
    neighbors with the trajectory poses gives depths at each frame's
    LOCAL map scale.  With B the true metric baseline and s_f frame f's
    local-scale drift factor, median(z_local/z_pair) measures s_f * B at
    each end, so the ratio is the relative scale s_b/s_a and
    (s_b * B) * t_unit is the loop translation in b's local units —
    exactly the S_b o S_a^{-1} measurement sim3.chain_graph expects
    (tested against injected drift in tests/test_sim3.py).

    Returns [(a, b, s_rel, R_rel [3,3], t_rel [3])], skipping edges with
    fewer than `min_support` triangulable keypoints at either end.
    """
    intr_j = jnp.asarray(intr, jnp.float32)
    out = []
    for e in edges:
        kp_a, kp_b = e.matches[:, 0], e.matches[:, 1]
        xa = np.stack([feats[e.i].x[kp_a], feats[e.i].y[kp_a]], axis=1)
        xb = np.stack([feats[e.j].x[kp_b], feats[e.j].y[kp_b]], axis=1)
        na = geo.normalize_points(jnp.asarray(xa, jnp.float32), intr_j)
        nb = geo.normalize_points(jnp.asarray(xb, jnp.float32), intr_j)
        Xp = np.asarray(triangulate(
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray(e.R_rel), jnp.asarray(e.t_rel), na, nb))
        z_pair_a = Xp[:, 2]
        z_pair_b = Xp @ e.R_rel.T[:, 2] + e.t_rel[2]

        va, z_loc_a = _local_depths(feats, intr_j, R, t, pair_matches,
                                    e.i, kp_a)
        vb, z_loc_b = _local_depths(feats, intr_j, R, t, pair_matches,
                                    e.j, kp_b)
        ok_a = va & (z_pair_a > 1e-6)
        ok_b = vb & (z_pair_b > 1e-6)
        if ok_a.sum() < min_support or ok_b.sum() < min_support:
            continue
        scale_a = float(np.median(z_loc_a[ok_a] / z_pair_a[ok_a]))
        scale_b = float(np.median(z_loc_b[ok_b] / z_pair_b[ok_b]))
        if scale_a <= 1e-9 or scale_b <= 1e-9:
            continue
        out.append((e.i, e.j, scale_b / scale_a, e.R_rel,
                    scale_b * e.t_rel))
    return out


# NOTE on integration: verified loop matches are fused as BA TRACKS
# (build_observations extra_matches), not as pose-graph edges.
# Measured findings behind that choice (synthetic circuits, 18 frames):
#  - pose-graph loop edges with translation scale borrowed from the
#    drifted estimate made ATE WORSE on an out-and-back revisit (true
#    baseline ~0 there, so the borrowed scale is exactly wrong);
#  - SE(3) pose-graph loop edges cannot correct the dominant error mode
#    of the windowed monocular pipeline (per-step SCALE noise — a
#    Sim(3) graph would be needed);
#  - track fusion is geometrically correct (loop matches verified
#    against ground truth: 25/25 with <2 px reprojection) and lets the
#    global BA apply the constraint, but on weak-parallax circuits the
#    BA basin is dominated by the same scale noise, so ATE gains are
#    not guaranteed.  Detection + verification accuracy ARE guaranteed
#    and tested (tests/test_odometry.py).
#  - the Sim(3) graph (sim3.py) with depth-ratio loop measurements
#    (loop_sim3_measurements above) closes the remaining gap for DRIFT:
#    on injected 2%/step drift it cuts ATE 390x (tests/test_sim3.py),
#    and its real-data measurement is accurate (18-frame circuit:
#    measured s_rel 10.7 vs ~7.4 step-length-derived truth, loop R_rel
#    0.7 deg off).  But the same circuit's local-scale profile is
#    per-step JITTER (1 -> 6.7 -> 14 -> 5.7 -> ... -> 7.4), which
#    violates the graph's smooth-scale (consecutive s_rel = 1) prior
#    and measurably distorted the chain (ATE 0.14 -> 0.46) — hence
#    loop_graph="sim3" is opt-in in reconstruct_long_sequence, intended
#    for slow-drift dataset sequences, not jittery circuits.
