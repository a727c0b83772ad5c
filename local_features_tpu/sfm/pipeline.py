"""Small-N incremental SfM pipeline: frames -> features -> matches ->
two-view init -> tracks -> triangulation -> bundle adjustment.

BASELINE.md config 3.  Device work (front-end, matching, triangulation,
BA) is batched JAX; the track-building graph logic is host-side NumPy —
the same split as the reference's host blob-filter between GPU phases.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..api import LocalFeatures
from ..ops.matching import mutual_match
from . import geometry as geo
from .ba import BAState, lm_bundle_adjust
from .two_view import estimate_relative_pose, triangulate


@dataclass
class Reconstruction:
    R: np.ndarray          # [C, 3, 3] world->cam
    t: np.ndarray          # [C, 3]
    X: np.ndarray          # [P, 3]
    uv: np.ndarray         # [C, P, 2]
    mask: np.ndarray       # [C, P]
    cost: float = 0.0
    cost_history: np.ndarray = field(default=None)
    # per-track observation keys {local_frame: kp_idx} — lets windowed
    # odometry identify the SAME physical track across overlapping
    # windows (they share the detected features), so stitching can use
    # structure, not just the (overlap-1) camera-center distances
    track_obs: list = field(default=None)

    @property
    def camera_centers(self) -> np.ndarray:
        return np.einsum("cji,cj->ci", self.R, -self.t)


def _pad_track_bucket(uv, mask, tracks, X=None, bucket=512):
    """Pad the track dimension up to a multiple of `bucket` (all-False
    mask, empty observation maps, zero points) so P-keyed jits are
    shared across windows instead of recompiling per track count."""
    P = uv.shape[1]
    Pb = max(bucket, -(-P // bucket) * bucket)
    if Pb != P:
        uv = np.pad(uv, ((0, 0), (0, Pb - P), (0, 0)))
        mask = np.pad(mask, ((0, 0), (0, Pb - P)))
        tracks = list(tracks) + [{} for _ in range(Pb - P)]
        if X is not None:
            X = np.pad(X, ((0, Pb - P), (0, 0)))
    if X is None:
        return uv, mask, tracks
    return uv, mask, tracks, X


def _match_pair(desc_a, desc_b, ratio=0.8):
    m = mutual_match(jnp.asarray(desc_a), jnp.asarray(desc_b), ratio=ratio)
    idx = np.asarray(m.indices)
    ok = np.asarray(m.mask)
    return np.stack([np.flatnonzero(ok), idx[ok]], axis=1)  # [M, 2]


def _build_tracks(pair_matches: list[np.ndarray], n_kps: list[int],
                  extra_matches=None):
    """Union-find over (frame, kp) nodes chained by consecutive matches.

    `extra_matches`: optional [(frame_a, frame_b, matches [M, 2])] —
    non-consecutive links (loop closures) fused into the same tracks.
    Returns tracks: list of {frame: kp_idx} dicts with >= 2 observations.
    """
    parent: dict = {}

    def find(a):
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    # pass 1: consecutive matches only — mutual matching is one-to-one
    # per pair, so these components are simple chains with at most one
    # keypoint per frame (conflict-free by construction)
    for a, matches in enumerate(pair_matches):
        for i, j in matches:
            union((a, int(i)), (a + 1, int(j)))

    groups: dict = {}
    for a, matches in enumerate(pair_matches):
        for i, j in matches:
            for node in ((a, int(i)), (a + 1, int(j))):
                groups.setdefault(find(node), {})[node[0]] = node[1]

    # pass 2: loop-closure links merge two chains only when their
    # frame->kp maps agree on every shared frame; an incompatible link
    # (a wrong loop match merging distinct physical points) is excised
    # on its own, leaving both good chains intact
    for a, b, matches in (extra_matches or []):
        for i, j in matches:
            na, nb = (a, int(i)), (b, int(j))
            ra, rb = find(na), find(nb)
            ga = groups.setdefault(ra, {na[0]: na[1]})
            if ra == rb:
                continue
            gb = groups.setdefault(rb, {nb[0]: nb[1]})
            if any(ga[f] != gb[f] for f in ga.keys() & gb.keys()):
                continue
            union(ra, rb)
            ga.update(gb)
            groups.pop(ra if find(ra) != ra else rb)
            groups[find(ra)] = ga

    return [g for g in groups.values() if len(g) >= 2]


def build_observations(feats, pair_matches, min_track_len=2,
                       extra_matches=None, return_tracks=False):
    """(uv [F, P, 2], mask [F, P]) from per-frame features + consecutive
    pair matches (+ optional loop-closure matches), via union-find
    track building.  `return_tracks=True` appends the per-track
    {frame: kp_idx} observation maps (track p = column p)."""
    F = len(feats)
    tracks = [t for t in _build_tracks(pair_matches,
                                       [len(ft) for ft in feats],
                                       extra_matches=extra_matches)
              if len(t) >= min_track_len]
    P = len(tracks)
    uv = np.zeros((F, P, 2), np.float32)
    mask = np.zeros((F, P), bool)
    for p, tr in enumerate(tracks):
        for f, k in tr.items():
            uv[f, p] = [feats[f].x[k], feats[f].y[k]]
            mask[f, p] = True
    if return_tracks:
        return uv, mask, tracks
    return uv, mask


def reconstruct_sequence(
    frames: np.ndarray,
    intr: np.ndarray,
    max_features: int = 1000,
    n_scales: int = 4,
    ba_iters: int = 25,
    ratio: float = 0.8,
    min_track_len: int = 2,
    seed: int = 0,
    engine: LocalFeatures | None = None,
    features: list | None = None,
    matches: list[np.ndarray] | None = None,
    huber_delta: float | None = 2.0,
) -> Reconstruction:
    """Reconstruct a short ordered sequence of [F, H, W] grayscale frames.

    Pose initialization chains pairwise essential-matrix estimates with
    scale propagation via shared tracks, then a full LM BA refines
    everything jointly.  `features`/`matches` may be precomputed (the
    odometry driver shares them across overlapping windows).
    """
    F = frames.shape[0]
    intr_j = jnp.asarray(intr, jnp.float32)
    if features is not None:
        feats = features
    else:
        lf = engine or LocalFeatures(max_features=max_features,
                                     n_scales=n_scales)
        feats = lf.detect_sequence(frames, max_features)

    if matches is not None:
        pair_matches = matches
    else:
        from ..ops.matching import match_consecutive, pad_descriptor_sequence

        descs, dvalid = pad_descriptor_sequence(feats)
        pair_matches = match_consecutive(descs, dvalid, ratio=ratio)

    uv, mask, tracks = build_observations(feats, pair_matches,
                                          min_track_len, return_tracks=True)
    P = uv.shape[1]
    if P < 8:
        raise ValueError(f"too few tracks ({P}) to reconstruct")

    # bucket the track dimension: every window of a long sequence has a
    # DIFFERENT track count, so un-bucketed shapes recompile every
    # P-keyed jit (RANSAC, triangulation, the whole LM BA) once per
    # window — ~200 heavy XLA CPU compiles in one process, which is
    # both slow and crashes the compiler past a threshold (CLAUDE.md).
    # Padded tracks have mask all-False end to end.
    uv, mask, tracks = _pad_track_bucket(uv, mask, tracks)
    P = uv.shape[1]

    uv_j = jnp.asarray(uv)
    norm = np.asarray(geo.normalize_points(uv_j, intr_j))

    # chained pairwise pose initialization with scale propagation
    Rs = [np.eye(3, dtype=np.float32)]
    ts = [np.zeros(3, dtype=np.float32)]
    key = jax.random.PRNGKey(seed)
    X_est = np.full((P, 3), np.nan, np.float32)  # in world frame
    prev_R_rel = np.eye(3, dtype=np.float32)
    prev_step = None          # previous |t_rel * scale|
    prev_t_dir = None
    for f in range(F - 1):
        both = mask[f] & mask[f + 1]
        key, sub = jax.random.split(key)
        res = estimate_relative_pose(
            jnp.asarray(norm[f]), jnp.asarray(norm[f + 1]),
            jnp.asarray(both), sub)
        R_rel = np.asarray(res.R)
        t_rel = np.asarray(res.t)
        inl = np.asarray(res.inliers)
        # constant-velocity fallback: a pair with too few verified
        # correspondences produces an arbitrary pose (one 13-point pair
        # with a 75-deg t error was enough to flip a whole corridor
        # reconstruction); reuse the previous relative motion instead
        # and let the bundle adjustment refine it
        weak = int(res.n_inliers) < 12 and f > 0
        if weak and prev_t_dir is not None:
            R_rel = prev_R_rel
            t_rel = prev_t_dir

        # triangulate inlier tracks in frame f's camera frame
        Xc = np.asarray(triangulate(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(R_rel), jnp.asarray(t_rel),
            jnp.asarray(norm[f]), jnp.asarray(norm[f + 1])))
        # to world: X_w = R_f^T (Xc - t_f)
        Xw = (Xc - ts[f]) @ Rs[f]

        if f == 0:
            scale = 1.0
        else:
            # scale from tracks already triangulated with the global scale
            known = inl & np.isfinite(X_est[:, 0])
            if known.sum() >= 3:
                Xc_known_global = X_est[known] @ Rs[f].T + ts[f]
                z_global = Xc_known_global[:, 2]
                z_local = Xc[known][:, 2]
                ratio_z = z_global / np.where(np.abs(z_local) > 1e-9,
                                              z_local, 1e-9)
                scale = float(np.median(ratio_z))
            else:
                scale = 1.0

        # scale sanity: the median-of-ratios estimate over a thin track
        # overlap can spike; clamp each step's length to [1/3, 3]x the
        # previous step (video prior), which keeps one bad link from
        # poisoning every later pose in the chain
        if prev_step is not None and np.isfinite(prev_step) and prev_step > 0:
            step_len = abs(scale) * float(np.linalg.norm(t_rel))
            lo, hi = prev_step / 3.0, prev_step * 3.0
            if step_len < lo or step_len > hi:
                scale = float(np.clip(step_len, lo, hi)) / max(
                    float(np.linalg.norm(t_rel)), 1e-9) * np.sign(scale or 1.0)
        t_rel = t_rel * scale
        prev_R_rel = R_rel
        prev_t_dir = t_rel / max(float(np.linalg.norm(t_rel)), 1e-9)
        prev_step = float(np.linalg.norm(t_rel))
        R_next = R_rel @ Rs[f]
        t_next = R_rel @ ts[f] + t_rel
        Rs.append(R_next.astype(np.float32))
        ts.append(t_next.astype(np.float32))

        # record newly triangulated points at the global scale
        Xw_scaled = (Xc * scale - ts[f]) @ Rs[f]
        new = inl & ~np.isfinite(X_est[:, 0]) & (Xc[:, 2] > 0.05)
        X_est[new] = Xw_scaled[new]

    good = np.isfinite(X_est[:, 0])
    # drop tracks that never triangulated, re-bucketing the survivors
    # (the filtered count varies per window too)
    uv, mask, X_est = uv[:, good], mask[:, good], X_est[good]
    tracks = [tr for tr, g in zip(tracks, good) if g]
    uv, mask, tracks, X_est = _pad_track_bucket(uv, mask, tracks, X_est)

    state0 = BAState(R=jnp.asarray(np.stack(Rs)),
                     t=jnp.asarray(np.stack(ts)),
                     X=jnp.asarray(X_est))
    # robust loss is NOT optional on real imagery: repetitive texture
    # produces ratio-test-surviving mismatches, and squared-loss LM warps
    # the cameras to appease them (measured on the phototex renders:
    # BA initialized AT ground-truth poses left with one step 86x off;
    # huber_delta=2 px recovered uniform steps).  The odometry global BA
    # already used 2.0 (odometry.py:243); the per-window BA now matches.
    result = lm_bundle_adjust(state0, jnp.asarray(uv), jnp.asarray(mask),
                              intr_j, n_iters=ba_iters,
                              huber_delta=huber_delta)
    return Reconstruction(
        R=np.asarray(result.state.R),
        t=np.asarray(result.state.t),
        X=np.asarray(result.state.X),
        uv=uv, mask=mask,
        cost=float(result.cost),
        cost_history=np.asarray(result.cost_history),
        track_obs=tracks,
    )


class BatchedReconstruction(NamedTuple):
    """Result of reconstruct_sequence_batched (config-4/5 chain)."""

    R: np.ndarray            # [F, 3, 3] world->cam
    t: np.ndarray            # [F, 3]
    cost: float
    cost_history: np.ndarray
    stats: dict

    @property
    def camera_centers(self) -> np.ndarray:
        return np.einsum("cji,cj->ci", self.R, -self.t)


def reconstruct_sequence_batched(
    frames: np.ndarray,
    intr: np.ndarray,
    max_features: int = 500,
    engine: LocalFeatures | None = None,
    seed: int = 0,
    ba_iters: int = 10,
    cg_iters: int = 12,
    ba_rounds: int = 2,
    c_blk: int = 32,
    halo: int = 16,
    max_obs: int = 12,
    mesh=None,
    axis: str = "map",
    loop_closure: bool = False,
    loop_kwargs: dict | None = None,
    huber_delta: float = 2.0,
    gate_px: float = 30.0,
    kf_stride: int | str = "auto",
    features: list | None = None,
    matches: list[np.ndarray] | None = None,
    smooth_weight: float = 10.0,
    anneal: float = 0.35,
) -> BatchedReconstruction:
    """Global batched SfM over an ordered [F, H, W] sequence — the
    config-4/5 at-scale chain, every stage a batched device program or
    a flat array program:

      batched front-end -> batched consecutive matching -> vectorized
      track chaining (+ optional loop-closure track fusion) -> chunked
      vmapped pair RANSAC + monocular scale chain -> flat block packing
      -> multiview re-triangulation -> reprojection outlier gate ->
      map-block-partitioned sparse BA (sharded over `mesh` if given).

    Unlike reconstruct_long_sequence's windowed odometry (per-window
    host loop, stitching heuristics), this path has no per-frame host
    round trips and one GLOBAL bundle adjustment; it is both the
    at-scale (config-5) pipeline and, measured on the phototex
    circuits, the more accurate config-4 default.

    loop_closure fuses verified revisit matches into the track set
    (tracks.merge_loop_tracks_flat).  A merged track spans the loop, so
    for sequences short enough (F <= 256) the block window is widened
    to cover the whole sequence; for longer sequences loop tracks
    whose span exceeds c_win are window-clipped (long-range drift is
    then sim3's job — sfm/sim3.py).
    """
    from ..ops.matching import match_consecutive, pad_descriptor_sequence
    from .sequence_init import initialize_sequence
    from .sparse_ba import (filter_block_outliers, sparse_bundle_adjust,
                            triangulate_blocks)
    from .tracks import (build_tracks_flat, build_track_blocks_flat,
                         flat_observation_uv, merge_loop_tracks_flat)

    if features is not None:
        feats = features
        F = len(feats)
    else:
        frames = np.asarray(frames, np.float32)
        F = frames.shape[0]
        lf = engine or LocalFeatures(max_features=max_features)
        feats = lf.detect_sequence(frames, max_features)
    n_kp = [len(np.asarray(f.x)) for f in feats]

    if matches is not None:
        pair_matches = matches
    else:
        descs, dvalid = pad_descriptor_sequence(feats)
        pair_matches = match_consecutive(descs, dvalid)

    flat = build_tracks_flat(pair_matches, n_kp)
    stats = {"n_tracks_chained": int(flat.n_tracks),
             "keypoints_total": int(np.sum(n_kp))}

    # pose init BEFORE loop merging: the scale chain and first-pair
    # structure init depend on the consecutive-chain track shape
    Rs, ts, X0, istats = initialize_sequence(feats, pair_matches, intr,
                                             flat, seed=seed,
                                             kf_stride=kf_stride)
    keyframes = istats.pop("keyframes", None)
    istats.pop("interp_chain_R", None)
    istats.pop("interp_chain_t", None)
    stats.update(istats)

    if loop_closure:
        from .loops import detect_loop_closures
        edges = detect_loop_closures(feats, intr,
                                     **(loop_kwargs or {}))
        stats["loop_edges"] = len(edges)
        if edges:
            flat2 = merge_loop_tracks_flat(flat, edges, n_kp)
            # carry X0 to the merged ids: a merged track keeps the
            # earliest member's first observation (merge_loop_tracks_
            # flat relabels by first frame), so map each new track's
            # first observation back to its old track via the shared
            # (frame, kp) key and inherit that old track's init point
            kmax = max(n_kp) if n_kp else 1
            okey = flat.frame.astype(np.int64) * kmax + flat.kp
            nkey = flat2.frame.astype(np.int64) * kmax + flat2.kp
            o_sort = np.argsort(okey)
            pos = np.searchsorted(okey[o_sort], nkey)
            old_tid = flat.tid[o_sort[pos]]
            first_seen = np.flatnonzero(
                np.r_[True, flat2.tid[1:] != flat2.tid[:-1]])
            X0 = X0[old_tid[first_seen]]
            flat = flat2
            if F <= 256:
                halo = max(halo, -(-max(F - c_blk, 0) // 2))
        stats["n_tracks_merged"] = int(flat.n_tracks)

    uv = flat_observation_uv(feats, flat)
    blocks, c_win, bstats = build_track_blocks_flat(
        flat, uv, X0, F, c_blk=c_blk, halo=halo, max_obs=max_obs,
        n_blocks_multiple=(mesh.devices.size if mesh is not None else 1),
        assign="mid", subsample="merge")
    stats.update(bstats)

    # anchor the keyframe cameras during the dense BA: the keyframe
    # chain has already been jointly adjusted (initialize_sequence's
    # annealed _keyframe_ba), and with c_win-local tracks the dense
    # problem's low-frequency trajectory modes are near-gauge — left
    # free they drift (measured at 1k frames: ATE rose while
    # reprojection cost fell).  Anchors pin the global shape; the
    # in-between cameras polish their SE(3)-interpolated inits.
    fixed = None
    if keyframes is not None and len(keyframes) >= 2:
        fixed = np.zeros(F, bool)
        fixed[np.asarray(keyframes, np.int64)] = True

    Rj, tj = jnp.asarray(Rs), jnp.asarray(ts)
    intr_j = jnp.asarray(intr, jnp.float32)
    # alternate (re-triangulate -> outlier gate -> LM rounds): refitting
    # the points from the moved cameras between LM rounds reaches a
    # lower basin than one long LM run (measured at 1k frames: cost
    # 1.09 single-run vs 0.68 alternating, same total iterations).
    # The gate/Huber pair ANNEALS by `anneal` each round (the keyframe
    # BA lesson, sequence_init._keyframe_ba: a loose gate alone leaves
    # the solution fitting the mismatch tail; a tight gate alone is
    # fragile against a poor init).  Re-triangulation always restarts
    # from the UNGATED packing so observations gated under an early bad
    # estimate can return once the estimate improves.
    blocks0 = blocks
    for r in range(max(1, ba_rounds)):
        X_tri = triangulate_blocks(Rj, tj, blocks0, intr_j, c_win)
        blocks = blocks0._replace(X=X_tri)
        blocks = filter_block_outliers(Rj, tj, blocks, intr_j, c_win,
                                       max_px=gate_px * anneal ** r)
        res = sparse_bundle_adjust(Rj, tj, blocks, intr_j, c_win,
                                   mesh=mesh, axis=axis, n_iters=ba_iters,
                                   cg_iters=cg_iters,
                                   huber_delta=huber_delta * anneal ** r,
                                   fixed_cams=fixed,
                                   smooth_weight=smooth_weight)
        Rj, tj, blocks = res.R, res.t, res.blocks
    return BatchedReconstruction(
        R=np.asarray(res.R), t=np.asarray(res.t),
        cost=float(res.cost),
        cost_history=np.asarray(res.cost_history), stats=stats)
