"""Vectorized track building + flat->TrackBlocks conversion (config 5).

`pipeline.py:_build_tracks` is a per-match Python union-find and
`sparse_ba.py:build_track_blocks` a per-track Python packer — fine at
config-3/4 scale (hundreds of frames), prohibitive at config 5's 10k
images (the 120-frame ATE artifact already spent most of its wall time
in host glue).  This module re-expresses both as flat NumPy array
programs:

- consecutive mutual matches are one-to-one per pair, so tracks are
  simple chains; chain labels propagate frame-to-frame with pure
  fancy-indexing (one O(n_kps) step per frame, no per-match work);
- block packing becomes a lexsort + segmented-cumsum rank computation
  + one fancy-indexed scatter per output array.

Semantics match the loop implementations exactly (tested against them
in tests/test_tracks.py); loop-closure track fusion stays in
pipeline.py — at config-5 scale loop constraints are handled at the
Sim(3) pose-graph level (sfm/loops.py), not by track merging.

Reference counterpart: none (north-star scope, BASELINE.md config 5).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class FlatTracks(NamedTuple):
    """Track observations as flat arrays, sorted by (track, frame).

    O = total observations, N = number of tracks.  Track ids are dense
    [0, N) in order of first appearance (frame-major).
    """

    tid: np.ndarray     # [O] i64 track id
    frame: np.ndarray   # [O] i32 frame index
    kp: np.ndarray      # [O] i32 keypoint index within the frame
    n_tracks: int


def build_tracks_flat(pair_matches: list[np.ndarray],
                      n_kps: list[int]) -> FlatTracks:
    """Chain consecutive mutual matches into tracks, vectorized.

    pair_matches[f]: [M_f, 2] (i, j) matching kp i of frame f to kp j
    of frame f+1.  Mutual matching is one-to-one per pair, so the
    chains are conflict-free by construction — the same invariant
    pipeline.py:_build_tracks pass 1 relies on.  Every track has >= 2
    observations (an id is only born at a match source, and the match
    guarantees the next-frame observation).
    """
    F = len(n_kps)
    obs_t: list[np.ndarray] = []
    obs_f: list[np.ndarray] = []
    obs_k: list[np.ndarray] = []
    next_id = 0
    tid = np.full(n_kps[0] if F else 0, -1, np.int64)
    for f in range(F):
        if f < F - 1 and len(pair_matches) > f and len(pair_matches[f]):
            m = np.asarray(pair_matches[f], np.int64)
            src, dst = m[:, 0], m[:, 1]
            need = tid[src] < 0
            n_new = int(need.sum())
            tid[src[need]] = next_id + np.arange(n_new)
            next_id += n_new
        else:
            src = dst = np.zeros(0, np.int64)
        has = np.flatnonzero(tid >= 0)
        obs_t.append(tid[has])
        obs_f.append(np.full(len(has), f, np.int32))
        obs_k.append(has.astype(np.int32))
        if f < F - 1:
            tid_next = np.full(n_kps[f + 1], -1, np.int64)
            tid_next[dst] = tid[src]
            tid = tid_next
    t = np.concatenate(obs_t) if obs_t else np.zeros(0, np.int64)
    fr = np.concatenate(obs_f) if obs_f else np.zeros(0, np.int32)
    kp = np.concatenate(obs_k) if obs_k else np.zeros(0, np.int32)
    order = np.lexsort((fr, t))
    return FlatTracks(tid=t[order], frame=fr[order], kp=kp[order],
                      n_tracks=next_id)


def concat_gather_xy(feats, frame_idx: np.ndarray,
                     kp_idx: np.ndarray) -> np.ndarray:
    """[M, 2] pixel coordinates of (frame, kp) pairs, resolved with ONE
    fancy index through a concatenation of the ragged per-frame coords.

    O(total_kps + M); the per-frame boolean-mask loop it replaces was
    O(F*M) and dominated the config-5 10k-frame chain's host glue
    (214 s of the 886 s total in CONFIG5_10K_r04).  Shared by
    flat_observation_uv and sequence_init's first-ray fallback."""
    if len(frame_idx) == 0 or len(feats) == 0:
        return np.zeros((len(frame_idx), 2), np.float32)
    xs = [np.asarray(f.x, np.float32) for f in feats]
    offs = np.zeros(len(feats), np.int64)
    np.cumsum([len(x) for x in xs[:-1]], out=offs[1:])
    idx = offs[np.asarray(frame_idx, np.int64)] + kp_idx
    return np.stack(
        [np.concatenate(xs)[idx],
         np.concatenate([np.asarray(f.y, np.float32)
                         for f in feats])[idx]], axis=1)


def flat_observation_uv(feats, flat: FlatTracks) -> np.ndarray:
    """[O, 2] pixel coordinates for each observation."""
    return concat_gather_xy(feats, flat.frame, flat.kp)


def _segment_starts(sorted_ids: np.ndarray) -> np.ndarray:
    """Indices where a new id segment begins in a sorted id array."""
    if len(sorted_ids) == 0:
        return np.zeros(0, np.int64)
    return np.flatnonzero(np.r_[True, sorted_ids[1:] != sorted_ids[:-1]])


def build_track_blocks_flat(
    flat: FlatTracks,
    obs_uv: np.ndarray,
    track_X: np.ndarray,
    n_cameras: int,
    c_blk: int = 32,
    halo: int = 16,
    max_obs: int = 8,
    block_capacity: int | None = None,
    n_blocks_multiple: int = 1,
    assign: str = "first",
    subsample: str = "head",
):
    """Vectorized equivalent of sparse_ba.build_track_blocks.

    Same packing semantics at the defaults (block = first camera's
    block; observations outside the window or past `max_obs` dropped;
    <2-obs tracks leave a gap slot; block overflow drops the tail),
    same stats dict — but expressed as lexsorts + segmented cumsums +
    fancy-indexed scatters, no per-track Python.  Tested slot-for-slot
    equal against the loop builder (tests/test_tracks.py).

    Two round-5 evidence-retention options (CONFIG5_10K_r04 dropped
    54 % of observations with the defaults — dense-video tracks are
    long-lived, the first-camera window clips their tails and the
    head-K cap discards the spread the triangulation needs):

    - assign="mid": key a track's block by its MIDDLE camera, centering
      the window on the track span instead of starting it there;
    - subsample="even": when a track has more in-window observations
      than `max_obs` (=K), keep an evenly-spaced subset across its
      span instead of the head: the first observation always survives
      and the kept set covers >= (1 - 1/K) of the in-window span, so
      triangulation sees (nearly) the track's full baseline.
    """
    import jax.numpy as jnp

    from .sparse_ba import TrackBlocks

    c_win = min(c_blk + 2 * halo, n_cameras)
    n_blocks = max(1, -(-n_cameras // c_blk))
    n_blocks = -(-n_blocks // n_blocks_multiple) * n_blocks_multiple

    tid = flat.tid
    cam = flat.frame.astype(np.int64)
    N = flat.n_tracks
    O = len(tid)

    # per-track segment starts (flat is sorted by (tid, frame))
    seg = _segment_starts(tid)                       # [Nseen]
    seen = tid[seg] if O else np.zeros(0, np.int64)
    first_cam = np.zeros(N, np.int64)
    first_cam[seen] = cam[seg]
    track_len = np.zeros(N, np.int64)
    np.add.at(track_len, tid, 1)

    if assign == "mid":
        last_cam = np.zeros(N, np.int64)
        seg_end = np.r_[seg[1:] - 1, O - 1] if O else np.zeros(0, np.int64)
        last_cam[seen] = cam[seg_end]
        key_cam = (first_cam + last_cam) // 2
    else:
        key_cam = first_cam
    b_of = np.minimum(key_cam // c_blk, n_blocks - 1)            # [N]
    ws_of = np.clip(b_of * c_blk - halo, 0, n_cameras - c_win)   # [N]

    # keep mask: obs inside its track's camera window
    keep = (cam >= ws_of[tid]) & (cam < ws_of[tid] + c_win)      # [O]
    # rank of each KEPT obs within its track (0-based), via segmented
    # cumsum: global cumsum minus the cumsum at the segment start
    csum = np.cumsum(keep) - keep                                # exclusive
    base = np.zeros(N, np.int64)
    base[seen] = csum[seg]
    rank = csum - base[tid]                                      # [O]
    if subsample in ("even", "merge"):
        # evenly-spaced selection of max_obs of the n_kept in-window
        # observations: an obs with in-window rank r survives iff
        # floor(r * K / n_kept) > floor((r-1) * K / n_kept), i.e. it is
        # the first to reach a new one of K evenly-spaced quantile
        # cells — keeps rank 0 always and exactly min(n_kept, K) per
        # track.  Re-rank the survivors so slots stay a dense prefix.
        n_kept = np.zeros(N, np.int64)
        np.add.at(n_kept, tid[keep], 1)
        nk = np.maximum(n_kept[tid], 1)
        cell = rank * max_obs // nk
        if subsample == "even":
            cell_prev = np.where(rank > 0,
                                 (rank - 1) * max_obs // nk, -1)
            sel = keep & (cell > cell_prev)
            csum2 = np.cumsum(sel) - sel
            base2 = np.zeros(N, np.int64)
            base2[seen] = csum2[seg]
            keep_k = sel
            rank = csum2 - base2[tid]
        else:
            # "merge": every in-window obs participates; same-cell obs
            # are AVERAGED into one sqrt(n)-weighted measurement below
            keep_k = keep
    else:
        keep_k = keep & (rank < max_obs)
    # in merge mode keep_k == keep, so kept_per_track counts in-window
    # obs and the >= 2 track gate below is exactly ">= 2 raw obs"
    kept_per_track = np.zeros(N, np.int64)
    np.add.at(kept_per_track, tid[keep_k], 1)
    # NOTE: the loop builder counts "kept minus K" overflow from the
    # WINDOW-kept count, and window-dropped separately
    win_kept = np.zeros(N, np.int64)
    np.add.at(win_kept, tid[keep], 1)

    # per-block slot: rank of track within its block, in tid order
    # (the loop builder enumerates per_block[b] in insertion = tid
    # order, allocating a slot even for tracks it then drops)
    order_t = np.lexsort((np.arange(N), b_of))
    b_sorted = b_of[order_t]
    bseg = _segment_starts(b_sorted)
    bbase = np.zeros(n_blocks, np.int64)
    bbase[b_sorted[bseg] if N else np.zeros(0, np.int64)] = bseg
    slot = np.empty(N, np.int64)
    slot[order_t] = np.arange(N) - bbase[b_sorted]

    # only tracks with >= 1 observation participate (match the loop
    # builder, which iterates actual track lists)
    present = track_len > 0
    n_per_block = np.zeros(n_blocks, np.int64)
    np.add.at(n_per_block, b_of[present], 1)

    T = block_capacity or max(1, int(n_per_block.max(initial=1)))
    in_cap = slot < T
    ok = present & in_cap & (kept_per_track >= 2)

    dropped_tracks = int(np.maximum(n_per_block - T, 0).sum())
    dropped_tracks += int((present & in_cap & (kept_per_track < 2)).sum())
    dropped_obs = int((~keep & (present & in_cap)[tid]).sum())
    if subsample != "merge":
        dropped_obs += int(np.maximum(
            win_kept[present & in_cap] - max_obs, 0).sum())

    uv = np.zeros((n_blocks, T, max_obs, 2), np.float32)
    camo = np.zeros((n_blocks, T, max_obs), np.int32)
    valid = np.zeros((n_blocks, T, max_obs), bool)
    X = np.zeros((n_blocks, T, 3), np.float32)
    tvalid = np.zeros((n_blocks, T), bool)
    win_start = np.clip(np.arange(n_blocks) * c_blk - halo, 0,
                        n_cameras - c_win).astype(np.int32)
    wobs = None

    sc = keep_k & ok[tid]
    if subsample == "merge":
        # average same-cell observations into one measurement per slot:
        # uv = mean, cam = rounded mean window-local index, weight =
        # sqrt(n) (sqrt-information: the BA's normal equations then
        # carry the full multiplicity n).  Dense video makes
        # consecutive observations of a track near-duplicates (flow
        # ~0.05 px/frame at 10k frames vs ~0.4 px detection noise);
        # averaging keeps their noise-reduction value without paying
        # a K slot per raw obs.  Bias from motion within a cell is
        # second-order (linear flow cancels around the cell center).
        bi, si, ki = b_of[tid[sc]], slot[tid[sc]], cell[sc]
        cnt = np.zeros((n_blocks, T, max_obs), np.float64)
        uv_acc = np.zeros((n_blocks, T, max_obs, 2), np.float64)
        cam_acc = np.zeros((n_blocks, T, max_obs), np.float64)
        np.add.at(cnt, (bi, si, ki), 1.0)
        np.add.at(uv_acc, (bi, si, ki), obs_uv[sc].astype(np.float64))
        np.add.at(cam_acc, (bi, si, ki),
                  (cam[sc] - ws_of[tid[sc]]).astype(np.float64))
        valid = cnt > 0
        denom = np.maximum(cnt, 1.0)
        uv = (uv_acc / denom[..., None]).astype(np.float32)
        camo = np.clip(np.rint(cam_acc / denom), 0,
                       c_win - 1).astype(np.int32)
        wobs = np.sqrt(cnt).astype(np.float32)
    else:
        bi, si, ki = b_of[tid[sc]], slot[tid[sc]], rank[sc]
        uv[bi, si, ki] = obs_uv[sc]
        camo[bi, si, ki] = (cam[sc] - ws_of[tid[sc]]).astype(np.int32)
        valid[bi, si, ki] = True
    tvalid[b_of[ok], slot[ok]] = True
    X[b_of[ok], slot[ok]] = np.asarray(track_X, np.float32)[ok]

    blocks = TrackBlocks(
        uv=jnp.asarray(uv), cam=jnp.asarray(camo), valid=jnp.asarray(valid),
        X=jnp.asarray(X), tvalid=jnp.asarray(tvalid),
        win_start=jnp.asarray(win_start),
        wobs=None if wobs is None else jnp.asarray(wobs),
    )
    stats = {"n_blocks": n_blocks, "capacity": T, "c_win": c_win,
             "dropped_obs": dropped_obs, "dropped_tracks": dropped_tracks}
    if subsample == "merge":
        stats["merged_obs"] = int(sc.sum() - valid.sum())
    return blocks, c_win, stats


def merge_loop_tracks_flat(flat: FlatTracks, loop_edges,
                           n_kps: list[int]) -> FlatTracks:
    """Fuse verified loop-closure matches into the flat track set by
    merging the two tracks each match connects (union-find over track
    ids, then a dense relabel + re-sort).

    The merged tracks tie a revisit's observations to the ORIGINAL
    pass's 3-D point, which is what lets a global bundle adjustment
    correct accumulated drift (same role as pipeline.py's
    build_observations extra_matches, but on the vectorized flat
    representation).  NOTE: a merged track spans the whole loop — the
    blocked BA only keeps observations inside its c_win camera window,
    so callers must size halo so c_win covers the revisit span (at
    config-4 sequence lengths: c_win >= n_frames).

    loop_edges: iterable with .i/.j frame ids and .matches [M, 2]
    (kp in frame i, kp in frame j) — sfm/loops.py LoopEdge.
    """
    N = flat.n_tracks
    if not N or not loop_edges:
        return flat
    # (frame, kp) -> tid lookup
    kmax = max(n_kps) if len(n_kps) else 1
    lut = np.full((len(n_kps), kmax), -1, np.int64)
    lut[flat.frame, flat.kp] = flat.tid

    parent = np.arange(N, dtype=np.int64)

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:            # path compression
            parent[a], a = root, parent[a]
        return root

    for e in loop_edges:
        ta = lut[e.i, e.matches[:, 0]]
        tb = lut[e.j, e.matches[:, 1]]
        for a, b in zip(ta, tb):
            if a < 0 or b < 0:
                continue
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    root = np.array([find(int(i)) for i in range(N)], np.int64)
    # dense relabel by (first frame, root) appearance order
    first = np.full(N, np.iinfo(np.int64).max, np.int64)
    np.minimum.at(first, root[flat.tid], flat.frame.astype(np.int64))
    uniq = np.unique(root)
    order = uniq[np.lexsort((uniq, first[uniq]))]
    new_of = np.zeros(N, np.int64)
    new_of[order] = np.arange(len(order))
    tid2 = new_of[root[flat.tid]]
    srt = np.lexsort((flat.frame, tid2))
    return FlatTracks(tid=tid2[srt], frame=flat.frame[srt],
                      kp=flat.kp[srt], n_tracks=len(order))
