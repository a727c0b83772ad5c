"""Vectorized track building / block packing == the loop implementations."""

import numpy as np
import pytest

from local_features_tpu.sfm.pipeline import _build_tracks
from local_features_tpu.sfm.sparse_ba import build_track_blocks
from local_features_tpu.sfm.tracks import (FlatTracks, build_tracks_flat,
                                           build_track_blocks_flat)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _random_chain_matches(rng, F=12, kmax=40):
    """Random one-to-one consecutive matches (the mutual-match
    invariant) over ragged per-frame keypoint counts."""
    n_kps = [int(rng.integers(5, kmax)) for _ in range(F)]
    pair_matches = []
    for f in range(F - 1):
        na, nb = n_kps[f], n_kps[f + 1]
        m = int(rng.integers(0, min(na, nb)))
        src = rng.choice(na, size=m, replace=False)
        dst = rng.choice(nb, size=m, replace=False)
        pair_matches.append(np.stack([src, dst], axis=1).astype(np.int64))
    return pair_matches, n_kps


def test_build_tracks_flat_matches_union_find(rng):
    pair_matches, n_kps = _random_chain_matches(rng)
    flat = build_tracks_flat(pair_matches, n_kps)

    ref = _build_tracks(pair_matches, n_kps)
    ref_sets = {frozenset(t.items()) for t in ref}

    got_sets = set()
    for t in np.unique(flat.tid):
        sel = flat.tid == t
        got_sets.add(frozenset(zip(flat.frame[sel].tolist(),
                                   flat.kp[sel].tolist())))
    assert got_sets == ref_sets
    assert flat.n_tracks == len(ref)
    # sorted by (tid, frame), every track >= 2 obs
    assert (np.diff(flat.tid) >= 0).all()
    counts = np.bincount(flat.tid, minlength=flat.n_tracks)
    assert (counts >= 2).all()


def _random_ragged_tracks(rng, n_tracks=200, n_cameras=100, kmax=12):
    track_cams, track_uvs = [], []
    for _ in range(n_tracks):
        k = int(rng.integers(2, kmax))
        start = int(rng.integers(0, n_cameras - 1))
        cams = np.arange(start, min(start + k, n_cameras))
        track_cams.append(cams)
        track_uvs.append(rng.uniform(0, 640, (len(cams), 2)).astype(
            np.float32))
    X = rng.standard_normal((n_tracks, 3)).astype(np.float32)
    return track_cams, track_uvs, X


@pytest.mark.parametrize("cap,mult", [(None, 1), (16, 4)])
def test_block_builder_flat_matches_loop(rng, cap, mult):
    n_cameras = 100
    track_cams, track_uvs, X = _random_ragged_tracks(rng,
                                                     n_cameras=n_cameras)
    ref_blocks, ref_cwin, ref_stats = build_track_blocks(
        track_cams, track_uvs, X, n_cameras, c_blk=16, halo=8, max_obs=6,
        block_capacity=cap, n_blocks_multiple=mult)

    # flat form: tid order == input list order, obs sorted by (tid, cam)
    tid = np.concatenate([np.full(len(c), i, np.int64)
                          for i, c in enumerate(track_cams)])
    cams = np.concatenate(track_cams).astype(np.int32)
    uv = np.concatenate(track_uvs)
    flat = FlatTracks(tid=tid, frame=cams, kp=np.zeros_like(cams),
                      n_tracks=len(track_cams))
    got_blocks, got_cwin, got_stats = build_track_blocks_flat(
        flat, uv, X, n_cameras, c_blk=16, halo=8, max_obs=6,
        block_capacity=cap, n_blocks_multiple=mult)

    assert got_cwin == ref_cwin
    assert got_stats == ref_stats
    for name in TrackBlocksFields():
        a, b = getattr(ref_blocks, name), getattr(got_blocks, name)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def TrackBlocksFields():
    from local_features_tpu.sfm.sparse_ba import TrackBlocks
    return TrackBlocks._fields


def test_flat_blocks_feed_sparse_ba(rng):
    """The flat builder's blocks run through sparse_bundle_adjust."""
    import jax.numpy as jnp
    from local_features_tpu.sfm.sparse_ba import sparse_bundle_adjust

    n_cameras = 24
    track_cams, track_uvs, X = _random_ragged_tracks(
        rng, n_tracks=60, n_cameras=n_cameras, kmax=6)
    tid = np.concatenate([np.full(len(c), i, np.int64)
                          for i, c in enumerate(track_cams)])
    cams = np.concatenate(track_cams).astype(np.int32)
    uv = np.concatenate(track_uvs)
    flat = FlatTracks(tid=tid, frame=cams, kp=np.zeros_like(cams),
                      n_tracks=len(track_cams))
    blocks, c_win, _ = build_track_blocks_flat(
        flat, uv, X, n_cameras, c_blk=8, halo=4, max_obs=6)
    R = jnp.broadcast_to(jnp.eye(3), (n_cameras, 3, 3))
    t = jnp.zeros((n_cameras, 3)).at[:, 2].set(
        jnp.arange(n_cameras, dtype=jnp.float32) * 0.1)
    res = sparse_bundle_adjust(R, t, blocks, jnp.asarray(
        [500.0, 500.0, 320.0, 240.0]), c_win, n_iters=2, cg_iters=5)
    assert np.isfinite(float(res.cost))


def test_merge_loop_tracks_flat(rng):
    """Loop-closure fusion: tracks joined by loop matches collapse into
    one id; the result stays sorted, densely relabeled, and keeps every
    observation."""
    from types import SimpleNamespace

    from local_features_tpu.sfm.tracks import merge_loop_tracks_flat

    pm, n_kps = _random_chain_matches(rng, F=10, kmax=30)
    flat = build_tracks_flat(pm, n_kps)
    N = flat.n_tracks
    assert N > 4

    # pick two tracks with disjoint frame spans and "close the loop"
    # between their observations
    first = np.flatnonzero(np.r_[True, flat.tid[1:] != flat.tid[:-1]])
    a, b = flat.tid[first[0]], flat.tid[first[-1]]
    ia, ib = first[0], first[-1]
    edge = SimpleNamespace(
        i=int(flat.frame[ia]), j=int(flat.frame[ib]),
        matches=np.array([[flat.kp[ia], flat.kp[ib]]], np.int64))
    merged = merge_loop_tracks_flat(flat, [edge], n_kps)

    assert merged.n_tracks == N - 1
    assert len(merged.tid) == len(flat.tid)          # no obs lost
    # sorted by (tid, frame)
    key = merged.tid * 1000 + merged.frame
    assert (np.diff(key) >= 0).all()
    # dense ids
    assert set(np.unique(merged.tid)) == set(range(N - 1))
    # the two chosen observations now share a track id
    ta = merged.tid[(merged.frame == edge.i) & (merged.kp == edge.matches[0, 0])]
    tb = merged.tid[(merged.frame == edge.j) & (merged.kp == edge.matches[0, 1])]
    assert len(ta) and len(tb) and ta[0] == tb[0]
    # no-op cases
    assert merge_loop_tracks_flat(flat, [], n_kps) is flat


def test_flat_observation_uv_matches_per_frame_loop(rng):
    from local_features_tpu.sfm.tracks import flat_observation_uv

    pair_matches, n_kps = _random_chain_matches(rng)
    flat = build_tracks_flat(pair_matches, n_kps)

    class _F:
        def __init__(self, k):
            self.x = rng.uniform(0, 640, k).astype(np.float32)
            self.y = rng.uniform(0, 480, k).astype(np.float32)

    feats = [_F(k) for k in n_kps]
    uv = flat_observation_uv(feats, flat)

    # reference: the per-frame boolean-mask gather the O(total)
    # concatenated fancy index replaced
    ref = np.zeros((len(flat.tid), 2), np.float32)
    for f in np.unique(flat.frame):
        sel = flat.frame == f
        ref[sel, 0] = feats[f].x[flat.kp[sel]]
        ref[sel, 1] = feats[f].y[flat.kp[sel]]
    assert np.array_equal(uv, ref)

    empty = FlatTracks(np.zeros(0, np.int64), np.zeros(0, np.int32),
                       np.zeros(0, np.int32), 0)
    assert flat_observation_uv(feats, empty).shape == (0, 2)


def test_block_builder_mid_even_options():
    """assign="mid" + subsample="even": kept observations per track are
    min(in-window, K), evenly spread across the span with the first
    in-window obs always kept, windows center on the track's mid
    camera, and the drop accounting matches the packed contents."""
    import numpy as np

    from local_features_tpu.sfm.tracks import (FlatTracks,
                                               build_track_blocks_flat)

    rng = np.random.default_rng(11)
    F = 200
    tids, frames, kps = [], [], []
    spans = []
    for t in range(40):
        start = int(rng.integers(0, F - 2))
        length = int(rng.integers(2, min(F - start, 90)))
        spans.append((start, start + length - 1))
        tids += [t] * length
        frames += list(range(start, start + length))
        kps += [t] * length
    order = np.lexsort((frames, tids))
    flat = FlatTracks(tid=np.asarray(tids, np.int64)[order],
                      frame=np.asarray(frames, np.int32)[order],
                      kp=np.asarray(kps, np.int32)[order], n_tracks=40)
    uv = rng.random((len(flat.tid), 2)).astype(np.float32)
    X0 = rng.random((40, 3)).astype(np.float32)

    K = 8
    blocks, c_win, stats = build_track_blocks_flat(
        flat, uv, X0, F, c_blk=32, halo=16, max_obs=K,
        assign="mid", subsample="even")
    valid = np.asarray(blocks.valid)
    cam = np.asarray(blocks.cam)
    ws = np.asarray(blocks.win_start)
    # window-local camera indices in range
    assert (cam[valid] >= 0).all() and (cam[valid] < c_win).all()
    kept_total = int(valid.sum())
    # reconstruct per-track expectations
    exp_kept = 0
    for t in range(40):
        obs_f = np.sort(flat.frame[flat.tid == t].astype(np.int64))
        mid = (obs_f[0] + obs_f[-1]) // 2
        b = min(mid // 32, np.asarray(blocks.win_start).shape[0] - 1)
        w0 = int(np.clip(b * 32 - 16, 0, F - c_win))
        inwin = obs_f[(obs_f >= w0) & (obs_f < w0 + c_win)]
        exp_kept += min(len(inwin), K)
    assert kept_total == exp_kept
    assert stats["dropped_obs"] == len(flat.tid) - kept_total
    # even spread of every valid track slot's kept frames
    for b in range(valid.shape[0]):
        w0 = int(ws[b])
        for s in range(valid.shape[1]):
            if not np.asarray(blocks.tvalid)[b, s]:
                continue
            fr = np.sort(w0 + cam[b, s][valid[b, s]])
            if len(fr) > 1:
                gaps = np.diff(fr)
                n_in = len(fr)
                # spread: max gap bounded by ~2x the even spacing
                assert gaps.max() <= max(2 * (fr[-1] - fr[0]) // max(
                    n_in - 1, 1) + 2, 3)


def test_block_builder_merge_weighted():
    """subsample="merge": every in-window observation is represented —
    slot uv is the mean of its cell's raw obs, weight is sqrt(count),
    total weighted multiplicity equals the in-window obs count, and
    dropped_obs counts ONLY window-clipped observations."""
    import numpy as np

    from local_features_tpu.sfm.tracks import (FlatTracks,
                                               build_track_blocks_flat)

    rng = np.random.default_rng(3)
    F = 100
    tids, frames = [], []
    for t in range(12):
        start = int(rng.integers(0, 40))
        length = int(rng.integers(2, 60))
        tids += [t] * length
        frames += list(range(start, min(start + length, F)))
    tids = np.asarray(tids, np.int64)
    frames = np.asarray(frames, np.int32)[: len(tids)]
    order = np.lexsort((frames, tids))
    flat = FlatTracks(tid=tids[order], frame=frames[order],
                      kp=np.zeros(len(tids), np.int32), n_tracks=12)
    uv = rng.random((len(flat.tid), 2)).astype(np.float32)
    X0 = rng.random((12, 3)).astype(np.float32)

    K = 6
    blocks, c_win, stats = build_track_blocks_flat(
        flat, uv, X0, F, c_blk=32, halo=16, max_obs=K,
        assign="mid", subsample="merge")
    valid = np.asarray(blocks.valid)
    wobs = np.asarray(blocks.wobs)
    cam = np.asarray(blocks.cam)
    ws = np.asarray(blocks.win_start)
    # weighted multiplicity == number of in-window raw obs
    n_inwin = len(flat.tid) - stats["dropped_obs"]
    assert int((wobs[valid] ** 2).round().sum()) == n_inwin
    assert stats["merged_obs"] == n_inwin - int(valid.sum())
    # per-slot uv equals the mean of the cell's raw observations
    # (reconstruct per-track windows by brute force)
    for t in range(12):
        m = flat.tid == t
        fr = flat.frame[m].astype(np.int64)
        first, last = fr.min(), fr.max()
        b = min(((first + last) // 2) // 32, valid.shape[0] - 1)
        w0 = int(np.clip(b * 32 - 16, 0, F - c_win))
        inwin = (fr >= w0) & (fr < w0 + c_win)
        nk = int(inwin.sum())
        if nk < 2:
            continue
        ranks = np.arange(nk)
        cells = ranks * K // nk
        uv_t = uv[m][inwin]
        # find the slot of this track: the one whose weighted count sums
        # to nk in block b
        got = False
        for s in range(valid.shape[1]):
            if not np.asarray(blocks.tvalid)[b, s]:
                continue
            if int((wobs[b, s][valid[b, s]] ** 2).round().sum()) != nk:
                continue
            exp_uv = np.stack([uv_t[cells == c].mean(0)
                               for c in np.unique(cells)])
            got_uv = np.asarray(blocks.uv)[b, s][valid[b, s]]
            if got_uv.shape == exp_uv.shape and np.allclose(
                    got_uv, exp_uv, atol=1e-5):
                got = True
                break
        assert got, f"track {t}: no slot with matching merged uv"
