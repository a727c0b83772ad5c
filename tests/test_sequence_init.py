"""Keyframed batched init (kf_stride > 1) on an exactly-known synthetic
geometry: keyframe re-matching, scale chain, SE(3) interpolation, and
the vectorized first-ray fallback all run; recovered camera centers
track ground truth after similarity alignment."""

import numpy as np

from local_features_tpu.sfm.pose_graph import absolute_trajectory_error
from local_features_tpu.sfm.sequence_init import initialize_sequence
from local_features_tpu.sfm.tracks import build_tracks_flat
from local_features_tpu.types import FeaturesResult
from local_features_tpu.utils.synth import arc_trajectory


def _project_world(rng, F=13, N=160):
    intr = np.array([260.0, 260.0, 160.0, 120.0], np.float32)
    X = np.stack([rng.uniform(-1.2, 1.2, N), rng.uniform(-0.9, 0.9, N),
                  rng.uniform(2.5, 5.5, N)], 1).astype(np.float32)
    R, t = arc_trajectory(F)
    desc = rng.standard_normal((N, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    feats, vis_ids = [], []
    for f in range(F):
        Xc = X @ R[f].T + t[f]
        u = intr[0] * Xc[:, 0] / Xc[:, 2] + intr[2]
        v = intr[1] * Xc[:, 1] / Xc[:, 2] + intr[3]
        vis = (Xc[:, 2] > 0.1) & (u >= 0) & (u < 320) & (v >= 0) & (v < 240)
        ids = np.flatnonzero(vis)
        kps = np.stack([u[ids], v[ids], np.full(len(ids), 4.0),
                        np.zeros(len(ids)), np.ones(len(ids))],
                       1).astype(np.float32)
        feats.append(FeaturesResult(kps, desc[ids]))
        vis_ids.append(ids)
    pair_matches = []
    for f in range(F - 1):
        common, ia, ib = np.intersect1d(vis_ids[f], vis_ids[f + 1],
                                        return_indices=True)
        pair_matches.append(np.stack([ia, ib], 1).astype(np.int64))
    return feats, pair_matches, intr, R, t


def test_keyframed_init_recovers_trajectory():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    feats, pair_matches, intr, R_gt, t_gt = _project_world(rng)
    flat = build_tracks_flat(pair_matches,
                             [len(np.asarray(f.x)) for f in feats])
    Rs, ts, X0, stats = initialize_sequence(
        feats, pair_matches, intr, flat, seed=2, chunk=4, kf_stride=3)
    assert stats["kf_stride"] == 3 and stats["n_keyframes"] == 5
    assert np.isfinite(X0).all() and np.isfinite(ts).all()
    # interpolated chain tracks ground truth up to a similarity
    centers_est = np.einsum("cji,cj->ci", Rs, -ts)
    centers_gt = np.einsum("cji,cj->ci", R_gt, -t_gt)
    ate = float(absolute_trajectory_error(
        jnp.asarray(centers_est), jnp.asarray(centers_gt),
        with_scale=True))
    extent = float(np.linalg.norm(
        centers_gt - centers_gt.mean(0), axis=1).max())
    assert ate < 0.15 * extent, (ate, extent)
    # the ray fallback covered the non-keyframe-born tracks
    assert stats["tracks_direct_init"] + stats["tracks_fallback_init"] \
        == flat.n_tracks
