"""Config-5 chain on a synthetic sequence: batched front-end -> batched
matching -> vectorized tracks -> batched pose init -> flat block packing
-> sparse (map-partitioned) bundle adjustment — the at-scale pipeline,
verified against ground truth at small scale (BASELINE.md config 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from local_features_tpu.api import LocalFeatures
from local_features_tpu.ops.matching import (match_consecutive,
                                             pad_descriptor_sequence)
from local_features_tpu.sfm.pose_graph import absolute_trajectory_error
from local_features_tpu.sfm.sequence_init import initialize_sequence
from local_features_tpu.sfm.sparse_ba import sparse_bundle_adjust
from local_features_tpu.sfm.tracks import (build_tracks_flat,
                                           build_track_blocks_flat,
                                           flat_observation_uv)
from local_features_tpu.utils.synth import render_sequence


@pytest.mark.slow
def test_config5_chain_small():
    rng = np.random.default_rng(3)
    F = 10
    frames, R_gt, t_gt, intr, world = render_sequence(
        rng, n_frames=F, height=240, width=320, n_points=130)

    lf = LocalFeatures(max_features=600)
    feats = lf.detect_sequence(frames, 600)
    descs, dvalid = pad_descriptor_sequence(feats)
    pair_matches = match_consecutive(descs, dvalid)

    flat = build_tracks_flat(pair_matches, [len(np.asarray(f.x))
                                            for f in feats])
    assert flat.n_tracks > 50
    Rs, ts, X0, stats = initialize_sequence(feats, pair_matches, intr,
                                            flat, seed=1, chunk=4)
    assert stats["tracks_direct_init"] > 0.5 * flat.n_tracks

    uv = flat_observation_uv(feats, flat)
    blocks, c_win, bstats = build_track_blocks_flat(
        flat, uv, X0, F, c_blk=4, halo=3, max_obs=8)
    # only >max_obs-length tracks clip observations (the c_win=10
    # window covers every camera at this scale)
    assert bstats["dropped_obs"] <= 0.02 * len(flat.tid)
    assert bstats["dropped_tracks"] == 0

    # multiview re-triangulation given the chained poses (per-pair
    # depths at consecutive-frame baselines are too noisy to start BA),
    # then gate the ratio-test-surviving mismatch tracks
    from local_features_tpu.sfm.sparse_ba import (filter_block_outliers,
                                                  triangulate_blocks)
    Rj, tj = jnp.asarray(Rs), jnp.asarray(ts)
    X_tri = triangulate_blocks(Rj, tj, blocks, jnp.asarray(intr), c_win)
    blocks = blocks._replace(X=X_tri)
    blocks = filter_block_outliers(Rj, tj, blocks, jnp.asarray(intr),
                                   c_win, max_px=30.0)

    res = sparse_bundle_adjust(Rj, tj, blocks,
                               jnp.asarray(intr), c_win, n_iters=12,
                               cg_iters=12, huber_delta=2.0)
    hist = np.asarray(res.cost_history)
    assert float(hist[-1]) <= float(hist[0])
    assert float(res.cost) < 4.0, float(res.cost)

    centers_est = np.einsum("cji,cj->ci", np.asarray(res.R),
                            -np.asarray(res.t))
    centers_gt = np.einsum("cji,cj->ci", R_gt, -t_gt)
    ate = float(absolute_trajectory_error(
        jnp.asarray(centers_est), jnp.asarray(centers_gt), with_scale=True))
    traj_extent = float(np.linalg.norm(centers_gt - centers_gt.mean(0),
                                       axis=1).max())
    assert ate < 0.06 * traj_extent, (ate, traj_extent)
