"""End-to-end SfM on a rendered synthetic sequence: features -> matches
-> two-view init -> tracks -> BA, checked against ground-truth poses via
Sim(3)-aligned ATE (BASELINE configs 3-4, offline stand-in for
TUM/KITTI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from local_features_tpu.sfm.pipeline import reconstruct_sequence
from local_features_tpu.sfm.pose_graph import absolute_trajectory_error
from local_features_tpu.utils.synth import render_sequence


@pytest.mark.slow
def test_sequence_reconstruction():
    # own deterministic rng: the scene must not depend on test order
    rng = np.random.default_rng(42)
    frames, R_gt, t_gt, intr, world = render_sequence(
        rng, n_frames=6, height=240, width=320, n_points=130)

    rec = reconstruct_sequence(frames, intr, max_features=600,
                               ba_iters=25, seed=1)
    assert rec.mask.sum() > 100
    # reprojection residual should be subpixel-ish after BA
    assert rec.cost < 2.0, rec.cost

    centers_est = rec.camera_centers
    centers_gt = np.einsum("cji,cj->ci", R_gt, -t_gt)
    ate = float(absolute_trajectory_error(
        jnp.asarray(centers_est), jnp.asarray(centers_gt), with_scale=True))
    traj_extent = float(np.linalg.norm(centers_gt - centers_gt.mean(0),
                                       axis=1).max())
    assert ate < 0.05 * traj_extent, (ate, traj_extent)


def test_build_tracks_loop_link_merges_compatible_chains():
    from local_features_tpu.sfm.pipeline import _build_tracks

    # two chains: frames 0-1-2 via kp 0s, and via kp 1s
    pair_matches = [np.array([[0, 0], [1, 1]]),
                    np.array([[0, 0], [1, 1]])]
    # loop link joins frame 0 kp 0 with frame 2 kp 0 — same chain, no-op
    tracks = _build_tracks(pair_matches, [2, 2, 2],
                           extra_matches=[(0, 2, np.array([[0, 0]]))])
    assert len(tracks) == 2
    assert {0: 0, 1: 0, 2: 0} in tracks and {0: 1, 1: 1, 2: 1} in tracks


def test_build_tracks_conflicting_loop_link_excised_not_dropped():
    from local_features_tpu.sfm.pipeline import _build_tracks

    # chain A: kp 0 through frames 0-2; chain B: kp 1 through frames 0-2
    pair_matches = [np.array([[0, 0], [1, 1]]),
                    np.array([[0, 0], [1, 1]])]
    # WRONG loop link: frame 0 kp 0 matched to frame 2 kp 1 — merging
    # would put two different frame-0 keypoints (0 and 1) in one track
    tracks = _build_tracks(pair_matches, [2, 2, 2],
                           extra_matches=[(0, 2, np.array([[0, 1]]))])
    # the link is excised; BOTH full-length chains survive untouched
    assert len(tracks) == 2
    assert {0: 0, 1: 0, 2: 0} in tracks and {0: 1, 1: 1, 2: 1} in tracks


def test_build_tracks_loop_link_joins_disjoint_chains():
    from local_features_tpu.sfm.pipeline import _build_tracks

    # chain A covers frames 0-1, chain B covers frames 3-4 (disjoint)
    pair_matches = [np.array([[0, 0]]), np.zeros((0, 2), np.int64),
                    np.zeros((0, 2), np.int64), np.array([[0, 0]])]
    tracks = _build_tracks(pair_matches, [1, 1, 0, 1, 1],
                           extra_matches=[(1, 3, np.array([[0, 0]]))])
    assert tracks == [{0: 0, 1: 0, 3: 0, 4: 0}]
