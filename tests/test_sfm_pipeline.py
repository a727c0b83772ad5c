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
