"""Long-sequence odometry (windowed SfM + stitching + pose graph +
global BA) vs ground truth — BASELINE config 4 (offline stand-in for
TUM/KITTI)."""

import jax.numpy as jnp
import numpy as np
import pytest

from local_features_tpu.sfm.odometry import reconstruct_long_sequence
from local_features_tpu.sfm.pose_graph import absolute_trajectory_error
from local_features_tpu.utils.synth import corridor_sequence


@pytest.mark.slow
def test_long_sequence_odometry():
    rng = np.random.default_rng(42)
    frames, R_gt, t_gt, intr, _ = corridor_sequence(rng, n_frames=14)
    res = reconstruct_long_sequence(frames, intr, window=6, overlap=3,
                                    max_features=700, seed=1)
    ce = res.camera_centers
    cg = np.einsum("cji,cj->ci", R_gt, -t_gt)
    ate = float(absolute_trajectory_error(
        jnp.asarray(ce), jnp.asarray(cg), with_scale=True))
    extent = float(np.linalg.norm(cg - cg.mean(0), axis=1).max())
    # north-star bound: ATE RMSE within 5% of the trajectory
    assert ate < 0.05 * extent, (ate, extent)
