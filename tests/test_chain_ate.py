"""Fast config-4 ATE regression: the batched chain on a small
real-texture circuit must stay an order of magnitude inside the
BASELINE.md config-4 bound (ATE RMSE within 5% of trajectory).

This is the quick iteration target the 120-frame artifact
(scripts/make_ate_artifact.py) is too slow to provide: ~40 s on CPU
including compiles.  The pinned numbers at this scale (seed 1):
loop_closure=False 3.3%, loop_closure=True 0.5%, keyframe stride 4
0.5% — asserts are set at 5% / 2% to hold across platform noise while
still catching any real regression of the init chain, the loop fusion,
or the sparse BA.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from local_features_tpu.sfm.pipeline import reconstruct_sequence_batched
from local_features_tpu.sfm.pose_graph import absolute_trajectory_error
from local_features_tpu.utils.image import load_gray_pil
from local_features_tpu.utils.phototex import render_layered_sequence


@pytest.fixture(scope="module")
def circuit():
    bg = load_gray_pil("sample_data/houses.jpg").astype(np.float32)
    fg = load_gray_pil("sample_data/bird.jpg").astype(np.float32)
    frames, R_gt, t_gt, intr = render_layered_sequence(
        bg, fg, n_frames=40, height=240, width=320, f=260.0)
    c_gt = np.einsum("nji,nj->ni", R_gt, -t_gt)
    traj = float(np.linalg.norm(np.diff(c_gt, axis=0), axis=1).sum())
    return frames, intr, c_gt, traj


def _ate_pct(rec, c_gt, traj):
    ate = float(absolute_trajectory_error(
        jnp.asarray(rec.camera_centers), jnp.asarray(c_gt),
        with_scale=True))
    return 100.0 * ate / traj


@pytest.mark.slow
def test_chain_ate_within_config4_bound(circuit):
    frames, intr, c_gt, traj = circuit
    rec = reconstruct_sequence_batched(frames, intr, max_features=500,
                                       seed=1)
    pct = _ate_pct(rec, c_gt, traj)
    assert pct < 5.0, pct
    hist = np.asarray(rec.cost_history)
    assert float(hist[-1]) <= float(hist[0])


@pytest.mark.slow
def test_chain_ate_loop_closure_tightens(circuit):
    frames, intr, c_gt, traj = circuit
    rec = reconstruct_sequence_batched(frames, intr, max_features=500,
                                       seed=1, loop_closure=True)
    pct = _ate_pct(rec, c_gt, traj)
    assert rec.stats.get("loop_edges", 0) > 0
    assert pct < 2.0, pct
