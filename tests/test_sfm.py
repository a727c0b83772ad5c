"""SfM layer tests on synthetic scenes with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from local_features_tpu.sfm import geometry as geo
from local_features_tpu.sfm.ba import BAState, lm_bundle_adjust, reprojection_residuals
from local_features_tpu.sfm.pose_graph import (
    PoseGraph,
    absolute_trajectory_error,
    optimize,
    total_error,
)
from local_features_tpu.sfm.two_view import (
    estimate_relative_pose,
    sampson_distance,
    triangulate,
)

INTR = jnp.asarray([500.0, 500.0, 320.0, 240.0])


def _synthetic_scene(rng, n_cams=6, n_pts=200, noise=0.0):
    """Cameras on an arc looking at a point cloud around the origin."""
    X = rng.uniform(-1.0, 1.0, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 5.0
    Rs, ts = [], []
    for c in range(n_cams):
        angle = 0.15 * (c - n_cams / 2)
        w = np.array([0.0, angle, 0.0], dtype=np.float32)
        R = np.asarray(geo.so3_exp(jnp.asarray(w)))
        tc = np.array([0.5 * c, 0.05 * c, 0.0], dtype=np.float32)
        # world->cam: x_cam = R (x - C) with camera center C
        t = -R @ tc
        Rs.append(R)
        ts.append(t)
    R = jnp.asarray(np.stack(Rs))
    t = jnp.asarray(np.stack(ts))
    X = jnp.asarray(X)
    uv, z = geo.project(R[:, None], t[:, None], X[None], INTR)
    if noise > 0:
        uv = uv + noise * rng.standard_normal(uv.shape).astype(np.float32)
    mask = z > 0.1
    return R, t, X, uv, mask


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(rng.uniform(-1.5, 1.5, (32, 3)).astype(np.float32))
    R = geo.so3_exp(w)
    w2 = geo.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)
    # orthonormality
    RtR = jnp.einsum("nij,nik->njk", R, R)
    np.testing.assert_allclose(np.asarray(RtR),
                               np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-5)


def test_se3_exp_compose_inverse(rng):
    xi = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 6)).astype(np.float32))
    R, t = geo.se3_exp(xi)
    Ri, ti = geo.se3_inverse(R, t)
    Rc, tc = geo.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc),
                               np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


def test_two_view_pose_and_triangulation(rng):
    R, t, X, uv, mask = _synthetic_scene(rng, n_cams=2, n_pts=150)
    x1 = geo.normalize_points(uv[0], INTR)
    x2 = geo.normalize_points(uv[1], INTR)
    res = estimate_relative_pose(
        x1, x2, mask[0] & mask[1], jax.random.PRNGKey(0))
    assert int(res.n_inliers) > 120

    # ground-truth relative pose cam1 -> cam2
    R_rel_gt, t_rel_gt = geo.se3_compose(*(R[1], t[1]),
                                         *geo.se3_inverse(R[0], t[0]))
    np.testing.assert_allclose(np.asarray(res.R), np.asarray(R_rel_gt),
                               atol=2e-3)
    t_dir_gt = np.asarray(t_rel_gt)
    t_dir_gt = t_dir_gt / np.linalg.norm(t_dir_gt)
    cos = abs(float(np.asarray(res.t) @ t_dir_gt))
    assert cos > 0.999

    # triangulation in cam1 frame reproduces the scene up to scale
    Xc1 = triangulate(jnp.eye(3), jnp.zeros(3), res.R, res.t, x1, x2)
    X_gt_c1 = jnp.einsum("ij,pj->pi", R[0], X) + t[0]
    scale = float(jnp.median(X_gt_c1[:, 2] / Xc1[:, 2]))
    err = np.asarray(jnp.linalg.norm(Xc1 * scale - X_gt_c1, axis=-1))
    assert np.median(err) < 0.02


def test_bundle_adjustment_converges(rng):
    R, t, X, uv, mask = _synthetic_scene(rng, n_cams=5, n_pts=120,
                                         noise=0.3)
    # perturb ground truth
    xi = jnp.asarray(0.01 * rng.standard_normal((5, 6)).astype(np.float32))
    R0, t0 = geo.se3_retract(R, t, xi)
    X0 = X + jnp.asarray(
        0.05 * rng.standard_normal(X.shape).astype(np.float32))
    state0 = BAState(R=R0, t=t0, X=X0)

    r0, _ = reprojection_residuals(state0, uv, mask.astype(jnp.float32), INTR)
    cost0 = float(jnp.sum(r0 * r0) / jnp.sum(mask))

    result = lm_bundle_adjust(state0, uv, mask, INTR, n_iters=15)
    assert float(result.cost) < cost0 / 10.0
    # with 0.3px noise the final mean squared error should be ~noise^2
    assert float(result.cost) < 0.5


def test_pose_graph_optimization(rng):
    n = 8
    # ground-truth poses along a line with small rotations
    xi_gt = jnp.asarray(
        np.cumsum(0.1 * rng.standard_normal((n, 6)), axis=0).astype(np.float32))
    R_gt, t_gt = geo.se3_exp(xi_gt)

    edges = np.array([[i, i + 1] for i in range(n - 1)] + [[0, n - 1]],
                     dtype=np.int32)
    Ri, ti = geo.se3_inverse(R_gt[edges[:, 0]], t_gt[edges[:, 0]])
    R_rel, t_rel = geo.se3_compose(R_gt[edges[:, 1]], t_gt[edges[:, 1]], Ri, ti)

    # noisy initialization
    xi0 = xi_gt + jnp.asarray(
        0.05 * rng.standard_normal((n, 6)).astype(np.float32))
    xi0 = xi0.at[0].set(xi_gt[0])  # gauge
    R0, t0 = geo.se3_exp(xi0)

    g = PoseGraph(R=R0, t=t0, edges=jnp.asarray(edges), R_rel=R_rel,
                  t_rel=t_rel, weight=jnp.ones(len(edges)))
    e0 = float(total_error(g))
    g_opt = optimize(g, n_iters=10)
    e1 = float(total_error(g_opt))
    assert e1 < e0 * 1e-3


def test_ate_alignment(rng):
    t_gt = jnp.asarray(rng.standard_normal((20, 3)).astype(np.float32))
    # rigidly transformed trajectory should align to ~zero ATE
    R = geo.so3_exp(jnp.asarray([0.3, -0.2, 0.5]))
    t_est = t_gt @ R.T + jnp.asarray([1.0, 2.0, 3.0])
    ate = float(absolute_trajectory_error(t_est, t_gt))
    assert ate < 1e-5
