"""Sim(3) pose-graph optimization: ops algebra + scale-drift-aware
loop closure on a synthetic drifted trajectory."""

import jax.numpy as jnp
import numpy as np

from local_features_tpu.sfm import sim3
from local_features_tpu.sfm.geometry import so3_exp
from local_features_tpu.sfm.pose_graph import absolute_trajectory_error


def _rand_sim3(rng):
    s = float(np.exp(rng.normal(0, 0.3)))
    R = np.asarray(so3_exp(jnp.asarray(rng.normal(0, 0.5, 3),
                                       jnp.float32)))
    t = rng.normal(0, 1.0, 3).astype(np.float32)
    return jnp.asarray(s), jnp.asarray(R), jnp.asarray(t)


def test_sim3_compose_inverse_identity():
    rng = np.random.default_rng(0)
    s, R, t = _rand_sim3(rng)
    si, Ri, ti = sim3.sim3_inverse(s, R, t)
    se, Re, te = sim3.sim3_compose(s, R, t, si, Ri, ti)
    assert abs(float(se) - 1.0) < 1e-6
    np.testing.assert_allclose(np.asarray(Re), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(te), 0.0, atol=1e-6)


def test_sim3_apply_matches_compose():
    """(S1 o S2)(x) == S1(S2(x))"""
    rng = np.random.default_rng(1)
    s1, R1, t1 = _rand_sim3(rng)
    s2, R2, t2 = _rand_sim3(rng)
    X = jnp.asarray(rng.normal(0, 1, (5, 3)), jnp.float32)
    sc, Rc, tc = sim3.sim3_compose(s1, R1, t1, s2, R2, t2)
    lhs = sim3.sim3_apply(sc, Rc, tc, X)
    rhs = sim3.sim3_apply(s1, R1, t1, sim3.sim3_apply(s2, R2, t2, X))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-5, atol=1e-5)


def test_sim3_log_retract_roundtrip():
    """log(retract(xi, Id)) == xi for the shared first-order chart."""
    rng = np.random.default_rng(2)
    xi = jnp.asarray(rng.normal(0, 0.2, 7), jnp.float32)
    s, R, t = sim3.sim3_retract(
        jnp.asarray(1.0), jnp.eye(3), jnp.zeros(3), xi)
    back = sim3.sim3_log_approx(s, R, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi),
                               rtol=1e-5, atol=1e-5)


def _circle_gt(N=24, radius=3.0):
    """Ground-truth loop: camera circling the origin, facing inward."""
    R, t = [], []
    for k in range(N):
        a = 2 * np.pi * k / N
        c = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        # world->frame rotation: camera z toward origin, y down
        z = -c / np.linalg.norm(c)
        y = np.array([0.0, 1.0, 0.0])
        x = np.cross(y, z)
        Rk = np.stack([x, y, z])            # rows = camera axes
        R.append(Rk)
        t.append(-Rk @ c)
    return np.stack(R).astype(np.float32), np.stack(t).astype(np.float32)


def _drifted_chain(R_gt, t_gt, drift_per_step):
    """Integrate GT relative poses whose translation magnitudes carry
    cumulative multiplicative scale drift — the monocular error mode."""
    N = len(R_gt)
    R = [R_gt[0]]
    t = [t_gt[0]]
    scale = 1.0
    for k in range(N - 1):
        R_rel = R_gt[k + 1] @ R_gt[k].T
        t_rel = t_gt[k + 1] - R_rel @ t_gt[k]
        scale *= drift_per_step
        R.append(R_rel @ R[k])
        t.append(R_rel @ t[k] + scale * t_rel)
    return np.stack(R), np.stack(t)


def test_sim3_graph_corrects_scale_drift():
    """2%-per-step scale drift over 24 steps (~60% total) + one loop
    edge: the Sim(3) graph must cut ATE by >20x; an SE(3)-style graph
    cannot express this correction at all (it closes the loop by
    smearing translation error and leaves every scale at 1).

    The loop edge carries what a depth-ratio measurement observes:
    the relative LOCAL-MAP scale s_j/s_i and a translation in frame
    j's local units (see loops.py:loop_sim3_measurements)."""
    R_gt, t_gt = _circle_gt()
    R_dr, t_dr = _drifted_chain(R_gt, t_gt, drift_per_step=1.02)
    c_gt = np.einsum("nji,nj->ni", R_gt, -t_gt)
    c_dr = np.einsum("nji,nj->ni", R_dr, -t_dr)
    ate0 = float(absolute_trajectory_error(
        jnp.asarray(c_dr), jnp.asarray(c_gt), with_scale=True))

    i, j = 0, len(R_gt) - 1
    drift = 1.02 ** np.arange(len(R_gt))
    R_rel = R_gt[j] @ R_gt[i].T
    t_rel = t_gt[j] - R_rel @ t_gt[i]
    g = sim3.chain_graph(
        R_dr, t_dr,
        loop_edges=[(i, j, drift[j] / drift[i], R_rel,
                     drift[j] * t_rel)],
        loop_weight=3.0)
    g_opt = sim3.optimize(g, n_iters=20, lam=1e-5)
    R_c, t_c = sim3.corrected_trajectory(g_opt)
    c_c = np.einsum("nji,nj->ni", np.asarray(R_c), -np.asarray(t_c))
    ate1 = float(absolute_trajectory_error(
        jnp.asarray(c_c), jnp.asarray(c_gt), with_scale=True))
    assert ate1 < ate0 / 20.0, (ate0, ate1)
    # the recovered node scales must track the injected drift profile
    s = np.asarray(g_opt.s)
    assert abs(s[0] - 1.0) < 1e-5          # gauge fixed at node 0
    corr = np.corrcoef(np.log(s + 1e-12), np.log(drift))[0, 1]
    assert corr > 0.99, corr
    assert abs(s[-1] - drift[-1]) < 0.05 * drift[-1], (s[-1], drift[-1])


def test_sim3_graph_noise_only_stays_put():
    """Zero drift + exact measurements: optimization must not move an
    already-consistent trajectory."""
    R_gt, t_gt = _circle_gt(N=12)
    i, j = 0, 11
    R_rel = R_gt[j] @ R_gt[i].T
    t_rel = t_gt[j] - R_rel @ t_gt[i]
    g = sim3.chain_graph(R_gt, t_gt,
                         loop_edges=[(i, j, 1.0, R_rel, t_rel)])
    err0 = float(sim3.total_error(g))
    assert err0 < 1e-8, err0
    g_opt = sim3.optimize(g, n_iters=5)
    np.testing.assert_allclose(np.asarray(g_opt.t), t_gt,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_opt.s), 1.0,
                               rtol=1e-4, atol=1e-4)


def test_sim3_robust_prunes_wrong_loop_edge():
    """One good loop edge + one garbage edge (wrong rotation, wrong
    scale): optimize_robust must disable the garbage edge by consensus
    and still recover the drifted trajectory."""
    R_gt, t_gt = _circle_gt()
    R_dr, t_dr = _drifted_chain(R_gt, t_gt, drift_per_step=1.02)
    c_gt = np.einsum("nji,nj->ni", R_gt, -t_gt)
    c_dr = np.einsum("nji,nj->ni", R_dr, -t_dr)
    ate0 = float(absolute_trajectory_error(
        jnp.asarray(c_dr), jnp.asarray(c_gt), with_scale=True))

    N = len(R_gt)
    drift = 1.02 ** np.arange(N)
    i, j = 0, N - 1
    R_rel = R_gt[j] @ R_gt[i].T
    t_rel = t_gt[j] - R_rel @ t_gt[i]
    good = (i, j, drift[j] / drift[i], R_rel, drift[j] * t_rel)
    rng = np.random.default_rng(5)
    R_bad = np.asarray(so3_exp(jnp.asarray(rng.normal(0, 1.0, 3),
                                           jnp.float32)))
    bad = (2, N - 3, 5.0, R_bad, rng.normal(0, 2.0, 3).astype(np.float32))
    # a second good edge so the consensus has a majority
    i2, j2 = 1, N - 2
    R_rel2 = R_gt[j2] @ R_gt[i2].T
    t_rel2 = t_gt[j2] - R_rel2 @ t_gt[i2]
    good2 = (i2, j2, drift[j2] / drift[i2], R_rel2, drift[j2] * t_rel2)

    g = sim3.chain_graph(R_dr, t_dr, loop_edges=[good, bad, good2],
                         loop_weight=3.0)
    g_opt = sim3.optimize_robust(g, n_consecutive=N - 1,
                                 n_iters=20, lam=1e-5)
    # the garbage edge must be disabled
    w_loops = np.asarray(g_opt.weight)[N - 1:]
    assert w_loops[1] == 0.0, w_loops
    assert w_loops[0] > 0 and w_loops[2] > 0, w_loops
    R_c, t_c = sim3.corrected_trajectory(g_opt)
    c_c = np.einsum("nji,nj->ni", np.asarray(R_c), -np.asarray(t_c))
    ate1 = float(absolute_trajectory_error(
        jnp.asarray(c_c), jnp.asarray(c_gt), with_scale=True))
    assert ate1 < ate0 / 20.0, (ate0, ate1)


def test_measurement_chain_corrects_injected_drift():
    """Full loop-closure chain under CONTROLLED drift: synthetic
    features (projected world points carrying per-point descriptors)
    flow through detect_loop_closures -> loop_sim3_measurements ->
    chain_graph -> optimize_robust, and the corrected trajectory must
    recover most of the injected scale drift.  This is the end-to-end
    validation the image-pipeline tests cannot give (estimation noise
    there is per-step jitter, not drift — see sfm/loops.py NOTE)."""
    from types import SimpleNamespace

    from local_features_tpu.sfm.loops import (detect_loop_closures,
                                              loop_sim3_measurements)

    rng = np.random.default_rng(9)
    N, H, W = 20, 240, 320
    intr = np.array([260.0, 260.0, W / 2, H / 2], np.float32)
    R_gt, t_gt = _circle_gt(N=N, radius=3.0)
    # world points: ring around the trajectory at larger radius + jitter
    P = 700
    ang = rng.uniform(0, 2 * np.pi, P)
    rad = rng.uniform(4.5, 7.0, P)
    X = np.stack([rad * np.cos(ang), rng.uniform(-1.5, 1.5, P),
                  rad * np.sin(ang)], axis=1)
    desc = rng.normal(size=(P, 128)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    feats, vis_ids = [], []
    for f in range(N):
        Xc = X @ R_gt[f].T + t_gt[f]
        u = intr[0] * Xc[:, 0] / Xc[:, 2] + intr[2]
        v = intr[1] * Xc[:, 1] / Xc[:, 2] + intr[3]
        vis = (Xc[:, 2] > 0.5) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        ids = np.flatnonzero(vis)
        kp = np.zeros((len(ids), 5), np.float32)
        kp[:, 0] = u[ids]
        kp[:, 1] = v[ids]
        feats.append(SimpleNamespace(
            keypoints_array=kp, x=kp[:, 0], y=kp[:, 1],
            descriptors=desc[ids]))
        vis_ids.append(ids)
    assert min(len(i) for i in vis_ids) > 60

    pair_matches = []
    for f in range(N - 1):
        common, ia, ib = np.intersect1d(vis_ids[f], vis_ids[f + 1],
                                        return_indices=True)
        pair_matches.append(np.stack([ia, ib], axis=1).astype(np.int64))

    loops = detect_loop_closures(feats, intr, min_separation=10, seed=3)
    assert loops, "revisit not retrieved from synthetic descriptors"

    R_dr, t_dr = _drifted_chain(R_gt, t_gt, drift_per_step=1.03)
    c_gt = np.einsum("nji,nj->ni", R_gt, -t_gt)
    c_dr = np.einsum("nji,nj->ni", R_dr, -t_dr)
    ate0 = float(absolute_trajectory_error(
        jnp.asarray(c_dr), jnp.asarray(c_gt), with_scale=True))

    meas = loop_sim3_measurements(feats, intr, R_dr.astype(np.float32),
                                  t_dr.astype(np.float32), pair_matches,
                                  loops)
    assert meas, "no sim3 measurement"
    g = sim3.chain_graph(R_dr, t_dr, loop_edges=meas, loop_weight=3.0)
    g_opt = sim3.optimize_robust(g, n_consecutive=N - 1,
                                 n_iters=20, lam=1e-5)
    R_c, t_c = sim3.corrected_trajectory(g_opt)
    c_c = np.einsum("nji,nj->ni", np.asarray(R_c), -np.asarray(t_c))
    ate1 = float(absolute_trajectory_error(
        jnp.asarray(c_c), jnp.asarray(c_gt), with_scale=True))
    # measured drift (1.03^20 ~ 1.8x scale error) must shrink >3x
    assert ate1 < ate0 / 3.0, (ate0, ate1)


def test_sim3_robust_rejects_lone_garbage_edge():
    """A SINGLE loop edge no longer bypasses consensus: a garbage edge
    (wrong rotation + 5x scale) must be rejected by the chain-
    disagreement gate, leaving the trajectory untouched."""
    R_gt, t_gt = _circle_gt()
    R_dr, t_dr = _drifted_chain(R_gt, t_gt, drift_per_step=1.02)
    N = len(R_gt)
    rng = np.random.default_rng(7)
    R_bad = np.asarray(so3_exp(jnp.asarray(rng.normal(0, 1.0, 3),
                                           jnp.float32)))
    bad = (2, N - 3, 5.0, R_bad, rng.normal(0, 2.0, 3).astype(np.float32))
    g = sim3.chain_graph(R_dr, t_dr, loop_edges=[bad], loop_weight=3.0)
    g_opt = sim3.optimize_robust(g, n_consecutive=N - 1,
                                 n_iters=20, lam=1e-5)
    assert float(np.asarray(g_opt.weight)[-1]) == 0.0
    # with the edge disabled the chain is self-consistent: poses stay
    np.testing.assert_allclose(np.asarray(g_opt.t), t_dr,
                               rtol=1e-3, atol=1e-3)


def test_sim3_robust_keeps_lone_genuine_edge():
    """A genuine single loop edge (real drift correction) must survive
    the chain gate and still correct the drift."""
    from local_features_tpu.sfm.pose_graph import absolute_trajectory_error

    R_gt, t_gt = _circle_gt()
    R_dr, t_dr = _drifted_chain(R_gt, t_gt, drift_per_step=1.02)
    c_gt = np.einsum("nji,nj->ni", R_gt, -t_gt)
    c_dr = np.einsum("nji,nj->ni", R_dr, -t_dr)
    ate0 = float(absolute_trajectory_error(
        jnp.asarray(c_dr), jnp.asarray(c_gt), with_scale=True))
    N = len(R_gt)
    drift = 1.02 ** np.arange(N)
    i, j = 0, N - 1
    R_rel = R_gt[j] @ R_gt[i].T
    t_rel = t_gt[j] - R_rel @ t_gt[i]
    good = (i, j, drift[j] / drift[i], R_rel, drift[j] * t_rel)
    g = sim3.chain_graph(R_dr, t_dr, loop_edges=[good], loop_weight=3.0)
    g_opt = sim3.optimize_robust(g, n_consecutive=N - 1,
                                 n_iters=20, lam=1e-5)
    assert float(np.asarray(g_opt.weight)[-1]) > 0.0
    R_c, t_c = sim3.corrected_trajectory(g_opt)
    c_c = np.einsum("nji,nj->ni", np.asarray(R_c), -np.asarray(t_c))
    ate1 = float(absolute_trajectory_error(
        jnp.asarray(c_c), jnp.asarray(c_gt), with_scale=True))
    assert ate1 < ate0 / 20.0, (ate0, ate1)


def test_sim3_survives_extreme_scale_loop_edge():
    """A loop edge measuring an extreme relative scale (the windowed
    estimate collapsed ~40x over a circuit — observed on real renders)
    must not NaN the graph: per-iteration tangent clamping keeps
    exp(sigma) finite and the optimization still recovers the scale."""
    R_gt, t_gt = _circle_gt(N=30)
    # severe per-step scale decay: total factor ~0.03
    R_dr, t_dr = _drifted_chain(R_gt, t_gt, drift_per_step=0.885)
    N = len(R_gt)
    drift = 0.885 ** np.arange(N)
    i, j = 0, N - 1
    R_rel = R_gt[j] @ R_gt[i].T
    t_rel = t_gt[j] - R_rel @ t_gt[i]
    good = (i, j, drift[j] / drift[i], R_rel, drift[j] * t_rel)
    g = sim3.chain_graph(R_dr, t_dr, loop_edges=[good], loop_weight=3.0)
    g_opt = sim3.optimize(g, n_iters=25, lam=1e-5)
    s = np.asarray(g_opt.s)
    assert np.isfinite(np.asarray(g_opt.t)).all()
    assert np.isfinite(s).all()
    # recovered node scales track the injected decay
    corr = np.corrcoef(np.log(s + 1e-12), np.log(drift))[0, 1]
    assert corr > 0.95, corr
