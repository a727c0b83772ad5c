"""Pose-graph optimization over SE(3) relative-pose constraints.

Gauss-Newton on the stacked tangent vector [N, 6] with autodiff
Jacobians (the edge count of keyframe graphs is small enough that the
dense [E*6, N*6] Jacobian is cheap; a sparse/Schur variant can follow
for very large graphs).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import se3_compose, se3_exp, se3_inverse, so3_log


class PoseGraph(NamedTuple):
    R: jnp.ndarray          # [N, 3, 3] absolute poses (world -> frame)
    t: jnp.ndarray          # [N, 3]
    edges: jnp.ndarray      # [E, 2] i32 (i, j)
    R_rel: jnp.ndarray      # [E, 3, 3] measured T_j * T_i^{-1}
    t_rel: jnp.ndarray      # [E, 3]
    weight: jnp.ndarray     # [E] edge weights (0 disables an edge)


def _edge_residual(Ri, ti, Rj, tj, R_rel, t_rel):
    """log( T_rel^-1 * T_j * T_i^-1 ) in R^6 (rotation, translation)."""
    Ri_inv, ti_inv = se3_inverse(Ri, ti)
    Rij, tij = se3_compose(Rj, tj, Ri_inv, ti_inv)
    Rrel_inv, trel_inv = se3_inverse(R_rel, t_rel)
    Re, te = se3_compose(Rrel_inv, trel_inv, Rij, tij)
    return jnp.concatenate([so3_log(Re), te], axis=-1)


def residuals(graph: PoseGraph, xi: jnp.ndarray) -> jnp.ndarray:
    """[E, 6] residuals with per-node tangent perturbations xi [N, 6]."""
    dR, dt = se3_exp(xi)
    R = dR @ graph.R
    t = jnp.einsum("nij,nj->ni", dR, graph.t) + dt
    i = graph.edges[:, 0]
    j = graph.edges[:, 1]
    r = _edge_residual(R[i], t[i], R[j], t[j], graph.R_rel, graph.t_rel)
    return r * graph.weight[:, None]


def optimize(graph: PoseGraph, n_iters: int = 10, lam: float = 1e-6,
             fix_first: bool = True) -> PoseGraph:
    """Damped Gauss-Newton; returns the graph with optimized poses."""
    N = graph.R.shape[0]

    def gn_step(g: PoseGraph, _):
        zero = jnp.zeros((N, 6))
        J = jax.jacfwd(lambda xi: residuals(g, xi).reshape(-1))(zero)
        J = J.reshape(-1, N * 6)                       # [E*6, N*6]
        r = residuals(g, zero).reshape(-1)
        H = J.T @ J + lam * jnp.eye(N * 6)
        b = -J.T @ r
        if fix_first:
            m = jnp.ones(N * 6).at[:6].set(0.0)
            H = H * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            b = b * m
        dxi = jnp.linalg.solve(H, b).reshape(N, 6)
        dR, dt = se3_exp(dxi)
        R = dR @ g.R
        t = jnp.einsum("nij,nj->ni", dR, g.t) + dt
        g = g._replace(R=R, t=t)
        return g, jnp.sum(r * r)

    graph, hist = jax.lax.scan(gn_step, graph, None, length=n_iters)
    return graph


def total_error(graph: PoseGraph) -> jnp.ndarray:
    r = residuals(graph, jnp.zeros((graph.R.shape[0], 6)))
    return jnp.sum(r * r)


def absolute_trajectory_error(
    t_est: jnp.ndarray, t_gt: jnp.ndarray, with_scale: bool = False
) -> jnp.ndarray:
    """ATE RMSE after Umeyama alignment (SE(3), or Sim(3) for monocular
    trajectories when with_scale=True)."""
    mu_e = t_est.mean(axis=0)
    mu_g = t_gt.mean(axis=0)
    E = t_est - mu_e
    G = t_gt - mu_g
    H = E.T @ G
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    if with_scale:
        var_e = jnp.sum(E * E) / E.shape[0]
        scale = jnp.sum(S * jnp.array([1.0, 1.0, d])) / (var_e * E.shape[0])
    else:
        scale = 1.0
    aligned = scale * E @ R.T + mu_g
    return jnp.sqrt(jnp.mean(jnp.sum((aligned - t_gt) ** 2, axis=-1)))
