"""Two-view geometry: essential matrix, RANSAC, pose recovery,
triangulation.  Fully vectorized / jit-compatible: RANSAC runs a fixed
number of hypotheses in parallel (vmap) instead of a data-dependent loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import se3_inverse


def _eight_point_weighted(x1: jnp.ndarray, x2: jnp.ndarray,
                          w: jnp.ndarray) -> jnp.ndarray:
    """Weighted 8-point essential matrix from normalized coords.

    x1, x2: [N, 2] normalized image coords; w: [N] weights (0/1 mask or
    robust weights).  Returns E [3, 3] with singular values (1, 1, 0).
    """
    X1, Y1 = x1[:, 0], x1[:, 1]
    X2, Y2 = x2[:, 0], x2[:, 1]
    ones = jnp.ones_like(X1)
    A = jnp.stack([X2 * X1, X2 * Y1, X2, Y2 * X1, Y2 * Y1, Y2, X1, Y1, ones],
                  axis=-1)                              # [N, 9]
    Aw = A * w[:, None]
    M = Aw.T @ Aw                                       # [9, 9]
    _, vecs = jnp.linalg.eigh(M)
    e = vecs[:, 0]                                      # smallest eigenvalue
    E = e.reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vt
    return E


def sampson_distance(E: jnp.ndarray, x1: jnp.ndarray,
                     x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) distance for x2^T E x1 = 0."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)  # [N,3]
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    Ex1 = h1 @ E.T                                      # [N, 3]
    Etx2 = h2 @ E                                       # [N, 3]
    num = jnp.sum(h2 * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


class TwoViewResult(NamedTuple):
    E: jnp.ndarray        # [3, 3]
    R: jnp.ndarray        # [3, 3] pose of cam2: x2 = R x1 + t
    t: jnp.ndarray        # [3] unit norm
    inliers: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray


def triangulate(R1, t1, R2, t2, x1, x2):
    """DLT triangulation of normalized correspondences.

    (R_i, t_i) map world -> cam_i; x_i [N, 2] normalized coords.
    Returns X [N, 3] world points.
    """
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)     # [3, 4]
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)

    def dlt(p1, p2):
        A = jnp.stack([
            p1[0] * P1[2] - P1[0],
            p1[1] * P1[2] - P1[1],
            p2[0] * P2[2] - P2[0],
            p2[1] * P2[2] - P2[1],
        ])                                              # [4, 4]
        _, vecs = jnp.linalg.eigh(A.T @ A)
        Xh = vecs[:, 0]
        return Xh[:3] / jnp.where(jnp.abs(Xh[3]) > 1e-12, Xh[3], 1e-12)

    return jax.vmap(dlt)(x1, x2)


def _recover_pose(E, x1, x2, w):
    """Decompose E into (R, t) picking the solution with the most points
    in front of both cameras (cheirality check)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    tu = U[:, 2]

    I = jnp.eye(3)
    z3 = jnp.zeros(3)

    def count_front(R, t):
        X = triangulate(I, z3, R, t, x1, x2)
        z1 = X[:, 2]
        Xc2 = X @ R.T + t
        z2 = Xc2[:, 2]
        return jnp.sum(((z1 > 0) & (z2 > 0)) * w)

    cands_R = jnp.stack([Ra, Ra, Rb, Rb])
    cands_t = jnp.stack([tu, -tu, tu, -tu])
    counts = jax.vmap(count_front)(cands_R, cands_t)
    best = jnp.argmax(counts)
    return cands_R[best], cands_t[best]


def estimate_relative_pose(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    n_hypotheses: int = 256,
    inlier_threshold: float = 1e-4,
) -> TwoViewResult:
    """RANSAC essential-matrix estimation from normalized correspondences.

    x1, x2: [N, 2]; mask: [N] valid correspondences.  `inlier_threshold`
    is on squared Sampson distance in normalized coords.
    Fixed-shape: `n_hypotheses` minimal samples evaluated in parallel.
    """
    N = x1.shape[0]
    wm = mask.astype(jnp.float32)

    # sample 8-tuples biased to valid entries: random keys, valid first
    def one_hypothesis(k):
        # Gumbel top-k trick: sample 8 distinct indices, preferring valid
        g = jax.random.gumbel(k, (N,)) + jnp.where(mask, 0.0, -1e9)
        _, idx = jax.lax.top_k(g, 8)
        E = _eight_point_weighted(x1[idx], x2[idx], jnp.ones(8))
        d = sampson_distance(E, x1, x2)
        inl = (d < inlier_threshold) & mask
        return E, jnp.sum(inl)

    keys = jax.random.split(key, n_hypotheses)
    Es, scores = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(scores)
    E0 = Es[best]

    # refine: weighted 8-point on the best hypothesis' inliers, twice
    def refine(E, _):
        d = sampson_distance(E, x1, x2)
        inl = (d < inlier_threshold) & mask
        E = _eight_point_weighted(x1, x2, inl.astype(jnp.float32))
        return E, None

    E, _ = jax.lax.scan(refine, E0, None, length=2)
    d = sampson_distance(E, x1, x2)
    inliers = (d < inlier_threshold) & mask
    R, t = _recover_pose(E, x1, x2, inliers.astype(jnp.float32))
    return TwoViewResult(E=E, R=R, t=t, inliers=inliers,
                         n_inliers=jnp.sum(inliers))
