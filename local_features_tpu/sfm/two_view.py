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


def triangulate_multiview(R, t, x_norm, mask):
    """Masked multi-view midpoint triangulation.

    R [C,3,3], t [C,3] world->cam; x_norm [C,P,2] normalized obs;
    mask [C,P].  Solves sum_c m (I - d d^T)(X - O_c) = 0 per point, where
    O_c is the camera center and d the unit ray direction in world
    coordinates.  Returns X [P,3].
    """
    m = mask.astype(jnp.float32)
    # rays in world frame
    d_cam = jnp.concatenate([x_norm, jnp.ones_like(x_norm[..., :1])], -1)
    d_w = jnp.einsum("cji,cpj->cpi", R, d_cam)            # R^T d
    d_w = d_w / jnp.linalg.norm(d_w, axis=-1, keepdims=True)
    O = jnp.einsum("cji,cj->ci", R, -t)                   # centers [C,3]
    I = jnp.eye(3)
    P_mat = I[None, None] - d_w[..., :, None] * d_w[..., None, :]
    P_mat = P_mat * m[..., None, None]                    # [C,P,3,3]
    A = jnp.sum(P_mat, axis=0)                            # [P,3,3]
    b = jnp.sum(jnp.einsum("cpij,cj->cpi", P_mat, O), axis=0)
    A = A + 1e-6 * I
    return jnp.linalg.solve(A, b[..., None])[..., 0]


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


def _essential_from_pose(R, t):
    return hat_t(t) @ R


def hat_t(t):
    return jnp.array([[0.0, -t[2], t[1]],
                      [t[2], 0.0, -t[0]],
                      [-t[1], t[0], 0.0]])


def refine_pose_sampson(R, t, x1, x2, w, n_iters: int = 10,
                        damping: float = 1e-6):
    """Gauss-Newton polish of (R, t) minimizing weighted Sampson error.

    Parametrized on the manifold: 3 rotation tangent dims + 2 tangent
    dims of the unit translation sphere.  The 8-point estimate is
    algebraically biased under keypoint noise; this golden-standard
    refinement recovers most of the accuracy at negligible cost.
    """
    from .geometry import so3_exp

    def t_basis(t):
        a = jnp.where(jnp.abs(t[0]) < 0.9,
                      jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
        b1 = jnp.cross(t, a)
        b1 = b1 / jnp.linalg.norm(b1)
        b2 = jnp.cross(t, b1)
        return jnp.stack([b1, b2], axis=1)              # [3, 2]

    def signed_sampson(params, R0, t0):
        dw, db = params[:3], params[3:]
        R_ = so3_exp(dw) @ R0
        t_ = t0 + t_basis(t0) @ db
        t_ = t_ / jnp.linalg.norm(t_)
        E = hat_t(t_) @ R_
        h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
        h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
        Ex1 = h1 @ E.T
        Etx2 = h2 @ E
        num = jnp.sum(h2 * Ex1, axis=-1)
        den = jnp.sqrt(Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
                       + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2 + 1e-12)
        return (num / den) * w

    def step(carry, _):
        R0, t0 = carry
        zero = jnp.zeros(5)
        J = jax.jacfwd(lambda p: signed_sampson(p, R0, t0))(zero)  # [N, 5]
        r = signed_sampson(zero, R0, t0)
        H = J.T @ J + damping * jnp.eye(5)
        p = -jnp.linalg.solve(H, J.T @ r)
        R1 = so3_exp(p[:3]) @ R0
        t1 = t0 + t_basis(t0) @ p[3:]
        t1 = t1 / jnp.linalg.norm(t1)
        # accept only if cost decreases
        c0 = jnp.sum(r * r)
        c1 = jnp.sum(signed_sampson(jnp.zeros(5), R1, t1) ** 2)
        ok = c1 < c0
        R1 = jnp.where(ok, R1, R0)
        t1 = jnp.where(ok, t1, t0)
        return (R1, t1), c1

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=n_iters)
    return R, t


def _translation_only_E(x1, x2, mask, key, inlier_threshold,
                        n_hypotheses: int = 128):
    """Robust E = [t]x for the best R=I translation.

    x2^T [t]x x1 = 0 is LINEAR in t (t ^ (x2 x x1) = 0): a 2-point
    minimal sample gives t = C_a x C_b, so its own mini-RANSAC is far
    more outlier-robust than the 8-point one (clean-sample probability
    ~(1-e)^2 vs (1-e)^8), followed by a weighted LS refit (smallest
    eigenvector of the inlier cross-product scatter).

    The bas-relief antidote: at video-like small rotations with shallow
    depth variation and pixel noise, the 8-point estimate trades true
    lateral translation for a few degrees of spurious rotation (t flips
    toward z, measured ~80 deg off); the translation-only fit has no
    rotation to hide in and recovers the direction to ~1-2 deg on the
    same data."""
    wm = mask.astype(jnp.float32)
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    C = jnp.cross(h2, h1)                                # [N, 3]
    N = x1.shape[0]

    def one(k):
        g = jax.random.gumbel(k, (N,)) + jnp.where(mask, 0.0, -1e9)
        _, idx = jax.lax.top_k(g, 2)
        t = jnp.cross(C[idx[0]], C[idx[1]])
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        d = sampson_distance(hat_t(t), x1, x2)
        return t, jnp.sum(jnp.maximum(1.0 - d / inlier_threshold, 0.0) * wm)

    ts, scores = jax.vmap(one)(jax.random.split(key, n_hypotheses))
    t0 = ts[jnp.argmax(scores)]
    # weighted LS refit on the winner's inliers
    inl = ((sampson_distance(hat_t(t0), x1, x2) < inlier_threshold)
           & mask).astype(jnp.float32)
    Cw = C * inl[:, None]
    _, vecs = jnp.linalg.eigh(Cw.T @ Cw)
    return hat_t(vecs[:, 0])


def _rotation_angle(R):
    return jnp.arccos(jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0))


def estimate_relative_pose(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    n_hypotheses: int = 256,
    inlier_threshold: float = 1e-5,
    rotation_prior: float = 0.0,
    adaptive_threshold: bool = False,
) -> TwoViewResult:
    """RANSAC essential-matrix estimation from normalized correspondences.

    x1, x2: [N, 2]; mask: [N] valid correspondences.  `inlier_threshold`
    is on squared Sampson distance in normalized coords.
    Fixed-shape: `n_hypotheses` minimal samples evaluated in parallel.

    `rotation_prior` breaks bas-relief ties: candidate selection
    maximizes MSAC score minus rotation_prior * rotation angle (rad).
    Statistically tied candidates (the lateral-baseline ambiguity) then
    resolve toward the smaller rotation — correct for consecutive video
    frames and revisit verification alike; a genuinely rotating pair's
    correct candidate outscores the tie-break margin by far.
    `adaptive_threshold` raises the inlier gate to 10x the masked median
    Sampson distance when the fixed threshold sits below the noise
    floor.  Both default OFF: they measurably fix the lateral-baseline
    + pixel-noise regime (t flipped ~80 deg -> <5 deg in the unit
    tests), but they also perturb inlier sets enough to shift the
    downstream monocular scale-chain/BA basin on sequences tuned
    against the legacy behavior — callers opt in where the regime is
    known (loop verification does).
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

    # key_t must be an independent stream: `split(key, 2)[1]` would
    # collide with `split(key, n)[1]` (threefry derivation depends only
    # on the index), handing the translation-only candidate the same
    # randomness as hypothesis 1.  fold_in with an out-of-range tag
    # keeps the hypothesis stream bit-identical to the legacy draws.
    key_t = jax.random.fold_in(key, n_hypotheses)
    keys = jax.random.split(key, n_hypotheses)
    Es, scores = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(scores)
    E0 = Es[best]

    # noise-adaptive threshold: with real pixel noise the fixed
    # threshold can sit BELOW the inlier Sampson floor, starving MSAC of
    # support and making selection a coin flip.  The masked median of
    # the best hypothesis' distances tracks the inlier noise level
    # (robust to <50% outliers); 10x median ~ a 4.7-sigma gate for
    # half-normal residuals.  Clean data keeps the original threshold.
    if adaptive_threshold:
        d0 = sampson_distance(E0, x1, x2)
        med = jnp.nanmedian(jnp.where(mask, d0, jnp.nan))
        med = jnp.where(jnp.isfinite(med), med, 0.0)  # all-False mask
        inlier_threshold = jnp.maximum(inlier_threshold, 10.0 * med)

    def msac_score(E):
        """Truncated-quadratic (MSAC) score — higher is better."""
        d = sampson_distance(E, x1, x2)
        return jnp.sum(jnp.maximum(1.0 - d / inlier_threshold, 0.0) * wm)

    # candidate ladder: each step may improve or regress; keep the best
    # by MSAC score instead of trusting the last step.
    def reweighted(E, _):
        d = sampson_distance(E, x1, x2)
        inl = (d < inlier_threshold) & mask
        return _eight_point_weighted(x1, x2, inl.astype(jnp.float32)), None

    E1, _ = jax.lax.scan(reweighted, E0, None, length=2)

    d1 = sampson_distance(E1, x1, x2)
    inl1 = ((d1 < inlier_threshold) & mask).astype(jnp.float32)
    R1, t1 = _recover_pose(E1, x1, x2, inl1)
    R2, t2 = refine_pose_sampson(R1, t1, x1, x2, inl1)
    E2 = hat_t(t2) @ R2

    if rotation_prior > 0.0:
        E3 = _translation_only_E(x1, x2, mask, key_t, inlier_threshold)
        cands = jnp.stack([E0, E1, E2, E3])
    else:
        cands = jnp.stack([E0, E1, E2])
    cand_scores = jax.vmap(msac_score)(cands)
    if rotation_prior > 0.0:
        def cand_rot(E_c):
            d_c = sampson_distance(E_c, x1, x2)
            w_c = ((d_c < inlier_threshold) & mask).astype(jnp.float32)
            R_c, _ = _recover_pose(E_c, x1, x2, w_c)
            return _rotation_angle(R_c)

        cand_scores = cand_scores - rotation_prior * jax.vmap(cand_rot)(cands)
    ci = jnp.argmax(cand_scores)
    E = cands[ci]

    d = sampson_distance(E, x1, x2)
    inliers = (d < inlier_threshold) & mask
    inl_f = inliers.astype(jnp.float32)
    # recover/polish the winning candidate's pose
    R, t = _recover_pose(E, x1, x2, inl_f)
    Rp, tp = refine_pose_sampson(R, t, x1, x2, inl_f)
    # keep the polish only if it does not lose inliers
    n_before = jnp.sum((sampson_distance(hat_t(t) @ R, x1, x2)
                        < inlier_threshold) & mask)
    n_after = jnp.sum((sampson_distance(hat_t(tp) @ Rp, x1, x2)
                       < inlier_threshold) & mask)
    take = n_after >= n_before
    R = jnp.where(take, Rp, R)
    t = jnp.where(take, tp, t)
    E = hat_t(t) @ R
    inliers = (sampson_distance(E, x1, x2) < inlier_threshold) & mask
    return TwoViewResult(E=E, R=R, t=t, inliers=inliers,
                         n_inliers=jnp.sum(inliers))
