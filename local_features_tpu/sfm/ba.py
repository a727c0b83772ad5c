"""Levenberg-Marquardt bundle adjustment with the Schur complement.

Dense-visibility formulation: observations are a [C, P, 2] array with a
[C, P] mask — the TPU-native layout (static shapes, masked work instead
of sparse indexing).  The point-block part of the normal equations is
embarrassingly parallel over P (this is the axis the distributed version
shards over, see sfm/distributed.py); the reduced camera system is
C*6 x C*6 dense and solved with a damped Cholesky-backed solve.

Analytic Jacobians (left-multiplicative se(3) perturbation):
  r = proj(exp(xi) (R X + t)) - uv
  d r / d Xc = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
  d Xc / d xi = [-hat(Xc) | I]      d Xc / d X = R
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import hat, se3_retract


class BAState(NamedTuple):
    R: jnp.ndarray       # [C, 3, 3]
    t: jnp.ndarray       # [C, 3]
    X: jnp.ndarray       # [P, 3]


class BAResult(NamedTuple):
    state: BAState
    cost: jnp.ndarray        # final masked mean squared reprojection error
    cost_history: jnp.ndarray  # [n_iters]


def reprojection_residuals(state: BAState, uv, mask, intr):
    """r [C, P, 2] masked; also returns camera-frame points Xc."""
    Xc = jnp.einsum("cij,pj->cpi", state.R, state.X) + state.t[:, None, :]
    z = jnp.where(jnp.abs(Xc[..., 2]) > 1e-9, Xc[..., 2], 1e-9)
    u = intr[0] * Xc[..., 0] / z + intr[2]
    v = intr[1] * Xc[..., 1] / z + intr[3]
    r = (jnp.stack([u, v], axis=-1) - uv) * mask[..., None]
    return r, Xc


def _jacobians(state: BAState, Xc, intr, mask):
    """Jc [C, P, 2, 6], Jp [C, P, 2, 3] (masked)."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    fx, fy = intr[0], intr[1]
    zero = jnp.zeros_like(z)
    # d uv / d Xc : [C, P, 2, 3]
    duv = jnp.stack([
        jnp.stack([fx / z, zero, -fx * x / (z * z)], axis=-1),
        jnp.stack([zero, fy / z, -fy * y / (z * z)], axis=-1),
    ], axis=-2)
    duv = duv * mask[..., None, None]
    # d Xc / d xi = [-hat(Xc) | I]
    dxc_dxi = jnp.concatenate(
        [-hat(Xc), jnp.broadcast_to(jnp.eye(3), Xc.shape[:-1] + (3, 3))],
        axis=-1)                                     # [C, P, 3, 6]
    Jc = duv @ dxc_dxi                               # [C, P, 2, 6]
    Jp = duv @ state.R[:, None, :, :]                # [C, P, 2, 3]
    return Jc, Jp


def _normal_equations(Jc, Jp, r):
    U = jnp.einsum("cpki,cpkj->cij", Jc, Jc)         # [C, 6, 6]
    V = jnp.einsum("cpki,cpkj->pij", Jp, Jp)         # [P, 3, 3]
    Wm = jnp.einsum("cpki,cpkj->cpij", Jc, Jp)       # [C, P, 6, 3]
    gc = -jnp.einsum("cpki,cpk->ci", Jc, r)          # [C, 6]
    gp = -jnp.einsum("cpki,cpk->pi", Jp, r)          # [P, 3]
    return U, V, Wm, gc, gp


def _schur_solve(U, V, Wm, gc, gp, lam, fix_first_cam):
    """Solve the damped normal equations via the Schur complement.

    Returns (d_xi [C, 6], d_X [P, 3]).
    """
    C = U.shape[0]
    P = V.shape[0]
    I3 = jnp.eye(3)
    I6 = jnp.eye(6)

    V_d = V + lam * I3
    Vinv = jnp.linalg.inv(V_d + 1e-9 * I3)           # [P, 3, 3]

    # S[c1, c2] = delta(c1,c2) U_d - sum_p W_c1p Vinv_p W_c2p^T
    WVinv = jnp.einsum("cpij,pjk->cpik", Wm, Vinv)   # [C, P, 6, 3]
    S_off = jnp.einsum("apik,bpjk->abij", WVinv, Wm)  # [C, C, 6, 6]
    U_d = U + lam * I6
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(U_d)
    rhs = gc - jnp.einsum("cpik,pk->ci", WVinv, gp)  # [C, 6]

    # gauge fixing: pin the first camera by zeroing its rows/cols
    if fix_first_cam:
        m = jnp.ones((C,)).at[0].set(0.0)
        S = S * m[:, None, None, None] * m[None, :, None, None]
        S = S.at[0, 0].set(jnp.eye(6))
        rhs = rhs * m[:, None]

    S_flat = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
    d_xi = jnp.linalg.solve(S_flat, rhs.reshape(-1)).reshape(C, 6)

    rhs_p = gp - jnp.einsum("cpij,ci->pj", Wm, d_xi)
    d_X = jnp.einsum("pij,pj->pi", Vinv, rhs_p)
    return d_xi, d_X


def _cost(state, uv, mask, intr):
    r, _ = reprojection_residuals(state, uv, mask, intr)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(r * r) / n


def lm_bundle_adjust(
    state: BAState,
    uv: jnp.ndarray,      # [C, P, 2] pixel observations
    mask: jnp.ndarray,    # [C, P] visibility
    intr: jnp.ndarray,    # [fx, fy, cx, cy]
    n_iters: int = 20,
    lam0: float = 1e-3,
    fix_first_cam: bool = True,
    huber_delta: float | None = None,
) -> BAResult:
    """Levenberg-Marquardt BA with accept/reject damping adaptation.

    `huber_delta` (pixels) enables IRLS robust weighting: observations
    with residual norm beyond delta get down-weighted by delta/|r| —
    essential when tracks contain mismatches."""
    maskf = mask.astype(jnp.float32)

    def step(carry, _):
        state, lam = carry
        r, Xc = reprojection_residuals(state, uv, maskf, intr)
        w = maskf
        if huber_delta is not None:
            rn = jnp.linalg.norm(r, axis=-1)
            w = maskf * jnp.sqrt(
                jnp.minimum(1.0, huber_delta / jnp.maximum(rn, 1e-9)))
        r = r * (w / jnp.maximum(maskf, 1e-9))[..., None]
        Jc, Jp = _jacobians(state, Xc, intr, w)
        U, V, Wm, gc, gp = _normal_equations(Jc, Jp, r)
        d_xi, d_X = _schur_solve(U, V, Wm, gc, gp, lam, fix_first_cam)

        R_new, t_new = se3_retract(state.R, state.t, d_xi)
        new_state = BAState(R=R_new, t=t_new, X=state.X + d_X)

        c_old = _cost(state, uv, maskf, intr)
        c_new = _cost(new_state, uv, maskf, intr)
        accept = c_new < c_old
        state = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), new_state, state)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return (state, lam), jnp.where(accept, c_new, c_old)

    (state, _), hist = jax.lax.scan(
        step, (state, jnp.float32(lam0)), None, length=n_iters)
    return BAResult(state=state, cost=_cost(state, uv, maskf, intr),
                    cost_history=hist)
