"""Distributed bundle adjustment: landmarks sharded over the device mesh.

The point-block half of the BA normal equations is embarrassingly
parallel over landmarks, so the natural multi-chip decomposition shards
the landmark axis: every device owns P/D landmarks and their
observations, computes its local point blocks (V_p, W_cp, g_p) and local
contributions to the camera system, and the camera-side reduction
(U_c, the Schur complement S, and the right-hand side) rides ICI as
`psum` collectives.  The reduced C*6 x C*6 camera solve is tiny and runs
replicated on every device; landmark updates stay local (no gather).

This is the collective pattern of BASELINE.md config 5 (map-partitioned
BA with Schur reduction over ICI); multi-host DCN sharding uses the same
code over a larger mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .ba import BAState, BAResult, _jacobians, reprojection_residuals
from .geometry import se3_retract


def _local_normal_eq(Jc, Jp, r):
    U_loc = jnp.einsum("cpki,cpkj->cij", Jc, Jc)
    V = jnp.einsum("cpki,cpkj->pij", Jp, Jp)
    Wm = jnp.einsum("cpki,cpkj->cpij", Jc, Jp)
    gc_loc = -jnp.einsum("cpki,cpk->ci", Jc, r)
    gp = -jnp.einsum("cpki,cpk->pi", Jp, r)
    return U_loc, V, Wm, gc_loc, gp


def lm_bundle_adjust_sharded(
    mesh: Mesh,
    state: BAState,
    uv: jnp.ndarray,      # [C, P, 2]
    mask: jnp.ndarray,    # [C, P]
    intr: jnp.ndarray,
    n_iters: int = 20,
    lam0: float = 1e-3,
    fix_first_cam: bool = True,
    axis: str = "batch",
) -> BAResult:
    """Landmark-sharded LM bundle adjustment.  P must divide the mesh."""
    C = state.R.shape[0]
    I3 = jnp.eye(3)
    I6 = jnp.eye(6)

    def step(carry, _):
        (R, t, X, lam) = carry
        st = BAState(R=R, t=t, X=X)
        r, Xc = reprojection_residuals(st, uv_l, maskf_l, intr)

        def cost_of(stt):
            rr, _ = reprojection_residuals(stt, uv_l, maskf_l, intr)
            return (jax.lax.psum(jnp.sum(rr * rr), axis)
                    / jnp.maximum(jax.lax.psum(jnp.sum(maskf_l), axis), 1.0))

        Jc, Jp = _jacobians(st, Xc, intr, maskf_l)
        U_loc, V, Wm, gc_loc, gp = _local_normal_eq(Jc, Jp, r)
        U = jax.lax.psum(U_loc, axis)
        gc = jax.lax.psum(gc_loc, axis)

        Vinv = jnp.linalg.inv(V + lam * I3 + 1e-9 * I3)
        WVinv = jnp.einsum("cpij,pjk->cpik", Wm, Vinv)
        S_off = jax.lax.psum(
            jnp.einsum("apik,bpjk->abij", WVinv, Wm), axis)
        rhs = gc - jax.lax.psum(jnp.einsum("cpik,pk->ci", WVinv, gp), axis)

        S = -S_off
        S = S.at[jnp.arange(C), jnp.arange(C)].add(U + lam * I6)
        if fix_first_cam:
            m = jnp.ones((C,)).at[0].set(0.0)
            S = S * m[:, None, None, None] * m[None, :, None, None]
            S = S.at[0, 0].set(jnp.eye(6))
            rhs = rhs * m[:, None]
        S_flat = S.transpose(0, 2, 1, 3).reshape(C * 6, C * 6)
        d_xi = jnp.linalg.solve(S_flat, rhs.reshape(-1)).reshape(C, 6)

        rhs_p = gp - jnp.einsum("cpij,ci->pj", Wm, d_xi)
        d_X = jnp.einsum("pij,pj->pi", Vinv, rhs_p)

        R_new, t_new = se3_retract(R, t, d_xi)
        new_st = BAState(R=R_new, t=t_new, X=X + d_X)
        c_old = cost_of(st)
        c_new = cost_of(new_st)
        accept = c_new < c_old
        out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), new_st, st)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return (out.R, out.t, out.X, lam), jnp.where(accept, c_new, c_old)

    def run(R, t, X_l, uv_local, mask_local):
        nonlocal uv_l, maskf_l
        uv_l = uv_local
        maskf_l = mask_local.astype(jnp.float32)
        (R, t, X_l, _), hist = jax.lax.scan(
            step, (R, t, X_l, jnp.float32(lam0)), None, length=n_iters)
        st = BAState(R=R, t=t, X=X_l)
        rr, _ = reprojection_residuals(st, uv_l, maskf_l, intr)
        cost = (jax.lax.psum(jnp.sum(rr * rr), axis)
                / jnp.maximum(jax.lax.psum(jnp.sum(maskf_l), axis), 1.0))
        return R, t, X_l, cost, hist

    uv_l = maskf_l = None  # bound inside run per shard

    shard = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(None, axis), P(None, axis)),
        out_specs=(P(), P(), P(axis), P(), P()),
        check_vma=False,
    )
    R, t, X, cost, hist = jax.jit(shard(run))(
        state.R, state.t, state.X, uv, mask)
    return BAResult(state=BAState(R=R, t=t, X=X), cost=cost,
                    cost_history=hist)
