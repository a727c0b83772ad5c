"""Sim(3) pose-graph optimization — scale-drift-aware loop closure.

Reference counterpart: none — north-star scope (BASELINE.md config 4).
The windowed monocular odometry's dominant error mode is per-step SCALE
noise (see sfm/loops.py NOTE): an SE(3) pose graph cannot express "the
map shrank between the two visits", so monocular loop closure is done
on Sim(3) — each node carries a similarity (s, R, t) and a loop edge
measures the relative similarity including the scale ratio between the
two visits' local maps (Strasdat et al., "Scale Drift-Aware Large Scale
Monocular SLAM", RSS 2010 — the approach ORB-SLAM adopted).

TPU-first: residuals are batched over all edges, the Jacobian comes
from jacfwd of the stacked [N, 7] tangent, and the damped Gauss-Newton
loop is a lax.scan — one XLA program, same design as pose_graph.py
(keyframe graphs are small; the dense [E*7, N*7] Jacobian is cheap).

Conventions match geometry.py: a node's similarity maps WORLD points to
FRAME points, x_frame = s * R @ x_world + t.  Tangent ordering is
[omega (3), upsilon (3), sigma (1)] with s = exp(sigma).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .geometry import so3_exp, so3_log


def sim3_compose(s1, R1, t1, s2, R2, t2):
    """(s1,R1,t1) o (s2,R2,t2): apply transform 2 first, then 1."""
    return (s1 * s2, R1 @ R2,
            s1[..., None] * jnp.einsum("...ij,...j->...i", R1, t2) + t1)


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    return (inv_s, Rt,
            -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, t))


def sim3_retract(s, R, t, xi):
    """First-order chart: (e^sigma, so3_exp(omega), upsilon) o (s, R, t).

    A retraction, not the exact Sim(3) exponential (whose translation
    part needs the W(sigma, omega) matrix) — any smooth chart with the
    right derivative at 0 works for Gauss-Newton.
    """
    w, v, sig = xi[..., :3], xi[..., 3:6], xi[..., 6]
    dR = so3_exp(w)
    return sim3_compose(jnp.exp(sig), dR, v, s, R, t)


def sim3_log_approx(s, R, t):
    """[so3_log(R), t, log s] — the residual chart (exact at identity)."""
    return jnp.concatenate(
        [so3_log(R), t, jnp.log(s)[..., None]], axis=-1)


def sim3_apply(s, R, t, X):
    """Apply to points: [..., 3] -> [..., 3]."""
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, X) + t


class Sim3Graph(NamedTuple):
    s: jnp.ndarray          # [N] node scales
    R: jnp.ndarray          # [N, 3, 3] absolute (world -> frame)
    t: jnp.ndarray          # [N, 3]
    edges: jnp.ndarray      # [E, 2] i32 (i, j)
    s_rel: jnp.ndarray      # [E] measured S_j o S_i^{-1} scale
    R_rel: jnp.ndarray      # [E, 3, 3]
    t_rel: jnp.ndarray      # [E, 3]
    weight: jnp.ndarray     # [E] edge weights (0 disables an edge)


def _edge_residual(si, Ri, ti, sj, Rj, tj, s_rel, R_rel, t_rel):
    """log( S_rel^-1 o S_j o S_i^-1 ) in R^7."""
    s_inv, R_inv, t_inv = sim3_inverse(si, Ri, ti)
    s_ij, R_ij, t_ij = sim3_compose(sj, Rj, tj, s_inv, R_inv, t_inv)
    sr_inv, Rr_inv, tr_inv = sim3_inverse(s_rel, R_rel, t_rel)
    se, Re, te = sim3_compose(sr_inv, Rr_inv, tr_inv, s_ij, R_ij, t_ij)
    return sim3_log_approx(se, Re, te)


def residuals(graph: Sim3Graph, xi: jnp.ndarray) -> jnp.ndarray:
    """[E, 7] edge residuals with per-node tangent perturbations [N, 7]."""
    s, R, t = sim3_retract(graph.s, graph.R, graph.t, xi)
    i = graph.edges[:, 0]
    j = graph.edges[:, 1]
    r = _edge_residual(s[i], R[i], t[i], s[j], R[j], t[j],
                       graph.s_rel, graph.R_rel, graph.t_rel)
    return r * graph.weight[:, None]


def optimize(graph: Sim3Graph, n_iters: int = 15, lam: float = 1e-6,
             fix_first: bool = True, huber: float = 1.5) -> Sim3Graph:
    """Robust damped Gauss-Newton.  Fixing node 0 pins the full 7-dof
    gauge freedom of a monocular reconstruction (global rotation,
    translation, scale).

    Three layers of robustness, each pinned by an observed failure:
    - Huber IRLS per edge (delta = `huber` x median residual norm,
      re-estimated every iteration): real loop-edge scale measurements
      can be junk — one 120-frame circuit produced 33 loop edges with
      s_rel spanning 0.0003..11 (30,000x mutually inconsistent), and a
      plain least-squares GN NaN'd by iteration 2 trying to satisfy
      them.  Down-weighting by residual lets the consistent majority
      win (the same lesson as the BA Huber fix, sfm/pipeline.py).
    - Accept/reject damping: a step is kept only if it reduces the
      robust cost AND stays finite; rejection raises lam 10x (recovers
      from an ill-conditioned solve), acceptance halves it.
    - Per-iteration tangent clamps: |sigma| <= 0.7 and |omega| <= 1
      (the components whose retraction explodes/wraps), translation
      <= 20x the median edge baseline — a single extreme-but-genuine
      scale edge (s_rel ~ 0.02) otherwise overflows exp(sigma) on the
      first step while still allowing e^10 total correction over 15
      iterations."""
    N = graph.R.shape[0]
    E = graph.edges.shape[0]
    v_max = 20.0 * jnp.median(jnp.linalg.norm(graph.t_rel, axis=-1)) + 1e-6

    def robust_cost(r, delta):
        rn = jnp.linalg.norm(r, axis=-1)
        quad = rn * rn
        lin = 2.0 * delta * rn - delta * delta
        return jnp.sum(jnp.where(rn <= delta, quad, lin))

    def gn_step(carry, _):
        g, lam_c = carry
        zero = jnp.zeros((N, 7))
        J = jax.jacfwd(lambda xi: residuals(g, xi).reshape(-1))(zero)
        J = J.reshape(E, 7, N * 7)
        r = residuals(g, zero)                         # [E, 7]
        rn = jnp.linalg.norm(r, axis=-1)
        active = graph.weight > 0
        med = jnp.nanmedian(jnp.where(active, rn, jnp.nan))
        delta = jnp.maximum(huber * jnp.where(jnp.isfinite(med), med, 1.0),
                            1e-9)
        w_irls = jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(rn, 1e-12)))
        rw = (r * w_irls[:, None]).reshape(-1)
        Jw = (J * w_irls[:, None, None]).reshape(-1, N * 7)
        H = Jw.T @ Jw + lam_c * jnp.eye(N * 7)
        b = -Jw.T @ rw
        if fix_first:
            m = jnp.ones(N * 7).at[:7].set(0.0)
            H = H * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            b = b * m
        dxi = jnp.linalg.solve(H, b).reshape(N, 7)
        w = jnp.clip(dxi[:, :3], -1.0, 1.0)
        v = jnp.clip(dxi[:, 3:6], -v_max, v_max)
        sig = jnp.clip(dxi[:, 6:7], -0.7, 0.7)
        dxi = jnp.concatenate([w, v, sig], axis=-1)
        s, R, t = sim3_retract(g.s, g.R, g.t, dxi)
        g_new = g._replace(s=s, R=R, t=t)

        c_old = robust_cost(r, delta)
        r_new = residuals(g_new, jnp.zeros((N, 7)))
        c_new = robust_cost(r_new, delta)
        finite = (jnp.isfinite(s).all() & jnp.isfinite(t).all()
                  & jnp.isfinite(c_new))
        accept = finite & (c_new < c_old)
        g = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), g_new, g)
        lam_c = jnp.where(accept, jnp.maximum(lam_c * 0.5, 1e-9),
                          jnp.minimum(lam_c * 10.0, 1e8))
        return (g, lam_c), jnp.where(accept, c_new, c_old)

    (graph, _), _ = jax.lax.scan(gn_step, (graph, jnp.float32(lam)),
                                 None, length=n_iters)
    return graph


def _chain_deformation(sol: Sim3Graph, graph: Sim3Graph,
                       n_consecutive: int) -> float:
    """Worst per-chain-edge squared deformation of solution `sol` vs the
    original chain measurements, translation normalized by the median
    chain step length (scale-free).  A genuine loop closure spreads a
    small drift correction smoothly (per-edge deformation ~1e-3);
    forcing a garbage edge bends some chain edge hard (~0.1-1+)."""
    idx = jnp.arange(n_consecutive)
    e = graph.edges[idx]
    r = _edge_residual(sol.s[e[:, 0]], sol.R[e[:, 0]], sol.t[e[:, 0]],
                       sol.s[e[:, 1]], sol.R[e[:, 1]], sol.t[e[:, 1]],
                       graph.s_rel[idx], graph.R_rel[idx], graph.t_rel[idx])
    step = jnp.median(jnp.linalg.norm(graph.t_rel[idx], axis=-1)) + 1e-9
    r = r.at[:, 3:6].divide(step)
    return float(jnp.max(jnp.sum(r * r, axis=-1)))


def optimize_robust(graph: Sim3Graph, n_consecutive: int,
                    n_iters: int = 15, lam: float = 1e-6,
                    prune_factor: float = 9.0,
                    chain_gate: float = 0.02) -> Sim3Graph:
    """optimize() with pairwise loop-edge consensus pruning.

    Assumes `graph.edges[:n_consecutive]` are the trajectory chain and
    the rest are loop edges (chain_graph's layout).  Joint- or
    leave-one-out residuals are mushy outlier signals (a wrong edge's
    error smears into the solution it helped shape), so consensus is
    scored on SINGLE-EDGE solutions: optimize the chain with each loop
    edge alone, then measure how badly every other edge fits that
    solution (symmetric pairwise disagreement).  Consistent edges
    vouch for each other with near-zero disagreement; a wrong edge has
    no partner near the consensus tightness and is disabled, after
    which the graph is re-optimized from the original poses.  Needs
    >= 3 loop edges for a majority (2 edges disagreeing is undecidable);
    with 1-2 loop edges each is instead gated on CHAIN disagreement:
    its single-edge solution must not deform any chain edge beyond
    `chain_gate` (normalized squared tangent norm — genuine drift
    corrections spread smoothly at ~1e-3/edge, a garbage edge bends the
    chain at ~0.1+), so a lone perceptual-aliasing edge that survived
    geometric verification is still rejected.  Cost: k+1 optimizations
    for k loop edges — loop edges are rare.
    """
    n_loops = graph.edges.shape[0] - n_consecutive
    if 1 <= n_loops <= 2:
        keep = graph.weight
        for k in range(n_loops):
            w = graph.weight.at[n_consecutive:].set(0.0) \
                .at[n_consecutive + k].set(graph.weight[n_consecutive + k])
            sol = optimize(graph._replace(weight=w), n_iters, lam)
            if _chain_deformation(sol, graph, n_consecutive) > chain_gate:
                keep = keep.at[n_consecutive + k].set(0.0)
        graph = graph._replace(weight=keep)
    if n_loops >= 3:
        # single-edge solutions: chain + loop edge k alone — BATCHED as
        # one vmapped device program over the k weight masks (the
        # previous per-edge Python loop paid k sequential optimize()
        # dispatches: 33 loop edges cost ~14 min on a 120-frame CPU
        # run; the vmapped form is one compile + one execution)
        base = graph.weight.at[n_consecutive:].set(0.0)
        ks = jnp.arange(n_loops)
        Ws = jax.vmap(lambda k: base.at[n_consecutive + k].set(
            graph.weight[n_consecutive + k]))(ks)
        sols = jax.vmap(
            lambda w: optimize(graph._replace(weight=w), n_iters, lam))(Ws)
        # per-solution squared residual of EVERY loop edge at once
        ei = graph.edges[n_consecutive:, 0]
        ej = graph.edges[n_consecutive:, 1]

        def all_loop_sq(s, R, t):
            r = _edge_residual(s[ei], R[ei], t[ei], s[ej], R[ej], t[ej],
                               graph.s_rel[n_consecutive:],
                               graph.R_rel[n_consecutive:],
                               graph.t_rel[n_consecutive:])
            return jnp.sum(r * r, axis=-1)          # [n_loops]

        Rsq = jax.vmap(all_loop_sq)(sols.s, sols.R, sols.t)  # [k, l]
        # symmetric pairwise disagreement: how badly edge l fits edge
        # k's solution and vice versa (measured: consistent pairs score
        # ~1e-3 while a garbage edge scores 30-47 on the same graph)
        D = Rsq + Rsq.T
        off = D + jnp.diag(jnp.full(n_loops, jnp.inf))
        best = jnp.min(off)                  # tightest consistent pair
        # an edge with NO partner near the consensus tightness is pruned
        bad = jnp.min(off, axis=1) > prune_factor * (best + 1e-9)
        if bool(bad.any()) and not bool(bad.all()):
            w = graph.weight.at[n_consecutive:].set(
                jnp.where(bad, 0.0, graph.weight[n_consecutive:]))
            graph = graph._replace(weight=w)
    return optimize(graph, n_iters, lam)


def total_error(graph: Sim3Graph) -> jnp.ndarray:
    r = residuals(graph, jnp.zeros((graph.R.shape[0], 7)))
    return jnp.sum(r * r)


def chain_graph(
    R: jnp.ndarray,
    t: jnp.ndarray,
    loop_edges: list | None = None,
    loop_weight: float = 1.0,
) -> Sim3Graph:
    """Build a Sim(3) graph from an estimated SE(3) trajectory.

    Consecutive edges are the trajectory's own relative poses with
    s_rel = 1 (the chain believes its local scale); each loop edge is
    (i, j, s_rel, R_rel [3,3], t_rel [3]) measuring
    S_j o S_i^{-1} — from `loop_sim3_measurement` or ground truth.
    Node scales start at 1.
    """
    R = jnp.asarray(R, jnp.float32)
    t = jnp.asarray(t, jnp.float32)
    N = R.shape[0]
    idx = jnp.arange(N - 1)
    edges = [jnp.stack([idx, idx + 1], axis=1)]
    Ri, ti = R[:-1], t[:-1]
    Rj, tj = R[1:], t[1:]
    Rt = jnp.swapaxes(Ri, -1, -2)
    R_rel = [Rj @ Rt]
    t_rel = [tj - jnp.einsum("eij,ej->ei", Rj @ Rt, ti)]
    s_rel = [jnp.ones(N - 1)]
    weight = [jnp.ones(N - 1)]
    if loop_edges:
        li = jnp.asarray([[e[0], e[1]] for e in loop_edges], jnp.int32)
        edges.append(li)
        s_rel.append(jnp.asarray([e[2] for e in loop_edges], jnp.float32))
        R_rel.append(jnp.asarray([e[3] for e in loop_edges], jnp.float32))
        t_rel.append(jnp.asarray([e[4] for e in loop_edges], jnp.float32))
        weight.append(jnp.full(len(loop_edges), loop_weight))
    return Sim3Graph(
        s=jnp.ones(N), R=R, t=t,
        edges=jnp.concatenate(edges),
        s_rel=jnp.concatenate(s_rel),
        R_rel=jnp.concatenate(R_rel),
        t_rel=jnp.concatenate(t_rel),
        weight=jnp.concatenate(weight),
    )


def corrected_trajectory(graph: Sim3Graph):
    """SE(3) trajectory (R [N,3,3], t [N,3]) from an optimized graph.

    The optimized node similarity maps world to frame at the NODE's
    local scale; dividing the translation by s re-expresses every pose
    at the (gauge-fixed) global scale: x_frame = R x_world + t / s.
    """
    return graph.R, graph.t / graph.s[:, None]
