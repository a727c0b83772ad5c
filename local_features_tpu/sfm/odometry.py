"""Long-sequence visual odometry: windowed SfM chunks + Sim(3) stitching
+ global pose-graph refinement (BASELINE.md config 4 — keyframe
trajectory estimation with ATE evaluation).

Design: the sequence is split into overlapping windows; each window is
reconstructed independently with the batched front-end + LM bundle
adjustment (sfm/pipeline.py — all device work), windows are stitched by
Sim(3) alignment over their shared cameras (monocular scale propagates
through the overlap), and a final Gauss-Newton pose graph over all
window-internal relative poses distributes residual drift.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from ..api import LocalFeatures
from . import geometry as geo
from .ba import BAState, lm_bundle_adjust
from .pipeline import (Reconstruction, build_observations,
                       reconstruct_sequence)
from .pose_graph import PoseGraph, optimize
from .two_view import triangulate_multiview


@dataclass
class OdometryResult:
    R: np.ndarray          # [F, 3, 3] world->cam
    t: np.ndarray          # [F, 3]
    chunks: list = field(default_factory=list)

    @property
    def camera_centers(self) -> np.ndarray:
        return np.einsum("cji,cj->ci", self.R, -self.t)


def _sim3_align(R_a, t_a, R_b, t_b, scale=None):
    """Sim(3) (s, R, t) mapping chunk-b world coords into chunk-a world
    coords, from >= 2 shared cameras.

    Camera centers satisfy C_a = s * Rw @ C_b + tw; rotations satisfy
    R_a[i] = R_b[i] @ Rw^T.  `scale` overrides the center-distance
    estimate (used when a structure-based estimate is available —
    _shared_track_scale)."""
    C_a = np.einsum("cji,cj->ci", R_a, -t_a)
    C_b = np.einsum("cji,cj->ci", R_b, -t_b)
    # rotation from the first shared camera's orientation
    Rw = R_b[0].T @ R_a[0]
    if scale is None:
        # scale from pairwise center distances
        d_a = np.linalg.norm(C_a[1:] - C_a[0], axis=-1)
        d_b = np.linalg.norm(C_b[1:] - C_b[0], axis=-1)
        ok = d_b > 1e-9
        s = float(np.median(d_a[ok] / d_b[ok])) if ok.any() else 1.0
    else:
        s = float(scale)
    tw = C_a[0] - s * (C_b[0] @ Rw)
    return s, Rw, tw


def _shared_track_scale(rec_a, off_a, rec_b, off_b, shared_frames):
    """Median per-track depth ratio between two window reconstructions
    over tracks they observe in COMMON (same (global frame, keypoint)
    observation — the windows share the detected features, so identical
    keys mean the identical physical track).

    Returns (scale a/b, n_common).  Depths are measured in the first
    shared camera of each window; with hundreds of shared tracks this
    beats the (overlap-1) camera-center distance ratios by an order of
    magnitude in robustness (overlap=2 gives ONE distance)."""
    if rec_a.track_obs is None or rec_b.track_obs is None:
        return 1.0, 0
    f = shared_frames[0]
    la, lb = f - off_a, f - off_b
    key_to_a = {}
    for p, tr in enumerate(rec_a.track_obs):
        k = tr.get(la)
        if k is not None:
            key_to_a[k] = p
    za, zb = [], []
    Ra, ta = rec_a.R[la], rec_a.t[la]
    Rb, tb = rec_b.R[lb], rec_b.t[lb]
    for p, tr in enumerate(rec_b.track_obs):
        k = tr.get(lb)
        if k is None or k not in key_to_a:
            continue
        Xa = rec_a.X[key_to_a[k]]
        Xb = rec_b.X[p]
        za.append(Ra[2] @ Xa + ta[2])
        zb.append(Rb[2] @ Xb + tb[2])
    za = np.asarray(za)
    zb = np.asarray(zb)
    ok = (za > 1e-6) & (zb > 1e-6)
    if ok.sum() < 10:
        return 1.0, int(ok.sum())
    return float(np.median(za[ok] / zb[ok])), int(ok.sum())


def _apply_sim3(s, Rw, tw, R, t):
    """Transform world->cam poses by the world-frame Sim(3):
    centers C' = s * C @ Rw + tw, orientations R' = R @ Rw^T."""
    C = np.einsum("cji,cj->ci", R, -t)
    C_new = s * C @ Rw + tw
    R_new = np.einsum("cij,jk->cik", R, Rw.T)
    t_new = -np.einsum("cij,cj->ci", R_new, C_new)
    return R_new, t_new


def reconstruct_long_sequence(
    frames: np.ndarray,
    intr: np.ndarray,
    window: int = 6,
    overlap: int = 2,
    max_features: int = 800,
    n_scales: int = 4,
    ba_iters: int = 20,
    pose_graph_iters: int = 8,
    global_ba_iters: int = 15,
    seed: int = 0,
    engine: LocalFeatures | None = None,
    loop_closure: bool = False,
    loop_graph: str = "tracks",
    loop_kwargs: dict | None = None,
) -> OdometryResult:
    """Windowed odometry over an ordered [F, H, W] frame sequence.

    loop_closure=True runs descriptor-index revisit detection
    (sfm/loops.py) and fuses the verified loop MATCHES into the global
    bundle adjustment's tracks.  loop_graph="sim3" additionally corrects
    scale drift with a Sim(3) pose graph over depth-ratio loop
    measurements (sfm/sim3.py) before the global BA — right for
    slow-DRIFT regimes (long forward-motion dataset sequences); on
    weak-parallax trajectories whose error is per-step scale JITTER the
    smooth-scale assumption distorts the chain (measured: synthetic
    18-frame circuit ATE 0.14 -> 0.46), hence opt-in.
    `loop_kwargs` forwards to detect_loop_closures (min_separation,
    min_votes, min_inliers, ratio, seed).

    Note: sequences with F <= window are reconstructed in one window and
    skip loop detection entirely (they are shorter than any revisit
    separation).  Track fusion requires global_ba_iters > 0 (the BA is
    its only consumer); with global_ba_iters=0, loop detection only
    runs when loop_graph="sim3" can use it.
    """
    if loop_graph not in ("tracks", "sim3"):
        raise ValueError(f"unknown loop_graph {loop_graph!r}; "
                         "expected 'tracks' or 'sim3'")
    F = frames.shape[0]
    if F <= window:
        rec = reconstruct_sequence(frames, intr, max_features=max_features,
                                   n_scales=n_scales, ba_iters=ba_iters,
                                   seed=seed, engine=engine)
        return OdometryResult(R=rec.R, t=rec.t, chunks=[rec])

    lf = engine or LocalFeatures(max_features=max_features,
                                 n_scales=n_scales)
    # detect features + match consecutive pairs ONCE, share across windows
    # (batched front-end AND batched matching: one device call per 8
    # frames / 8 pairs — per-pair dispatch+fetch otherwise dominates at
    # config-4/5 sequence lengths)
    from ..ops.matching import match_consecutive, pad_descriptor_sequence

    feats = lf.detect_sequence(frames, max_features)
    descs, dvalid = pad_descriptor_sequence(feats)
    all_matches = match_consecutive(descs, dvalid)

    stride = window - overlap
    starts = list(range(0, F - window + 1, stride))
    if starts[-1] + window < F:
        starts.append(F - window)

    chunks: list[tuple[int, Reconstruction]] = []
    for s0 in starts:
        rec = reconstruct_sequence(
            frames[s0:s0 + window], intr, max_features=max_features,
            n_scales=n_scales, ba_iters=ba_iters, seed=seed + s0, engine=lf,
            features=feats[s0:s0 + window],
            matches=all_matches[s0:s0 + window - 1])
        chunks.append((s0, rec))

    # stitch chunks into the first chunk's frame via Sim(3) over overlaps
    R_glob = np.zeros((F, 3, 3), np.float32)
    t_glob = np.zeros((F, 3), np.float32)
    have = np.zeros(F, bool)
    s0, rec0 = chunks[0]
    R_glob[s0:s0 + window] = rec0.R
    t_glob[s0:s0 + window] = rec0.t
    have[s0:s0 + window] = True
    applied_scale = [1.0]  # per chunk: scale taking its frame -> global
    for idx, (sc, rec) in enumerate(chunks[1:], start=1):
        shared = [f for f in range(sc, sc + window) if have[f]]
        ids = [f - sc for f in shared]
        # structure-based scale: the previous chunk owns the shared
        # frames and observes the SAME tracks there; the median depth
        # ratio over those tracks (x previous chunk's global scale) is
        # far more robust than overlap-1 center distances (with
        # overlap=2 the center estimate is ONE noisy baseline — the
        # dominant scale-drift source measured on the phototex renders)
        sp, rec_p = chunks[idx - 1]
        shared_p = [f for f in shared if sp <= f < sp + window]
        s_override = None
        if shared_p:
            s_tr, n_common = _shared_track_scale(rec_p, sp, rec, sc,
                                                 shared_p)
            if n_common >= 10:
                s_override = s_tr * applied_scale[idx - 1]
        s, Rw, tw = _sim3_align(R_glob[shared], t_glob[shared],
                                rec.R[ids], rec.t[ids], scale=s_override)
        applied_scale.append(s)
        R_new, t_new = _apply_sim3(s, Rw, tw, rec.R, rec.t)
        for j, f in enumerate(range(sc, sc + window)):
            if not have[f]:
                R_glob[f] = R_new[j]
                t_glob[f] = t_new[j]
                have[f] = True

    assert have.all()

    # global pose graph over all chunk-internal relative poses
    edges, R_rel, t_rel = [], [], []
    for (sc, rec) in chunks:
        # rescale each chunk's relative translations into the global frame
        shared = list(range(sc, sc + window))
        s, Rw, tw = _sim3_align(R_glob[shared], t_glob[shared], rec.R, rec.t)
        Rr, tr = _apply_sim3(s, Rw, tw, rec.R, rec.t)
        for i in range(window - 1):
            a, b = sc + i, sc + i + 1
            Ri, ti = geo.se3_inverse(jnp.asarray(Rr[i]), jnp.asarray(tr[i]))
            Rij, tij = geo.se3_compose(jnp.asarray(Rr[i + 1]),
                                       jnp.asarray(tr[i + 1]), Ri, ti)
            edges.append((a, b))
            R_rel.append(np.asarray(Rij))
            t_rel.append(np.asarray(tij))

    graph = PoseGraph(
        R=jnp.asarray(R_glob), t=jnp.asarray(t_glob),
        edges=jnp.asarray(np.array(edges, np.int32)),
        R_rel=jnp.asarray(np.stack(R_rel)),
        t_rel=jnp.asarray(np.stack(t_rel)),
        weight=jnp.ones(len(edges)),
    )
    graph = optimize(graph, n_iters=pose_graph_iters)
    R_glob = np.asarray(graph.R)
    t_glob = np.asarray(graph.t)

    extra_matches = None
    # skip detection when nothing will consume its result (track fusion
    # is applied by the global BA; sim3 applies directly to the poses)
    if loop_closure and (global_ba_iters > 0 or loop_graph == "sim3"):
        # loop correction (see docstring for the loop_graph regimes):
        # 1. loop_graph="sim3": verified revisits become relative-
        #    similarity edges (depth-ratio scale measurement, sim3.py) —
        #    the only machinery that can undo monocular scale DRIFT
        #    (an SE(3) edge with borrowed translation scale measurably
        #    made ATE worse).
        # 2. always: the verified loop MATCHES fuse into the global BA's
        #    tracks so the refinement keeps the revisit constraint.
        from .loops import detect_loop_closures

        kw = dict(loop_kwargs or {})
        kw.setdefault("seed", seed)
        loops = detect_loop_closures(feats, intr, **kw)
        if loops and loop_graph == "sim3":
            from . import sim3
            from .loops import loop_sim3_measurements

            meas = loop_sim3_measurements(feats, intr, R_glob, t_glob,
                                          all_matches, loops)
            if meas:
                g = sim3.chain_graph(R_glob, t_glob, loop_edges=meas,
                                     loop_weight=3.0)
                if os.environ.get("LF_SIM3_DUMP"):
                    np.savez(os.environ["LF_SIM3_DUMP"],
                             R=np.asarray(g.R), t=np.asarray(g.t),
                             s=np.asarray(g.s),
                             edges=np.asarray(g.edges),
                             R_rel=np.asarray(g.R_rel),
                             t_rel=np.asarray(g.t_rel),
                             s_rel=np.asarray(g.s_rel),
                             weight=np.asarray(g.weight))
                g = sim3.optimize_robust(g, n_consecutive=F - 1,
                                         n_iters=15, lam=1e-5)
                R_c, t_c = sim3.corrected_trajectory(g)
                R_c, t_c = np.asarray(R_c), np.asarray(t_c)
                # a loop correction must never be WORSE than no
                # correction: a non-finite corrected chain (observed
                # once on a 120-frame circuit; the graph inputs can be
                # captured via LF_SIM3_DUMP) falls back to the
                # uncorrected poses instead of poisoning the global BA
                if np.isfinite(R_c).all() and np.isfinite(t_c).all():
                    R_glob = R_c
                    t_glob = t_c
                else:
                    logger.warning(
                        "sim3 loop correction produced non-finite poses"
                        " (%d edges); keeping uncorrected trajectory",
                        len(meas))
        if loops:
            extra_matches = [(e.i, e.j, e.matches) for e in loops]

    if global_ba_iters > 0:
        # global refinement: full-sequence tracks, multi-view midpoint
        # triangulation from the stitched poses, one joint LM BA
        uv, mask = build_observations(feats, all_matches, min_track_len=2,
                                      extra_matches=extra_matches)
        intr_j = jnp.asarray(intr, jnp.float32)
        x_norm = geo.normalize_points(jnp.asarray(uv), intr_j)
        X0 = triangulate_multiview(jnp.asarray(R_glob), jnp.asarray(t_glob),
                                   x_norm, jnp.asarray(mask))
        # drop badly-conditioned points (behind any observing camera)
        Xc = jnp.einsum("cij,pj->cpi", jnp.asarray(R_glob), X0) \
            + jnp.asarray(t_glob)[:, None, :]
        ok = np.asarray(jnp.all(jnp.where(jnp.asarray(mask),
                                          Xc[..., 2] > 0.05, True), axis=0))
        uv, mask, X0 = uv[:, ok], mask[:, ok], X0[ok]
        result = lm_bundle_adjust(
            BAState(R=jnp.asarray(R_glob), t=jnp.asarray(t_glob), X=X0),
            jnp.asarray(uv), jnp.asarray(mask), intr_j,
            n_iters=global_ba_iters, huber_delta=2.0)
        R_glob = np.asarray(result.state.R)
        t_glob = np.asarray(result.state.t)

    return OdometryResult(R=R_glob, t=t_glob,
                          chunks=[rec for _, rec in chunks])
