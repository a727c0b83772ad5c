"""Instrument the Sim(3) loop-closure scale measurements against ground
truth (the round-3 judge's ask: diagnose why odometry+sim3_loops lost
to plain track fusion on the circuit ATE artifact).

Method: render a phototex circuit, run the keyframed chain init (the
round-4 config-4/5 default), detect loop closures on the keyframes,
compute the depth-ratio Sim(3) measurements (sfm/loops.py:
loop_sim3_measurements), and compare each edge's measured relative
scale s_rel with the GROUND-TRUTH relative scale of the drifted chain
(the ratio of estimated to true step length around each loop end —
what a perfect measurement would report).  Prints one JSON line per
edge and a summary.

Conclusion this script documents (measured, see ATE_r04.json): the
depth-ratio measurement itself is useful in the slow-drift keyframe
regime — median |log s_err| 0.088 vs the chain's own log-scale-profile
spread of 0.21 (80-frame circuit, 4 verified edges), i.e. ~2.4x
tighter than the drift it corrects; the round-3 inversion came
from applying the graph to the per-frame windowed-odometry chain whose
error is per-step scale JITTER — the graph's smooth-scale prior
(consecutive s_rel = 1) is violated there, exactly as the sfm/loops.py
NOTE predicted.  Round 4 therefore runs the Sim(3) graph at the
KEYFRAME level inside the batched chain (sequence_init.py), where the
same machinery measurably helps.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--f", type=float, default=260.0)
    ap.add_argument("--max-features", type=int, default=500)
    ap.add_argument("--stride", type=int, default=2)
    args = ap.parse_args()

    from local_features_tpu.utils.platform import apply_platform_env
    apply_platform_env(default="cpu")

    from local_features_tpu.api import LocalFeatures
    from local_features_tpu.ops.matching import (match_consecutive,
                                                 pad_descriptor_sequence)
    from local_features_tpu.sfm.loops import (detect_loop_closures,
                                              loop_sim3_measurements)
    from local_features_tpu.sfm.sequence_init import (
        batched_relative_poses, chain_sequence_poses,
        pair_correspondence_arrays)
    from local_features_tpu.utils.image import load_gray_pil
    from local_features_tpu.utils.phototex import render_layered_sequence

    root = os.path.join(os.path.dirname(__file__), "..")
    bg = load_gray_pil(os.path.join(root, "sample_data/houses.jpg"))
    fg = load_gray_pil(os.path.join(root, "sample_data/bird.jpg"))
    frames, R_gt, t_gt, intr = render_layered_sequence(
        bg.astype(np.float32), fg.astype(np.float32),
        n_frames=args.frames, height=args.height, width=args.width,
        f=args.f)
    lf = LocalFeatures(max_features=args.max_features)
    feats = lf.detect_sequence(frames, args.max_features)

    kf = np.arange(0, args.frames, args.stride)
    feats_kf = [feats[i] for i in kf]
    n_kps_kf = [len(np.asarray(f.x)) for f in feats_kf]
    descs, dvalid = pad_descriptor_sequence(feats_kf)
    matches_kf = match_consecutive(descs, dvalid)
    pairs = pair_correspondence_arrays(feats_kf, matches_kf, intr)
    R_rel, t_rel, inl, n_inl, Xc = batched_relative_poses(pairs, seed=1)
    Rk, tk, scale, t_rel, Xc = chain_sequence_poses(
        pairs, R_rel, t_rel, inl, n_inl, Xc, n_kps_kf)

    edges = detect_loop_closures(feats_kf, intr,
                                 min_separation=max(len(kf) // 4, 8))
    meas = loop_sim3_measurements(feats_kf, intr, Rk, tk, matches_kf,
                                  edges)

    # ground-truth local scale of the drifted chain at keyframe k:
    # estimated step length / true step length around k
    c_est = np.einsum("kji,kj->ki", Rk, -tk)
    c_gt = np.einsum("kji,kj->ki", R_gt[kf], -t_gt[kf])
    step_est = np.linalg.norm(np.diff(c_est, axis=0), axis=1)
    step_gt = np.linalg.norm(np.diff(c_gt, axis=0), axis=1)
    s_local = step_est / np.maximum(step_gt, 1e-12)
    s_node = np.r_[s_local[:1], 0.5 * (s_local[1:] + s_local[:-1]),
                   s_local[-1:]][: len(kf)]

    errs = []
    for (a, b, s_rel, R_rel_e, t_rel_e) in meas:
        s_true = s_node[b] / max(s_node[a], 1e-12)
        log_err = float(np.log(max(s_rel, 1e-12)) - np.log(s_true))
        errs.append(log_err)
        print(json.dumps({"edge": [int(a), int(b)],
                          "s_rel_measured": round(float(s_rel), 4),
                          "s_rel_true": round(float(s_true), 4),
                          "log_scale_error": round(log_err, 4)}),
              flush=True)
    if errs:
        e = np.abs(errs)
        print(json.dumps({
            "n_edges": len(errs),
            "median_abs_log_scale_error": round(float(np.median(e)), 4),
            "p90_abs_log_scale_error": round(float(np.percentile(e, 90)),
                                             4),
            "chain_scale_profile_cv": round(
                float(np.std(np.log(np.maximum(s_local, 1e-12)))), 4),
        }))
    else:
        print(json.dumps({"n_edges": 0,
                          "note": "no verified loop measurements"}))


if __name__ == "__main__":
    main()
