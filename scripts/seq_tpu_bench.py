"""SEQ_TPU_r0N.json: the sequence path on the real chip through the
tunnel — api.detect_sequence (batched vmapped front-end) +
ops.matching.match_consecutive (batched mutual matching), measuring
frames/s at the round-4 workload (120-frame 480x640 phototex sequence,
800 kp/frame).

Round 4 measured 13.5 fps (b=16/32): each batch paid a full tunnel
round trip because detect_batch fetched immediately after dispatch.
Round 5 software-pipelines both loops one batch deep (batch k+1 is
dispatched before batch k's fetch), overlapping device compute with
the host round trip; this script records both the default and the
round-4 batch configs.

Run (TPU): python scripts/seq_tpu_bench.py --out SEQ_TPU_r05.json
Reference counterpart: none (sequence throughput is north-star scope);
the per-frame analog is the reference's webcam loop
(examples/webcam/src/main.rs:126-141, serial per-frame detect).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--max-features", type=int, default=800)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from local_features_tpu.api import LocalFeatures
    from local_features_tpu.ops.matching import (match_consecutive,
                                                 pad_descriptor_sequence)
    from local_features_tpu.utils.image import load_gray_pil
    from local_features_tpu.utils.phototex import render_layered_sequence

    root = os.path.join(os.path.dirname(__file__), "..")
    bg = load_gray_pil(os.path.join(root, "sample_data/houses.jpg"))
    fg = load_gray_pil(os.path.join(root, "sample_data/bird.jpg"))
    frames, _, _, _ = render_layered_sequence(
        bg.astype(np.float32), fg.astype(np.float32),
        n_frames=args.frames, height=args.height, width=args.width,
        f=520.0)
    F = args.frames
    print(f"backend={jax.default_backend()}", flush=True)

    lf = LocalFeatures(max_features=args.max_features)
    results = []
    # fused on-device matching: descriptors never leave the device
    # (the split path is tunnel-BANDWIDTH-bound: ~8 MB of padded
    # descriptors per batch at ~20 MB/s effective — api.py
    # detect_match_sequence docstring)
    for fused_batch in (8, 16):
        lf.detect_match_sequence(frames[: 2 * fused_batch],
                                 args.max_features, batch=fused_batch)
        t0 = time.perf_counter()
        feats_f, pm_f = lf.detect_match_sequence(frames, args.max_features,
                                                 batch=fused_batch)
        t_fused = time.perf_counter() - t0
        results.append({
            "config": f"fused on-device matching, batch={fused_batch}",
            "total_s": round(t_fused, 2),
            "frames_per_s": round(F / t_fused, 1),
            "matches_total": int(sum(len(m) for m in pm_f))})
        print(json.dumps(results[-1]), flush=True)
    for fe_batch, m_batch in ((8, 8), (16, 32)):
        # warm both executables (compile excluded from timing)
        lf.detect_sequence(frames[: 2 * fe_batch], args.max_features,
                           batch=fe_batch)
        t0 = time.perf_counter()
        feats = lf.detect_sequence(frames, args.max_features,
                                   batch=fe_batch)
        t_fe = time.perf_counter() - t0
        descs, dvalid = pad_descriptor_sequence(feats)
        match_consecutive(descs[: 2 * m_batch + 1],
                          dvalid[: 2 * m_batch + 1], batch=m_batch)
        t0 = time.perf_counter()
        pair_matches = match_consecutive(descs, dvalid, batch=m_batch)
        t_m = time.perf_counter() - t0
        fps = F / (t_fe + t_m)
        results.append({
            "config": f"pipelined, frontend batch={fe_batch}, "
                      f"matching batch={m_batch}",
            "frontend_s": round(t_fe, 2), "matching_s": round(t_m, 2),
            "frames_per_s": round(fps, 1)})
        print(json.dumps(results[-1]), flush=True)

    out = {
        "workload": f"{F}-frame {args.height}x{args.width} phototex "
                    f"sequence, {args.max_features} kp/frame: "
                    "api.detect_sequence + ops.matching.match_consecutive "
                    f"on backend={jax.default_backend()}",
        "pipelining": "both loops dispatch batch k+1 before fetching "
                      "batch k (1-deep software pipeline); result "
                      "equality with the serial path pinned by "
                      "tests/test_api.py::test_detect_sequence_matches_"
                      "single and tests/test_matching.py::test_match_"
                      "consecutive_pipelined_equals_serial",
        "results": results,
        "round4_baseline_fps": 13.5,
        "matches_total": int(sum(len(m) for m in pair_matches)),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
