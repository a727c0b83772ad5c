"""Visual odometry on a real dataset: load a TUM RGB-D or KITTI odometry
sequence, estimate the trajectory with the windowed SfM pipeline (batched
TPU front-end -> windowed BA -> Sim(3) stitching -> pose graph -> global
BA), and report ATE RMSE against ground truth (BASELINE.md config 4).

Usage:
    python examples/odometry_dataset.py --format tum --root PATH \
        [--max-frames 60] [--stride 2] [--window 6] [--overlap 2] \
        [--max-features 800] [--intr fx,fy,cx,cy] [--save traj.npz]
    python examples/odometry_dataset.py --format kitti --root PATH \
        --seq 00 [...]

Try it on the vendored mini fixture:
    python examples/odometry_dataset.py --format tum \
        --root tests/data/tum_mini --intr-file tests/data/tum_mini/intr.txt
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from local_features_tpu.sfm import datasets  # noqa: E402
from local_features_tpu.sfm.odometry import reconstruct_long_sequence  # noqa: E402
from local_features_tpu.utils.platform import apply_platform_env  # noqa: E402


def main() -> int:
    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--format", choices=["tum", "kitti"], required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--seq", default="00", help="KITTI sequence id")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--window", type=int, default=6)
    ap.add_argument("--overlap", type=int, default=2)
    ap.add_argument("--max-features", type=int, default=800)
    ap.add_argument("--intr", default=None,
                    help="fx,fy,cx,cy override (TUM default: Freiburg-1)")
    ap.add_argument("--intr-file", default=None,
                    help="file with fx fy cx cy (one line)")
    ap.add_argument("--loop-closure", action="store_true",
                    help="detect revisits via the descriptor index and "
                    "fuse verified loop matches into the global BA "
                    "(sfm/loops.py)")
    ap.add_argument("--loop-graph", default="tracks",
                    choices=["tracks", "sim3"],
                    help="sim3: also correct scale drift with the "
                    "Sim(3) pose graph over depth-ratio loop "
                    "measurements (sfm/sim3.py) — for slow-drift "
                    "sequences; see reconstruct_long_sequence docstring")
    ap.add_argument("--save", default=None,
                    help="write estimated + gt trajectory to this npz")
    args = ap.parse_args()

    intr = None
    if args.intr:
        intr = np.array([float(v) for v in args.intr.split(",")], np.float32)
    elif args.intr_file:
        intr = np.array([float(v) for v in
                         Path(args.intr_file).read_text().split()],
                        np.float32)

    t0 = time.perf_counter()
    if args.format == "tum":
        seq = datasets.load_tum_rgbd(args.root, max_frames=args.max_frames,
                                     stride=args.stride, intr=intr)
    else:
        seq = datasets.load_kitti_odometry(
            args.root, seq=args.seq, max_frames=args.max_frames,
            stride=args.stride)
    t_load = time.perf_counter() - t0
    print(f"loaded {len(seq)} frames "
          f"{seq.frames.shape[1]}x{seq.frames.shape[2]} in {t_load:.1f}s, "
          f"gt={'yes' if seq.gt_centers is not None else 'no'}",
          file=sys.stderr)

    t0 = time.perf_counter()
    res = reconstruct_long_sequence(
        seq.frames, seq.intr, window=args.window, overlap=args.overlap,
        max_features=args.max_features, seed=1,
        loop_closure=args.loop_closure, loop_graph=args.loop_graph)
    t_rec = time.perf_counter() - t0

    out = {
        "format": args.format,
        "n_frames": len(seq),
        "resolution": list(seq.frames.shape[1:]),
        "reconstruct_s": round(t_rec, 2),
        "fps": round(len(seq) / t_rec, 2),
    }
    if seq.gt_centers is not None:
        ate = datasets.evaluate_ate(res, seq)
        extent = float(np.linalg.norm(
            seq.gt_centers - seq.gt_centers.mean(0), axis=1).max())
        out["ate_rmse"] = round(ate, 5)
        out["trajectory_extent"] = round(extent, 4)
        out["ate_pct_of_extent"] = round(100.0 * ate / max(extent, 1e-12), 3)
    if args.save:
        np.savez(args.save, centers=res.camera_centers, R=res.R, t=res.t,
                 gt_centers=seq.gt_centers if seq.gt_centers is not None
                 else np.zeros((0, 3)),
                 timestamps=seq.timestamps)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
