"""Reconstruct a camera trajectory from an image sequence.

Demonstrates the full SfM stack (BASELINE configs 3-4): front-end
features -> mutual matching -> two-view RANSAC init -> tracks ->
Levenberg-Marquardt bundle adjustment, with ATE evaluation against
ground truth on the built-in synthetic sequence.

Usage:
    python examples/sfm_sequence.py                      # synthetic demo
    python examples/sfm_sequence.py --frames f0.png f1.png ... \
        --fx 500 --fy 500 --cx 320 --cy 240
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from local_features_tpu.sfm.pipeline import reconstruct_sequence  # noqa: E402
from local_features_tpu.utils.platform import apply_platform_env  # noqa: E402
from local_features_tpu.sfm.pose_graph import absolute_trajectory_error  # noqa: E402


def main() -> int:
    apply_platform_env()  # LF_PLATFORM=cpu forces CPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", nargs="*", default=None)
    ap.add_argument("--fx", type=float, default=300.0)
    ap.add_argument("--fy", type=float, default=300.0)
    ap.add_argument("--cx", type=float, default=None)
    ap.add_argument("--cy", type=float, default=None)
    ap.add_argument("--n-frames", type=int, default=6)
    ap.add_argument("--max-features", type=int, default=800)
    args = ap.parse_args()

    R_gt = t_gt = None
    if args.frames:
        from PIL import Image

        frames = np.stack([
            np.asarray(Image.open(f).convert("L"), np.float32) / 255.0
            for f in args.frames
        ])
        h, w = frames.shape[1:]
        intr = np.array([args.fx, args.fy,
                         args.cx if args.cx is not None else w / 2,
                         args.cy if args.cy is not None else h / 2],
                        np.float32)
    else:
        from local_features_tpu.utils.synth import render_sequence

        rng = np.random.default_rng(42)
        frames, R_gt, t_gt, intr, _ = render_sequence(
            rng, n_frames=args.n_frames, height=240, width=320)
        print(f"synthetic sequence: {frames.shape}")

    t0 = time.perf_counter()
    rec = reconstruct_sequence(frames, intr,
                               max_features=args.max_features)
    print(f"reconstructed {frames.shape[0]} cameras, "
          f"{rec.X.shape[0]} points in {time.perf_counter() - t0:.2f}s")
    print(f"mean squared reprojection error: {rec.cost:.4f} px^2")
    print("camera centers:")
    for c in rec.camera_centers:
        print(f"  [{c[0]:+.3f} {c[1]:+.3f} {c[2]:+.3f}]")

    if R_gt is not None:
        centers_gt = np.einsum("cji,cj->ci", R_gt, -t_gt)
        ate = float(absolute_trajectory_error(
            jnp.asarray(rec.camera_centers), jnp.asarray(centers_gt),
            with_scale=True))
        extent = float(np.linalg.norm(
            centers_gt - centers_gt.mean(0), axis=1).max())
        print(f"ATE RMSE: {ate:.4f} ({100 * ate / extent:.2f}% of "
              f"trajectory extent)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
