"""Generate the vendored mini dataset fixtures under tests/data/.

Renders a deterministic 10-frame synthetic corridor sequence and writes
it out in BOTH standard odometry dataset formats (TUM RGB-D and KITTI
odometry), with ground-truth poses derived from the renderer's exact
camera trajectory.  Committed outputs let the parser tests read files
that exist on disk in the real formats (rather than round-tripping
through a writer at test time).

Usage: python scripts/make_dataset_fixtures.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from local_features_tpu.utils.synth import corridor_sequence  # noqa: E402

# 240x320: the sprite world renders ~120+ detectable features per frame
# at this scale (at 120x160 only ~15 survive — too few for two-view
# geometry), matching the proven odometry test configuration
N_FRAMES, H, W = 10, 240, 320


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """[3,3] -> (qx, qy, qz, qw), TUM component order."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-8:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # w ~ 0: fall back to largest diagonal element
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(0.0, 1.0 + R[i, i] - R[j, j] - R[k, k])) * 2
        q = np.zeros(3)
        q[i] = s / 4
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z = q
        w = (R[k, j] - R[j, k]) / s
    return np.array([x, y, z, w])


def main() -> None:
    from PIL import Image

    rng = np.random.default_rng(42)
    frames, R_wc, t_wc, intr, _ = corridor_sequence(
        rng, n_frames=N_FRAMES, height=H, width=W, n_points=400)
    # world->cam -> cam-to-world
    R_cw = np.transpose(R_wc, (0, 2, 1))
    centers = np.einsum("fij,fj->fi", R_cw, -t_wc)

    data = Path(__file__).resolve().parent.parent / "tests" / "data"

    # ---- TUM RGB-D layout -------------------------------------------------
    tum = data / "tum_mini"
    (tum / "rgb").mkdir(parents=True, exist_ok=True)
    rgb_lines = ["# color images", "# timestamp filename"]
    gt_lines = ["# ground truth trajectory",
                "# timestamp tx ty tz qx qy qz qw"]
    for f in range(N_FRAMES):
        ts = 1305031100.0 + 0.0333 * f
        name = f"rgb/{ts:.6f}.png"
        Image.fromarray((frames[f] * 255).astype(np.uint8)).save(tum / name)
        rgb_lines.append(f"{ts:.6f} {name}")
        q = rotmat_to_quat(R_cw[f])
        # ground truth sampled at a slightly offset (association-testing)
        # timestamp, within the 0.02 s tolerance
        c = centers[f]
        gt_lines.append(
            f"{ts + 0.004:.6f} {c[0]:.6f} {c[1]:.6f} {c[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
    (tum / "rgb.txt").write_text("\n".join(rgb_lines) + "\n")
    (tum / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    (tum / "intr.txt").write_text(" ".join(f"{v}" for v in intr) + "\n")

    # ---- KITTI odometry layout -------------------------------------------
    kitti = data / "kitti_mini"
    img_dir = kitti / "sequences" / "00" / "image_0"
    img_dir.mkdir(parents=True, exist_ok=True)
    (kitti / "poses").mkdir(parents=True, exist_ok=True)
    for f in range(N_FRAMES):
        Image.fromarray((frames[f] * 255).astype(np.uint8)).save(
            img_dir / f"{f:06d}.png")
    fx, fy, cx, cy = intr
    p_row = [fx, 0.0, cx, 0.0, 0.0, fy, cy, 0.0, 0.0, 0.0, 1.0, 0.0]
    calib = "\n".join(
        f"P{i}: " + " ".join(f"{v:.12e}" for v in p_row) for i in range(4))
    (kitti / "sequences" / "00" / "calib.txt").write_text(calib + "\n")
    (kitti / "sequences" / "00" / "times.txt").write_text(
        "\n".join(f"{0.1 * f:.6e}" for f in range(N_FRAMES)) + "\n")
    pose_lines = []
    for f in range(N_FRAMES):
        P = np.concatenate([R_cw[f], centers[f, :, None]], axis=1)
        pose_lines.append(" ".join(f"{v:.6e}" for v in P.reshape(-1)))
    (kitti / "poses" / "00.txt").write_text("\n".join(pose_lines) + "\n")

    print(f"wrote {tum} and {kitti} ({N_FRAMES} frames, {H}x{W})")


if __name__ == "__main__":
    main()
