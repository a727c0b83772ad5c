"""Real-dataset loaders + ATE evaluation harness (BASELINE.md config 4).

Parses the two standard visual-odometry dataset formats so trajectories
estimated by :mod:`local_features_tpu.sfm.odometry` can be scored against
published ground truth:

- **TUM RGB-D**: ``rgb.txt`` (``timestamp filename`` lines) associated to
  ``groundtruth.txt`` (``timestamp tx ty tz qx qy qz qw`` lines,
  cam-to-world) by nearest timestamp within a tolerance — the same
  association rule as TUM's ``associate.py`` tooling.
- **KITTI odometry**: ``sequences/<seq>/image_0/*.png`` grayscale frames,
  ``calib.txt`` ``P0``/``P1`` projection rows, and ``poses/<seq>.txt``
  (12 floats/line, cam-to-world ``[R|t]``).

The reference has no dataset tooling (north-star scope); the evaluation
math reuses :func:`..sfm.pose_graph.absolute_trajectory_error` (Umeyama
Sim(3) alignment — monocular trajectories are scored up to scale).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from .pose_graph import absolute_trajectory_error

# TUM Freiburg-1 default pinhole intrinsics (fx, fy, cx, cy) — used when
# the caller doesn't supply calibration (TUM sequences don't ship one in
# the sequence directory itself).
TUM_DEFAULT_INTR = np.array([525.0, 525.0, 319.5, 239.5], np.float32)


@dataclass
class SequenceData:
    """A loaded dataset sequence ready for the odometry pipeline."""

    frames: np.ndarray          # [F, H, W] f32 grayscale in [0, 1]
    intr: np.ndarray            # [4] fx, fy, cx, cy
    timestamps: np.ndarray      # [F] f64 seconds
    gt_centers: np.ndarray | None  # [F, 3] camera centers in world frame
    gt_R: np.ndarray | None     # [F, 3, 3] cam-to-world rotations

    def __len__(self) -> int:
        return self.frames.shape[0]


def quat_to_rotmat(q: np.ndarray) -> np.ndarray:
    """[..., 4] quaternions (qx, qy, qz, qw — TUM order) -> [..., 3, 3]."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3), np.float64)
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - z * w)
    R[..., 0, 2] = 2 * (x * z + y * w)
    R[..., 1, 0] = 2 * (x * y + z * w)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - x * w)
    R[..., 2, 0] = 2 * (x * z - y * w)
    R[..., 2, 1] = 2 * (y * z + x * w)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def _load_gray(path: Path) -> np.ndarray:
    """Grayscale f32 [0,1] image from PNG/JPG/PGM."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float32) / 255.0


def _read_tum_list(path: Path) -> list[tuple[float, list[str]]]:
    rows = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        rows.append((float(parts[0]), parts[1:]))
    return rows


def associate(
    ts_a: np.ndarray, ts_b: np.ndarray, max_difference: float = 0.02
) -> list[tuple[int, int]]:
    """Greedy nearest-timestamp association (TUM associate.py semantics):
    all candidate pairs within tolerance, best-first, each item used once."""
    cand = []
    for i, ta in enumerate(ts_a):
        d = np.abs(ts_b - ta)
        j = int(np.argmin(d))
        if d[j] <= max_difference:
            cand.append((float(d[j]), i, j))
    cand.sort()
    used_a, used_b, out = set(), set(), []
    for _, i, j in cand:
        if i in used_a or j in used_b:
            continue
        used_a.add(i)
        used_b.add(j)
        out.append((i, j))
    out.sort()
    return out


def load_tum_rgbd(
    root: str | Path,
    max_frames: int | None = None,
    stride: int = 1,
    max_difference: float = 0.02,
    intr: np.ndarray | None = None,
) -> SequenceData:
    """Load a TUM RGB-D sequence directory (``rgb.txt`` +
    ``groundtruth.txt`` + image files; ground truth optional)."""
    root = Path(root)
    rgb = _read_tum_list(root / "rgb.txt")
    rgb = rgb[::stride]
    if max_frames is not None:
        rgb = rgb[:max_frames]
    ts = np.array([t for t, _ in rgb])

    gt_centers = gt_R = None
    gt_path = root / "groundtruth.txt"
    if gt_path.exists():
        gt = _read_tum_list(gt_path)
        gt_ts = np.array([t for t, _ in gt])
        pairs = associate(ts, gt_ts, max_difference)
        keep = [i for i, _ in pairs]
        rgb = [rgb[i] for i in keep]
        ts = ts[keep]
        vals = np.array([[float(v) for v in gt[j][1]] for _, j in pairs],
                        np.float64).reshape(-1, 7)
        gt_centers = vals[:, :3].astype(np.float32)   # t IS the center
        gt_R = quat_to_rotmat(vals[:, 3:7]).astype(np.float32) \
            if len(vals) else np.zeros((0, 3, 3), np.float32)

    frames = (np.stack([_load_gray(root / f[0]) for _, f in rgb])
              if rgb else np.zeros((0, 0, 0), np.float32))
    return SequenceData(
        frames=frames,
        intr=np.asarray(TUM_DEFAULT_INTR if intr is None else intr,
                        np.float32),
        timestamps=ts,
        gt_centers=gt_centers,
        gt_R=gt_R,
    )


def load_kitti_odometry(
    root: str | Path,
    seq: str = "00",
    max_frames: int | None = None,
    stride: int = 1,
    camera: int = 0,
) -> SequenceData:
    """Load a KITTI odometry sequence (``sequences/<seq>`` + optional
    ``poses/<seq>.txt`` ground truth)."""
    root = Path(root)
    seq_dir = root / "sequences" / seq
    img_dir = seq_dir / f"image_{camera}"
    paths = sorted(img_dir.glob("*.png"))[::stride]
    if max_frames is not None:
        paths = paths[:max_frames]
    if not paths:
        raise FileNotFoundError(f"no frames under {img_dir}")

    # calib.txt: "P0: p00 p01 ... p23" rows; fx = P[0,0], cx = P[0,2] ...
    intr = None
    calib = seq_dir / "calib.txt"
    if calib.exists():
        for line in calib.read_text().splitlines():
            if line.startswith(f"P{camera}:"):
                P = np.array([float(v) for v in line.split()[1:]]).reshape(3, 4)
                intr = np.array([P[0, 0], P[1, 1], P[0, 2], P[1, 2]],
                                np.float32)
    if intr is None:
        raise FileNotFoundError(f"no P{camera} row in {calib}")

    times_file = seq_dir / "times.txt"
    if times_file.exists():
        ts = np.array([float(v) for v in times_file.read_text().split()])
        ts = ts[::stride][: len(paths)]
    else:
        ts = np.arange(len(paths), dtype=np.float64) * 0.1

    gt_centers = gt_R = None
    poses_file = root / "poses" / f"{seq}.txt"
    if poses_file.exists():
        vals = np.loadtxt(poses_file).reshape(-1, 3, 4)[::stride]
        vals = vals[: len(paths)]
        gt_R = vals[:, :, :3].astype(np.float32)      # cam-to-world
        gt_centers = vals[:, :, 3].astype(np.float32)

    frames = np.stack([_load_gray(p) for p in paths])
    return SequenceData(frames=frames, intr=intr, timestamps=ts,
                        gt_centers=gt_centers, gt_R=gt_R)


def evaluate_ate(
    result, data: SequenceData, with_scale: bool = True
) -> float:
    """ATE RMSE of an OdometryResult (or anything with
    ``camera_centers``) against the sequence's ground truth, after
    Umeyama Sim(3) alignment (monocular scale is unobservable)."""
    if data.gt_centers is None:
        raise ValueError("sequence has no ground truth")
    import jax.numpy as jnp

    est = np.asarray(result.camera_centers
                     if hasattr(result, "camera_centers") else result)
    if est.shape[0] != data.gt_centers.shape[0]:
        raise ValueError(
            f"{est.shape[0]} estimated poses vs "
            f"{data.gt_centers.shape[0]} ground-truth poses")
    return float(absolute_trajectory_error(
        jnp.asarray(est), jnp.asarray(data.gt_centers),
        with_scale=with_scale))
