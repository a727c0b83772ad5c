"""Synthetic 3D sprite scenes for end-to-end SfM testing.

Renders a cloud of small, uniquely-textured sprites under a moving
pinhole camera — enough visual structure for the blob detector to fire
and for MKD descriptors to discriminate, with exact ground-truth poses
and 3D positions for trajectory/ATE evaluation (the offline stand-in for
TUM/KITTI sequences; BASELINE.md configs 3-4).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SpriteWorld:
    points: np.ndarray    # [N, 3] world positions
    sprites: np.ndarray   # [N, s, s] textures in [0, 1]
    base_size: float      # world-space sprite radius


def make_sprite_world(
    rng: np.random.Generator,
    n_points: int = 150,
    extent: float = 2.0,
    depth_range: tuple[float, float] = (2.5, 5.0),
    sprite_px: int = 21,
    base_size: float = 0.12,
) -> SpriteWorld:
    pts = np.stack([
        rng.uniform(-extent, extent, n_points),
        rng.uniform(-extent * 0.75, extent * 0.75, n_points),
        rng.uniform(*depth_range, n_points),
    ], axis=1).astype(np.float32)

    # unique blob-like textures: smoothed noise x radial window
    s = sprite_px
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
    r2 = ((xx - s / 2) ** 2 + (yy - s / 2) ** 2) / (s / 2.2) ** 2
    window = np.exp(-2.5 * r2)
    sprites = []
    for _ in range(n_points):
        tex = rng.random((s, s)).astype(np.float32)
        for _ in range(2):  # cheap smoothing
            tex = (tex + np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
                   + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)) / 5.0
        tex = 0.35 + 0.65 * (tex - tex.min()) / max(float(np.ptp(tex)), 1e-6)
        sprites.append(tex * window)
    return SpriteWorld(points=pts, sprites=np.stack(sprites),
                       base_size=base_size)


def render_frame(
    world: SpriteWorld,
    R: np.ndarray,
    t: np.ndarray,
    intr: np.ndarray,
    height: int,
    width: int,
    background: float = 0.15,
) -> np.ndarray:
    """Render one [H, W] grayscale frame.

    Each sprite is a textured WORLD-SPACE planar patch (fixed world
    orientation, axes x/y), rendered via its exact per-camera homography
    — so every texture detail is a true, multi-view-consistent 3D point
    and ground-truth poses are exactly recoverable.
    """
    img = np.full((height, width), background, np.float32)
    fx, fy, cx, cy = intr
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    s = world.sprites.shape[1]
    b = world.base_size
    Xc_all = world.points @ R.T + t
    for i in np.argsort(-Xc_all[:, 2]):  # far to near
        z = Xc_all[i, 2]
        if z < 0.5:
            continue
        X = world.points[i]
        # plane patch: P(u, v) = X + b*(u*ex + v*ey), u, v in [-1, 1]
        ex = R @ np.array([b, 0.0, 0.0], np.float32)
        ey = R @ np.array([0.0, b, 0.0], np.float32)
        o = R @ X + t
        H = K @ np.stack([ex, ey, o], axis=1)           # (u,v,1) -> image
        # projected corners -> bounding box
        corners = np.array([[-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1]],
                           np.float32) @ H.T
        cu = corners[:, 0] / corners[:, 2]
        cv = corners[:, 1] / corners[:, 2]
        x0 = max(int(np.floor(cu.min())), 0)
        x1 = min(int(np.ceil(cu.max())) + 1, width)
        y0 = max(int(np.floor(cv.min())), 0)
        y1 = min(int(np.ceil(cv.max())) + 1, height)
        if x1 <= x0 or y1 <= y0:
            continue
        Hinv = np.linalg.inv(H)
        px, py = np.meshgrid(np.arange(x0, x1, dtype=np.float32),
                             np.arange(y0, y1, dtype=np.float32))
        ph = np.stack([px, py, np.ones_like(px)], axis=-1) @ Hinv.T
        u = ph[..., 0] / ph[..., 2]
        v = ph[..., 1] / ph[..., 2]
        inside = (np.abs(u) < 1.0) & (np.abs(v) < 1.0) & (ph[..., 2] != 0)
        # texture lookup (bilinear)
        tu = (u + 1.0) * 0.5 * (s - 1)
        tv = (v + 1.0) * 0.5 * (s - 1)
        tu0 = np.clip(np.floor(tu).astype(int), 0, s - 2)
        tv0 = np.clip(np.floor(tv).astype(int), 0, s - 2)
        ftu = np.clip(tu - tu0, 0, 1).astype(np.float32)
        ftv = np.clip(tv - tv0, 0, 1).astype(np.float32)
        sp = world.sprites[i]
        val = ((1 - ftv) * ((1 - ftu) * sp[tv0, tu0] + ftu * sp[tv0, tu0 + 1])
               + ftv * ((1 - ftu) * sp[tv0 + 1, tu0]
                        + ftu * sp[tv0 + 1, tu0 + 1]))
        img[y0:y1, x0:x1] += np.where(inside, val, 0.0)
    return np.clip(img, 0.0, 1.0)


def arc_trajectory(n_frames: int, radius: float = 1.4,
                   sweep: float = 0.9) -> tuple[np.ndarray, np.ndarray]:
    """Camera centers on a lateral arc, looking roughly at the scene.

    Returns (R [F, 3, 3], t [F, 3]) world->cam with x_cam = R x + t.
    """
    Rs, ts = [], []
    for f in range(n_frames):
        a = sweep * (f / max(n_frames - 1, 1) - 0.5)
        C = np.array([radius * np.sin(a), 0.05 * f, radius * (1 - np.cos(a))],
                     dtype=np.float32)
        # yaw to keep the scene centered
        cy, sy = np.cos(a * 0.5), np.sin(a * 0.5)
        R = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]], dtype=np.float32)
        Rs.append(R)
        ts.append(-R @ C)
    return np.stack(Rs), np.stack(ts)


def render_sequence(
    rng: np.random.Generator,
    n_frames: int = 6,
    height: int = 240,
    width: int = 320,
    intr: np.ndarray | None = None,
    n_points: int = 150,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, SpriteWorld]:
    """(frames [F, H, W], R_gt, t_gt, intr, world)."""
    if intr is None:
        intr = np.array([300.0, 300.0, width / 2, height / 2], np.float32)
    world = make_sprite_world(rng, n_points=n_points)
    R, t = arc_trajectory(n_frames)
    frames = np.stack([
        render_frame(world, R[f], t[f], intr, height, width)
        for f in range(n_frames)
    ])
    return frames, R, t, intr, world


def corridor_sequence(
    rng: np.ndarray,
    n_frames: int = 14,
    height: int = 240,
    width: int = 320,
    n_points: int = 400,
    step: float = 0.35,
):
    """Lateral-dolly trajectory through a wide sprite field — the
    odometry test scene (the scene stays in view for long sequences,
    unlike the fixed arc of render_sequence)."""
    world = make_sprite_world(rng, n_points=n_points, extent=6.0)
    Rs, ts = [], []
    for f in range(n_frames):
        a = 0.02 * np.sin(f * 0.9)
        cy, sy = np.cos(a), np.sin(a)
        R = np.array([[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]], np.float32)
        C = np.array([step * f - step * (n_frames - 1) / 2,
                      0.03 * np.cos(f), 0.05 * np.sin(f * 0.5)], np.float32)
        Rs.append(R)
        ts.append(-R @ C)
    R_gt, t_gt = np.stack(Rs), np.stack(ts)
    intr = np.array([300.0, 300.0, width / 2, height / 2], np.float32)
    frames = np.stack([
        render_frame(world, R_gt[f], t_gt[f], intr, height, width)
        for f in range(n_frames)
    ])
    return frames, R_gt, t_gt, intr, world


def loop_trajectory(n_frames: int, rx: float = 0.8,
                    ry: float = 0.5) -> tuple[np.ndarray, np.ndarray]:
    """Closed front-facing ellipse circuit: the camera translates around
    a loop while always looking at the scene, so the last frames revisit
    the first frames' viewpoints with healthy baselines everywhere (no
    turnaround degeneracy) — the loop-closure test bed (no reference
    counterpart; BASELINE config 4 drift-correction scope)."""
    Rs, ts = [], []
    R = np.eye(3, dtype=np.float32)
    for f in range(n_frames):
        a = 2.0 * np.pi * f / n_frames      # f = n_frames would close it
        C = np.array([rx * np.sin(a), ry * (1.0 - np.cos(a)), 0.0],
                     dtype=np.float32)
        Rs.append(R)
        ts.append(-R @ C)
    return np.stack(Rs), np.stack(ts)
