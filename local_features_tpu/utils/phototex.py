"""Real-texture pseudo-sequence renderer: layered planar warps of the
vendored photographs with exact SE(3) ground truth.

Purpose (BASELINE.md config 4 content): real TUM/KITTI downloads are
impossible in this environment (no network), so odometry is exercised on
sequences whose TEXTURE is real imagery (sample_data/*.jpg) and whose
GEOMETRY is exactly known: the scene is two fronto-parallel textured
planes (background photo + foreground photo patches at a nearer depth —
two depths give genuine parallax, so two-view geometry is
non-degenerate), and each frame is rendered by the exact plane-induced
homographies of a chosen camera trajectory.  ATE against the generating
trajectory is then a real accuracy measurement, not a self-check.

Rendering: x_img ~ K (R - t n^T / d) K^-1 x_tex per plane (n = [0,0,1],
fronto-parallel), bilinear sampling, back-to-front composite.
"""

from __future__ import annotations

import numpy as np


def _bilinear(tex: np.ndarray, x: np.ndarray, y: np.ndarray):
    """Sample tex at float coords; returns (values, inside_mask)."""
    h, w = tex.shape
    inside = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    x = np.clip(x, 0, w - 1.000001)
    y = np.clip(y, 0, h - 1.000001)
    x0 = x.astype(np.int64)
    y0 = y.astype(np.int64)
    fx = x - x0
    fy = y - y0
    v = ((1 - fy) * ((1 - fx) * tex[y0, x0] + fx * tex[y0, x0 + 1])
         + fy * ((1 - fx) * tex[y0 + 1, x0] + fx * tex[y0 + 1, x0 + 1]))
    return v.astype(np.float32), inside


def plane_homography(K: np.ndarray, R: np.ndarray, t: np.ndarray,
                     depth: float, tex_scale: float,
                     tex_offset: np.ndarray) -> np.ndarray:
    """Homography mapping IMAGE pixel -> TEXTURE pixel for the plane
    z = depth (world), camera x_cam = R x_world + t.

    World points on the plane are parameterized by texture coords
    p_tex = (X - off) / s, i.e. X = s * p_tex + off (X, Y world; Z =
    depth).  The image of world point X is K (R X + t); inverting gives
    the image->texture map returned here.
    """
    s = tex_scale
    off = np.asarray(tex_offset, np.float64)
    # world -> image homography for the plane: columns for (ptex_x,
    # ptex_y, 1) in homogeneous image coords
    r1, r2, r3 = R[:, 0], R[:, 1], R[:, 2]
    col1 = s * r1
    col2 = s * r2
    col3 = off[0] * r1 + off[1] * r2 + depth * r3 + t
    H_t2i = K @ np.stack([col1, col2, col3], axis=1)
    return np.linalg.inv(H_t2i)


def render_layered_sequence(
    bg_tex: np.ndarray,
    fg_tex: np.ndarray,
    n_frames: int = 120,
    height: int = 480,
    width: int = 640,
    f: float = 500.0,
    bg_depth: float = 8.0,
    fg_depth: float = 3.2,
    mid_depth: float = 5.5,
    radius: float = 0.9,
    yaw_amp: float = 0.06,
    n_fg_patches: int = 40,
    n_mid_patches: int = 24,
    seed: int = 0,
):
    """Render a closed-circuit sequence over two textured planes.

    Returns (frames [F, H, W] f32 in [0, 1], R_gt [F, 3, 3],
    t_gt [F, 3], intr [4]).  The trajectory is a circle in the x-y
    plane returning to its start (exercises loop closure), with a small
    sinusoidal yaw so image rotation is exercised too.

    THREE depth layers (bg plane + mid/fg patch layers): a
    single-plane scene makes essential-matrix RANSAC degenerate (a
    wrong-motion E consistent with the plane scores ~as well as the
    truth — measured: a two-plane render with sparse foreground still
    coin-flipped t by ~80 deg on some seeds); patch layers at two more
    depths make off-plane parallax a large fraction of the matches, as
    in a real 3-D scene.
    """
    rng = np.random.default_rng(seed)
    K = np.array([[f, 0, width / 2.0],
                  [0, f, height / 2.0],
                  [0, 0, 1.0]])

    # texture scale: background plane spans ~2.4x the view footprint
    bh, bw = bg_tex.shape
    view_w = bg_depth * width / f
    bg_scale = 2.6 * view_w / bw
    bg_off = np.array([-1.3 * view_w, -1.3 * view_w * bh / bw])

    def _patch_layer(tex, depth, n_patches):
        """(tex, alpha, scale, offset) for an alpha-masked patch plane."""
        hh, ww = tex.shape
        vw = depth * width / f
        sc = 2.6 * vw / ww
        off = np.array([-1.3 * vw, -1.3 * vw * hh / ww])
        yy, xx = np.mgrid[0:hh, 0:ww]
        alpha = np.zeros((hh, ww), np.float32)
        for _ in range(n_patches):
            cx = rng.uniform(0.05 * ww, 0.95 * ww)
            cy = rng.uniform(0.05 * hh, 0.95 * hh)
            rx = rng.uniform(0.04, 0.10) * ww
            ry = rng.uniform(0.04, 0.10) * hh
            alpha = np.maximum(
                alpha, (((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 < 1.0)
                .astype(np.float32))
        return tex, alpha, sc, off

    # mid layer reuses the flipped background photo (distinct texture
    # statistics from the visible background under it)
    layers = [
        _patch_layer(bg_tex[::-1, ::-1], mid_depth, n_mid_patches),
        _patch_layer(fg_tex, fg_depth, n_fg_patches),
    ]
    layer_depths = [mid_depth, fg_depth]

    # circuit trajectory (world frame): camera centers on a circle,
    # looking +z with slight yaw
    Rs, ts = [], []
    for k in range(n_frames):
        a = 2 * np.pi * k / n_frames
        C = np.array([radius * np.cos(a) - radius,
                      0.6 * radius * np.sin(a), 0.0])
        yaw = yaw_amp * np.sin(2 * a)
        cy_, sy_ = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy_, -sy_, 0.0], [sy_, cy_, 0.0], [0.0, 0.0, 1.0]])
        t = -R @ C
        Rs.append(R)
        ts.append(t)
    R_gt = np.stack(Rs).astype(np.float32)
    t_gt = np.stack(ts).astype(np.float32)

    ui, vi = np.meshgrid(np.arange(width, dtype=np.float64),
                         np.arange(height, dtype=np.float64))
    ones = np.ones_like(ui)
    pix = np.stack([ui, vi, ones], axis=0).reshape(3, -1)

    frames = np.zeros((n_frames, height, width), np.float32)
    for k in range(n_frames):
        # background plane
        Hb = plane_homography(K, Rs[k], ts[k], bg_depth, bg_scale, bg_off)
        q = Hb @ pix
        bx, by = q[0] / q[2], q[1] / q[2]
        img, _ = _bilinear(bg_tex, bx.reshape(height, width),
                           by.reshape(height, width))
        # patch layers, back to front
        for (tex, alpha, sc, off), depth in zip(layers, layer_depths):
            Hl = plane_homography(K, Rs[k], ts[k], depth, sc, off)
            q = Hl @ pix
            lx, ly = q[0] / q[2], q[1] / q[2]
            v, ins = _bilinear(tex, lx.reshape(height, width),
                               ly.reshape(height, width))
            am, _ = _bilinear(alpha, lx.reshape(height, width),
                              ly.reshape(height, width))
            am = am * ins
            img = (1.0 - am) * img + am * v
        frames[k] = img

    intr = np.array([f, f, width / 2.0, height / 2.0], np.float32)
    return frames, R_gt, t_gt, intr


def write_tum_sequence(frames: np.ndarray, R: np.ndarray, t: np.ndarray,
                       out_dir) -> None:
    """Persist a rendered sequence in TUM RGB-D layout (rgb/ + rgb.txt +
    groundtruth.txt) so the standard dataset loader consumes it."""
    from pathlib import Path

    out = Path(out_dir)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    rgb_lines = []
    gt_lines = []
    for k in range(frames.shape[0]):
        ts = f"{k / 30.0:.6f}"
        name = f"rgb/{k:06d}.pgm"
        img = np.clip(frames[k] * 255.0, 0, 255).astype(np.uint8)
        with open(out / name, "wb") as fh:
            fh.write(f"P5\n{img.shape[1]} {img.shape[0]}\n255\n".encode())
            fh.write(img.tobytes())
        rgb_lines.append(f"{ts} {name}")
        # TUM GT: tx ty tz qx qy qz qw of camera-to-world
        Rcw = R[k].T
        C = -Rcw @ t[k]
        qw = np.sqrt(max(1.0 + Rcw[0, 0] + Rcw[1, 1] + Rcw[2, 2], 1e-12)) / 2
        qx = (Rcw[2, 1] - Rcw[1, 2]) / (4 * qw)
        qy = (Rcw[0, 2] - Rcw[2, 0]) / (4 * qw)
        qz = (Rcw[1, 0] - Rcw[0, 1]) / (4 * qw)
        gt_lines.append(f"{ts} {C[0]:.6f} {C[1]:.6f} {C[2]:.6f} "
                        f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")
    (out / "rgb.txt").write_text(
        "# ts filename\n" + "\n".join(rgb_lines) + "\n")
    (out / "groundtruth.txt").write_text(
        "# ts tx ty tz qx qy qz qw\n" + "\n".join(gt_lines) + "\n")
