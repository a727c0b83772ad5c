"""SO(3) / SE(3) utilities and pinhole camera geometry (pure JAX).

Conventions:
- Rotations are 3x3 matrices; tangent vectors use the axis-angle
  (rotation-vector) parameterization.
- An SE(3) pose (R, t) maps WORLD points to CAMERA points:
  x_cam = R @ x_world + t.
- se(3) tangent ordering is [omega (3), upsilon (3)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] rotation vector -> [..., 3, 3] matrix."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3), W.shape)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle Taylor guards
    a = jnp.where(theta2 > _EPS, jnp.sin(theta) / theta, 1.0 - theta2 / 6.0)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2,
                  0.5 - theta2 / 24.0)
    return I + a * W + b * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] rotation vector.

    Differentiable at the identity: the theta/(2 sin theta) factor uses
    the double-where trick so autodiff never sees arccos'(1) = -inf.
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    near_id = cos_t > 1.0 - 1e-6
    safe_cos = jnp.where(near_id, 0.0, cos_t)  # keeps arccos grad finite
    theta = jnp.arccos(safe_cos)
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    scale_big = theta / (2.0 * jnp.sin(theta) + _EPS)
    # series of theta/(2 sin theta) in terms of cos: 1/2 + (1 - cos)/6 + ...
    scale_small = 0.5 + (1.0 - cos_t) / 6.0
    scale = jnp.where(near_id, scale_small, scale_big)
    return w * scale[..., None]


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 6] (omega, upsilon) -> (R [..., 3, 3], t [..., 3])."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3), W.shape)
    b = jnp.where(theta2 > _EPS, (1.0 - jnp.cos(theta)) / theta2,
                  0.5 - theta2 / 24.0)
    c = jnp.where(theta2 > _EPS, (theta - jnp.sin(theta)) / (theta2 * theta),
                  1.0 / 6.0 - theta2 / 120.0)
    V = I + b * W + c * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_compose(R1, t1, R2, t2):
    """(R1, t1) o (R2, t2): apply pose2 first, then pose1."""
    return R1 @ R2, jnp.einsum("...ij,...j->...i", R1, t2) + t1


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_retract(R, t, xi):
    """Left-multiplicative retraction: exp(xi) o (R, t)."""
    dR, dt = se3_exp(xi)
    return se3_compose(dR, dt, R, t)


def project(
    R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray, intr: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pinhole projection of world points.

    R [..., 3, 3], t [..., 3], X [..., 3], intr = [fx, fy, cx, cy].
    Returns (uv [..., 2], depth [...]).
    """
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = intr[..., 0] * Xc[..., 0] / zs + intr[..., 2]
    v = intr[..., 1] * Xc[..., 1] / zs + intr[..., 3]
    return jnp.stack([u, v], axis=-1), z


def normalize_points(uv: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords -> normalized camera coords."""
    x = (uv[..., 0] - intr[..., 2]) / intr[..., 0]
    y = (uv[..., 1] - intr[..., 3]) / intr[..., 1]
    return jnp.stack([x, y], axis=-1)
