"""Golden NumPy MKD descriptor (Multiple-Kernel local Descriptor).

Oracle for the TPU descriptor stages.  Semantics follow the reference CPU
model (mkd_ref.rs:304-327) and its GPU kernels
(shaders/mkd/{patch_gradients,embedding,normalize,whitening,normalize_final}.glsl):

patch[32,32] -> blur(sigma=0.7, replicate border)
            -> negated central-difference gradients (replicate border)
            -> (mag^(1/2), -atan2) polar form
            -> von Mises lift (7 dims) x {polar, cartesian} spatial pooling
            -> per-part L2 norm, concat, L2 norm -> raw[238]
            -> attenuated-PCA whitening -> L2 norm -> desc[128]
"""

from __future__ import annotations

import numpy as np

from .. import constants as C


def _sep_conv_replicate(arr: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Separable 2D convolution with replicate (clamp) border.

    Matches the order used by both reference implementations: vertical pass
    first, then horizontal (mkd_ref.rs:108-127, patch_gradients.glsl:74-95).
    """
    rad = (len(kernel) - 1) // 2
    h, w = arr.shape
    out_v = np.zeros_like(arr)
    for i, k in enumerate(kernel):
        yy = np.clip(np.arange(h) + i - rad, 0, h - 1)
        out_v += k * arr[yy, :]
    out = np.zeros_like(arr)
    for i, k in enumerate(kernel):
        xx = np.clip(np.arange(w) + i - rad, 0, w - 1)
        out += k * out_v[:, xx]
    return out


def patch_mag_angle(patch: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Blur + gradients + polar form of one 32x32 patch.

    Returns (mag, angle), each [32, 32], where mag has the sqrt pre-applied
    (mag = (gx^2+gy^2+eps)^(1/4), patch_gradients.glsl:105) and
    angle = -atan2(gy, gx) (patch_gradients.glsl:106, mkd_ref.rs:140).

    Gradient sign convention: the reference negates the standard central
    difference (mkd_ref.rs:306 `-gradients`), i.e.
      gx = p[y, x-1] - p[y, x+1],  gy = p[y+1, x] - p[y-1, x]
    with replicate borders (mkd_ref.rs:90-91).
    """
    p = _sep_conv_replicate(patch.astype(np.float32), C.PATCH_BLUR_KERNEL)
    n = p.shape[0]
    xm = np.clip(np.arange(n), 1, n - 1) - 1
    xp = np.clip(np.arange(n), 0, n - 2) + 1
    gx = p[:, xm] - p[:, xp]
    gy = p[xp, :] - p[xm, :]
    eps = 1e-8
    mag = np.sqrt(np.sqrt(gx * gx + gy * gy + eps))
    ang = -np.arctan2(gy, gx)
    return mag.astype(np.float32), ang.astype(np.float32)


def _l2(v: np.ndarray) -> np.ndarray:
    return v / np.sqrt((v * v).sum())


def _von_mises_lift(ang: np.ndarray) -> np.ndarray:
    """[7, 32, 32] von Mises embedding of an angle field with the N3_K8
    coefficients (embedding.glsl:44-54, mkd_ref.rs:207)."""
    return C.von_mises(ang, C.VM_FOURIER_N3_K8)


def mkd_raw_descriptor(patch: np.ndarray) -> np.ndarray:
    """Full 238-D raw MKD descriptor of one 32x32 patch (mkd_ref.rs:304-327)."""
    mag, ang = patch_mag_angle(patch)

    # Polar parametrization: per-pixel angle offset then von Mises lift.
    ang_rel = ang + C.gradient_angle_table()
    lift_rel = _von_mises_lift(ang_rel) * mag[None]          # [7,32,32]
    emb_polar = C.polar_embedding_planes()                    # [25,32,32]
    polar = np.einsum("ipq,jpq->ij", lift_rel, emb_polar)     # [7,25]
    polar = _l2(polar.reshape(-1))                            # [175]

    # Cartesian parametrization: raw angle.
    lift = _von_mises_lift(ang) * mag[None]
    emb_cart = C.cart_embedding_planes()                      # [9,32,32]
    cart = np.einsum("ipq,jpq->ij", lift, emb_cart)           # [7,9]
    cart = _l2(cart.reshape(-1))                              # [63]

    return _l2(np.concatenate([polar, cart])).astype(np.float32)


def mkd_descriptor(
    patch: np.ndarray, mean: np.ndarray, proj: np.ndarray
) -> np.ndarray:
    """128-D whitened descriptor: l2((raw - mean) @ proj) (mkd_ref.rs:57-77)."""
    raw = mkd_raw_descriptor(patch)
    return _l2((raw - mean) @ proj).astype(np.float32)
