"""MKD descriptor extraction on TPU.

TPU-first redesign of the reference's extract kernels:

- shaders/mkd/patch_gradients.glsl (rotated/scaled patch sampling via
  textureLod + in-shared-memory blur + gradients) becomes a batched
  bilinear gather from the flat mip pyramid plus fused elementwise math
  over [K, 32, 32] arrays.
- shaders/mkd/embedding{_polar,_cartesian}.glsl (workgroup-per-patch dot
  products with subgroup reductions) becomes two MXU matmuls against the
  precomputed [1024, 25] / [1024, 9] spatial-kernel planes — the kernelized
  pooling IS a matrix product, which the MXU does at speed of light.
- shaders/mkd/normalize.glsl, whitening.glsl, normalize_final.glsl become
  row-wise vector math + one [K, 238] x [238, 128] matmul.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .. import constants as C


def _clip_conv_5tap(p: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Separable 5-tap conv with replicate border on [..., 32, 32] patches.

    Vertical pass then horizontal, matching mkd_ref.rs:108-127 and
    patch_gradients.glsl:74-95.
    """
    import jax

    n = p.shape[-1]
    rad = (len(kernel) - 1) // 2
    pads = [(0, 0)] * (p.ndim - 2)

    xp = jnp.pad(p, pads + [(rad, rad), (0, 0)], mode="edge")
    out = jnp.zeros_like(p)
    for i, k in enumerate(kernel):
        out = out + float(k) * jax.lax.slice_in_dim(xp, i, i + n,
                                                    axis=p.ndim - 2)
    xp = jnp.pad(out, pads + [(0, 0), (rad, rad)], mode="edge")
    out = jnp.zeros_like(p)
    for i, k in enumerate(kernel):
        out = out + float(k) * jax.lax.slice_in_dim(xp, i, i + n,
                                                    axis=p.ndim - 1)
    return out


def _mirror_idx(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """MirroredRepeat index wrap with *dynamic* extent n (per-keypoint mip)."""
    m = jnp.mod(i, 2 * n)
    return jnp.where(m >= n, 2 * n - 1 - m, m)


def sample_patches(
    pyr,
    kx: jnp.ndarray,
    ky: jnp.ndarray,
    ksize: jnp.ndarray,
    kangle_deg: jnp.ndarray,
    kvalid: jnp.ndarray,
    patch_scale_factor: jnp.ndarray | float = C.DEFAULT_PATCH_SCALE_FACTOR,
    act_widths: jnp.ndarray | None = None,
    act_heights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[K, 32, 32] rotated/scaled patches from the flat mip pyramid.

    Per-keypoint mip level = floor(log2(size * psf / 32)) with residual
    scale applied in the rotation grid (patch_gradients.glsl:46-70);
    bilinear sampling with mirror border at pixel-center coordinates.

    `act_widths`/`act_heights` (pad-to-max mode): per-level ACTUAL mip
    extents — mirror folds wrap at the actual borders while flat
    indexing keeps the padded layout strides, so sampling matches an
    exact-shape run of the same image.
    """
    K = kx.shape[0]
    psf = jnp.asarray(patch_scale_factor, jnp.float32)
    scale = jnp.maximum(ksize, 1e-6) * psf / C.PATCH_SIZE
    log2s = jnp.log2(scale)
    level = jnp.clip(jnp.floor(log2s), 0, pyr.n_levels - 1).astype(jnp.int32)
    rem = jnp.exp2(log2s - level.astype(jnp.float32))      # [K]

    theta = jnp.deg2rad(kangle_deg)
    ct, st = jnp.cos(theta), jnp.sin(theta)                # [K]
    ps2 = C.PATCH_SIZE / 2.0
    lx = jnp.arange(C.PATCH_SIZE, dtype=jnp.float32)[None, :] - ps2  # [1,32]
    ly = jnp.arange(C.PATCH_SIZE, dtype=jnp.float32)[:, None] - ps2  # [32,1]
    xx = lx[None] * ct[:, None, None] - ly[None] * st[:, None, None]
    yy = lx[None] * st[:, None, None] + ly[None] * ct[:, None, None]
    inv = jnp.exp2(-level.astype(jnp.float32))
    sx = xx * rem[:, None, None] + (kx * inv)[:, None, None]
    sy = yy * rem[:, None, None] + (ky * inv)[:, None, None]

    w = pyr.widths[level][:, None, None]
    h = pyr.heights[level][:, None, None]
    fw = w if act_widths is None else act_widths[level][:, None, None]
    fh = h if act_heights is None else act_heights[level][:, None, None]
    base = pyr.offsets[level][:, None, None]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def at(xi, yi):
        xm = _mirror_idx(xi, fw)    # fold at the ACTUAL extent ...
        ym = _mirror_idx(yi, fh)
        return jnp.take(pyr.flat, base + ym * w + xm, axis=0)  # ... index
        # with the padded layout stride

    patch = ((1 - fy) * ((1 - fx) * at(x0, y0) + fx * at(x0 + 1, y0))
             + fy * ((1 - fx) * at(x0, y0 + 1) + fx * at(x0 + 1, y0 + 1)))
    return jnp.where(kvalid[:, None, None], patch, 0.0)


@functools.lru_cache(maxsize=None)
def _blur_grad_operators():
    """[32, 32] constant matrices for the patch blur and gradients, all
    oriented [src, dst] so `out = in @ M` applies along the last axis
    (and einsum 'ksx,sy->kyx' along the row axis).

    Cb: 5-tap replicate-border blur, Cb[clip(d+i-2), d] += k[i].
    Gx: negated central difference, p[clip(d-1)] - p[clip(d+1)].
    Gy: row direction flips sign, p[clip(d+1)] - p[clip(d-1)].
    """
    n = C.PATCH_SIZE
    k = C.PATCH_BLUR_KERNEL
    rad = (len(k) - 1) // 2
    Cb = np.zeros((n, n), np.float32)
    for d in range(n):
        for i, kv in enumerate(k):
            Cb[min(max(d + i - rad, 0), n - 1), d] += np.float32(kv)
    Gx = np.zeros((n, n), np.float32)
    for d in range(n):
        Gx[max(d - 1, 0), d] += 1.0
        Gx[min(d + 1, n - 1), d] -= 1.0
    return Cb, Gx


def _blurred_gradients(patches: jnp.ndarray, matmul: bool = False):
    """sigma=0.7 blur then negated central-difference gradients with
    replicate border (patch_gradients.glsl:74-106, mkd_ref.rs:82-127).
    Shared by the atan2 and the transcendental-free paths so the two
    gradient definitions cannot drift.

    matmul=True lowers all four passes (blur rows, blur cols, d/dx,
    d/dy) as batched [32, 32] constant-operator matmuls: the pad/slice
    formulation (_clip_conv_5tap + edge pads + unaligned lane slices)
    measured ~5 ms/8-frame batch on v5e — pure relayout traffic on
    arrays that use 32 of 128 lanes — while the same math as MXU
    contractions is ~2 GFLOP/batch, microseconds.  The two lowerings
    agree to f32 summation-order noise (~2e-7 on gx/gy, pinned by
    tests/test_mkd.py::test_gradient_matmul_lowering), but that noise
    flips the (gx, gy) DIRECTION wherever the blurred gradient is near
    zero, and the magnitude floor (+1e-8 in the mag term) keeps such
    pixels' lift contribution at ~1e-2 — so descriptors move ~1e-4,
    beyond the frozen-oracle gates.  Hence matmul stays OFF for the
    exact/parity path and ON only in fast mode, whose bf16 patch
    sampling already dominates exactly this sensitivity (same
    precision-tier rule as the other bf16 fast paths, CLAUDE.md)."""
    import jax

    if matmul:
        Cb, Gx = _blur_grad_operators()
        Cb = jnp.asarray(Cb)
        Gx = jnp.asarray(Gx)
        hp = jax.lax.Precision.HIGHEST
        # vertical then horizontal blur (mkd_ref.rs order)
        p1 = jnp.einsum("...sx,sy->...yx", patches, Cb, precision=hp)
        p2 = jnp.einsum("...yc,cw->...yw", p1, Cb, precision=hp)
        # gx = p[y, x-1] - p[y, x+1]; gy = p[y+1, x] - p[y-1, x]
        gx = jnp.einsum("...yc,cw->...yw", p2, Gx, precision=hp)
        gy = jnp.einsum("...sx,sy->...yx", p2, -Gx, precision=hp)
        return gx, gy

    p = _clip_conv_5tap(patches, C.PATCH_BLUR_KERNEL)
    n = C.PATCH_SIZE
    pads = [(0, 0)] * (p.ndim - 2)
    pe = jnp.pad(p, pads + [(1, 1), (1, 1)], mode="edge")
    sl = lambda a, o, ax: jax.lax.slice_in_dim(a, o, o + n, axis=ax)
    # gx = p[y, x-1] - p[y, x+1]; gy = p[y+1, x] - p[y-1, x]
    gx = (sl(sl(pe, 1, p.ndim - 2), 0, p.ndim - 1)
          - sl(sl(pe, 1, p.ndim - 2), 2, p.ndim - 1))
    gy = (sl(sl(pe, 2, p.ndim - 2), 1, p.ndim - 1)
          - sl(sl(pe, 0, p.ndim - 2), 1, p.ndim - 1))
    return gx, gy


def patches_mag_angle(patches: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Blur + negated gradients + (mag^(1/2), -atan2) for [K, 32, 32]."""
    gx, gy = _blurred_gradients(patches)
    mag = jnp.sqrt(jnp.sqrt(gx * gx + gy * gy + 1e-8))
    ang = -jnp.arctan2(gy, gx)
    return mag, ang


def _patches_mag_cos_sin(patches: jnp.ndarray, matmul: bool = False):
    """(mag, cos(ang), sin(ang)) for ang = -atan2(gy, gx), without any
    transcendental: cos = gx/r, sin = -gy/r, r = sqrt(gx^2 + gy^2).
    Zero gradient keeps the atan2(0, 0) = 0 convention: (cos, sin) =
    (1, 0).  Bitwise-near patches_mag_angle -> cos/sin (diff ~1 ulp).
    rsqrt runs on raw q (no lower cap — a cap would shrink the unit
    vector for tiny nonzero gradients); q = 0 (incl. TPU-flushed
    denormals) takes the where branch, so the rsqrt(0) = inf lanes are
    never selected."""
    import jax

    gx, gy = _blurred_gradients(patches, matmul=matmul)
    q = gx * gx + gy * gy
    mag = jnp.sqrt(jnp.sqrt(q + 1e-8))
    inv = jax.lax.rsqrt(q)
    zero = q == 0.0
    c1 = jnp.where(zero, 1.0, gx * inv)
    s1 = jnp.where(zero, 0.0, -gy * inv)
    return mag, c1, s1


def _vm_stack(c1, s1, m, coef, axis: int = 1, out_dtype=None):
    """Von Mises components from cos/sin of the base angle, stacked on
    `axis` (1 -> [K, 7, N], 0 -> [7, K, N]).

    Higher harmonics come from Chebyshev-style recurrences
    (cos2 = 2c^2-1, sin2 = 2sc, cos3 = 2*cos2*c - c, sin3 = 2*cos2*s + s)
    instead of extra transcendental evaluations.  The recurrence math
    runs in the input dtype (f32 everywhere in practice — CLAUDE.md
    limits bf16 to the pooling matmuls); `out_dtype` casts only at the
    stacked materialization, which is where the HBM traffic is."""
    c2 = 2.0 * c1 * c1 - 1.0
    s2 = 2.0 * s1 * c1
    c3 = 2.0 * c2 * c1 - c1
    s3 = 2.0 * c2 * s1 + s1
    cf = [float(c) for c in coef]
    comps = [cf[0] * m, cf[1] * c1 * m, cf[2] * c2 * m, cf[3] * c3 * m,
             cf[1] * s1 * m, cf[2] * s2 * m, cf[3] * s3 * m]
    if out_dtype is not None:
        comps = [c.astype(out_dtype) for c in comps]
    return jnp.stack(comps, axis=axis)


def _von_mises_lift(ang: jnp.ndarray, mag: jnp.ndarray) -> jnp.ndarray:
    """[K, 7, 1024] von Mises lift x magnitude (embedding.glsl:44-54)."""
    K = ang.shape[0]
    a = ang.reshape(K, -1)
    m = mag.reshape(K, -1)
    return _vm_stack(jnp.cos(a), jnp.sin(a), m, C.VM_FOURIER_N3_K8)


@functools.lru_cache(maxsize=None)
def _polar_planes_rotated():
    """[7, 1024, 50] constant: polar spatial planes pre-modulated by the
    per-pixel gradient angle's harmonics.

    The polar embedding pools the von-Mises lift of the ROTATED angle
    phi = theta + ga (embedding_polar.glsl adds the precomputed pixel
    angle).  Angle addition moves that rotation off the per-keypoint
    tensor and into the constant planes:

      cos(i*phi) = cos(i*theta) cos(i*ga) - sin(i*theta) sin(i*ga)
      sin(i*phi) = sin(i*theta) cos(i*ga) + cos(i*theta) sin(i*ga)

    so pooled row c_i = L[c_i] @ (plane * cos(i*ga)) - L[s_i] @
    (plane * sin(i*ga)) (and the s_i analog), where L is the same
    UNROTATED lift the cartesian embedding uses.  Block j of this
    constant holds [plane * cos(h(j)*ga), plane * sin(h(j)*ga)] for
    lift row j's harmonic h(j); _combine_polar does the cross-row
    add/sub.  One lift tensor total — the rotated copy never exists.
    """
    ga = C.gradient_angle_table().reshape(-1)                # [1024]
    planes = C.polar_embedding_planes().reshape(25, -1).T    # [1024, 25]
    harm = [0, 1, 2, 3, 1, 2, 3]                             # h(j) per row
    out = np.stack([
        np.concatenate([planes * np.cos(h * ga)[:, None],
                        planes * np.sin(h * ga)[:, None]], axis=1)
        for h in harm
    ])                                                       # [7, 1024, 50]
    return out.astype(np.float32)


def _combine_polar(pooled: jnp.ndarray) -> jnp.ndarray:
    """[K, 7, 50] per-row pooled (A=cos-, B=sin-modulated halves) ->
    [K, 175] polar part, rows ordered [const, c1, c2, c3, s1, s2, s3]
    like the direct rotated-lift pooling."""
    A = pooled[:, :, :25]
    Bm = pooled[:, :, 25:]
    rows = [A[:, 0]]
    rows += [A[:, i] - Bm[:, 3 + i] for i in (1, 2, 3)]      # c_i rows
    rows += [A[:, 3 + i] + Bm[:, i] for i in (1, 2, 3)]      # s_i rows
    return jnp.concatenate(rows, axis=-1)


def raw_mkd_descriptors(patches: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """[K, 238] raw MKD descriptors from [K, 32, 32] patches.

    fast=True runs the pooling matmuls in bf16 (~0.3% relative error in
    the pooled sums, well inside matching tolerance; the reference's own
    GPU path uses fast-math GLSL) and builds the lift directly in bf16
    with the rotation folded into the constant planes
    (_polar_planes_rotated) — the exact path materializes both lifts in
    f32 like the reference's two embedding dispatches."""
    K = patches.shape[0]
    mag, c1, s1 = _patches_mag_cos_sin(patches, matmul=fast)
    m = mag.reshape(K, -1)
    c1 = c1.reshape(K, -1)
    s1 = s1.reshape(K, -1)

    # ZERO transcendentals for the angle: cos(-atan2(gy, gx)) = gx/r and
    # sin(-atan2(gy, gx)) = -gy/r (r = |grad|), so the base cos/sin come
    # straight from the gradients with one rsqrt.  The polar lift's
    # pixel angle offset (ang + ga) is applied with the angle-addition
    # formula (in the constant planes in fast mode, elementwise here),
    # and higher harmonics use recurrences (_vm_stack) — the reference
    # evaluates 12 transcendentals per pixel (embedding.glsl:44-54).
    def l2(v):
        return v / jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))

    if fast:
        # one lift, f32 math, materialized bf16 (only the pooling
        # matmuls are low-precision, per the parity rules); [7, K, 1024]
        # so the polar pooling batches over lift rows without a relayout
        lift = _vm_stack(c1, s1, m, C.VM_FOURIER_N3_K8,
                         axis=0, out_dtype=jnp.bfloat16)      # [7, K, 1024]
        pp = jnp.asarray(_polar_planes_rotated()).astype(jnp.bfloat16)
        cart_planes = jnp.asarray(
            C.cart_embedding_planes().reshape(9, -1).T).astype(jnp.bfloat16)
        # 7 plain [K,1024]x[1024,50] matmuls (unrolled: a j-batched
        # einsum compiles pathologically slowly on TPU under vmap)
        pooled = jnp.stack([
            jnp.dot(lift[j], pp[j], preferred_element_type=jnp.float32)
            for j in range(7)
        ], axis=1)                                            # [K, 7, 50]
        polar = _combine_polar(pooled)                        # [K, 175]
        cart = jnp.dot(lift.reshape(7 * K, -1), cart_planes,
                       preferred_element_type=jnp.float32)
        cart = cart.reshape(7, K, 9).transpose(1, 0, 2).reshape(K, 63)
    else:
        ga = C.gradient_angle_table().reshape(-1)
        cg = jnp.asarray(np.cos(ga))[None, :]
        sg = jnp.asarray(np.sin(ga))[None, :]
        c1r = c1 * cg - s1 * sg
        s1r = s1 * cg + c1 * sg
        lift_rel = _vm_stack(c1r, s1r, m, C.VM_FOURIER_N3_K8)  # [K, 7, 1024]
        lift = _vm_stack(c1, s1, m, C.VM_FOURIER_N3_K8)
        polar_planes = jnp.asarray(C.polar_embedding_planes().reshape(25, -1).T)
        cart_planes = jnp.asarray(C.cart_embedding_planes().reshape(9, -1).T)
        polar = jnp.dot(lift_rel.reshape(K * 7, -1), polar_planes,
                        preferred_element_type=jnp.float32).reshape(K, 175)
        cart = jnp.dot(lift.reshape(K * 7, -1), cart_planes,
                       preferred_element_type=jnp.float32).reshape(K, 63)

    polar = l2(polar)
    cart = l2(cart)
    return l2(jnp.concatenate([polar, cart], axis=-1))


def mkd_descriptors(
    patches: jnp.ndarray,
    mean: jnp.ndarray,
    proj: jnp.ndarray,
    kvalid: jnp.ndarray | None = None,
    fast: bool = False,
) -> jnp.ndarray:
    """[K, 128] whitened, L2-normalized descriptors."""
    raw = raw_mkd_descriptors(patches, fast=fast)
    d = jnp.dot(raw - mean[None, :], proj, preferred_element_type=jnp.float32)
    d = d / jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    if kvalid is not None:
        d = jnp.where(kvalid[:, None], d, 0.0)
    return d
