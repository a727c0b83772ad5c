"""Independent validation of the MKD constant tables — NOT derived from
the reference source.

The von Mises Fourier coefficient tables (constants.py VM_FOURIER_*)
were transcribed from the reference (mkd_ref.rs:7-9, itself inherited
from kornia's MKD).  A shared misreading there would pass every
golden-parity test, so this file re-derives the numbers from first
principles: the von Mises kernel's Fourier expansion

    e^{kappa*cos(theta)} = I_0(kappa) + 2 * sum_n I_n(kappa) cos(n*theta)

gives an explicit finite feature map phi with phi(x)*phi(y) ~= the
normalized kernel, whose weights are

    c_0 = sqrt(I_0(kappa) / e^kappa),   c_n = sqrt(2 I_n(kappa) / e^kappa)

(normalizing by the kernel's peak e^kappa so the infinite expansion sums
to 1).  I_n is computed here directly from its integral definition
I_n(k) = (1/pi) * int_0^pi e^{k cos t} cos(n t) dt — no Bessel table, no
reference code, no shared constants.
"""

import numpy as np

from local_features_tpu import constants as C


def bessel_i(n: int, kappa: float, m: int = 400001) -> float:
    """Modified Bessel function of the first kind via its integral
    definition (trapezoid quadrature; smooth integrand converges fast)."""
    t = np.linspace(0.0, np.pi, m)
    return float(np.trapezoid(np.exp(kappa * np.cos(t)) * np.cos(n * t), t)
                 / np.pi)


def vm_feature_weights(n_harmonics: int, kappa: float) -> np.ndarray:
    e = np.exp(kappa)
    c = [np.sqrt(bessel_i(0, kappa) / e)]
    c += [np.sqrt(2.0 * bessel_i(n, kappa) / e)
          for n in range(1, n_harmonics + 1)]
    return np.array(c)


def test_k8_tables_match_bessel_derivation():
    """Both kappa=8 tables are exactly the Bessel-derived weights."""
    derived = vm_feature_weights(3, 8.0)
    np.testing.assert_allclose(C.VM_FOURIER_N3_K8, derived, atol=2e-7)
    np.testing.assert_allclose(C.VM_FOURIER_N2_K8, derived[:3], atol=2e-7)


def test_n1_table_is_valid_kernel_feature_map():
    """The cartesian (n=1) table isn't plain von Mises for any single
    kappa, but it must still be a valid shift-invariant kernel feature
    map on the embedded range: phi(x)*phi(y) = c0^2 + c1^2*cos(x - y)
    must be positive, peaked at zero lag, and monotone decreasing in
    |x - y| over the cartesian embedding's actual lag range.

    mesh_grid() maps coordinates to [-1, 1] and the cartesian embedding
    scales by pi/2, so lags span [-pi, pi]."""
    c0, c1 = (float(v) for v in C.VM_FOURIER_N1_K1)
    lags = np.linspace(0.0, np.pi, 181)
    k = c0 * c0 + c1 * c1 * np.cos(lags)
    assert k[0] == max(k)                      # peak at zero lag
    assert np.all(np.diff(k) < 0)              # monotone on [0, pi]
    assert k.min() > -0.11                     # near-PSD truncation
    # kernel scale is O(1): normalized self-similarity
    assert 0.5 < k[0] < 1.0


def test_von_mises_lift_is_kernel_inner_product():
    """constants.von_mises builds phi such that phi(x)^T phi(y) equals
    the truncated Fourier kernel sum c0^2 + sum_n c_n^2 cos(n(x-y)) —
    checked against an independently computed truncated series (angle
    addition never enters: the series is evaluated directly)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-np.pi, np.pi, (8, 1)).astype(np.float32)
    y = rng.uniform(-np.pi, np.pi, (8, 1)).astype(np.float32)
    coeffs = vm_feature_weights(3, 8.0).astype(np.float32)

    phi_x = C.von_mises(x, coeffs).reshape(7, 8)
    phi_y = C.von_mises(y, coeffs).reshape(7, 8)
    got = np.sum(phi_x * phi_y, axis=0)

    lag = (x - y).reshape(8)
    want = coeffs[0] ** 2 + sum(
        coeffs[n] ** 2 * np.cos(n * lag) for n in range(1, 4))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_truncated_kernel_approximates_von_mises():
    """End-to-end: the truncated feature-map kernel with the Bessel
    weights approximates the true normalized von Mises kernel
    e^{kappa(cos(lag)-1)} — the mathematical claim the whole embedding
    rests on.  kappa=8, 3 harmonics: sup error is dominated by the
    dropped n>=4 terms, sum 2*I_n(8)/e^8 for n in 4.. ~= 0.21."""
    coeffs = vm_feature_weights(3, 8.0)
    lags = np.linspace(-np.pi, np.pi, 721)
    approx = coeffs[0] ** 2 + sum(
        coeffs[n] ** 2 * np.cos(n * lags) for n in range(1, 4))
    exact = np.exp(8.0 * (np.cos(lags) - 1.0))
    tail = 1.0 - (bessel_i(0, 8.0)
                  + 2 * sum(bessel_i(n, 8.0) for n in range(1, 4))) \
        / np.exp(8.0)
    assert np.abs(approx - exact).max() < 2.5 * tail
    # and the tail itself is small: the 4-term truncation carries >75%
    # of the kernel mass
    assert tail < 0.25


# ---------------------------------------------------------------------------
# Spatial-kernel planes: kernel-property validation (round 3).
#
# The [9,32,32] cartesian and [25,32,32] polar plane tables are only
# correct if they are feature maps of the intended product kernels:
#   cart:  emb(p) . emb(q) = k1(pi/2*(x_p-x_q)) * k1(pi/2*(y_p-y_q))
#   polar: emb(p) . emb(q) = k2(phi_p-phi_q)    * k2(rho_p-rho_q)
# with k_i the truncated Fourier kernels of their coefficient tables
# (k2's coefficients re-derived from Bessel integrals above).  The
# expected values below are computed from raw grid definitions only —
# the plane-construction code never enters the right-hand side.
# ---------------------------------------------------------------------------


def _grid_xy():
    r = 2.0 * np.arange(32) / 31.0 - 1.0
    return np.meshgrid(r, r)  # x varies along columns, y along rows


def test_cart_planes_are_product_kernel_feature_map():
    from itertools import product

    emb = C.spatial_kernel_embedding_cart().reshape(9, -1)
    x, y = _grid_xy()
    x, y = x.ravel(), y.ravel()
    c0, c1 = (float(v) for v in C.VM_FOURIER_N1_K1)
    k1 = lambda d: c0 * c0 + c1 * c1 * np.cos(d)
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 32 * 32, size=(64, 2))
    for p, q in idx:
        got = float(emb[:, p] @ emb[:, q])
        want = k1(np.pi / 2 * (x[p] - x[q])) * k1(np.pi / 2 * (y[p] - y[q]))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_polar_planes_are_product_kernel_feature_map():
    emb = C.spatial_kernel_embedding_polar().reshape(25, -1)
    x, y = _grid_xy()
    x, y = x.ravel(), y.ravel()
    phi = np.arctan2(y, x)
    rho = np.sqrt(x * x + y * y + 1e-8) * np.pi / np.sqrt(2.0)
    c = vm_feature_weights(2, 8.0)          # Bessel-derived, not the table
    k2 = lambda d: c[0] ** 2 + c[1] ** 2 * np.cos(d) + c[2] ** 2 * np.cos(2 * d)
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 32 * 32, size=(64, 2))
    for p, q in idx:
        got = float(emb[:, p] @ emb[:, q])
        want = k2(phi[p] - phi[q]) * k2(rho[p] - rho[q])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=3e-6)


def test_gaussian_weighting_from_definition():
    """w = exp(-(|p| / max|p|)^2) on the [-1,1]^2 grid: recomputed here
    from the formula (max radius = the corner, sqrt(2)) plus the
    symmetry/extremal properties any such weight must satisfy."""
    w = C.gaussian_weighting()
    x, y = _grid_xy()
    r = np.sqrt(x * x + y * y)
    want = np.exp(-((r / np.sqrt(2.0)) ** 2))
    np.testing.assert_allclose(w, want, rtol=1e-5, atol=1e-6)
    # dihedral symmetry and extremes
    np.testing.assert_allclose(w, w.T, atol=0)
    np.testing.assert_allclose(w, np.rot90(w), atol=1e-7)
    np.testing.assert_allclose(w[0, 0], np.exp(-1.0), rtol=1e-6)
    assert w.max() == w[15, 15] or w.max() == w[16, 16]


# ---------------------------------------------------------------------------
# 90-degree rotation equivariance of the raw MKD descriptor.
#
# For Q = np.rot90(P) (pixel map Q[i,j] = P[j, 31-i]), every stage
# transforms exactly (verified numerically stage by stage):
#   implemented angle field ang = -atan2(gy, gx) shifts by -pi/2,
#   the position table (-atan2(y, x)) shifts by +pi/2, so the RELATIVE
#   angle (ang + table) is rotation invariant — the property the
#   "relative gradients" parametrization exists to provide; the spatial
#   phi (= +atan2) shifts by -pi/2 and the cart (x, y) embeddings swap
#   with a sin sign flip.  Each shift is an exact orthogonal transform
#   on the von Mises harmonics, so the 238-D raw descriptor satisfies
#   raw(Q) = blockdiag-transform(raw(P))
# to float precision.  A sign misreading anywhere in mkd_ref.rs's
# conventions (negated angles, phi direction, grid orientation) breaks
# this law, so it pins the convention stack without reference vectors.
# ---------------------------------------------------------------------------


def _vm_shift_matrix(coeffs: np.ndarray, delta: float) -> np.ndarray:
    """Matrix M with vm(a + delta) = M @ vm(a) for the [1, cos(na),
    sin(na)] * weights layout (weights cancel: M is built on the
    unweighted harmonics and conjugated by the diagonal weight matrix,
    which commutes blockwise)."""
    n = len(coeffs) - 1
    d = 2 * n + 1
    M = np.zeros((d, d))
    M[0, 0] = 1.0
    for k in range(1, n + 1):
        cd, sd = np.cos(k * delta), np.sin(k * delta)
        # cos(k(a+d)) = cos ka cos kd - sin ka sin kd
        M[k, k], M[k, n + k] = cd, -sd
        # sin(k(a+d)) = sin ka cos kd + cos ka sin kd
        M[n + k, k], M[n + k, n + k] = sd, cd
    return M


def test_raw_descriptor_rot90_equivariance():
    from local_features_tpu.golden.mkd import mkd_raw_descriptor

    rng = np.random.default_rng(3)
    # smooth random patch (band-limited so gradients are well-formed)
    z = rng.standard_normal((8, 8))
    patch = np.kron(z, np.ones((4, 4)))
    # band-limit with a simple repeated box blur
    for _ in range(3):
        patch = (np.roll(patch, 1, 0) + patch + np.roll(patch, -1, 0)) / 3.0
        patch = (np.roll(patch, 1, 1) + patch + np.roll(patch, -1, 1)) / 3.0
    patch = patch.astype(np.float32)

    raw_p = mkd_raw_descriptor(patch)
    raw_q = mkd_raw_descriptor(np.rot90(patch).copy())

    # polar part [7, 25]: relative-angle lift is INVARIANT (the whole
    # point of relative gradients); spatial phi shifts by -pi/2
    A5 = _vm_shift_matrix(C.VM_FOURIER_N2_K8, -np.pi / 2)
    A25 = np.kron(A5, np.eye(5))          # index = phi*5 + rho
    polar_p = raw_p[:175].reshape(7, 25)
    polar_q = raw_q[:175].reshape(7, 25)
    np.testing.assert_allclose(polar_q, polar_p @ A25.T,
                               atol=2e-5, rtol=1e-4)

    # cart part [7, 9]: lift shifts by -pi/2; spatial (x,y) -> (y', -x')
    # swaps the two axis embeddings with a sin sign flip on the new y
    D7c = _vm_shift_matrix(C.VM_FOURIER_N3_K8, -np.pi / 2)
    S = np.diag([1.0, 1.0, -1.0])         # vm(-a) = S @ vm(a), n=1
    swap = np.zeros((9, 9))
    for i in range(3):
        for j in range(3):
            swap[i * 3 + j, j * 3 + i] = S[j, j]
    cart_p = raw_p[175:].reshape(7, 9)
    cart_q = raw_q[175:].reshape(7, 9)
    np.testing.assert_allclose(cart_q, D7c @ cart_p @ swap.T,
                               atol=2e-5, rtol=1e-4)
