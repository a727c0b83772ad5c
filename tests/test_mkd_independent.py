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
