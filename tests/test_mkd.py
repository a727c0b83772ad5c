"""Golden-parity tests for the MKD descriptor math."""

import numpy as np
import jax.numpy as jnp

from local_features_tpu import constants as C
from local_features_tpu.golden import mkd_raw_descriptor, mkd_descriptor, patch_mag_angle
from local_features_tpu.ops.descriptor import (
    mkd_descriptors,
    patches_mag_angle,
    raw_mkd_descriptors,
)
from local_features_tpu.pca import load_pca


def _patches(rng, n=8):
    return rng.random((n, 32, 32), dtype=np.float32)


def test_patch_mag_angle_matches_golden(rng):
    patches = _patches(rng)
    mag_j, ang_j = patches_mag_angle(jnp.asarray(patches))
    for i, p in enumerate(patches):
        mag_g, ang_g = patch_mag_angle(p)
        np.testing.assert_allclose(np.asarray(mag_j)[i], mag_g, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ang_j)[i], ang_g, atol=1e-5)


def test_raw_descriptor_matches_golden(rng):
    patches = _patches(rng)
    raw_j = np.asarray(raw_mkd_descriptors(jnp.asarray(patches)))
    assert raw_j.shape == (len(patches), 238)
    for i, p in enumerate(patches):
        raw_g = mkd_raw_descriptor(p)
        # f32 accumulation-order differences between backends reach ~1e-4
        np.testing.assert_allclose(raw_j[i], raw_g, atol=4e-4)
        cos = float(raw_j[i] @ raw_g)
        assert cos > 1.0 - 1e-6


def test_whitened_descriptor_matches_golden(rng):
    patches = _patches(rng)
    mean, proj = load_pca("liberty").attenuated
    d_j = np.asarray(
        mkd_descriptors(jnp.asarray(patches), jnp.asarray(mean), jnp.asarray(proj))
    )
    assert d_j.shape == (len(patches), 128)
    np.testing.assert_allclose(np.linalg.norm(d_j, axis=1), 1.0, atol=1e-5)
    for i, p in enumerate(patches):
        d_g = mkd_descriptor(p, mean, proj)
        # whitening amplifies low-variance components; gate on cosine too
        np.testing.assert_allclose(d_j[i], d_g, atol=2e-3)
        cos = float(d_j[i] @ d_g)
        assert cos > 1.0 - 1e-5


def test_all_pca_models_load():
    for name in ("liberty", "notredame", "yosemite"):
        mean, proj = load_pca(name).attenuated
        assert mean.shape == (238,)
        assert proj.shape == (238, 128)
        assert np.isfinite(proj).all()


def test_raw_descriptor_structure(rng):
    """Polar/cart parts are separately normalized before the final norm."""
    raw = np.asarray(raw_mkd_descriptors(jnp.asarray(_patches(rng, 4))))
    polar_n = np.linalg.norm(raw[:, :175], axis=1)
    cart_n = np.linalg.norm(raw[:, 175:], axis=1)
    np.testing.assert_allclose(polar_n, 1 / np.sqrt(2), atol=1e-5)
    np.testing.assert_allclose(cart_n, 1 / np.sqrt(2), atol=1e-5)


def test_fast_descriptor_matches_exact(rng):
    """bf16 fast path (single lift, rotation folded into constant
    planes) stays within matching tolerance of the exact f32 path."""
    patches = jnp.asarray(rng.random((64, 32, 32), dtype=np.float32))
    exact = np.asarray(raw_mkd_descriptors(patches, fast=False))
    fast = np.asarray(raw_mkd_descriptors(patches, fast=True))
    cos = np.sum(exact * fast, axis=1)  # both L2-normalized
    assert cos.min() > 0.99999
    np.testing.assert_allclose(fast, exact, atol=5e-3)


def test_gradient_matmul_lowering(rng):
    """The constant-operator matmul lowering of the blur+gradients (fast
    path, MXU) must agree with the pad/slice sequential lowering (exact
    path) to f32 summation-order noise on the gradients themselves.
    (The full descriptors are NOT compared bit-level here on purpose:
    near-zero gradients have noise-dominated directions with a floored
    magnitude, so descriptor-level agreement is only ~1e-4 — see
    _blurred_gradients docstring.)"""
    from local_features_tpu.ops.descriptor import _blurred_gradients

    patches = jnp.asarray(rng.random((16, 32, 32)).astype(np.float32))
    gx0, gy0 = _blurred_gradients(patches, matmul=False)
    gx1, gy1 = _blurred_gradients(patches, matmul=True)
    assert float(jnp.abs(gx0 - gx1).max()) < 1e-6
    assert float(jnp.abs(gy0 - gy1).max()) < 1e-6
