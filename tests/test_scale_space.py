"""Golden-parity tests for the scale-space / pyramid stages."""

import numpy as np
import jax.numpy as jnp

from local_features_tpu import golden
import local_features_tpu.ops.scale_space as jss
from local_features_tpu.ops.pyramid import patch_pyramid, pyramid_levels_for


def test_scale_space_matches_golden(test_image):
    n_scales = 4
    g = golden.scale_space(test_image, n_scales)
    j = np.asarray(jss.scale_space(jnp.asarray(test_image), n_scales))
    assert j.shape == g.shape == (n_scales + 3, *test_image.shape)
    np.testing.assert_allclose(j, g, atol=2e-6)


def test_fine_volume_matches_golden(test_image):
    g = golden.fine_volume(golden.scale_space(test_image, 4))
    j = np.asarray(jss.fine_volume(jss.scale_space(jnp.asarray(test_image), 4)))
    np.testing.assert_allclose(j, g, atol=2e-6)


def test_mirror_border_small_dilation():
    """Dilated taps larger than the image must still mirror correctly."""
    rng = np.random.default_rng(0)
    img = rng.random((8, 8)).astype(np.float32)
    from local_features_tpu.golden.scale_space import _sep_conv_mirror
    from local_features_tpu import constants as C

    for dil in (1, 2, 4, 8):
        g = _sep_conv_mirror(img, C.SWT_KERNEL, dil)
        j = np.asarray(jss.sep_conv_mirror(jnp.asarray(img), C.SWT_KERNEL, dil))
        np.testing.assert_allclose(j, g, atol=1e-6, err_msg=f"dilation {dil}")


def test_patch_pyramid_matches_golden(test_image):
    coarse_g = golden.scale_space(test_image, 4)
    n_levels = pyramid_levels_for(*test_image.shape)
    mips_g = golden.patch_pyramid(coarse_g, n_levels)

    coarse_j = jss.scale_space(jnp.asarray(test_image), 4)
    pyr = patch_pyramid(coarse_j, n_levels)
    flat = np.asarray(pyr.flat)
    offsets = np.asarray(pyr.offsets)
    heights = np.asarray(pyr.heights)
    widths = np.asarray(pyr.widths)

    assert pyr.n_levels == len(mips_g)
    for lvl, mip_g in enumerate(mips_g):
        h, w = heights[lvl], widths[lvl]
        assert (h, w) == mip_g.shape, f"level {lvl}"
        mip_j = flat[offsets[lvl] : offsets[lvl] + h * w].reshape(h, w)
        np.testing.assert_allclose(mip_j, mip_g, atol=2e-6,
                                   err_msg=f"level {lvl}")


def test_scale_space_prepad_matches_perlevel():
    """The one-shot-mirror-extension variant must match the per-level
    construction to f32 summation precision everywhere, including
    pad >= dim regimes (small image, large total receptive field)."""
    rng = np.random.default_rng(3)
    for shape in ((96, 128), (240, 320)):
        img = rng.random(shape).astype(np.float32)
        a = np.asarray(jss.scale_space(jnp.asarray(img), 4))
        b = np.asarray(jss.scale_space_prepad(jnp.asarray(img), 4))
        np.testing.assert_allclose(b, a, atol=2e-6, rtol=1e-6,
                                   err_msg=str(shape))


def test_scale_space_matmul_matches_perlevel(test_image):
    """Constant-matrix conv variant (LF_SCALE_SPACE=matmul) vs the
    default per-level construction: same values to f32 summation-order
    noise (the mirror fold lives in the matrix, so every border pixel
    must agree too)."""
    from local_features_tpu.ops.scale_space import (scale_space,
                                                    scale_space_matmul)
    import jax.numpy as jnp

    a = np.asarray(scale_space(jnp.asarray(test_image), 4))
    b = np.asarray(scale_space_matmul(jnp.asarray(test_image), 4))
    np.testing.assert_allclose(b, a, atol=2e-6, rtol=1e-6)
