"""Interpret-mode parity of the fused Pallas scale-space kernel vs the
proven XLA construction (which is itself golden-tested)."""

import jax.numpy as jnp
import numpy as np
import pytest

from local_features_tpu.ops import scale_space as jss
from local_features_tpu.pallas.scale_space import scale_space_pallas


@pytest.mark.parametrize("shape", [(96, 128), (240, 320), (480, 640)])
def test_pallas_scale_space_matches_xla(shape):
    rng = np.random.default_rng(1)
    img = rng.random(shape).astype(np.float32)
    ref = np.asarray(jss.scale_space(jnp.asarray(img), 4))
    out = np.asarray(scale_space_pallas(jnp.asarray(img), 4,
                                        interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-6)


def test_pallas_scale_space_batched():
    """The custom_vmap unroll must match per-frame calls."""
    import jax

    rng = np.random.default_rng(2)
    imgs = rng.random((3, 96, 128)).astype(np.float32)
    f = lambda im: scale_space_pallas(im, 4, interpret=True)
    batched = np.asarray(jax.vmap(f)(jnp.asarray(imgs)))
    single = np.stack([np.asarray(f(jnp.asarray(im))) for im in imgs])
    np.testing.assert_allclose(batched, single, atol=0, rtol=0)


def test_pallas_scale_space_nonaligned_width():
    """W not a multiple of 128 exercises the zero-fill footprint."""
    rng = np.random.default_rng(3)
    img = rng.random((120, 160)).astype(np.float32)
    ref = np.asarray(jss.scale_space(jnp.asarray(img), 3))
    out = np.asarray(scale_space_pallas(jnp.asarray(img), 3,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-6, rtol=1e-6)


def test_vmem_guard_raises_for_impossible_shape():
    """Even hb=8 can blow scoped VMEM for extreme widths/levels; the
    picker must surface that instead of letting Mosaic fault."""
    import pytest

    from local_features_tpu.pallas.scale_space import (
        ScaleSpaceVmemError, _pick_block_rows)

    # ~65k-wide image with many levels: scratch term alone exceeds budget
    with pytest.raises(ScaleSpaceVmemError):
        _pick_block_rows(h=480, w_out=65536, wp=66048, n_levels=10, T=256)


def test_vmem_guard_dispatch_falls_back(monkeypatch):
    """LF_SCALE_SPACE=pallas on an impossible shape must fall back to the
    XLA construction, not raise."""
    import local_features_tpu.pallas.scale_space as pss

    def boom(*a, **k):
        raise pss.ScaleSpaceVmemError("synthetic")

    monkeypatch.setattr(pss, "scale_space_pallas", boom)
    monkeypatch.setenv("LF_SCALE_SPACE", "pallas")
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((32, 64)).astype(np.float32))
    out = np.asarray(jss.scale_space(img, 3))
    ref = np.asarray(jss.sep_conv_mirror(img, __import__(
        "local_features_tpu.constants", fromlist=["x"]).BASE_BLUR_KERNEL))
    np.testing.assert_allclose(out[0], ref, atol=0, rtol=0)
