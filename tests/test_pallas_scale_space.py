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
