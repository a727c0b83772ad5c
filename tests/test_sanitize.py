"""checkify sanitizer tests: invariants pass on real output and actually
fire on corrupted output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from local_features_tpu.ops.frontend import FrontendConfig
from local_features_tpu.pca import load_pca
from local_features_tpu.utils.sanitize import (
    checked_detect_extract,
    frontend_invariants,
)


def _cfg():
    return FrontendConfig(n_scales=3, max_blobs=256, max_keypoints=128,
                          max_filtered=128)


def test_checked_frontend_passes(test_image):
    mean, proj = load_pca().attenuated
    res = checked_detect_extract(test_image, _cfg(), jnp.asarray(mean),
                                 jnp.asarray(proj), 64)
    assert int(np.asarray(res.n_keypoints)) > 0


def test_invariants_fire_on_corruption(test_image):
    mean, proj = load_pca().attenuated
    res = checked_detect_extract(test_image, _cfg(), jnp.asarray(mean),
                                 jnp.asarray(proj), 64)
    h, w = test_image.shape
    bad = res._replace(x=res.x.at[0].set(jnp.nan))

    def run(r):
        frontend_invariants(r, h, w)
        return r.n_keypoints

    err, _ = checkify.checkify(jax.jit(run))(bad)
    with pytest.raises(Exception, match="non-finite keypoint x"):
        err.throw()

    bad2 = res._replace(descriptors=res.descriptors.at[0, 0].add(10.0))
    err2, _ = checkify.checkify(jax.jit(run))(bad2)
    with pytest.raises(Exception, match="unit-norm"):
        err2.throw()
