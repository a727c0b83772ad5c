"""Sharded/batched front-end tests on the virtual 8-device CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from local_features_tpu.ops.frontend import FrontendConfig, detect_extract
from local_features_tpu.parallel import (
    batched_detect_extract,
    make_mesh,
    sharded_detect_extract,
)
from local_features_tpu.pca import load_pca


def _cfg():
    return FrontendConfig(n_scales=3, max_blobs=256, max_keypoints=128,
                          max_filtered=128)


def _batch(test_image, b=8):
    rng = np.random.default_rng(7)
    imgs = np.stack([
        np.clip(test_image + 0.02 * rng.standard_normal(test_image.shape), 0, 1)
        for _ in range(b)
    ]).astype(np.float32)
    return jnp.asarray(imgs)


def test_vmap_batch_matches_single(test_image):
    cfg = _cfg()
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)
    imgs = _batch(test_image, b=4)
    rb = batched_detect_extract(imgs, cfg, mean, proj, 128, 0.0, 24.0)
    for i in range(4):
        rs = detect_extract(imgs[i], cfg, mean, proj, 128, 0.0, 24.0)
        assert int(rb.n_keypoints[i]) == int(rs.n_keypoints)
        vb = np.asarray(rb.valid[i])
        # 1e-4 px: jit(vmap) fuses differently from the single-image
        # program, so refined positions differ by float rounding
        np.testing.assert_allclose(np.asarray(rb.x[i])[vb],
                                   np.asarray(rs.x)[np.asarray(rs.valid)],
                                   atol=1e-4)


def test_sharded_matches_batched(test_image):
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    cfg = _cfg()
    mesh = make_mesh()
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)
    imgs = _batch(test_image, b=8)

    run = sharded_detect_extract(mesh, cfg)
    r_sh = run(imgs, mean, proj, jnp.int32(128), jnp.float32(0.0),
               jnp.float32(24.0))
    r_ref = batched_detect_extract(imgs, cfg, mean, proj, 128, 0.0, 24.0)

    np.testing.assert_array_equal(np.asarray(r_sh.n_keypoints),
                                  np.asarray(r_ref.n_keypoints))
    np.testing.assert_allclose(np.asarray(r_sh.descriptors),
                               np.asarray(r_ref.descriptors), atol=1e-5)
    # outputs keep the batch sharding
    assert len(r_sh.descriptors.sharding.device_set) == 8


def test_sharded_pallas_interpret_smoke(test_image):
    """Flagship Pallas kernels (patch sampler + fused orientation
    histograms) composed under shard_map on a 2-device mesh shard,
    interpret mode.  Real Mosaic compilation is impossible on the CPU
    mesh, but this at least trace-checks the kernels' sharding
    composition (custom_vmap rules, scalar-prefetch operands, canvas
    layouts) before real hardware ever sees them under a mesh."""
    from jax.sharding import Mesh, PartitionSpec as P

    cfg = FrontendConfig(n_scales=3, max_blobs=256, max_keypoints=128,
                         max_filtered=128, sampler="pallas", interpret=True)
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)
    imgs = _batch(test_image, b=2)
    mesh = Mesh(np.array(jax.devices()[:2]), ("batch",))

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("batch"), P(), P()),
        out_specs=P("batch"),
        # pallas_call out_shapes carry no vma annotation; skip the check
        check_vma=False)
    def run(imgs, mean, proj):
        return batched_detect_extract(imgs, cfg, mean, proj, 128, 0.0, 24.0)

    r_sh = run(imgs, mean, proj)
    r_ref = batched_detect_extract(imgs, cfg, mean, proj, 128, 0.0, 24.0)
    np.testing.assert_array_equal(np.asarray(r_sh.n_keypoints),
                                  np.asarray(r_ref.n_keypoints))
    np.testing.assert_allclose(np.asarray(r_sh.descriptors),
                               np.asarray(r_ref.descriptors), atol=1e-5)
    assert len(r_sh.descriptors.sharding.device_set) == 2
