"""Parity test: Pallas patch sampler (interpret mode) vs XLA sampler."""

import numpy as np
import jax.numpy as jnp

import local_features_tpu.ops.scale_space as ss
from local_features_tpu.ops.pyramid import patch_pyramid
from local_features_tpu.ops.descriptor import sample_patches
from local_features_tpu.pallas.sampling import build_canvas, sample_patches_pallas


def _mips_from_flat(pyr):
    mips = []
    flat = np.asarray(pyr.flat)
    offs = np.asarray(pyr.offsets)
    hs = np.asarray(pyr.heights)
    ws = np.asarray(pyr.widths)
    for l in range(pyr.n_levels):
        mips.append(jnp.asarray(
            flat[offs[l]: offs[l] + hs[l] * ws[l]].reshape(hs[l], ws[l])))
    return mips


def test_pallas_sampler_matches_xla(test_image, rng):
    coarse = ss.scale_space(jnp.asarray(test_image), 4)
    pyr = patch_pyramid(coarse)
    mips = _mips_from_flat(pyr)
    canvas = build_canvas(mips)

    K = 64
    h, w = test_image.shape
    kx = jnp.asarray(rng.uniform(5, w - 5, K).astype(np.float32))
    ky = jnp.asarray(rng.uniform(5, h - 5, K).astype(np.float32))
    ksize = jnp.asarray(rng.uniform(1.6, 8.0, K).astype(np.float32))
    kangle = jnp.asarray(rng.uniform(0, 360, K).astype(np.float32))
    kvalid = jnp.asarray(np.ones(K, bool))

    ref = sample_patches(pyr, kx, ky, ksize, kangle, kvalid, 24.0)
    got = sample_patches_pallas(
        canvas, pyr.widths, pyr.heights, kx, ky, ksize, kangle, kvalid,
        24.0, interpret=True,
    )
    # fast path stores the pyramid in bf16 (comparable to the reference's
    # GPU texture-unit subtexel precision): ~2^-9 relative error
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert d.max() < 8e-3, d.max()
    assert d.mean() < 1.5e-3, d.mean()


def test_pallas_sampler_edge_keypoints(test_image, rng):
    """Keypoints hugging the borders exercise the mirror paths."""
    coarse = ss.scale_space(jnp.asarray(test_image), 4)
    pyr = patch_pyramid(coarse)
    canvas = build_canvas(_mips_from_flat(pyr))

    h, w = test_image.shape
    edge = [(1.0, 1.0), (w - 2.0, 1.0), (1.0, h - 2.0), (w - 2.0, h - 2.0),
            (w / 2, 0.5), (0.5, h / 2)]
    K = len(edge)
    kx = jnp.asarray([e[0] for e in edge], dtype=jnp.float32)
    ky = jnp.asarray([e[1] for e in edge], dtype=jnp.float32)
    ksize = jnp.asarray(rng.uniform(1.6, 12.0, K).astype(np.float32))
    kangle = jnp.asarray(rng.uniform(0, 360, K).astype(np.float32))
    kvalid = jnp.asarray(np.ones(K, bool))

    ref = sample_patches(pyr, kx, ky, ksize, kangle, kvalid, 24.0)
    got = sample_patches_pallas(
        canvas, pyr.widths, pyr.heights, kx, ky, ksize, kangle, kvalid,
        24.0, interpret=True,
    )
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert d.max() < 8e-3, d.max()


def test_vmapped_sampler_matches_per_frame(test_image, rng):
    """The custom_vmap per-frame unroll (B standalone-shaped kernel
    calls) must reproduce per-frame sampling exactly.  Replaces the
    vmapped pallas lowering that faulted Mosaic on v5e, and the flat
    B*Kp fold that faulted alongside the windows kernel at B=8 (see
    pallas/windows.py docstring)."""
    import jax

    B, K = 3, 24
    h, w = test_image.shape
    imgs = jnp.stack([
        jnp.asarray(np.clip(
            test_image + 0.05 * rng.standard_normal((h, w)), 0, 1
        ).astype(np.float32))
        for _ in range(B)
    ])
    kx = jnp.asarray(rng.uniform(5, w - 5, (B, K)).astype(np.float32))
    ky = jnp.asarray(rng.uniform(5, h - 5, (B, K)).astype(np.float32))
    ksize = jnp.asarray(rng.uniform(1.6, 8.0, (B, K)).astype(np.float32))
    kangle = jnp.asarray(rng.uniform(0, 360, (B, K)).astype(np.float32))
    kvalid = jnp.ones((B, K), bool)

    def one(im, x, y, s, a, v):
        coarse = ss.scale_space(im, 4)
        pyr = patch_pyramid(coarse)
        canvas = build_canvas(_mips_from_flat_traced(coarse))
        return sample_patches_pallas(
            canvas, pyr.widths, pyr.heights, x, y, s, a, v, 24.0,
            interpret=True)

    def _mips_from_flat_traced(coarse):
        from local_features_tpu.ops.pyramid import patch_pyramid_mips
        return patch_pyramid_mips(coarse)

    got = jax.vmap(one)(imgs, kx, ky, ksize, kangle, kvalid)
    for b in range(B):
        ref = one(imgs[b], kx[b], ky[b], ksize[b], kangle[b], kvalid[b])
        np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(ref))


def test_pallas_sampler_dedup_shared_windows(test_image, rng):
    """Runs of keypoints sharing one window (same x/y/size, different
    angles — exactly the multi-orientation expansion shape) must sample
    identically to distinct-window keypoints: the kernel issues ONE DMA
    per run head and chunk-mates read its VMEM slot (_run_head_srcj)."""
    coarse = ss.scale_space(jnp.asarray(test_image), 4)
    pyr = patch_pyramid(coarse)
    canvas = build_canvas(_mips_from_flat(pyr))

    h, w = test_image.shape
    K = 48
    # 12 base locations, each repeated 4x with different angles ->
    # every KB-chunk holds duplicate runs (KB=4 and KB=8 both covered)
    bx = rng.uniform(8, w - 8, 12).astype(np.float32)
    by = rng.uniform(8, h - 8, 12).astype(np.float32)
    bs = rng.uniform(1.6, 10.0, 12).astype(np.float32)
    kx = jnp.asarray(np.repeat(bx, 4))
    ky = jnp.asarray(np.repeat(by, 4))
    ksize = jnp.asarray(np.repeat(bs, 4))
    kangle = jnp.asarray(rng.uniform(0, 360, K).astype(np.float32))
    # punch holes in the validity mask so runs cross invalid slots
    kvalid = jnp.asarray(np.arange(K) % 7 != 3)

    ref = sample_patches(pyr, kx, ky, ksize, kangle, kvalid, 24.0)
    got = sample_patches_pallas(
        canvas, pyr.widths, pyr.heights, kx, ky, ksize, kangle, kvalid,
        24.0, interpret=True,
    )
    d = np.abs(np.asarray(got) - np.asarray(ref))
    assert d.max() < 8e-3, d.max()


def test_window_sort_key_groups_equal_windows(test_image, rng):
    """window_sort_key equality must match (plane, ox, oy) equality of
    the kernel's own geometry — otherwise sorting silently stops
    deduplicating (the two share _window_geometry; this pins it)."""
    from local_features_tpu.pallas.sampling import (
        N_PHASE, _window_geometry, window_sort_key)

    K = 256
    h, w = test_image.shape
    kx = jnp.asarray(rng.uniform(0, w, K).astype(np.float32))
    ky = jnp.asarray(rng.uniform(0, h, K).astype(np.float32))
    ksize = jnp.asarray(rng.uniform(1.6, 40.0, K).astype(np.float32))
    kvalid = jnp.asarray(np.ones(K, bool))
    L = 6
    key = np.asarray(window_sort_key(kx, ky, ksize, kvalid, L * N_PHASE, 24.0))
    _, _, _, _, ox, plane, oy, _ = _window_geometry(
        L, kx, ky, ksize, jnp.float32(24.0))
    trip = np.stack([np.asarray(plane), np.asarray(ox), np.asarray(oy)], 1)
    for i in range(K):
        for j in range(i + 1, K):
            assert (key[i] == key[j]) == bool((trip[i] == trip[j]).all()), \
                (i, j, key[i], key[j], trip[i], trip[j])


def test_frontend_sorted_sampling_matches_unsorted(test_image):
    """The window-key-sorted sample+describe chain (LF_SAMPLER_SORT=1)
    must reproduce the unsorted path bit-for-bit: sorting is an internal
    scheduling choice, restored by an exact one-hot unsort on the
    descriptors (ops/frontend.py:_finish_extract)."""
    from local_features_tpu.ops import frontend as fe
    from local_features_tpu.pca import load_pca

    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)
    cfg = fe.FrontendConfig(n_scales=4, max_blobs=512, max_keypoints=128,
                            max_filtered=128, sampler="pallas",
                            interpret=True)
    img = jnp.asarray(test_image)

    orig = fe._SAMPLER_SORT
    try:
        fe._SAMPLER_SORT = True
        res_sorted = fe.detect_extract(img, cfg, mean, proj, 128, 0.0, 24.0)
        fe._SAMPLER_SORT = False
        res_plain = fe.detect_extract(img, cfg, mean, proj, 128, 0.0, 24.0)
    finally:
        fe._SAMPLER_SORT = orig
    np.testing.assert_array_equal(np.asarray(res_sorted.valid),
                                  np.asarray(res_plain.valid))
    np.testing.assert_array_equal(np.asarray(res_sorted.descriptors),
                                  np.asarray(res_plain.descriptors))
