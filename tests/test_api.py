"""API-surface tests: host blob filter, batched detection, parity between
entry points."""

import numpy as np

from local_features_tpu.api import LocalFeatures


def test_detect_with_filter_matches_top_n(test_image):
    lf = LocalFeatures(max_features=128, max_blobs=512, n_scales=4)
    r_top = lf.detect_top_n(test_image, 20)

    def top20(x, y, size, contrast):
        order = np.argsort(-np.abs(contrast), kind="stable")
        return np.sort(order[:20])

    r_filt = lf.detect_with_filter(test_image, top20)
    assert len(r_filt) == len(r_top)
    np.testing.assert_allclose(np.sort(r_filt.response),
                               np.sort(r_top.response), atol=1e-6)
    np.testing.assert_allclose(np.sort(r_filt.x), np.sort(r_top.x),
                               atol=1e-5)


def test_detect_with_filter_custom(test_image):
    """A filter selecting only large blobs."""
    lf = LocalFeatures(max_features=128, max_blobs=512, n_scales=4)
    r_all = lf.detect(test_image)

    def only_big(x, y, size, contrast):
        return np.flatnonzero(size >= 3.0)

    r = lf.detect_with_filter(test_image, only_big)
    if len(r):
        assert (r.size >= 3.0).all()
    n_expected_blobs = len(np.unique(r_all.response[r_all.size >= 3.0]))
    assert len(np.unique(r.response)) == n_expected_blobs


def test_detect_sequence_matches_single(test_image):
    """detect_sequence (batched, tail-padded) == per-frame detect_top_n."""
    rng = np.random.default_rng(5)
    frames = np.stack([
        np.clip(test_image + 0.02 * rng.standard_normal(test_image.shape),
                0, 1).astype(np.float32)
        for _ in range(5)
    ])
    lf = LocalFeatures(max_features=128, max_blobs=512, n_scales=4)
    seq = lf.detect_sequence(frames, 64, batch=2)  # odd tail exercises pad
    assert len(seq) == 5
    for f in range(5):
        single = lf.detect_top_n(frames[f], 64)
        assert len(seq[f]) == len(single)
        np.testing.assert_allclose(seq[f].x, single.x, atol=1e-5)
        np.testing.assert_allclose(seq[f].descriptors, single.descriptors,
                                   atol=1e-5)


def test_detect_batch_matches_single(test_image):
    rng = np.random.default_rng(3)
    imgs = np.stack([
        np.clip(test_image + 0.02 * rng.standard_normal(test_image.shape),
                0, 1).astype(np.float32)
        for _ in range(3)
    ])
    lf = LocalFeatures(max_features=128, max_blobs=512, n_scales=4)
    batch = lf.detect_batch(imgs, n=64)
    for b in range(3):
        single = lf.detect_top_n(imgs[b], 64)
        assert len(batch[b]) == len(single)
        np.testing.assert_allclose(batch[b].x, single.x, atol=1e-5)
        np.testing.assert_allclose(batch[b].descriptors, single.descriptors,
                                   atol=1e-5)


def test_detect_keypoint_cap_below_blob_cap(test_image):
    """detect() lets blobs flow at max_blobs but caps keypoint slots at
    max_features: with a tiny max_features the result is truncated to
    exactly max_features and the excess is reported in dropped_features
    (two-tier capacity contract, lib.rs:55-75)."""
    lf_big = LocalFeatures(max_features=256, max_blobs=512, n_scales=4)
    r_big = lf_big.detect(test_image)
    n_all = len(r_big.keypoints_array)
    assert n_all > 8, "fixture must produce more keypoints than the cap"
    assert r_big.dropped_features == 0

    lf_small = LocalFeatures(max_features=8, max_blobs=512, n_scales=4)
    r_small = lf_small.detect(test_image)
    assert len(r_small.keypoints_array) == 8
    assert r_small.dropped_features == n_all - 8
    # compaction is strongest-blob-first: the kept keypoints are a
    # subset of the full result's keypoints
    big_set = {tuple(np.round(row[:3], 4)) for row in r_big.keypoints_array}
    for row in r_small.keypoints_array:
        assert tuple(np.round(row[:3], 4)) in big_set


def test_sampler_auto_resolves_by_backend():
    """FrontendConfig defaults to sampler="auto": xla on CPU, and invalid
    names are rejected at trace time."""
    import pytest

    from local_features_tpu.ops.frontend import FrontendConfig, _use_pallas

    assert _use_pallas(FrontendConfig()) is False  # tests pin CPU
    assert _use_pallas(FrontendConfig(sampler="pallas")) is True
    assert _use_pallas(FrontendConfig(sampler="xla")) is False
    with pytest.raises(ValueError):
        _use_pallas(FrontendConfig(sampler="cuda"))


def test_detect_match_sequence_equals_serial(test_image):
    """Fused on-device sequence matching == detect_sequence followed by
    match_consecutive (keypoints, counts, and every pair's match set),
    including the cross-batch seam pairs and a padded tail batch."""
    from local_features_tpu.ops.matching import (match_consecutive,
                                                 pad_descriptor_sequence)

    rng = np.random.default_rng(9)
    frames = np.stack([
        np.clip(test_image + 0.02 * rng.standard_normal(test_image.shape),
                0, 1).astype(np.float32)
        for _ in range(7)
    ])
    lf = LocalFeatures(max_features=128, max_blobs=512, n_scales=4)
    feats_ref = lf.detect_sequence(frames, 128, batch=3)
    descs, dvalid = pad_descriptor_sequence(feats_ref,
                                            capacity=lf.max_features)
    pm_ref = match_consecutive(descs, dvalid)

    feats, pm = lf.detect_match_sequence(frames, 128, batch=3)
    assert len(feats) == 7 and len(pm) == 6
    for f in range(7):
        np.testing.assert_allclose(feats[f].x, feats_ref[f].x, atol=1e-5)
        assert len(feats[f]) == len(feats_ref[f])
    for p in range(6):
        np.testing.assert_array_equal(pm[p], pm_ref[p])
