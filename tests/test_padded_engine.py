"""Pad-to-max single-compile engine: one executable serves any
(H, W) <= max with results matching exact-shape compiles.

Reference contract: vulkan/mod.rs:271-291 (allocate once at
max_image_*, serve any smaller frame with zero recompilation).
"""

import numpy as np
import pytest

from local_features_tpu import LocalFeatures


def _image(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
    return (0.5 + 0.25 * base
            + 0.1 * rng.standard_normal((h, w))).astype(np.float32)


def _match_results(exact, padded):
    """Greedy nearest matching on (position, angle) between two keypoint
    sets (a blob emits several same-position orientations, so position
    alone cannot pair them); returns (n_matched, max position err,
    max descriptor err) over matched pairs."""
    ka, kb = exact.keypoints_array, padded.keypoints_array
    if len(ka) == 0 or len(kb) == 0:
        return 0, np.inf, np.inf
    d = np.linalg.norm(ka[:, None, :2] - kb[None, :, :2], axis=-1)
    da = np.abs(ka[:, None, 3] - kb[None, :, 3])
    da = np.minimum(da, 360.0 - da)
    j = (d + 0.01 * da).argmin(axis=1)
    pos = d[np.arange(len(ka)), j]
    ok = (pos < 0.05) & (da[np.arange(len(ka)), j] < 0.05)
    derr = np.linalg.norm(
        exact.descriptors[ok] - padded.descriptors[j[ok]], axis=1)
    return int(ok.sum()), float(pos[ok].max(initial=0)), \
        (float(derr.max(initial=0)), float(np.median(derr)) if len(derr)
         else 0.0)


def test_padded_engine_matches_exact_across_sizes():
    """Three different input sizes through ONE padded engine; every
    result must match its exact-shape engine (same keypoints within
    f32-summation-order noise, same descriptors)."""
    rng = np.random.default_rng(0)
    padded = LocalFeatures(max_image_width=320, max_image_height=256,
                           max_features=300, max_blobs=2000, n_scales=3)
    sizes = [(256, 320), (200, 320), (160, 224)]
    for h, w in sizes:
        img = _image(rng, h, w)
        exact_eng = LocalFeatures(max_features=300, max_blobs=2000,
                                  n_scales=3)
        r_exact = exact_eng.detect_top_n(img, 200)
        r_pad = padded.detect_top_n(img, 200)
        n_e = len(r_exact.keypoints_array)
        n_p = len(r_pad.keypoints_array)
        assert n_e > 30, (h, w, n_e)
        # identical keypoint COUNT up to threshold knife-edges
        assert abs(n_e - n_p) <= max(2, n_e // 100), (h, w, n_e, n_p)
        matched, pos_err, desc_err = _match_results(r_exact, r_pad)
        assert matched >= n_e - max(2, n_e // 100), (h, w, matched, n_e)
        assert pos_err < 0.05, pos_err
        # f32 summation-order noise near borders only: descriptors are
        # otherwise exact (mip extensions refreshed level by level)
        assert desc_err[0] < 1e-3 and desc_err[1] < 1e-4, desc_err
    # the whole sweep hit ONE compiled executable
    pad_keys = [k for k in padded._jit_cache if k[-1] is True]
    assert len(pad_keys) == 1, padded._jit_cache.keys()


def test_padded_engine_rejects_oversize():
    eng = LocalFeatures(max_image_width=128, max_image_height=128,
                        n_scales=3)
    with pytest.raises(ValueError):
        eng.detect_top_n(np.zeros((129, 100), np.float32), 10)


def test_padded_engine_full_size_frame():
    """A frame at exactly max size still runs (and matches exact)."""
    rng = np.random.default_rng(1)
    img = _image(rng, 160, 192)
    padded = LocalFeatures(max_image_width=192, max_image_height=160,
                           max_features=200, n_scales=3)
    exact = LocalFeatures(max_features=200, n_scales=3)
    r_p = padded.detect_top_n(img, 150)
    r_e = exact.detect_top_n(img, 150)
    matched, pos_err, desc_err = _match_results(r_e, r_p)
    assert matched >= len(r_e.keypoints_array) - 2
    assert pos_err < 0.05, pos_err
    assert desc_err[0] < 1e-3 and desc_err[1] < 1e-4, desc_err
