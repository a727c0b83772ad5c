"""Matching tests: synthetic-shift correctness + real-image smoke test."""

import numpy as np
import jax.numpy as jnp
import pytest

from local_features_tpu.api import LocalFeatures
from local_features_tpu.ops.matching import match_descriptors, mutual_match


def test_match_identity():
    rng = np.random.default_rng(0)
    d = rng.standard_normal((64, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m = match_descriptors(jnp.asarray(d), jnp.asarray(d), ratio=0.8)
    idx = np.asarray(m.indices)
    mask = np.asarray(m.mask)
    assert mask.all()
    np.testing.assert_array_equal(idx, np.arange(64))


def test_mutual_match_validity():
    rng = np.random.default_rng(1)
    da = rng.standard_normal((32, 128)).astype(np.float32)
    da /= np.linalg.norm(da, axis=1, keepdims=True)
    db = np.concatenate([da[16:], rng.standard_normal((16, 128)).astype(np.float32)])
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    valid_a = np.ones(32, bool)
    valid_b = np.ones(32, bool)
    m = mutual_match(jnp.asarray(da), jnp.asarray(db),
                     jnp.asarray(valid_a), jnp.asarray(valid_b))
    idx = np.asarray(m.indices)
    # rows 16..31 of A are rows 0..15 of B
    for i in range(16, 32):
        assert idx[i] == i - 16


def test_detect_match_shifted(test_image):
    """Features detected on an image and its translate should match with
    the correct offset."""
    shift = 8
    img_a = test_image[:, :-shift]
    img_b = test_image[:, shift:]
    lf = LocalFeatures(n_scales=4, max_features=256, max_blobs=1024)
    ra = lf.detect_top_n(img_a, 100)
    rb = lf.detect_top_n(img_b, 100)
    assert len(ra) > 5 and len(rb) > 5
    m = match_descriptors(jnp.asarray(ra.descriptors),
                          jnp.asarray(rb.descriptors), ratio=0.8)
    idx = np.asarray(m.indices)
    mask = np.asarray(m.mask)
    assert mask.sum() >= 5
    good = 0
    for i in np.flatnonzero(mask):
        j = idx[i]
        dx = ra.x[i] - rb.x[j]
        dy = ra.y[i] - rb.y[j]
        if abs(dx - shift) < 1.0 and abs(dy) < 1.0:
            good += 1
    assert good / mask.sum() > 0.8


@pytest.mark.slow
def test_real_images_smoke():
    """Front-end + matching on the reference's sample images (downscaled)."""
    from PIL import Image

    def load(path, size=(160, 120)):
        img = Image.open(path).convert("L").resize(size)
        return np.asarray(img, dtype=np.float32) / 255.0

    try:
        a = load("/root/reference/sample_data/bird.jpg")
        b = load("/root/reference/sample_data/houses.jpg")
    except FileNotFoundError:
        pytest.skip("sample data not available")

    lf = LocalFeatures(n_scales=3, max_features=512, max_blobs=2048)
    ra = lf.detect_top_n(a, 300)
    rb = lf.detect_top_n(b, 300)
    assert len(ra) > 20 and len(rb) > 20
    m = match_descriptors(jnp.asarray(ra.descriptors),
                          jnp.asarray(rb.descriptors))
    # different scenes: ratio test should kill most matches
    assert np.asarray(m.mask).sum() < 0.5 * len(ra)


def test_top2_reduce_matches_masked():
    """The single-pass variadic-reduce top-2 (default) must agree with
    the three-pass masked-max lowering on values, seconds, and argbest
    tie rule (smaller index wins), including duplicated maxima and
    -inf-masked columns.  All--inf rows may differ in argbest only
    (masked: 0, reduce: -1) — both yield indices=-1 after the ratio
    mask, which is the public contract."""
    import numpy as np
    import jax.numpy as jnp

    import local_features_tpu.ops.matching as M

    rng = np.random.default_rng(7)
    orig = M._TOP2_IMPL
    try:
        for trial in range(30):
            m, n = rng.integers(1, 40, 2)
            sim = rng.standard_normal((m, n)).astype(np.float32)
            if n > 3:
                sim[:, 1] = sim[:, 2]
            if trial % 3 == 0:
                sim[:, rng.integers(0, n)] = -np.inf
            if trial % 7 == 0:
                sim[:] = -np.inf
            M._TOP2_IMPL = "masked"
            b0, s0, i0 = M._top2(jnp.asarray(sim))
            M._TOP2_IMPL = "reduce"
            b1, s1, i1 = M._top2(jnp.asarray(sim))
            np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))
            np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
            row_neginf = np.all(sim == -np.inf, axis=1)
            np.testing.assert_array_equal(np.asarray(i0)[~row_neginf],
                                          np.asarray(i1)[~row_neginf])
    finally:
        M._TOP2_IMPL = orig


def test_match_consecutive_pipelined_equals_serial():
    """The software-pipelined match_consecutive (batch k+1 dispatched
    before batch k is fetched) returns exactly the per-pair serial
    result, including ragged tails across batch boundaries."""
    from local_features_tpu.ops.matching import match_consecutive

    rng = np.random.default_rng(7)
    F, K, D = 11, 48, 128
    descs = rng.standard_normal((F, K, D)).astype(np.float32)
    descs /= np.linalg.norm(descs, axis=2, keepdims=True)
    valid = rng.random((F, K)) < 0.8

    got = match_consecutive(descs, valid, ratio=0.8, batch=4)
    assert len(got) == F - 1
    for p in range(F - 1):
        m = mutual_match(jnp.asarray(descs[p]), jnp.asarray(descs[p + 1]),
                         jnp.asarray(valid[p]), jnp.asarray(valid[p + 1]),
                         ratio=0.8)
        rows = np.flatnonzero(np.asarray(m.mask))
        want = np.stack([rows, np.asarray(m.indices)[rows]], axis=1)
        np.testing.assert_array_equal(got[p], want)
