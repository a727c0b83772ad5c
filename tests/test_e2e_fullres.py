"""Full-resolution real-image golden parity (slow).

Runs the complete detect -> orient -> describe pipeline on the vendored
sample images at FULL resolution and compares against the NumPy golden
oracle.  Tiny synthetic e2e tests (test_e2e.py) can hide border,
level-clamp, and capacity bugs; houses.jpg additionally overflows the
8000-blob capacity (22k+ candidates) so the hierarchical-top-k drop path
must keep exactly the strongest blobs to stay golden-equal.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from local_features_tpu.api import LocalFeatures
from local_features_tpu.golden.pipeline import GoldenParams, detect_and_extract
from local_features_tpu.utils.image import load_gray_rust

REPO = Path(__file__).resolve().parent.parent
TOP_N = 2000


def _compare(img_name: str) -> None:
    img = load_gray_rust(str(REPO / "sample_data" / img_name))
    g = detect_and_extract(img, GoldenParams(n_scales=5), top_n=TOP_N)
    lf = LocalFeatures(max_features=3000, max_blobs=8000, n_scales=5)
    r = lf.detect_top_n(img, TOP_N, 0.0)

    assert len(r) == len(g.x) > 100, (len(r), len(g.x))

    # order-free row matching: nearest golden row in (x, y, angle)
    jx = np.stack([r.x, r.y, 0.01 * r.angle], axis=1).astype(np.float64)
    gx = np.stack([g.x, g.y, 0.01 * g.angle], axis=1).astype(np.float64)
    used = np.zeros(len(gx), bool)
    order = np.argsort(r.response)[::-1]  # strongest first for greedy
    pairs = np.empty(len(jx), np.int64)
    for i in order:
        d = np.abs(gx - jx[i]).sum(axis=1)
        d[used] = np.inf
        k = int(np.argmin(d))
        assert d[k] < 0.1, (img_name, i, d[k])
        used[k] = True
        pairs[i] = k

    k = pairs
    np.testing.assert_allclose(r.size, g.size[k], rtol=1e-3)
    np.testing.assert_allclose(r.response, g.response[k], atol=1e-4)
    cos = np.einsum("ij,ij->i", r.descriptors, g.descriptors[k])
    assert cos.min() > 0.999, (img_name, float(cos.min()))


@pytest.mark.slow
def test_fullres_bird_matches_golden():
    _compare("bird.jpg")


@pytest.mark.slow
def test_fullres_houses_matches_golden():
    _compare("houses.jpg")
