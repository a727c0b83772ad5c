"""End-to-end golden parity: full detect -> orient -> describe pipeline."""

import numpy as np
import jax.numpy as jnp

from local_features_tpu import golden
from local_features_tpu.api import LocalFeatures
from local_features_tpu.golden.pipeline import GoldenParams


def _match_rows(j, g, keys=("x", "y", "size", "angle")):
    """Match keypoint rows between two result sets by (x, y, angle)."""
    used = set()
    pairs = []
    for i in range(len(j["x"])):
        best, best_d = None, 1e9
        for k in range(len(g.x)):
            if k in used:
                continue
            d = (abs(j["x"][i] - g.x[k]) + abs(j["y"][i] - g.y[k])
                 + 0.01 * abs(j["angle"][i] - g.angle[k]))
            if d < best_d:
                best, best_d = k, d
        assert best is not None and best_d < 0.1, (i, best_d)
        used.add(best)
        pairs.append((i, best))
    return pairs


def test_e2e_matches_golden(test_image):
    g = golden.detect_and_extract(test_image, GoldenParams(), top_n=None)

    lf = LocalFeatures(n_scales=4, max_features=512, max_blobs=1024)
    r = lf.detect(test_image)

    assert len(r) == len(g.x) > 3
    j = {"x": r.x, "y": r.y, "size": r.size, "angle": r.angle}
    pairs = _match_rows(j, g)
    for i, k in pairs:
        np.testing.assert_allclose(r.size[i], g.size[k], rtol=1e-3)
        np.testing.assert_allclose(r.response[i], g.response[k], atol=1e-4)
        # descriptor cosine similarity (tolerates tiny patch-sample drift)
        cos = float(r.descriptors[i] @ g.descriptors[k])
        assert cos > 0.999, (i, k, cos)
    # unit descriptors
    np.testing.assert_allclose(
        np.linalg.norm(r.descriptors, axis=1), 1.0, atol=1e-5
    )


def test_top_n(test_image):
    lf = LocalFeatures(n_scales=4, max_features=512, max_blobs=1024)
    r_all = lf.detect(test_image)
    n = max(2, len(r_all) // 2)
    r_top = lf.detect_top_n(test_image, n)
    assert len(r_top) >= n  # multi-orientation can exceed n blobs
    # top-n keeps the strongest responses
    kept = np.unique(r_top.response)
    all_resp = np.sort(np.unique(r_all.response))[::-1]
    np.testing.assert_allclose(np.sort(kept)[::-1], all_resp[: len(kept)],
                               atol=1e-6)


def test_min_size(test_image):
    lf = LocalFeatures(n_scales=4, max_features=512, max_blobs=1024)
    r = lf.detect_top_n(test_image, 512, min_size=3.0)
    if len(r):
        assert (r.size >= 3.0).all()
