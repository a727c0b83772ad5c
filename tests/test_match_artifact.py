"""Stability of the committed BASELINE config-1 match-set artifact.

Regenerates the full-resolution bird.jpg x houses.jpg run (reference
match_images parameters, examples/match_images/src/main.rs:63-79) and
asserts the result matches artifacts/match_bird_houses.json.  Guards the
whole front-end + matcher against silent drift at real image scale —
tiny-image e2e tests can hide border/clamp/capacity bugs.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
ARTIFACT = REPO / "artifacts" / "match_bird_houses.json"


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "make_match_artifact", REPO / "scripts" / "make_match_artifact.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_match_artifact_stable():
    committed = json.loads(ARTIFACT.read_text())
    gen = _load_script()

    lf_cache = {}
    bird = gen.detect(lf_cache, REPO / "sample_data" / "bird.jpg")
    houses = gen.detect(lf_cache, REPO / "sample_data" / "houses.jpg")

    for got, want in zip((bird, houses), committed["images"]):
        assert got["sha256"] == want["sha256"], "input image changed"
        # keypoint COUNTS pin detection; allow none-or-tiny drift
        assert got["n_keypoints"] == want["n_keypoints"]
        assert got["dropped_blobs"] == want["dropped_blobs"]
        kp_got = np.asarray(got["keypoints"], np.float64)
        kp_want = np.asarray(want["keypoints"], np.float64)
        assert kp_got.shape == kp_want.shape
        # identical ordering + coords (rounded to artifact precision)
        np.testing.assert_allclose(kp_got, kp_want, atol=2e-2)

    for key, fa, fb in (("bird_to_houses", bird, houses),
                        ("houses_to_bird", houses, bird)):
        got = gen.match_set(fa, fb)
        want = committed[key]
        got_pairs = {(p["a"], p["b"]) for p in got["pairs"]}
        want_pairs = {(p["a"], p["b"]) for p in want["pairs"]}
        # Cross-scene ratio matches sit near the acceptance boundary;
        # tolerate <=2% churn against the committed set.
        n = max(len(want_pairs), 1)
        overlap = len(got_pairs & want_pairs) / n
        assert overlap >= 0.98, (key, overlap)
        assert abs(len(got_pairs) - len(want_pairs)) <= max(2, 0.02 * n)
