"""Generate the BASELINE config-1 match-set artifact (bird.jpg x houses.jpg).

Reproduces the reference's match_images run end-to-end at FULL resolution
with the reference example's exact parameters
(examples/match_images/src/main.rs:63-79,119):

    n_scales=5, max_features=3000, max_blobs=8000, top_n=2000,
    min_size=0.0, one-directional 2-NN dot-product matching with
    Lowe acceptance  best * 0.8 > second.

Grayscale conversion follows the Rust image crate exactly
(utils/image.py:load_gray_rust).  Runs on CPU (deterministic, exact f32,
no TPU contention) — the front-end semantics are backend-identical and
Pallas-vs-XLA parity is checked separately on silicon
(scripts/verify_pallas_tpu.py).

Writes artifacts/match_bird_houses.json: keypoint sets (rounded), drop
counters, the accepted match set with coordinates, and input image
hashes.  tests/test_match_artifact.py (slow) regenerates and asserts
stability against the committed artifact.

Usage:  LF_PLATFORM=cpu python scripts/make_match_artifact.py
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from local_features_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env(default="cpu")

import jax.numpy as jnp  # noqa: E402

from local_features_tpu import LocalFeatures  # noqa: E402
from local_features_tpu.ops.matching import match_descriptors  # noqa: E402
from local_features_tpu.utils.image import load_gray_rust  # noqa: E402

# Reference match_images example parameters (main.rs:63-79)
N_SCALES = 5
MAX_FEATURES = 3000
MAX_BLOBS = 8000
TOP_N = 2000
MIN_SIZE = 0.0
RATIO = 0.8

OUT = REPO / "artifacts" / "match_bird_houses.json"


def detect(lf_cache: dict, path: Path) -> dict:
    gray = load_gray_rust(str(path))
    H, W = gray.shape
    # one engine per image shape (jit cache is per-shape anyway)
    lf = lf_cache.setdefault(
        (H, W), LocalFeatures(max_features=MAX_FEATURES, max_blobs=MAX_BLOBS,
                              n_scales=N_SCALES))
    t0 = time.perf_counter()
    res = lf.detect_top_n(gray, TOP_N, MIN_SIZE)
    dt = time.perf_counter() - t0
    print(f"{path.name}: {len(res)} keypoints, "
          f"dropped_blobs={res.dropped_blobs} "
          f"dropped_features={res.dropped_features} ({dt:.1f}s)")
    return {
        "image": path.name,
        "sha256": hashlib.sha256(path.read_bytes()).hexdigest(),
        "width": int(W),
        "height": int(H),
        "n_keypoints": len(res),
        "dropped_blobs": int(res.dropped_blobs),
        "dropped_features": int(res.dropped_features),
        "keypoints": [
            [round(float(x), 2), round(float(y), 2),
             round(float(s), 3), round(float(a), 4)]
            for x, y, s, a in zip(res.x, res.y, res.size, res.angle)
        ],
        "_res": res,
    }


def match_set(fa, fb) -> dict:
    m = match_descriptors(jnp.asarray(fa["_res"].descriptors),
                          jnp.asarray(fb["_res"].descriptors), ratio=RATIO)
    idx = np.asarray(m.indices)
    ok = np.asarray(m.mask)
    sc = np.asarray(m.scores)
    ra, rb = fa["_res"], fb["_res"]
    pairs = []
    for i in np.flatnonzero(ok):
        j = int(idx[i])
        pairs.append({
            "a": int(i), "b": j,
            "xa": round(float(ra.x[i]), 2), "ya": round(float(ra.y[i]), 2),
            "xb": round(float(rb.x[j]), 2), "yb": round(float(rb.y[j]), 2),
            "score": round(float(sc[i]), 5),
        })
    print(f"{fa['image']} -> {fb['image']}: {len(pairs)} matches")
    return {"n_matches": len(pairs), "pairs": pairs}


def main() -> int:
    lf_cache: dict = {}
    bird = detect(lf_cache, REPO / "sample_data" / "bird.jpg")
    houses = detect(lf_cache, REPO / "sample_data" / "houses.jpg")

    artifact = {
        "config": {
            "n_scales": N_SCALES, "max_features": MAX_FEATURES,
            "max_blobs": MAX_BLOBS, "top_n": TOP_N, "min_size": MIN_SIZE,
            "ratio": RATIO, "direction": "a_to_b",
            "grayscale": "image-crate-0.25 integer Rec.709, truncating div",
            "backend": "cpu (exact f32 XLA path)",
        },
        "images": [
            {k: v for k, v in f.items() if k != "_res"}
            for f in (bird, houses)
        ],
        # BASELINE config 1: the named cross-scene pair.  Both directions
        # recorded; the reference example logs 1->2 (main.rs:119).
        "bird_to_houses": match_set(bird, houses),
        "houses_to_bird": match_set(houses, bird),
    }
    OUT.parent.mkdir(exist_ok=True)
    OUT.write_text(json.dumps(artifact, indent=1) + "\n")
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
