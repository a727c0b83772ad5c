"""Match local features between two images and render the matches.

TPU-native equivalent of the reference's match_images example
(examples/match_images/src/main.rs): load two images, detect the top-N
keypoints + MKD descriptors on each, 2-NN ratio-test matching (here a
single MXU matmul instead of the reference's O(N^2) CPU loop), draw
circles and match lines, save a side-by-side PNG.

Usage:
    python examples/match_images.py IMG_A IMG_B [--out matches.png]
        [--n 2000] [--min-size 0.0] [--ratio 0.8] [--mutual]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402
from PIL import Image, ImageDraw  # noqa: E402

from local_features_tpu import LocalFeatures  # noqa: E402
from local_features_tpu.utils.platform import apply_platform_env  # noqa: E402
from local_features_tpu.ops.matching import match_descriptors, mutual_match  # noqa: E402


def load_gray(path: str) -> tuple[np.ndarray, np.ndarray]:
    img = Image.open(path).convert("RGB")
    rgb = np.asarray(img, dtype=np.uint8)
    gray = np.asarray(img.convert("L"), dtype=np.float32) / 255.0
    return gray, rgb


def main() -> int:
    apply_platform_env()  # LF_PLATFORM=cpu forces CPU
    ap = argparse.ArgumentParser()
    ap.add_argument("image_a")
    ap.add_argument("image_b")
    ap.add_argument("--out", default="matches.png")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--min-size", type=float, default=0.0)
    ap.add_argument("--ratio", type=float, default=0.8)
    ap.add_argument("--mutual", action="store_true")
    args = ap.parse_args()

    gray_a, rgb_a = load_gray(args.image_a)
    gray_b, rgb_b = load_gray(args.image_b)

    lf = LocalFeatures(max_features=args.n, max_blobs=4 * args.n)
    t0 = time.perf_counter()
    fa = lf.detect_top_n(gray_a, args.n, args.min_size)
    fb = lf.detect_top_n(gray_b, args.n, args.min_size)
    print(f"detect: {len(fa)} / {len(fb)} keypoints "
          f"in {time.perf_counter() - t0:.3f}s (includes compile)")

    matcher = mutual_match if args.mutual else match_descriptors
    m = matcher(jnp.asarray(fa.descriptors), jnp.asarray(fb.descriptors),
                ratio=args.ratio)
    idx = np.asarray(m.indices)
    ok = np.asarray(m.mask)
    print(f"matches: {int(ok.sum())}")

    # side-by-side canvas
    ha, wa = rgb_a.shape[:2]
    hb, wb = rgb_b.shape[:2]
    canvas = np.zeros((max(ha, hb), wa + wb, 3), np.uint8)
    canvas[:ha, :wa] = rgb_a
    canvas[:hb, wa:wa + wb] = rgb_b
    im = Image.fromarray(canvas)
    draw = ImageDraw.Draw(im)

    for i in range(len(fa)):
        r = max(fa.size[i], 2.0)
        draw.ellipse([fa.x[i] - r, fa.y[i] - r, fa.x[i] + r, fa.y[i] + r],
                     outline=(90, 200, 90))
    for j in range(len(fb)):
        r = max(fb.size[j], 2.0)
        draw.ellipse([wa + fb.x[j] - r, fb.y[j] - r,
                      wa + fb.x[j] + r, fb.y[j] + r], outline=(90, 200, 90))
    for i in np.flatnonzero(ok):
        j = idx[i]
        draw.line([fa.x[i], fa.y[i], wa + fb.x[j], fb.y[j]],
                  fill=(250, 180, 40), width=1)

    im.save(args.out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
