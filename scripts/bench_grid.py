"""Criterion-equivalent benchmark grid (reference: local_features/benches/
bench.rs:41-112).

The reference sweeps two grids over `detect_top_n` wall time:
  (a) image scale in {0.25, 0.5, 0.75, 1.0} x n_scales in {3, 5} at
      3000 features (bench.rs:76-90);
  (b) full-res x max_features in {100, 500, 1000, 2000} x n_scales in
      {3, 5} (bench.rs:92-112).

This harness reproduces both sweeps on TPU with the dependency-chained
timing methodology from bench.py (feed each output back as the next
input; one host fetch at the end) so tunnel latency and async dispatch
cannot distort per-config numbers.  The measured content is the SAME
image the reference measures: `sample_data/houses.jpg` (vendored,
byte-identical), grayscaled and Lanczos-resized per scale factor
exactly as `open_image` does (bench.rs:9-20) — native 4096x3072, so
scale=1.0 really is 4096x3072.  `--synthetic` switches back to the
640x480-based sine+noise texture (the pre-round-4 behavior, kept for
history comparability).

Usage:  python scripts/bench_grid.py [--iters N] [--quick] [--synthetic]
Prints one JSON line per config: {"config": ..., "ms_per_frame": ...,
"frames_per_s": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


_HOUSES = os.path.join(os.path.dirname(__file__), "..", "sample_data",
                       "houses.jpg")


def make_image(H, W):
    import numpy as np
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
    return (0.5 + 0.25 * base
            + 0.1 * rng.standard_normal((H, W))).astype(np.float32)


def open_houses(scale):
    """houses.jpg grayscaled + Lanczos-resized by `scale`, f32 in [0,1]
    — the same preparation as the reference's open_image
    (bench.rs:9-20: image::open().grayscale() + Lanczos3 resize)."""
    import numpy as np
    from PIL import Image

    img = Image.open(_HOUSES).convert("L")
    w = int(round(img.width * scale))
    h = int(round(img.height * scale))
    img = img.resize((w, h), Image.LANCZOS)
    return np.asarray(img, dtype=np.float32) / 255.0


def time_config(img, n_feats, n_scales, iters, samples=1):
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import FrontendConfig, detect_extract
    from local_features_tpu.pca import load_pca

    sampler = "pallas" if jax.default_backend() != "cpu" else "xla"
    # max_blobs = 5 * max_features mirrors the reference's bench setup
    # (bench.rs:61: max_blobs: 5 * max_features)
    cfg = FrontendConfig(n_scales=n_scales, max_blobs=5 * n_feats,
                         max_keypoints=n_feats, max_filtered=n_feats,
                         sampler=sampler)
    mean, proj = load_pca().attenuated
    mean = jnp.asarray(mean)
    proj = jnp.asarray(proj)

    @jax.jit
    def step(img):
        res = detect_extract(img, cfg, mean, proj, n_feats, 0.0, 24.0)
        feedback = 1e-12 * jnp.sum(res.descriptors)
        return img + feedback

    import numpy as np
    img = jnp.asarray(img)
    x = step(img)
    _ = np.asarray(jnp.sum(x))  # compile + warm

    # criterion-style statistics: `samples` independent dependency-
    # chained runs of `iters` steps each (the reference takes 50
    # criterion samples per config, bench.rs:41-74; each sample here
    # amortizes tunnel latency over the chained iters)
    per_sample = []
    for _ in range(samples):
        t0 = time.perf_counter()
        x = img
        for _ in range(iters):
            x = step(x)
        _ = np.asarray(jnp.sum(x))
        per_sample.append((time.perf_counter() - t0) / iters)
    return per_sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--samples", type=int, default=5,
                    help="independent timing samples per config "
                         "(criterion runs 50; each sample here is an "
                         "`iters`-step dependency chain)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny subset / few iters (CI smoke)")
    ap.add_argument("--synthetic", action="store_true",
                    help="640x480-based sine+noise texture instead of "
                         "houses.jpg (pre-round-4 behavior)")
    ap.add_argument("--out", default=None,
                    help="write the result list as JSON to this path")
    args = ap.parse_args()

    if args.quick:
        scales = [0.25] if not args.synthetic else [0.5]
        feats = [500]
        nscales_list = [3]
        iters = 2
        samples = 2
    else:
        scales = [0.25, 0.5, 0.75, 1.0]
        feats = [100, 500, 1000, 2000]
        nscales_list = [3, 5]
        iters = args.iters
        samples = args.samples

    if args.synthetic:
        BH, BW = 480, 640
        load = lambda s: make_image(int(BH * s), int(BW * s))
        src = f"synthetic{BH}x{BW}"
    else:
        load = open_houses
        src = "houses.jpg"

    def _timed(img, feats_n, ns):
        # the remote TPU compiler occasionally drops a connection
        # mid-compile ("response body closed"); retry once before
        # giving up on the whole grid
        try:
            return time_config(img, feats_n, ns, iters, samples)
        except Exception as e:     # noqa: BLE001 - transport flake
            print(json.dumps({"retry": str(e)[:120]}), flush=True)
            return time_config(img, feats_n, ns, iters, samples)

    def _stats(per_sample_s, config):
        import numpy as np
        ms = np.asarray(per_sample_s) * 1e3
        rec = {"config": config,
               "ms_per_frame": round(float(ms.mean()), 3),
               "frames_per_s": round(float(1e3 / ms.mean()), 2),
               "n_samples": len(ms),
               "iters_per_sample": iters,
               "ms_min": round(float(ms.min()), 3),
               "ms_max": round(float(ms.max()), 3),
               "ms_std": round(float(ms.std(ddof=1)) if len(ms) > 1
                               else 0.0, 3)}
        print(json.dumps(rec), flush=True)
        return rec

    results = []
    # sweep (a): image scale at 3000 (or max) features
    top = 3000 if not args.quick else 500
    for ns in nscales_list:
        for s in scales:
            img = load(s)
            H, W = img.shape
            ts = _timed(img, top, ns)
            results.append(_stats(
                ts, f"{src},scale={s}({H}x{W}),feats={top},n_scales={ns}"))
    # sweep (b): full-res, feature-count sweep (quick mode stays at the
    # small sweep-(a) scale so the smoke run finishes in minutes)
    bscale = scales[0] if args.quick else 1.0
    img = load(bscale)
    H, W = img.shape
    for ns in nscales_list:
        for nf in feats:
            ts = _timed(img, nf, ns)
            results.append(_stats(
                ts, f"{src},fullres*{bscale}({H}x{W}),feats={nf},"
                    f"n_scales={ns}"))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
    return results


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
