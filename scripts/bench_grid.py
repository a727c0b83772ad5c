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
cannot distort per-config numbers.  Base resolution 640x480 stands in
for houses.jpg (sample images are not vendored); content is the same
synthetic texture as bench.py.

Usage:  python scripts/bench_grid.py [--iters N] [--quick]
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


def make_image(H, W):
    import numpy as np
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
    return (0.5 + 0.25 * base
            + 0.1 * rng.standard_normal((H, W))).astype(np.float32)


def time_config(H, W, n_feats, n_scales, iters):
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import FrontendConfig, detect_extract
    from local_features_tpu.pca import load_pca

    sampler = "pallas" if jax.default_backend() != "cpu" else "xla"
    cfg = FrontendConfig(n_scales=n_scales, max_blobs=8000,
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
    img = jnp.asarray(make_image(H, W))
    x = step(img)
    _ = np.asarray(jnp.sum(x))  # compile + warm

    t0 = time.perf_counter()
    x = img
    for _ in range(iters):
        x = step(x)
    _ = np.asarray(jnp.sum(x))
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--quick", action="store_true",
                    help="tiny subset / few iters (CI smoke)")
    args = ap.parse_args()

    BH, BW = 480, 640
    if args.quick:
        scales = [0.5]
        feats = [500]
        nscales_list = [3]
        iters = 2
    else:
        scales = [0.25, 0.5, 0.75, 1.0]
        feats = [100, 500, 1000, 2000]
        nscales_list = [3, 5]
        iters = args.iters

    results = []
    # sweep (a): image scale at 3000 (or max) features
    top = 3000 if not args.quick else 500
    for ns in nscales_list:
        for s in scales:
            H, W = int(BH * s), int(BW * s)
            ms = time_config(H, W, top, ns, iters) * 1e3
            rec = {"config": f"scale={s}x{BH}x{BW},feats={top},n_scales={ns}",
                   "ms_per_frame": round(ms, 3),
                   "frames_per_s": round(1e3 / ms, 2)}
            print(json.dumps(rec), flush=True)
            results.append(rec)
    # sweep (b): full-res, feature-count sweep
    for ns in nscales_list:
        for nf in feats:
            ms = time_config(BH, BW, nf, ns, iters) * 1e3
            rec = {"config": f"fullres,feats={nf},n_scales={ns}",
                   "ms_per_frame": round(ms, 3),
                   "frames_per_s": round(1e3 / ms, 2)}
            print(json.dumps(rec), flush=True)
            results.append(rec)
    return results


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
