"""Benchmark: batched single-chip front-end (detect + describe + match).

BASELINE.md config 2: 640x480 frames, 2000 keypoints/frame, MKD
descriptors + matching.  Prints ONE JSON line with frames/s/chip.

The reference publishes no numbers (BASELINE.md); vs_baseline is measured
against the north-star 500 frames/s aggregate on v5p-16 (8 chips), i.e.
62.5 frames/s/chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import FrontendConfig
    from local_features_tpu.ops.matching import match_descriptors
    from local_features_tpu.parallel import batched_detect_extract
    from local_features_tpu.pca import load_pca

    B = int(__import__("os").environ.get("BENCH_BATCH", 8))
    H, W = 480, 640
    cfg = FrontendConfig(n_scales=4, max_blobs=8000, max_keypoints=2000,
                         max_filtered=2000)
    mean, proj = load_pca().attenuated
    mean = jnp.asarray(mean)
    proj = jnp.asarray(proj)

    @jax.jit
    def step(imgs):
        res = batched_detect_extract(imgs, cfg, mean, proj, 2000, 0.0, 24.0)
        d = res.descriptors
        m = jax.vmap(match_descriptors)(
            d, jnp.roll(d, -1, axis=0), res.valid, jnp.roll(res.valid, -1, axis=0)
        )
        return res.n_keypoints, res.x, res.y, m.indices

    rng = np.random.default_rng(0)
    # synthetic frames with texture at multiple scales
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
    imgs = np.stack([
        0.5 + 0.25 * base + 0.1 * rng.standard_normal((H, W))
        for _ in range(B)
    ]).astype(np.float32)
    imgs = jnp.asarray(imgs)

    # warmup / compile
    out = step(imgs)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(imgs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = B * iters / dt
    print(json.dumps({
        "metric": "frontend_frames_per_s_per_chip_640x480_2k",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 62.5, 3),
    }))


if __name__ == "__main__":
    main()
