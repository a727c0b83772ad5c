"""Benchmark: batched single-chip front-end (detect + describe + match).

BASELINE.md config 2: 640x480 frames, 2000 keypoints/frame, MKD
descriptors + matching.  Prints ONE JSON line with frames/s/chip.

The reference publishes no benchmark numbers (BASELINE.md); vs_baseline
is measured against the north-star 500 frames/s aggregate on v5p-16
(8 chips), i.e. 62.5 frames/s/chip.

Timing is dependency-chained with a single host fetch at the end so the
remote-TPU round-trip latency (~30 ms on tunneled devices) is amortized
and asynchronous dispatch cannot fake the numbers.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import FrontendConfig
    from local_features_tpu.ops.matching import match_descriptors
    from local_features_tpu.parallel import batched_detect_extract
    from local_features_tpu.pca import load_pca

    B = int(os.environ.get("BENCH_BATCH", 8))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    H, W = 480, 640
    sampler = "pallas" if jax.default_backend() != "cpu" else "xla"
    cfg = FrontendConfig(n_scales=4, max_blobs=8000, max_keypoints=2000,
                         max_filtered=2000, sampler=sampler)
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
        # dependency-chain the images through the result so iterations
        # serialize on device
        feedback = 1e-12 * (jnp.sum(d) + jnp.sum(m.scores * m.mask))
        return imgs + feedback

    # LF_BENCH_IMAGE: measure on the real vendored image instead of the
    # sine+noise texture (the reference's criterion grid measures
    # houses.jpg, benches/bench.rs:7).  "1"/"houses" = sample_data/
    # houses.jpg; any other value = a path.  The batch is B shifted
    # 480x640 crops from a slightly-larger Lanczos resize, so frames
    # are distinct but all real texture.
    img_src = os.environ.get("LF_BENCH_IMAGE", "")
    if img_src:
        from PIL import Image
        if img_src in ("1", "houses"):
            img_src = os.path.join(os.path.dirname(__file__),
                                   "sample_data", "houses.jpg")
        pil = Image.open(img_src).convert("L")
        sy, sx = 32, 32  # per-frame crop shift
        bw, bh = W + sx * (B - 1), H + sy * (B - 1)
        full = np.asarray(pil.resize((bw, bh), Image.LANCZOS),
                          dtype=np.float32) / 255.0
        imgs = jnp.asarray(np.stack([
            full[i * sy:i * sy + H, i * sx:i * sx + W] for i in range(B)
        ]))
        metric_suffix = "_houses" if img_src.endswith("houses.jpg") else "_img"
    else:
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
                + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
        imgs = jnp.asarray(np.stack([
            0.5 + 0.25 * base + 0.1 * rng.standard_normal((H, W))
            for _ in range(B)
        ]).astype(np.float32))
        metric_suffix = ""

    # warmup / compile
    x = step(imgs)
    _ = np.asarray(jnp.sum(x))

    t0 = time.perf_counter()
    x = imgs
    for _ in range(iters):
        x = step(x)
    _ = np.asarray(jnp.sum(x))  # single fetch fences the whole chain
    dt = time.perf_counter() - t0

    fps = B * iters / dt
    print(json.dumps({
        "metric": "frontend_frames_per_s_per_chip_640x480_2k" + metric_suffix,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 62.5, 3),
    }))


if __name__ == "__main__":
    main()
