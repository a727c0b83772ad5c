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
    # measurement knob for the padded-capacity cost (CLAUDE.md capacity
    # diagnosis); the recorded bench always runs the default 2000
    kp_cap = int(os.environ.get("LF_BENCH_MAXKP", 2000))
    H, W = 480, 640
    sampler = "pallas" if jax.default_backend() != "cpu" else "xla"
    cfg = FrontendConfig(n_scales=4, max_blobs=8000, max_keypoints=kp_cap,
                         max_filtered=kp_cap, sampler=sampler)
    mean, proj = load_pca().attenuated
    mean = jnp.asarray(mean)
    proj = jnp.asarray(proj)

    @jax.jit
    def step(imgs):
        res = batched_detect_extract(imgs, cfg, mean, proj, kp_cap, 0.0, 24.0)
        d = res.descriptors
        m = jax.vmap(match_descriptors)(
            d, jnp.roll(d, -1, axis=0), res.valid, jnp.roll(res.valid, -1, axis=0)
        )
        # dependency-chain the images through the result so iterations
        # serialize on device
        feedback = 1e-12 * (jnp.sum(d) + jnp.sum(m.scores * m.mask))
        return imgs + feedback

    # Workloads.  The HEADLINE is the real vendored image the
    # reference's criterion grid measures (houses.jpg, benches/
    # bench.rs:7) — B shifted 480x640 crops from a slightly-larger
    # Lanczos resize, so frames are distinct but all real texture
    # (~1300 valid keypoints/frame vs the synthetic texture's ~730;
    # the per-item stages make the real image the harder, honest
    # number).  The synthetic sine+noise texture is measured too and
    # attached to the same JSON line for round-over-round history.
    # LF_BENCH_IMAGE overrides: "synth" = synthetic only (pre-round-5
    # behavior); a path = that image as the headline.
    def houses_imgs():
        from PIL import Image
        src = os.environ.get("LF_BENCH_IMAGE", "")
        if src in ("", "1", "houses"):
            src = os.path.join(os.path.dirname(__file__),
                               "sample_data", "houses.jpg")
        pil = Image.open(src).convert("L")
        sy, sx = 32, 32  # per-frame crop shift
        bw, bh = W + sx * (B - 1), H + sy * (B - 1)
        full = np.asarray(pil.resize((bw, bh), Image.LANCZOS),
                          dtype=np.float32) / 255.0
        return jnp.asarray(np.stack([
            full[i * sy:i * sy + H, i * sx:i * sx + W] for i in range(B)
        ]))

    def synth_imgs():
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
                + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
        return jnp.asarray(np.stack([
            0.5 + 0.25 * base + 0.1 * rng.standard_normal((H, W))
            for _ in range(B)
        ]).astype(np.float32))

    def timed(imgs):
        x = step(imgs)                  # warmup / compile
        _ = np.asarray(jnp.sum(x))
        t0 = time.perf_counter()
        x = imgs
        for _ in range(iters):
            x = step(x)
        _ = np.asarray(jnp.sum(x))      # single fetch fences the chain
        return B * iters / (time.perf_counter() - t0)

    if os.environ.get("LF_BENCH_IMAGE", "") == "synth":
        fps = timed(synth_imgs())
        print(json.dumps({
            "metric": "frontend_frames_per_s_per_chip_640x480_2k",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / 62.5, 3),
        }))
        return

    fps_synth = timed(synth_imgs())
    fps = timed(houses_imgs())
    print(json.dumps({
        "metric": "frontend_frames_per_s_per_chip_640x480_2k_houses",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 62.5, 3),
        "synthetic_texture_frames_per_s": round(fps_synth, 2),
    }))


if __name__ == "__main__":
    main()
