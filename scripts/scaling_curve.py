"""Single-chip batch-size scaling curve + sharded-vs-unsharded overhead.

Two measurements this environment CAN produce toward the config-5
scaling story (BASELINE.md config 5 asks for frames/s at 1 chip / 1
host / N hosts; only one real chip exists here):

1. on the real TPU: bench.py's exact workload (640x480, 2k keypoints,
   detect+describe+match) at batch sizes B in {1, 2, 4, 8, 16} with the
   dependency-chained timing methodology — how much per-dispatch
   overhead the one-program-per-batch design amortizes;
2. on an 8-virtual-device CPU mesh: the SAME jitted front-end step run
   unsharded on one device vs sharded over the mesh
   (parallel/data_parallel.py:sharded_detect_extract) — the sharding
   machinery's compile-level overhead, isolated from ICI (which this
   host cannot measure).

Prints one JSON line per point.  Usage:
  python scripts/scaling_curve.py             # TPU batch curve
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_curve.py --sharded   # CPU mesh overhead
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_batch(B, H, W):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
    return np.stack([
        0.5 + 0.25 * base + 0.1 * rng.standard_normal((H, W))
        for _ in range(B)
    ]).astype(np.float32)


def batch_curve(batches, iters):
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import FrontendConfig
    from local_features_tpu.ops.matching import match_descriptors
    from local_features_tpu.parallel import batched_detect_extract
    from local_features_tpu.pca import load_pca

    H, W = 480, 640
    sampler = "pallas" if jax.default_backend() != "cpu" else "xla"
    cfg = FrontendConfig(n_scales=4, max_blobs=8000, max_keypoints=2000,
                         max_filtered=2000, sampler=sampler)
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)

    @jax.jit
    def step(imgs):
        res = batched_detect_extract(imgs, cfg, mean, proj, 2000, 0.0, 24.0)
        d = res.descriptors
        m = jax.vmap(match_descriptors)(
            d, jnp.roll(d, -1, axis=0), res.valid,
            jnp.roll(res.valid, -1, axis=0))
        return imgs + 1e-12 * (jnp.sum(d) + jnp.sum(m.scores * m.mask))

    for B in batches:
        imgs = jnp.asarray(make_batch(B, H, W))
        x = step(imgs)
        _ = np.asarray(jnp.sum(x))          # compile + warm
        t0 = time.perf_counter()
        x = imgs
        for _ in range(iters):
            x = step(x)
        _ = np.asarray(jnp.sum(x))
        dt = time.perf_counter() - t0
        fps = B * iters / dt
        print(json.dumps({"mode": "batch_curve", "batch": B,
                          "frames_per_s": round(fps, 2),
                          "ms_per_frame": round(1e3 * dt / (B * iters), 3)}),
              flush=True)


def sharded_overhead(iters):
    """Unsharded (1 device) vs mesh-sharded front-end, CPU 8-dev mesh."""
    from local_features_tpu.utils.platform import apply_platform_env
    apply_platform_env(default="cpu")
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import FrontendConfig
    from local_features_tpu.parallel import batched_detect_extract
    from local_features_tpu.parallel.data_parallel import (
        make_mesh, sharded_detect_extract)
    from local_features_tpu.pca import load_pca

    n_dev = len(jax.devices())
    H, W = 240, 320
    B = n_dev
    cfg = FrontendConfig(n_scales=4, max_blobs=2000, max_keypoints=500,
                         max_filtered=500, sampler="xla")
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)
    imgs = jnp.asarray(make_batch(B, H, W))

    @jax.jit
    def _plain(x):
        r = batched_detect_extract(x, cfg, mean, proj, 500, 0.0, 24.0)
        return x + 1e-12 * jnp.sum(r.descriptors)

    # both variants fetch once per call: on CPU there is no tunnel to
    # amortize, and a symmetric methodology is what the comparison needs
    def plain(x):
        return x + 1e-12 * float(np.asarray(jnp.sum(_plain(x))))

    mesh = make_mesh()
    sharded_run = sharded_detect_extract(mesh, cfg)

    def sharded(x):
        r = sharded_run(x, mean, proj, 500, 0.0, 24.0)
        return x + 1e-12 * np.asarray(jnp.sum(r.descriptors))

    for name, fn in [("unsharded_1dev", plain),
                     (f"sharded_{n_dev}dev", sharded)]:
        x = fn(imgs)
        _ = np.asarray(jnp.sum(x))
        t0 = time.perf_counter()
        x = imgs
        for _ in range(iters):
            x = fn(x)
        _ = np.asarray(jnp.sum(x))
        dt = time.perf_counter() - t0
        print(json.dumps({"mode": name, "batch": B,
                          "frames_per_s": round(B * iters / dt, 2),
                          "ms_per_frame": round(1e3 * dt / (B * iters), 3)}),
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sharded", action="store_true",
                    help="CPU-mesh sharded-vs-unsharded overhead instead "
                         "of the TPU batch curve")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batches", type=int, nargs="*",
                    default=[1, 2, 4, 8, 16])
    args = ap.parse_args()
    if args.sharded:
        sharded_overhead(args.iters)
    else:
        batch_curve(args.batches, args.iters)


if __name__ == "__main__":
    main()
