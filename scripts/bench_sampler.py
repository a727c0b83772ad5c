"""Micro-benchmark of the Pallas patch sampler at bench.py shapes.

Times sample_patches_pallas alone (vmapped B=8, K=2000, 640x480 mip
pyramid) with dependency-chained iterations, to evaluate kernel-variant
experiments (env: LF_SAMPLER_KB) without running the whole front-end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from local_features_tpu.pallas import sampling as S

    B = int(os.environ.get("BENCH_B", 8))
    K = int(os.environ.get("BENCH_K", 2000))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    H, W = 480, 640

    rng = np.random.default_rng(0)
    L = int(np.ceil(np.log2(min(H, W))))
    mips = []
    h, w = H, W
    img = rng.standard_normal((H, W)).astype(np.float32)
    for _ in range(L):
        mips.append(jnp.asarray(img[:h, :w]))
        h, w = max(1, h // 2), max(1, w // 2)
    canvas = S.build_canvas(mips)
    widths = jnp.asarray([m.shape[1] for m in mips], jnp.int32)
    heights = jnp.asarray([m.shape[0] for m in mips], jnp.int32)

    kx = jnp.asarray(rng.uniform(5, W - 5, (B, K)).astype(np.float32))
    ky = jnp.asarray(rng.uniform(5, H - 5, (B, K)).astype(np.float32))
    ksz = jnp.asarray(np.exp(rng.uniform(np.log(2.0), np.log(60.0),
                                         (B, K))).astype(np.float32))
    kang = jnp.asarray(rng.uniform(0, 360, (B, K)).astype(np.float32))
    kval = jnp.ones((B, K), bool)

    sample = jax.vmap(
        lambda x, y, s, a, v: S.sample_patches_pallas(
            canvas, widths, heights, x, y, s, a, v),
        in_axes=(0, 0, 0, 0, 0))

    @jax.jit
    def step(x):
        p = sample(x, ky, ksz, kang, kval)
        return x + 1e-20 * jnp.sum(p, axis=(1, 2, 3))[:, None]

    x = step(kx)
    _ = np.asarray(jnp.sum(x))

    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _ = np.asarray(jnp.sum(x))
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "kb": S.KB, "ms_per_batch": round(dt * 1e3, 2),
        "us_per_kp": round(dt / (B * K) * 1e6, 3),
    }))


if __name__ == "__main__":
    main()
