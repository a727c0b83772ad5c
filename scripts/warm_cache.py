"""Warm the persistent XLA/Mosaic compilation cache for the shapes the
driver touches (run after ANY Pallas kernel or front-end graph edit).

Cold Mosaic compiles through the remote compiler are minutes per kernel
variant; the driver's end-of-round `bench.py` run pays them unless the
bench shape is already in the persistent cache.  This script compiles
(and runs once) exactly:

1. the bench.py step (batched 8x 480x640, 2000 kp, Pallas sampler +
   windows + matching), and
2. the `__graft_entry__.entry()` single-image program,

then reports wall time per compile.  Usage:  python scripts/warm_cache.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import FrontendConfig
    from local_features_tpu.ops.matching import match_descriptors
    from local_features_tpu.parallel import batched_detect_extract
    from local_features_tpu.pca import load_pca

    cfg = FrontendConfig(n_scales=4, max_blobs=8000, max_keypoints=2000,
                         max_filtered=2000, sampler="pallas")
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)

    @jax.jit
    def step(imgs):
        res = batched_detect_extract(imgs, cfg, mean, proj, 2000, 0.0, 24.0)
        d = res.descriptors
        m = jax.vmap(match_descriptors)(
            d, jnp.roll(d, -1, 0), res.valid, jnp.roll(res.valid, -1, 0))
        return imgs + 1e-12 * (jnp.sum(d) + jnp.sum(m.scores * m.mask))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((8, 480, 640), dtype=np.float32))
    t0 = time.perf_counter()
    _ = np.asarray(jnp.sum(step(imgs)))
    print(f"bench step warmed in {time.perf_counter() - t0:.1f}s")

    import __graft_entry__ as g

    fn, args = g.entry()
    t0 = time.perf_counter()
    jax.block_until_ready(jax.jit(fn)(*args))
    print(f"graft entry warmed in {time.perf_counter() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
