"""Cumulative-prefix timing of the XLA-fallback front-end path.

Each measurement jits a prefix of the pipeline and reduces the output to
a scalar so nothing can be dead-code-eliminated; stage cost = difference
between successive prefixes.  NOTE: successive prefixes share work, but
an unused intermediate (e.g. detect in a pyramid-only prefix) is DCE'd —
read deltas against the dependency structure, not the printed order.

Timing is dependency-chained (each iteration's scalar feeds the next
input; one host fetch at the end): `block_until_ready` loops do NOT
reliably fence on the tunneled axon platform and can report memoized
~0 ms times (see bench.py docstring).  The Pallas production path is
profiled by scripts/profile_pallas.py; this script times the exact-XLA
fallback (sampler="xla", fast=False).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def bench(fn, x, iters=5):
    import jax
    import jax.numpy as jnp

    out = fn(x)
    _ = np.asarray(jnp.sum(out))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = np.asarray(jnp.sum(x))  # single fetch fences the chain
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    import local_features_tpu.ops.scale_space as ss
    from local_features_tpu.ops.descriptor import (
        mkd_descriptors,
        patches_mag_angle,
        raw_mkd_descriptors,
        sample_patches,
    )
    from local_features_tpu.ops.detect import detect_blobs, dense_candidates
    from local_features_tpu.ops.frontend import FrontendConfig, _truncate_blobs
    from local_features_tpu.ops.orientation import keypoints_from_blobs
    from local_features_tpu.ops.pyramid import patch_pyramid
    from local_features_tpu.pca import load_pca

    B = 8
    H, W = 480, 640
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = np.sin(xx / 7.0) * np.cos(yy / 9.0)
    imgs = jnp.asarray(np.stack([
        0.5 + 0.25 * base + 0.1 * rng.standard_normal((H, W))
        for _ in range(B)]).astype(np.float32))

    cfg = FrontendConfig(n_scales=4, max_blobs=8000, max_keypoints=2000,
                         max_filtered=2000)
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)

    def pipeline(imgs, upto):
        def one(img):
            coarse = ss.scale_space(img, cfg.n_scales)
            if upto == "scale":
                return jnp.sum(coarse)
            fine = ss.fine_volume(coarse)
            if upto == "fine":
                return jnp.sum(fine)
            if upto == "dense":
                valid, x, y, size, contrast = dense_candidates(fine)
                return jnp.sum(contrast * valid)
            blobs = detect_blobs(fine, cfg.max_blobs, 0.0)
            if upto == "detect":
                return jnp.sum(blobs.contrast)
            filt = _truncate_blobs(blobs, cfg.max_filtered, 2000)
            kps = keypoints_from_blobs(coarse, filt, cfg.max_keypoints)
            if upto == "orient":
                return jnp.sum(kps.angle)
            pyr = patch_pyramid(coarse)
            if upto == "pyramid":
                return jnp.sum(pyr.flat)
            patches = sample_patches(pyr, kps.x, kps.y, kps.size, kps.angle,
                                     kps.valid, 24.0)
            if upto == "sample":
                return jnp.sum(patches)
            if upto == "magangle":
                m, a = patches_mag_angle(patches)
                return jnp.sum(m) + jnp.sum(a)
            if upto == "raw":
                return jnp.sum(raw_mkd_descriptors(patches))
            desc = mkd_descriptors(patches, mean, proj, kps.valid)
            return jnp.sum(desc)

        return jnp.sum(jax.vmap(one)(imgs))

    prev = 0.0
    for stage in ["scale", "fine", "dense", "detect", "orient", "pyramid",
                  "sample", "magangle", "raw", "full"]:
        # chain: feed the prefix's scalar back into the images so the
        # iterations serialize on device
        f = jax.jit(lambda im, s=stage: im + 1e-20 * pipeline(im, s))
        dt = bench(f, imgs)
        print(f"{stage:10s} cum {dt*1e3:8.2f} ms   delta {(dt-prev)*1e3:8.2f} ms"
              f"   ({B/dt:6.1f} fps)")
        prev = dt


if __name__ == "__main__":
    main()
