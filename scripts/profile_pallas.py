"""Cumulative-prefix timing of the REAL bench path (Pallas sampler +
Pallas orientation windows + bf16 fast MKD), vmapped B=8 at bench.py
shapes.  Stage cost = delta between successive prefixes.

Complements profile_stages.py (which times the exact-XLA fallback path).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import local_features_tpu.ops.scale_space as ss
    from local_features_tpu.ops.descriptor import mkd_descriptors
    from local_features_tpu.ops.detect import detect_blobs
    from local_features_tpu.ops.frontend import FrontendConfig, _truncate_blobs
    from local_features_tpu.ops.matching import match_descriptors
    from local_features_tpu.ops.orientation import keypoints_from_blobs
    from local_features_tpu.ops.pyramid import patch_pyramid_mips
    from local_features_tpu.pallas.sampling import (build_canvas,
                                                    sample_patches_pallas)
    from local_features_tpu.pca import load_pca

    B, H, W = 8, 480, 640
    iters = int(os.environ.get("BENCH_ITERS", 10))
    cfg = FrontendConfig(n_scales=4, max_blobs=8000, max_keypoints=2000,
                         max_filtered=2000, sampler="pallas")
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
    imgs = jnp.asarray(np.stack([
        0.5 + 0.25 * base + 0.1 * rng.standard_normal((H, W))
        for _ in range(B)]).astype(np.float32))

    def prefix(img, upto):
        coarse = ss.scale_space(img, cfg.n_scales)
        if upto == "scale":
            return jnp.sum(coarse)
        fine = ss.fine_volume(coarse)
        if upto == "fine":
            return jnp.sum(fine)
        if upto in ("dense", "topk"):
            # detect sub-stages (mirrors detect_blobs)
            from local_features_tpu.ops.detect import (dense_candidates,
                                                       hierarchical_top_k)
            dvalid, dx, dy, dsize, dcontrast = dense_candidates(fine)
            if upto == "dense":
                return (jnp.sum(dvalid) + jnp.sum(dcontrast)
                        + jnp.sum(jnp.where(dvalid, dx + dy + dsize, 0.0)))
            dscore = jnp.where(dvalid, dcontrast, -1.0).reshape(-1)
            tv, ti = hierarchical_top_k(dscore, cfg.max_blobs)
            return jnp.sum(tv) + jnp.sum(ti)
        blobs = detect_blobs(fine, cfg.max_blobs, 0.0)
        if upto == "detect":
            return jnp.sum(blobs.contrast)
        filt = _truncate_blobs(blobs, cfg.max_filtered, 2000)
        if upto in ("ocanvas", "owin", "oextract"):
            # orientation sub-stages via the SHARED production helpers
            # (ops.orientation._arena_offsets) so the profiler cannot
            # drift from the real pipeline
            import local_features_tpu.ops.orientation as ori
            from local_features_tpu.pallas.windows import fetch_windows_multi
            if upto == "ocanvas":
                arena, *_ = ori._arena_canvas(coarse)
                return jnp.sum(arena)
            xi = jnp.floor(filt.x).astype(jnp.int32)
            yi = jnp.floor(filt.y).astype(jnp.int32)
            from local_features_tpu import constants as C
            nC = coarse.shape[0]
            level = jnp.round(jnp.log2(filt.size / (
                C.DOG_FIRST_SCALE_SIGMA * C.DOG_SIGMA_RADIUS_FACTOR)))
            level = jnp.clip(level, 0, nC - 1).astype(jnp.int32)
            (arena, sel, plane0, oy_glob, ox, y_local, x_local) = \
                ori._arena_offsets(coarse, xi, yi, level, filt.valid)
            win = fetch_windows_multi((arena,), sel, plane0, oy_glob, ox,
                                      win_h=ori._OWIN_H, win_w=ori._OWIN_W)
            if upto == "owin":
                return jnp.sum(win)
            rows = jnp.arange(ori._OWIN_H, dtype=jnp.int32)
            cols = jnp.arange(ori._OWIN_W, dtype=jnp.int32)
            r15 = jnp.arange(ori._PS, dtype=jnp.int32)
            By = (rows[None, None, :]
                  == (y_local[:, None] + r15[None, :])[..., None]
                  ).astype(jnp.float32)
            Bx = (cols[None, :, None]
                  == (x_local[:, None] + r15[None, :])[:, None, :]
                  ).astype(jnp.float32)
            patch = jnp.einsum("fri,fij,fjc->frc", By, win, Bx,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(patch)
        if upto == "ohist":
            # histogram + peak math only (no keypoint top_k compaction)
            import local_features_tpu.ops.orientation as ori
            angles, peak = ori.orientation_histograms(
                coarse, filt.x, filt.y, filt.size, filt.valid,
                use_pallas=True)
            return jnp.sum(angles) + jnp.sum(peak)
        kps = keypoints_from_blobs(coarse, filt, cfg.max_keypoints,
                                   use_pallas=True)
        if upto == "orient":
            return jnp.sum(kps.angle)
        mips = patch_pyramid_mips(coarse)
        canvas = build_canvas(mips)
        if upto == "pyramid":
            return jnp.sum(canvas.astype(jnp.float32))
        widths = jnp.asarray([m.shape[1] for m in mips], jnp.int32)
        heights = jnp.asarray([m.shape[0] for m in mips], jnp.int32)
        patches = sample_patches_pallas(canvas, widths, heights, kps.x,
                                        kps.y, kps.size, kps.angle,
                                        kps.valid, 24.0)
        if upto == "sample":
            return jnp.sum(patches)
        if upto in ("dconv", "dlift", "dpool", "draw"):
            # descriptor sub-stages (mirrors raw_mkd_descriptors fast path)
            from local_features_tpu import constants as C
            from local_features_tpu.ops.descriptor import (
                _patches_mag_cos_sin, _vm_stack, raw_mkd_descriptors)
            K = patches.shape[0]
            mag, c1, s1 = _patches_mag_cos_sin(patches, matmul=True)
            if upto == "dconv":
                return jnp.sum(mag) + jnp.sum(c1) + jnp.sum(s1)
            from local_features_tpu.ops.descriptor import (
                _combine_polar, _polar_planes_rotated)
            m = mag.reshape(K, -1)
            c1 = c1.reshape(K, -1)
            s1 = s1.reshape(K, -1)
            # production runs the recurrence in f32 and materializes the
            # stack as bf16 (raw_mkd_descriptors fast path) — profile
            # the same kernel, not a bf16-native variant
            lift = _vm_stack(c1, s1, m, C.VM_FOURIER_N3_K8,
                             axis=0, out_dtype=jnp.bfloat16)
            if upto == "dlift":
                return jnp.sum(lift.astype(jnp.float32))
            pp = jnp.asarray(_polar_planes_rotated()).astype(jnp.bfloat16)
            cart_planes = jnp.asarray(
                C.cart_embedding_planes().reshape(9, -1).T).astype(jnp.bfloat16)
            pooled = jnp.stack([
                jnp.dot(lift[j], pp[j], preferred_element_type=jnp.float32)
                for j in range(7)
            ], axis=1)
            polar = _combine_polar(pooled)
            cart = jnp.dot(lift.reshape(7 * K, -1), cart_planes,
                           preferred_element_type=jnp.float32)
            if upto == "dpool":
                return jnp.sum(polar) + jnp.sum(cart)
            return jnp.sum(raw_mkd_descriptors(patches, fast=True))
        desc = mkd_descriptors(patches, mean, proj, kps.valid, fast=True)
        if upto == "desc":
            return jnp.sum(desc)
        return desc, kps.valid

    def run(upto):
        if upto == "match":
            @jax.jit
            def step(x):
                d, v = jax.vmap(lambda im: prefix(im, "match"))(x)
                m = jax.vmap(match_descriptors)(
                    d, jnp.roll(d, -1, 0), v, jnp.roll(v, -1, 0))
                s = jnp.sum(d) + jnp.sum(m.scores * m.mask)
                return x + 1e-20 * s
        else:
            @jax.jit
            def step(x):
                s = jnp.sum(jax.vmap(lambda im: prefix(im, upto))(x))
                return x + 1e-20 * s

        x = step(imgs)
        _ = np.asarray(jnp.sum(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x)
        _ = np.asarray(jnp.sum(x))
        return (time.perf_counter() - t0) / iters

    import os as _os
    stages = ["scale", "fine", "detect", "orient", "pyramid", "sample",
              "desc", "match"]
    if _os.environ.get("LF_PROFILE_ORI") == "1":
        stages = ["scale", "fine", "detect", "ocanvas", "owin", "oextract",
                  "ohist", "orient"]
    if _os.environ.get("LF_PROFILE_DET") == "1":
        stages = ["fine", "dense", "topk", "detect"]
    if _os.environ.get("LF_PROFILE_DESC") == "1":
        stages = ["sample", "dconv", "dlift", "dpool", "draw", "desc"]
    prev = 0.0
    for stage in stages:
        dt = run(stage)
        print(f"{stage:8s} cum {dt*1e3:8.2f} ms  delta {(dt-prev)*1e3:7.2f} ms"
              f"  ({B/dt:6.1f} fps)", flush=True)
        prev = dt


if __name__ == "__main__":
    main()
