"""Honest end-to-end stage costing: run the EXACT bench.py step with one
stage ablated (its output replaced by zeros of the right shape, making
the stage dead code) and report the fps delta vs the un-ablated run.

Prefix profiling on the tunneled axon platform mis-attributes time
(memoization, unreliable fencing — CLAUDE.md "MICRO-BENCH LIES"); an
ablated full pipeline keeps the dependency-chained timing methodology
of bench.py, so the delta is the stage's true end-to-end cost
(including whatever XLA can no longer overlap).

Usage: python scripts/bench_ablate.py [stage ...]
Stages: none owin sample hist desc match scale detect
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_bench():
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import FrontendConfig
    from local_features_tpu.ops.matching import match_descriptors
    from local_features_tpu.parallel import batched_detect_extract
    from local_features_tpu.pca import load_pca

    B, iters = 8, 10
    H, W = 480, 640
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
        feedback = 1e-12 * (jnp.sum(d) + jnp.sum(m.scores * m.mask)
                            + jnp.sum(res.x) + jnp.sum(res.angle))
        return imgs + feedback

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
    imgs = jnp.asarray(np.stack([
        0.5 + 0.25 * base + 0.1 * rng.standard_normal((H, W))
        for _ in range(B)]).astype(np.float32))

    x = step(imgs)
    _ = np.asarray(jnp.sum(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _ = np.asarray(jnp.sum(x))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3, B * iters / (dt * iters)


def ablate(stage):
    import jax.numpy as jnp

    if stage == "none":
        return
    if stage == "owin":
        import local_features_tpu.pallas.windows as w

        real = w.fetch_windows_multi

        def fake(canvases, sel, plane, oy, ox, win_h=24, win_w=256, kb=16,
                 interpret=False):
            # patterned (non-constant) windows so orientation still
            # produces peaks and the downstream sampler keeps its
            # real keypoint workload
            F = plane.shape[0]
            r = jnp.sin(jnp.arange(win_h * win_w, dtype=jnp.float32)
                        * 0.37).reshape(win_h, win_w)
            return (jnp.broadcast_to(r, (F, win_h, win_w))
                    + canvases[0][0, 0, 0] * 1e-20
                    + oy[:, None, None].astype(jnp.float32) * 1e-20)
        w.fetch_windows_multi = fake
        import local_features_tpu.ops.orientation as o
        o.fetch_windows_multi = fake
    elif stage == "sample":
        import local_features_tpu.pallas.sampling as s

        def fake(canvas, widths, heights, kx, ky, ksize, kangle, kvalid,
                 psf=24.0, interpret=False):
            K = kx.shape[0]
            return (jnp.zeros((K, 32, 32), jnp.float32)
                    + canvas[0, 0, 0].astype(jnp.float32)
                    + kx[:, None, None] * 1e-20)
        s.sample_patches_pallas = fake
        import local_features_tpu.ops.frontend as f
        # frontend imports inside the function body — patch the module
        # it imports from
        import local_features_tpu.pallas.sampling as ps
        ps.sample_patches_pallas = fake
    elif stage == "hist":
        import local_features_tpu.ops.orientation as o

        real = o.orientation_histograms

        def fake(coarse, bx, by, bsize, bvalid, use_pallas=False,
                 interpret=False, extent=None):
            F = bx.shape[0]
            ang = (jnp.zeros((F, 36)) + bx[:, None] * 1e-20
                   + coarse[0, 0, 0] * 1e-20)
            peak = jnp.ones((F, 36), bool) & bvalid[:, None]
            # keep realistic keypoint counts: ~1.2 peaks per blob
            peak = peak & (jnp.arange(36)[None, :] < 1)
            return ang, peak
        o.orientation_histograms = fake
    elif stage == "desc":
        import local_features_tpu.ops.descriptor as dd

        def fake(patches, mean, proj, valid, fast=False):
            K = patches.shape[0]
            return (jnp.zeros((K, 128), jnp.float32)
                    + jnp.sum(patches) * 1e-20)
        dd.mkd_descriptors = fake
        import local_features_tpu.ops.frontend as f
        f.mkd_descriptors = fake
    elif stage == "match":
        import local_features_tpu.ops.matching as mm
        from typing import NamedTuple

        real = mm.match_descriptors

        def fake(da, db, va=None, vb=None, ratio=0.8):
            n = da.shape[0]
            return mm.Matches(
                indices=jnp.zeros(n, jnp.int32) + (jnp.sum(da) * 0).astype(
                    jnp.int32),
                scores=jnp.zeros(n) + jnp.sum(db) * 1e-20,
                mask=jnp.ones(n, bool))
        mm.match_descriptors = fake
        globals()["_fake_match"] = fake
    else:
        raise SystemExit(f"unknown stage {stage}")


def main():
    stages = sys.argv[1:] or ["none"]
    assert len(stages) == 1, "one stage per process (jit caches)"
    stage = stages[0]
    ablate(stage)
    if stage == "match":
        # match is called from run_bench directly; rebind there via module
        pass
    ms, fps = run_bench()
    print(f"ABLATE {stage:8s} {ms:8.2f} ms/batch  {fps:7.1f} fps", flush=True)


if __name__ == "__main__":
    main()
