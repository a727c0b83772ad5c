"""Honest end-to-end stage costing: run the EXACT bench.py step with one
stage ablated (its output replaced by zeros of the right shape, making
the stage dead code) and report the fps delta vs the un-ablated run.

Prefix profiling on the tunneled axon platform mis-attributes time
(memoization, unreliable fencing — CLAUDE.md "MICRO-BENCH LIES"); an
ablated full pipeline keeps the dependency-chained timing methodology
of bench.py, so the delta is the stage's true end-to-end cost
(including whatever XLA can no longer overlap).

Usage: python scripts/bench_ablate.py [stage ...]
Stages: none owin sample hist oextract obin oweight oatan obinsum opeak
        dgrad dlift dpool desc match scale detect
(scale/detect fakes keep ALL blob slots valid, so downstream load is the
worst case and their deltas UNDERSTATE the stage's true cost.)
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

    if os.environ.get("LF_BENCH_IMAGE", "") in ("1", "houses"):
        # real-image workload (~1300 valid kp/frame vs synth ~730) —
        # same crop construction as bench.py
        from PIL import Image
        pil = Image.open(os.path.join(os.path.dirname(__file__), "..",
                                      "sample_data", "houses.jpg")
                         ).convert("L")
        sy, sx = 32, 32
        full = np.asarray(pil.resize((W + sx * (B - 1), H + sy * (B - 1)),
                                     Image.LANCZOS), np.float32) / 255.0
        imgs = jnp.asarray(np.stack([
            full[i * sy:i * sy + H, i * sx:i * sx + W] for i in range(B)]))
    else:
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
    elif stage == "oextract":
        # keep the window fetch + histogram math, fake the one-hot
        # extraction einsum: patch = window mean broadcast (plus a tiny
        # per-pixel ramp so gradients/peaks survive)
        import local_features_tpu.ops.orientation as o

        real = o._sample_ori_patches_pallas

        def fake(coarse, xi, yi, level, bvalid, interpret=False):
            from local_features_tpu.pallas.windows import fetch_windows_multi
            (arena, sel, plane0, oy_glob, ox, y_local, x_local) = \
                o._arena_offsets(coarse, xi, yi, level, bvalid)
            win = fetch_windows_multi((arena,), sel, plane0, oy_glob, ox,
                                      win_h=o._OWIN_H, win_w=o._OWIN_W,
                                      kb=o._OWIN_KB, interpret=interpret)
            m = jnp.mean(win, axis=(1, 2))
            ramp = jnp.sin(jnp.arange(225, dtype=jnp.float32)).reshape(
                15, 15)
            return (m[:, None, None] + 0.05 * ramp[None]
                    + y_local[:, None, None].astype(jnp.float32) * 1e-20)
        o._sample_ori_patches_pallas = fake
    elif stage == "obin":
        # keep patches + gradients, fake the 36-bin one-hot histogram
        # contraction + smoothing (the [F,13,13,36] reduce)
        import local_features_tpu.ops.orientation as o

        real_hist = o.orientation_histograms

        def fake(coarse, bx, by, bsize, bvalid, use_pallas=False,
                 interpret=False, extent=None):
            import local_features_tpu.constants as Cc
            nC, H, W = coarse.shape
            level = jnp.clip(jnp.round(jnp.log2(bsize / (
                Cc.DOG_FIRST_SCALE_SIGMA * Cc.DOG_SIGMA_RADIUS_FACTOR))),
                0, nC - 1).astype(jnp.int32)
            xi = jnp.floor(bx).astype(jnp.int32)
            yi = jnp.floor(by).astype(jnp.int32)
            patch = o._sample_ori_patches_pallas(coarse, xi, yi, level,
                                                 bvalid, interpret)
            gx = patch[:, 1:-1, 2:] - patch[:, 1:-1, :-2]
            gy = patch[:, :-2, 1:-1] - patch[:, 2:, 1:-1]
            s = jnp.sum(gx * gx + gy * gy, axis=(1, 2))
            F = bx.shape[0]
            ang = jnp.zeros((F, 36)) + s[:, None] * 1e-20
            peak = (jnp.arange(36)[None, :] < 1) & bvalid[:, None]
            return ang, peak
        o.orientation_histograms = fake
    elif stage in ("oatan", "oweight", "obinsum", "opeak"):
        # surgical variants of orientation_histograms: one sub-step
        # replaced by a cheap stand-in of the same shape
        import local_features_tpu.ops.orientation as o
        import local_features_tpu.constants as Cc

        real = o.orientation_histograms

        def fake(coarse, bx, by, bsize, bvalid, use_pallas=False,
                 interpret=False, extent=None):
            nC, H, W = coarse.shape
            F = bx.shape[0]
            level = jnp.clip(jnp.round(jnp.log2(bsize / (
                Cc.DOG_FIRST_SCALE_SIGMA * Cc.DOG_SIGMA_RADIUS_FACTOR))),
                0, nC - 1).astype(jnp.int32)
            step = jnp.left_shift(1, level)
            radius = jnp.round(Cc.ORI_RADIUS_FACTOR * bsize
                               / Cc.DOG_SIGMA_RADIUS_FACTOR)
            sigma = Cc.ORI_SIGMA_FACTOR * bsize / Cc.DOG_SIGMA_RADIUS_FACTOR
            xi = jnp.floor(bx).astype(jnp.int32)
            yi = jnp.floor(by).astype(jnp.int32)
            offs = jnp.arange(-o._R, o._R + 1, dtype=jnp.int32)
            x_img = xi[:, None] + offs[None, :] * step[:, None]
            y_img = yi[:, None] + offs[None, :] * step[:, None]
            vx = (x_img >= 0) & (x_img < W)
            vy = (y_img >= 0) & (y_img < H)
            valid_px = vx[:, None, :] & vy[:, :, None]
            patch = o._sample_ori_patches_pallas(coarse, xi, yi, level,
                                                 bvalid, interpret)
            patch = jnp.where(valid_px & bvalid[:, None, None], patch, 0.0)
            gx = patch[:, 1:-1, 2:] - patch[:, 1:-1, :-2]
            gy = patch[:, :-2, 1:-1] - patch[:, 2:, 1:-1]
            ioffs = offs[1:-1].astype(jnp.float32)
            dx = ioffs[None, :] * step[:, None].astype(jnp.float32)
            in_grad = ((jnp.abs(dx) <= radius[:, None])[:, None, :]
                       & (jnp.abs(dx) <= radius[:, None])[:, :, None]
                       & valid_px[:, 1:-1, 1:-1])
            contrib_mask = (in_grad & ((gx != 0.0) | (gy != 0.0))
                            & bvalid[:, None, None])
            mag = jnp.sqrt(gx * gx + gy * gy)
            dist = dx[:, None, :] ** 2 + dx[:, :, None] ** 2
            if stage == "oweight":
                weight = 1.0 + dist * 1e-20     # no exp
            else:
                weight = jnp.exp(-dist / (2.0 * sigma * sigma)[:, None, None])
            contrib = jnp.where(contrib_mask, weight * mag, 0.0)
            if stage == "oatan":
                # no arctan2: fake bins from a cheap hash of gradients
                b = (jnp.abs(gx * 7.3 + gy * 3.1) * 4.0).astype(jnp.int32)
                b = jnp.mod(b, Cc.N_ORI_BINS)
            else:
                ang = jnp.arctan2(gy, gx)
                b = jnp.round(ang * (Cc.N_ORI_BINS / (2.0 * jnp.pi))
                              ).astype(jnp.int32)
                b = jnp.mod(b, Cc.N_ORI_BINS)
            if stage == "obinsum":
                # skip the one-hot 36-bin contraction: fold bins down
                # to a scalar per pixel and broadcast
                s = jnp.sum(contrib * (b + 1), axis=(1, 2))
                raw_hist = jnp.zeros((F, 36)) + s[:, None] * 1e-6
            else:
                onehot = (b[..., None]
                          == jnp.arange(Cc.N_ORI_BINS)[None, None, None, :])
                raw_hist = jnp.sum(contrib[..., None] * onehot, axis=(1, 2))
            r = lambda sft: jnp.roll(raw_hist, sft, axis=-1)
            hist = ((r(2) + r(-2)) * (1.0 / 16.0)
                    + (r(1) + r(-1)) * (4.0 / 16.0) + raw_hist * (6. / 16.))
            if stage == "opeak":
                peak = (hist > jnp.mean(hist)) & bvalid[:, None]
                peak = peak & (jnp.arange(36)[None, :] < 2)
                angles = hist * 0.1
                return angles, peak
            left = jnp.roll(hist, 1, axis=-1)
            right = jnp.roll(hist, -1, axis=-1)
            thresh = jnp.max(hist, axis=-1, keepdims=True) * Cc.ORI_PEAK_RATIO
            peak = ((left < hist) & (right < hist) & (hist >= thresh)
                    & bvalid[:, None])
            denom = left - 2.0 * hist + right
            interp = jnp.where(peak, (left - right)
                               / jnp.where(denom == 0, 1.0, denom), 0.0)
            bin_f = (jnp.arange(Cc.N_ORI_BINS, dtype=jnp.float32)[None, :]
                     + interp / 2.0)
            bin_f = jnp.where(bin_f < 0, bin_f + Cc.N_ORI_BINS, bin_f)
            bin_f = jnp.where(bin_f > Cc.N_ORI_BINS, bin_f - Cc.N_ORI_BINS,
                              bin_f)
            angles = 360.0 - (360.0 / Cc.N_ORI_BINS) * bin_f
            return angles, peak
        o.orientation_histograms = fake
    elif stage == "dgrad":
        # fake the blur + gradients + rsqrt chain (keeps lift + pooling)
        import local_features_tpu.ops.descriptor as dd

        def fake(patches, matmul=False):
            K = patches.shape[0]
            base = jnp.sin(jnp.arange(1024, dtype=jnp.float32) * 0.13)
            m = jnp.broadcast_to(base, (K, 1024)).reshape(K, 32, 32) \
                + patches * 1e-20
            c = jnp.broadcast_to(jnp.cos(base * 2), (K, 1024)
                                 ).reshape(K, 32, 32) + patches * 1e-20
            s = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
            return m, c, s
        dd._patches_mag_cos_sin = fake
    elif stage == "dlift":
        # fake the von Mises recurrence stack (keeps gradient chain +
        # pooling matmuls, same [7, K, N] materialization)
        import local_features_tpu.ops.descriptor as dd

        def fake(c1, s1, m, coef, axis=1, out_dtype=None):
            v = (m + c1 * 1e-20 + s1 * 1e-20)
            if out_dtype is not None:
                v = v.astype(out_dtype)
            reps = [v] * 7
            return jnp.stack(reps, axis=axis)
        dd._vm_stack = fake
    elif stage == "dpool":
        # fake the pooling matmuls + combine (keeps gradient + lift)
        import local_features_tpu.ops.descriptor as dd

        real_raw = dd.raw_mkd_descriptors

        def fake(patches, fast=False):
            import local_features_tpu.constants as Cc
            K = patches.shape[0]
            mag, c1, s1 = dd._patches_mag_cos_sin(patches, matmul=fast)
            lift = dd._vm_stack(c1.reshape(K, -1), s1.reshape(K, -1),
                                mag.reshape(K, -1), Cc.VM_FOURIER_N3_K8,
                                axis=0, out_dtype=jnp.bfloat16)
            s = jnp.sum(lift.astype(jnp.float32), axis=(0, 2))   # [K]
            return jnp.zeros((K, 238)) + s[:, None] * 1e-20 + 0.06
        dd.raw_mkd_descriptors = fake
    elif stage == "desc":
        import local_features_tpu.ops.descriptor as dd

        def fake(patches, mean, proj, valid, fast=False):
            K = patches.shape[0]
            return (jnp.zeros((K, 128), jnp.float32)
                    + jnp.sum(patches) * 1e-20)
        dd.mkd_descriptors = fake
        import local_features_tpu.ops.frontend as f
        f.mkd_descriptors = fake
    elif stage == "scanvas":
        # fake the sampler's transposed bf16 canvas build (keeps mips +
        # kernel): delta = transpose/pad/stack cost
        import local_features_tpu.pallas.sampling as s
        import local_features_tpu.ops.frontend as f

        def fake(mips):
            h0, w0 = mips[0].shape
            Wc = max(s.WIN_X, s._round_up(w0 + 64, 16))
            Hc = s._round_up(
                h0 + s.PADT + (s.N_PHASE - 1) * s.PHASE_STEP + s.WIN_Y, 128)
            seed = (jnp.sum(mips[0][0, :]) * 1e-20).astype(jnp.bfloat16)
            return jnp.zeros((len(mips) * s.N_PHASE, Wc, Hc),
                             jnp.bfloat16) + seed
        s.build_canvas = fake
    elif stage == "mips":
        # fake the patch pyramid (keeps canvas + sampler): delta =
        # binomial blur + decimate chain cost
        import local_features_tpu.ops.pyramid as pp
        import local_features_tpu.ops.frontend as f

        real_mips = pp.patch_pyramid_mips

        def fake(coarse, n_levels=None, extent=None):
            ms = real_mips(coarse, n_levels, extent)
            seed = jnp.sum(coarse[0, 0, :]) * 1e-20
            return [jnp.zeros(m.shape, m.dtype) + seed for m in ms]
        pp.patch_pyramid_mips = fake
        f.patch_pyramid_mips = fake
    elif stage == "oarena":
        # fake the arena-canvas construction (keeps offsets + DMA +
        # kernel + untangle): delta = decimate/pack/transpose cost
        import local_features_tpu.ops.orientation as o

        real_arena = o._arena_canvas

        def fake(coarse):
            arena, layout = real_arena(coarse)
            # PATTERNED, not zeros: a zero arena yields zero histograms
            # -> no keypoints -> the whole downstream stage collapses
            # and the "arena cost" reads as ~10 ms of vanished sampler/
            # descriptor load (measured; the same trap the owin fake
            # documents)
            r = jnp.sin(jnp.arange(arena.shape[2], dtype=jnp.float32)
                        * 0.37)[None, None, :]
            c = jnp.cos(jnp.arange(arena.shape[1], dtype=jnp.float32)
                        * 0.23)[None, :, None]
            z = (r * c + jnp.sum(coarse[:, 0, :]) * 1e-20
                 ).astype(arena.dtype) * 0.5
            return jnp.broadcast_to(z, arena.shape), layout
        o._arena_canvas = fake
    elif stage == "okernel":
        # fake the packed kernel CALL only, keeping the arena live via a
        # cheap dependency: delta = DMA + kernel + untangle
        import local_features_tpu.pallas.orihist as oh

        def fake_fetch(arena, sel, oy, ox, fparams, kb=8, interpret=False):
            F = sel.shape[0]
            base = jnp.sin(jnp.arange(36, dtype=jnp.float32) * 1.7) + 1.5
            seed = jnp.sum(arena[0, 0, :]) * 1e-20
            return (jnp.broadcast_to(base, (F, 36))
                    + seed + fparams[2, :, None] * 1e-20)
        oh.fetch_histograms_packed = fake_fetch
        oh.fetch_histograms = fake_fetch
    elif stage == "ountangle":
        # fake the packed kernel's strided-slice output untangle only
        import local_features_tpu.pallas.orihist as oh

        real_core = oh._core_packed

        def fake_fetch(arena, sel, oy, ox, fparams, kb=8, interpret=False):
            F = sel.shape[0]
            Fp = oh._round_up(max(F, kb), kb)
            if Fp != F:
                sel = jnp.pad(sel, (0, Fp - F), constant_values=-1)
                oy = jnp.pad(oy, (0, Fp - F))
                ox = jnp.pad(ox, (0, Fp - F))
                fparams = jnp.pad(fparams, ((0, 0), (0, Fp - F)))
            _, Ha, Wa = arena.shape
            oy = jnp.clip(oy, 0, max(((Ha - 24) // 8) * 8, 0))
            ox = jnp.clip(ox, 0, max(((Wa - 128) // 128) * 128, 0))
            nv = jnp.max(jnp.where(
                sel >= 0, jnp.arange(1, Fp + 1, dtype=jnp.int32), 0),
                keepdims=True)
            out = real_core(kb, interpret)(nv, sel, oy, ox, fparams, arena)
            # garbage-but-cheap reshape instead of [:, :36, ::16]+T
            flat = out.reshape(-1)[: Fp * 36].reshape(Fp, 36)
            return flat[:F]
        oh.fetch_histograms_packed = fake_fetch
        import local_features_tpu.ops.orientation  # noqa: F401
    elif stage == "scale":
        # fake the scale-space blur chain (keeps fine volume + detect +
        # everything downstream on a patterned coarse stack)
        import local_features_tpu.ops.scale_space as ss
        import local_features_tpu.ops.frontend as f

        def fake(img, n_scales):
            H, W = img.shape
            nC = n_scales + 3
            base = jnp.sin(jnp.arange(H * W, dtype=jnp.float32) * 0.13
                           ).reshape(H, W)
            levels = [base * (0.9 ** l) + img * 1e-20 for l in range(nC)]
            return jnp.stack(levels)
        ss.scale_space = fake
        f.scale_space = fake
    elif stage == "detect":
        # fake the extremum scan + refine + compaction: a grid of
        # plausible blobs (keeps orientation/sampler/descriptor load)
        import local_features_tpu.ops.detect as dd
        import local_features_tpu.ops.frontend as f

        def fake(fine, max_blobs, min_size=0.0, border=5,
                 contrast_threshold=None, select_cap=None, extent=None):
            _, H, W = fine.shape
            cap = select_cap or max_blobs
            n = jnp.arange(cap, dtype=jnp.int32)
            gx = 16 + (n * 29) % (W - 32)
            gy = 16 + (n * 37) % (H - 32)
            seed = jnp.sum(fine) * 1e-20
            return dd.BlobArrays(
                x=gx.astype(jnp.float32) + seed,
                y=gy.astype(jnp.float32) + seed,
                size=jnp.full((cap,), 4.2, jnp.float32) + seed,
                contrast=jnp.full((cap,), 0.05, jnp.float32) + seed,
                level=jnp.zeros((cap,), jnp.int32),
                valid=jnp.ones((cap,), bool),
                n_total=jnp.asarray(cap, jnp.int32),
                n_dropped=jnp.asarray(0, jnp.int32),
            )
        dd.detect_blobs = fake
        f.detect_blobs = fake
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
