"""On-TPU Pallas stress + parity harness (run on real hardware).

Two jobs the CPU test suite cannot do:

1. **Parity on silicon** — interpret-mode Pallas tests (CPU) never
   exercise the Mosaic lowering (bf16 relayouts, DMA alignment, vmapped
   grids).  For each (H, W, B) this script asserts Pallas == XLA for the
   patch sampler and the orientation-window path ON THE CHIP, with the
   same tolerances as the interpret-mode tests
   (tests/test_pallas_sampling.py: max<8e-3, mean<1.5e-3;
   tests/test_orientation.py: 1e-4).  This is the on-hardware analog of
   the reference's golden-model-as-oracle discipline
   (local_features/src/mkd_ref.rs, vulkan/mod.rs:1614-1619).
2. **Shape-robustness stress** — the engine must accept any (W, H) up
   to max like the reference (vulkan/mod.rs:271-291), and round 1 saw
   the TPU worker die ("kernel fault") under vmapped pipelines at
   240x320 B=8.  Every config runs in its own SUBPROCESS so a worker
   crash is recorded (status "crash") instead of ending the sweep, and
   the sweep bisects pipeline vs sampler vs windows automatically.

Writes/updates VERIFY_PALLAS_TPU.json at the repo root after every
config (commit the artifact).  Expect long cold Mosaic compiles
(~10-20 min per new sampler shape variant) on first run; results are
cached remotely afterwards.

Usage:
    python scripts/verify_pallas_tpu.py                 # full sweep
    python scripts/verify_pallas_tpu.py --configs 240x320:8:pipeline
    python scripts/verify_pallas_tpu.py --child 240 320 8 pipeline
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OUT_PATH = REPO / "VERIFY_PALLAS_TPU.json"

# Priority order: reproduce/bisect the round-1 crash shape first, then
# the warmed bench shape, then the rest of the sweep.
DEFAULT_CONFIGS = [
    (240, 320, 8, "pipeline"),
    (240, 320, 8, "sampler"),
    (240, 320, 8, "windows"),
    (480, 640, 8, "pipeline"),
    (480, 640, 8, "sampler"),
    (480, 640, 8, "windows"),
    (120, 160, 8, "pipeline"),
    (120, 160, 8, "sampler"),
    (120, 160, 8, "windows"),
    (240, 320, 1, "pipeline"),
    (240, 320, 4, "pipeline"),
    (480, 640, 1, "pipeline"),
    (480, 640, 4, "pipeline"),
    (120, 160, 1, "pipeline"),
    (120, 160, 4, "pipeline"),
]

SAMPLER_MAX_TOL = 8e-3   # tests/test_pallas_sampling.py gates
SAMPLER_MEAN_TOL = 1.5e-3
WINDOWS_TOL = 1e-4       # tests/test_orientation.py gate


def _images(H: int, W: int, B: int) -> np.ndarray:
    """Same textured synthetic frames as bench.py."""
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = (np.sin(xx / 7.0) * np.cos(yy / 9.0)
            + 0.5 * np.sin(xx / 23.0 + 1.0) * np.cos(yy / 17.0))
    return np.stack([
        0.5 + 0.25 * base + 0.1 * rng.standard_normal((H, W))
        for _ in range(B)
    ]).astype(np.float32)


def run_child(H: int, W: int, B: int, stage: str) -> dict:
    import jax
    import jax.numpy as jnp

    from local_features_tpu.ops.frontend import (FrontendConfig,
                                                 _truncate_blobs,
                                                 detect_extract,
                                                 detect_phase)
    from local_features_tpu.ops.orientation import keypoints_from_blobs
    from local_features_tpu.pca import load_pca

    # LF_VERIFY_INTERPRET=1: CPU plumbing smoke (interpret-mode kernels)
    interp = os.environ.get("LF_VERIFY_INTERPRET") == "1"
    cfg_p = FrontendConfig(n_scales=4, max_blobs=8000, max_keypoints=2000,
                           max_filtered=2000, sampler="pallas",
                           interpret=interp)
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)
    imgs = jnp.asarray(_images(H, W, B))
    t0 = time.perf_counter()
    rec: dict = {"backend": jax.default_backend()}

    if stage == "pipeline":
        # the round-1 crash class: the FULL vmapped Pallas front-end
        fn = jax.jit(jax.vmap(
            lambda im: detect_extract(im, cfg_p, mean, proj, 2000, 0.0, 24.0)))
        res = fn(imgs)
        desc = np.asarray(res.descriptors)
        valid = np.asarray(res.valid)
        n = valid.sum(axis=1)
        rec.update(
            n_keypoints=[int(v) for v in n],
            finite=bool(np.isfinite(desc[valid]).all()),
        )
        ok = rec["finite"] and all(v > 0 for v in n)

    elif stage == "windows":
        def kps(im, use_pallas):
            coarse, blobs = detect_phase(im, cfg_p, 0.0)
            filt = _truncate_blobs(blobs, cfg_p.max_filtered, 2000)
            return keypoints_from_blobs(coarse, filt, cfg_p.max_keypoints,
                                        use_pallas=use_pallas,
                                        interpret=interp)

        fn = jax.jit(jax.vmap(
            lambda im: (kps(im, True), kps(im, False))))
        got, ref = fn(imgs)
        v = np.asarray(got.valid) & np.asarray(ref.valid)
        same_valid = bool(
            (np.asarray(got.valid) == np.asarray(ref.valid)).all())
        diffs = {
            f: float(np.abs(np.asarray(getattr(got, f))[v]
                            - np.asarray(getattr(ref, f))[v]).max())
            for f in ("x", "y", "size", "angle")
        } if v.any() else {}
        rec.update(same_valid=same_valid, n_valid=int(v.sum()),
                   max_diff=diffs)
        ok = (same_valid and v.any()
              and all(d < WINDOWS_TOL for d in diffs.values()))

    elif stage == "sampler":
        from local_features_tpu.ops.descriptor import sample_patches
        from local_features_tpu.ops.pyramid import (flat_pyramid,
                                                    patch_pyramid_mips)
        from local_features_tpu.pallas.sampling import (build_canvas,
                                                        sample_patches_pallas)

        def both(im):
            coarse, blobs = detect_phase(im, cfg_p, 0.0)
            filt = _truncate_blobs(blobs, cfg_p.max_filtered, 2000)
            kp = keypoints_from_blobs(coarse, filt, cfg_p.max_keypoints,
                                      use_pallas=False)
            mips = patch_pyramid_mips(coarse)
            canvas = build_canvas(mips)
            widths = jnp.asarray([m.shape[1] for m in mips], jnp.int32)
            heights = jnp.asarray([m.shape[0] for m in mips], jnp.int32)
            p_pal = sample_patches_pallas(
                canvas, widths, heights, kp.x, kp.y, kp.size, kp.angle,
                kp.valid, 24.0, interpret=interp)
            p_xla = sample_patches(flat_pyramid(mips), kp.x, kp.y, kp.size,
                                   kp.angle, kp.valid, 24.0)
            return p_pal, p_xla, kp.valid

        fn = jax.jit(jax.vmap(both))
        p_pal, p_xla, valid = fn(imgs)
        d = np.abs(np.asarray(p_pal) - np.asarray(p_xla))
        v = np.asarray(valid)
        dmax = float(d[v].max()) if v.any() else 0.0
        dmean = float(d[v].mean()) if v.any() else 0.0
        rec.update(n_valid=int(v.sum()), max_diff=dmax, mean_diff=dmean)
        ok = v.any() and dmax < SAMPLER_MAX_TOL and dmean < SAMPLER_MEAN_TOL

    else:
        raise ValueError(f"unknown stage {stage!r}")

    rec.update(status="ok" if ok else "fail",
               seconds=round(time.perf_counter() - t0, 1))
    return rec


def parent(configs: list[tuple[int, int, int, str]], timeout_s: int,
           fresh: bool = False) -> int:
    results = []
    if OUT_PATH.exists() and not fresh:
        try:
            results = json.loads(OUT_PATH.read_text())["configs"]
        except Exception:
            results = []

    def save():
        OUT_PATH.write_text(json.dumps({
            "tolerances": {"sampler_max": SAMPLER_MAX_TOL,
                           "sampler_mean": SAMPLER_MEAN_TOL,
                           "windows": WINDOWS_TOL},
            "configs": results,
        }, indent=1) + "\n")

    for H, W, B, stage in configs:
        key = {"H": H, "W": W, "B": B, "stage": stage}
        done = next((r for r in results
                     if all(r.get(k) == v for k, v in key.items())
                     and r.get("status") == "ok"), None)
        if done is not None:
            print(f"SKIP (already ok): {key}", flush=True)
            continue
        results = [r for r in results
                   if not all(r.get(k) == v for k, v in key.items())]
        print(f"RUN {key} ...", flush=True)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child",
                 str(H), str(W), str(B), stage],
                capture_output=True, text=True, timeout=timeout_s,
            )
            line = next((ln for ln in reversed(proc.stdout.splitlines())
                         if ln.startswith("{")), None)
            if proc.returncode == 0 and line:
                rec = json.loads(line)
            else:
                rec = {"status": "crash", "returncode": proc.returncode,
                       "stderr_tail": proc.stderr[-2000:]}
        except subprocess.TimeoutExpired as e:
            rec = {"status": "timeout",
                   "stderr_tail": (e.stderr or "")[-2000:] if isinstance(
                       e.stderr, str) else ""}
        rec.update(key)
        rec["wall_s"] = round(time.perf_counter() - t0, 1)
        results.append(rec)
        save()
        print(f"  -> {rec['status']} ({rec['wall_s']}s)", flush=True)
        if rec["status"] == "crash":
            time.sleep(30)  # give a crashed TPU worker time to recover

    bad = [r for r in results if r["status"] != "ok"]
    print(f"{len(results) - len(bad)}/{len(results)} ok; "
          f"failures: {[{k: r[k] for k in ('H', 'W', 'B', 'stage', 'status')} for r in bad]}")
    return 1 if bad else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", nargs=4, metavar=("H", "W", "B", "STAGE"),
                    default=None)
    ap.add_argument("--configs", default=None,
                    help="comma list HxW:B:stage (default: full sweep)")
    ap.add_argument("--timeout", type=int,
                    default=int(os.environ.get("LF_VERIFY_TIMEOUT", 2700)))
    ap.add_argument("--fresh", action="store_true",
                    help="ignore prior ok results (re-verify after any "
                         "kernel change)")
    args = ap.parse_args()

    if args.child:
        H, W, B, stage = args.child
        rec = run_child(int(H), int(W), int(B), stage)
        print(json.dumps(rec))
        return 0

    configs = DEFAULT_CONFIGS
    if args.configs:
        configs = []
        for spec in args.configs.split(","):
            hw, b, stage = spec.split(":")
            h, w = hw.split("x")
            configs.append((int(h), int(w), int(b), stage))
    return parent(configs, args.timeout, fresh=args.fresh)


if __name__ == "__main__":
    raise SystemExit(main())
