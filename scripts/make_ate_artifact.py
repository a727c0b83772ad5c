"""Produce ATE_r0N.json: full odometry (front-end + windowed SfM +
Sim(3) loop closure + global BA) on a REAL-TEXTURE pseudo-sequence with
exact ground truth (BASELINE.md config 4 evidence).

Real TUM/KITTI downloads are impossible here (no network — verified:
DNS fails), so the sequence is rendered from the vendored photographs
over three depth layers with exactly known SE(3) trajectory
(utils/phototex.py).  ATE against the generating trajectory is a real
accuracy measurement of the whole pipeline.

Usage: python scripts/make_ate_artifact.py [--frames 120] [--height 480]
           [--width 640] [--out ATE_r03.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--f", type=float, default=500.0)
    ap.add_argument("--max-features", type=int, default=800)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--overlap", type=int, default=3)
    ap.add_argument("--out", default="ATE_r03.json")
    ap.add_argument("--seq-dir", default=None,
                    help="also persist the sequence in TUM layout")
    args = ap.parse_args()

    # CPU by default (LF_PLATFORM=tpu to override): the site hook pins
    # JAX_PLATFORMS=axon over env prefixes, and this long CPU-bound SfM
    # workload must not contend for the single tunneled TPU
    from local_features_tpu.utils.platform import apply_platform_env
    apply_platform_env(default="cpu")

    import jax
    import jax.numpy as jnp

    from local_features_tpu.sfm.odometry import reconstruct_long_sequence
    from local_features_tpu.sfm.pose_graph import absolute_trajectory_error
    from local_features_tpu.utils.image import load_gray_pil
    from local_features_tpu.utils.phototex import (render_layered_sequence,
                                                   write_tum_sequence)

    root = os.path.join(os.path.dirname(__file__), "..")
    bg = load_gray_pil(os.path.join(root, "sample_data/houses.jpg"))
    fg = load_gray_pil(os.path.join(root, "sample_data/bird.jpg"))

    t_render = time.time()
    # LF_ATE_SEED varies BOTH the scene (patch layout) and the
    # estimator seed, so multi-seed children measure genuinely
    # different sequences, not just different RANSAC draws
    frames, R_gt, t_gt, intr = render_layered_sequence(
        bg.astype(np.float32), fg.astype(np.float32),
        n_frames=args.frames, height=args.height, width=args.width,
        f=args.f, seed=int(os.environ.get("LF_ATE_SEED", "0")))
    t_render = time.time() - t_render
    if args.seq_dir:
        write_tum_sequence(frames, R_gt, t_gt, args.seq_dir)

    c_gt = np.einsum("nji,nj->ni", R_gt, -t_gt)
    traj_len = float(np.linalg.norm(np.diff(c_gt, axis=0), axis=1).sum())

    # each variant runs in its OWN subprocess: one process accumulating
    # hundreds of XLA CPU compiles hits the compiler's allocation
    # failure (CLAUDE.md pytest.ini note; reproduced here as LLVM
    # "Cannot allocate memory" mid-loop-closure)
    if os.environ.get("LF_ATE_CHILD"):
        child = os.environ["LF_ATE_CHILD"]
        seed = int(os.environ.get("LF_ATE_SEED", "1"))
        t0 = time.time()
        if child.startswith("chain"):
            # the batched global chain (pipeline.reconstruct_sequence_
            # batched) — the round-4 default config-4 mode
            from local_features_tpu.sfm.pipeline import \
                reconstruct_sequence_batched
            lc = child == "chain_loops"
            label = "chain+loop_tracks" if lc else "chain"
            if seed != 1:
                label += f"@seed{seed}"
            res = reconstruct_sequence_batched(
                frames, intr, max_features=args.max_features, seed=seed,
                loop_closure=lc,
                loop_kwargs=dict(
                    min_separation=max(args.frames // 4, 10)))
        else:
            label, lc, graph = {
                "odometry": ("odometry", False, "tracks"),
                "tracks": ("odometry+loop_tracks", True, "tracks"),
                "sim3": ("odometry+sim3_loops", True, "sim3"),
            }[child]
            res = reconstruct_long_sequence(
                frames, intr, window=args.window, overlap=args.overlap,
                max_features=args.max_features, ba_iters=20,
                loop_closure=lc, loop_graph=graph,
                loop_kwargs=dict(min_separation=max(args.frames // 4, 10)))
        wall = time.time() - t0
        ate = float(absolute_trajectory_error(
            jnp.asarray(res.camera_centers), jnp.asarray(c_gt),
            with_scale=True))
        print(json.dumps({"label": label, "ate_rmse": round(ate, 5),
                          "ate_pct_of_trajectory":
                              round(100.0 * ate / traj_len, 3),
                          "wall_time_s": round(wall, 1)}), flush=True)
        return

    import subprocess

    # chain children run at 3 seeds (fast); the legacy odometry modes
    # once each (they are the slow round-3 baselines kept for
    # comparison)
    children = [("chain", 1), ("chain", 2), ("chain", 3),
                ("chain_loops", 1), ("chain_loops", 2), ("chain_loops", 3),
                ("odometry", 1), ("tracks", 1), ("sim3", 1)]
    results = {}
    for child, seed in children:
        env = dict(os.environ, LF_ATE_CHILD=child, LF_ATE_SEED=str(seed))
        out = subprocess.run(
            [sys.executable] + sys.argv, env=env, capture_output=True,
            text=True, timeout=7200)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        if not lines:
            sys.stderr.write(f"--- child {child} rc={out.returncode} "
                             f"stderr ---\n{out.stderr[-4000:]}\n")
            raise RuntimeError(f"child {child} produced no result")
        line = lines[-1]
        rec = json.loads(line)
        results[rec.pop("label")] = rec
        print(child, "->", rec, flush=True)

    artifact = {
        "sequence": {
            "renderer": "utils/phototex.py:render_layered_sequence",
            "textures": ["sample_data/houses.jpg", "sample_data/bird.jpg"],
            "n_frames": args.frames,
            "resolution": [args.height, args.width],
            "focal": args.f,
            "trajectory": "closed circuit, 3 depth layers",
            "trajectory_length": round(traj_len, 3),
            "render_time_s": round(t_render, 1),
            "note": ("real TUM/KITTI unavailable in this environment "
                     "(no network); texture is real imagery, geometry "
                     "exactly known"),
        },
        "pipeline": {
            "max_features": args.max_features,
            "window": args.window, "overlap": args.overlap,
            "backend": jax.default_backend(),
        },
        "results": results,
    }
    with open(args.out, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
