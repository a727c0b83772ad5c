"""Render + frontend + matching + tracks for the config-5 sequence,
cached to an npz so packing/BA experiments iterate without re-paying
the ~12 min 10k-frame frontend (CONFIG5_10K_r04: render 312 s +
frontend 685 s + matching 30 s of the 886 s host total).

Saves per-frame keypoint coords + descriptors (ragged -> concat +
offsets), the consecutive pair matches (ragged -> concat + offsets),
ground-truth poses and intrinsics.  Descriptors are kept because the
keyframed init re-matches non-consecutive KEYFRAME pairs downstream
(sequence_init.initialize_sequence).

Usage:  python scripts/cache_chain_inputs.py --frames 1000
Output: artifacts/chain_cache_{frames}.npz

Reference counterpart: none (north-star scope, BASELINE.md config 5).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def cache_path(frames: int) -> str:
    root = os.path.join(os.path.dirname(__file__), "..")
    return os.path.join(root, "artifacts", f"chain_cache_{frames}.npz")


def load_cache(frames: int):
    """(xs, ys, pair_matches, R_gt, t_gt, intr) from the npz cache.

    xs/ys: list of [k_f] arrays; pair_matches: list of [M_p, 2].
    NOTE: npz members must be extracted ONCE before slicing per frame —
    `d["name"]` decompresses the whole member on every access, and a
    per-frame access pattern turns a 1 GB cache into an hours-long,
    tens-of-GB decompression loop (measured at 10k frames)."""
    d = np.load(cache_path(frames))
    ko = d["kp_offsets"]
    kx, ky = d["kp_x"], d["kp_y"]
    xs = [kx[ko[i]:ko[i + 1]] for i in range(len(ko) - 1)]
    ys = [ky[ko[i]:ko[i + 1]] for i in range(len(ko) - 1)]
    mo = d["match_offsets"]
    ms = d["matches"]
    pm = [ms[mo[i]:mo[i + 1]] for i in range(len(mo) - 1)]
    return xs, ys, pm, d["R_gt"], d["t_gt"], d["intr"]


class _Feat:
    """Duck-typed stand-in for FeaturesResult (x/y/descriptors + len)."""

    def __init__(self, x, y, descriptors):
        self.x = x
        self.y = y
        self.descriptors = descriptors

    def __len__(self):
        return len(self.x)


def load_cache_feats(frames: int):
    """(feats, pair_matches, R_gt, t_gt, intr) with feats exposing
    .x/.y/.descriptors — enough for tracks/sequence_init/packing
    experiments."""
    d = np.load(cache_path(frames))
    ko = d["kp_offsets"]
    desc = d["desc"]
    kx, ky = d["kp_x"], d["kp_y"]     # extract ONCE (see load_cache)
    feats = [_Feat(kx[ko[i]:ko[i + 1]], ky[ko[i]:ko[i + 1]],
                   desc[ko[i]:ko[i + 1]]) for i in range(len(ko) - 1)]
    mo = d["match_offsets"]
    ms = d["matches"]
    pm = [ms[mo[i]:mo[i + 1]] for i in range(len(mo) - 1)]
    return feats, pm, d["R_gt"], d["t_gt"], d["intr"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--f", type=float, default=260.0)
    ap.add_argument("--max-features", type=int, default=500)
    args = ap.parse_args()

    from local_features_tpu.utils.platform import apply_platform_env
    apply_platform_env(default="cpu")

    from local_features_tpu.api import LocalFeatures
    from local_features_tpu.ops.matching import (match_consecutive,
                                                 pad_descriptor_sequence)
    from local_features_tpu.utils.image import load_gray_pil
    from local_features_tpu.utils.phototex import render_layered_sequence

    root = os.path.join(os.path.dirname(__file__), "..")
    bg = load_gray_pil(os.path.join(root, "sample_data/houses.jpg"))
    fg = load_gray_pil(os.path.join(root, "sample_data/bird.jpg"))
    t0 = time.perf_counter()
    frames, R_gt, t_gt, intr = render_layered_sequence(
        bg.astype(np.float32), fg.astype(np.float32),
        n_frames=args.frames, height=args.height, width=args.width,
        f=args.f)
    print(f"render {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    lf = LocalFeatures(max_features=args.max_features)
    feats = lf.detect_sequence(frames, args.max_features)
    print(f"frontend {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    descs, dvalid = pad_descriptor_sequence(feats)
    pair_matches = match_consecutive(descs, dvalid)
    print(f"matching {time.perf_counter() - t0:.1f}s", flush=True)

    xs = [np.asarray(f.x, np.float32) for f in feats]
    ys = [np.asarray(f.y, np.float32) for f in feats]
    ko = np.zeros(len(xs) + 1, np.int64)
    np.cumsum([len(x) for x in xs], out=ko[1:])
    pm = [np.asarray(m, np.int32).reshape(-1, 2) for m in pair_matches]
    mo = np.zeros(len(pm) + 1, np.int64)
    np.cumsum([len(m) for m in pm], out=mo[1:])
    os.makedirs(os.path.join(root, "artifacts"), exist_ok=True)
    np.savez_compressed(
        cache_path(args.frames),
        kp_x=np.concatenate(xs) if xs else np.zeros(0, np.float32),
        kp_y=np.concatenate(ys) if ys else np.zeros(0, np.float32),
        kp_offsets=ko,
        matches=(np.concatenate(pm) if pm
                 else np.zeros((0, 2), np.int32)).astype(np.int32),
        match_offsets=mo,
        desc=np.concatenate(
            [np.asarray(f.descriptors, np.float16) for f in feats])
        if feats else np.zeros((0, 128), np.float16),
        R_gt=R_gt, t_gt=t_gt, intr=np.asarray(intr, np.float32))
    print(f"wrote {cache_path(args.frames)}", flush=True)


if __name__ == "__main__":
    main()
