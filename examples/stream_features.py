"""Streaming feature extraction: native frame pipeline -> TPU front-end
-> consecutive-frame matching — the TPU-native analog of the reference's
webcam demo (examples/webcam): frames stream through the C++ prefetching
loader while the previous batch runs on the TPU; per-batch latency and
match counts print live.

Usage:
    python examples/stream_features.py [--n-frames 64] [--batch 8]
        [--height 240] [--width 320]
    python examples/stream_features.py --frames dir_of_pgm_files/*.pgm
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from local_features_tpu import native  # noqa: E402
from local_features_tpu.utils.platform import apply_platform_env  # noqa: E402
from local_features_tpu.ops.frontend import FrontendConfig  # noqa: E402
from local_features_tpu.ops.index import DescriptorIndex  # noqa: E402
from local_features_tpu.ops.matching import match_descriptors  # noqa: E402
from local_features_tpu.parallel import batched_detect_extract  # noqa: E402
from local_features_tpu.pca import load_pca  # noqa: E402


def _write_synthetic_pgms(out_dir: str, n: int, h: int, w: int) -> list[str]:
    """Synthetic camera stream written as PGM files (stand-in for a
    webcam; the reference demo captures v4l2 MJPG)."""
    from local_features_tpu.utils.synth import corridor_sequence

    rng = np.random.default_rng(0)
    frames, *_ = corridor_sequence(rng, n_frames=n, height=h, width=w)
    paths = []
    for i, fr in enumerate(frames):
        p = f"{out_dir}/frame{i:04d}.pgm"
        with open(p, "wb") as f:
            f.write(f"P5\n{w} {h}\n255\n".encode())
            f.write((fr * 255).astype(np.uint8).tobytes())
        paths.append(p)
    return paths


def main() -> int:
    apply_platform_env()  # LF_PLATFORM=cpu forces CPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", nargs="*", default=None,
                    help="PGM/PPM files (default: synthetic stream)")
    ap.add_argument("--n-frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--max-features", type=int, default=1000)
    ap.add_argument("--snapshot", type=int, default=None, metavar="FRAME",
                    help="take frame FRAME as a persistent snapshot and "
                    "match every later frame against its descriptor index "
                    "(the reference webcam demo's snapshot workflow) "
                    "instead of consecutive-frame matching")
    args = ap.parse_args()

    tmp = None
    if args.frames:
        paths = args.frames
    else:
        tmp = tempfile.TemporaryDirectory()
        paths = _write_synthetic_pgms(tmp.name, args.n_frames,
                                      args.height, args.width)
        print(f"synthetic stream: {len(paths)} frames")

    if not native.available():
        print(f"native loader unavailable ({native.build_error()}); "
              "falling back to PIL")

    cfg = FrontendConfig(
        n_scales=4, max_blobs=4 * args.max_features,
        max_keypoints=args.max_features, max_filtered=args.max_features,
        sampler="pallas" if jax.default_backend() != "cpu" else "xla")
    mean, proj = load_pca().attenuated
    mean, proj = jnp.asarray(mean), jnp.asarray(proj)

    @jax.jit
    def step(imgs, prev_desc, prev_valid):
        res = batched_detect_extract(imgs, cfg, mean, proj,
                                     args.max_features, 0.0, 24.0)
        d = res.descriptors
        v = res.valid
        d_prev = jnp.concatenate([prev_desc[None], d[:-1]], axis=0)
        v_prev = jnp.concatenate([prev_valid[None], v[:-1]], axis=0)
        m = jax.vmap(match_descriptors)(d, d_prev, v, v_prev)
        return res, m, d[-1], v[-1]

    B = args.batch
    K = args.max_features
    prev_desc = jnp.zeros((K, 128), jnp.float32)
    prev_valid = jnp.zeros((K,), bool)

    loader = native.FramePipeline(paths, args.height, args.width,
                                  n_threads=4, queue_cap=2 * B) \
        if native.available() else iter([])

    buf, n_frames, t0 = [], 0, time.perf_counter()
    first = True
    snap_index: DescriptorIndex | None = None
    for frame in loader:
        buf.append(frame)
        if len(buf) < B:
            continue
        imgs = jnp.asarray(np.stack(buf))
        buf = []
        res, m, prev_desc, prev_valid = step(imgs, prev_desc, prev_valid)
        nk = np.asarray(res.n_keypoints)
        if first:
            t0 = time.perf_counter()  # exclude compile from fps
            first = False
            n_frames = 0
        if args.snapshot is not None and snap_index is None \
                and n_frames + B > args.snapshot:
            i = max(0, args.snapshot - n_frames)
            snap_index = DescriptorIndex(ratio=0.75)
            snap_index.add(np.asarray(res.descriptors[i])
                           [np.asarray(res.valid[i])])
            print(f"snapshot @ frame {n_frames + i}: indexed "
                  f"{len(snap_index)} descriptors")
        if snap_index is not None:
            # batched 2-NN query against the persistent snapshot bank
            # (webcam demo's per-frame loop, main.rs:261-282)
            qm = snap_index.search(
                np.asarray(res.descriptors).reshape(-1, 128),
                valid=np.asarray(res.valid).reshape(-1))
            nm = np.asarray(qm.mask).reshape(B, -1).sum(axis=1)
            tag = "snapshot matches"
        else:
            nm = np.asarray(m.mask).sum(axis=1)
            tag = "matches"
        n_frames += B
        print(f"batch: keypoints {nk.tolist()} {tag} {nm.tolist()}")
    dt = time.perf_counter() - t0
    if n_frames:
        print(f"{n_frames} frames in {dt:.2f}s = {n_frames / dt:.1f} fps "
              "(steady state)")
    if tmp:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
