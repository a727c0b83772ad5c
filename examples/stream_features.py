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


def _render_overlay(out_dir: Path, frame_idx: int, gray: np.ndarray,
                    kx, ky, ksize, kvalid,
                    match_idx=None, match_ok=None,
                    snap_xy=None) -> None:
    """One frame of the live view: green circles per keypoint; when a
    snapshot is active, amber lines from each matched live keypoint to the
    snapshot keypoint's position (webcam/src/main.rs:261-282 draws the same
    overlay into the egui canvas)."""
    from PIL import Image, ImageDraw

    rgb = np.repeat((np.clip(gray, 0.0, 1.0) * 255.0)
                    .astype(np.uint8)[..., None], 3, axis=-1)
    im = Image.fromarray(rgb)
    draw = ImageDraw.Draw(im)
    for k in np.flatnonzero(kvalid):
        r = max(float(ksize[k]), 2.0)
        draw.ellipse([kx[k] - r, ky[k] - r, kx[k] + r, ky[k] + r],
                     outline=(90, 220, 90))
    if match_ok is not None and snap_xy is not None:
        sx, sy = snap_xy
        for k in np.flatnonzero(match_ok & kvalid):
            j = match_idx[k]
            draw.line([kx[k], ky[k], sx[j], sy[j]], fill=(250, 180, 40),
                      width=1)
    im.save(out_dir / f"frame{frame_idx:05d}.png")


def _write_filmstrip(out_dir: Path, n: int) -> None:
    """index.html filmstrip: the headless stand-in for the egui window."""
    rows = "\n".join(
        f'<img src="frame{i:05d}.png" loading="lazy">' for i in range(n))
    (out_dir / "index.html").write_text(
        "<!doctype html><title>stream_features overlay</title>"
        "<style>body{background:#111;margin:0} "
        "img{display:block;margin:4px auto}</style>\n" + rows + "\n")


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
    ap.add_argument("--overlay", default=None, metavar="DIR",
                    help="render the demo's live view: write each frame as "
                    "a PNG with keypoint circles and, once a --snapshot is "
                    "active, match lines to the snapshot keypoints "
                    "(the headless analog of the reference webcam UI's "
                    "overlay, webcam/src/main.rs:261-282), plus an "
                    "index.html filmstrip viewer")
    args = ap.parse_args()

    tmp = None
    if args.frames:
        paths = args.frames
    else:
        tmp = tempfile.TemporaryDirectory()
        paths = _write_synthetic_pgms(tmp.name, args.n_frames,
                                      args.height, args.width)
        print(f"synthetic stream: {len(paths)} frames")

    use_native = native.available() and all(map(native.supports, paths))
    if not use_native:
        why = (f"unavailable ({native.build_error()})" if
               not native.available() else "unsupported format in stream")
        print(f"native loader {why}; falling back to PIL")

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

    def _pil_frames(ps, h, w):
        from PIL import Image
        for p in ps:
            im = Image.open(p).convert("L").resize((w, h), Image.BILINEAR)
            yield np.asarray(im, np.float32) / 255.0

    loader = native.FramePipeline(paths, args.height, args.width,
                                  n_threads=4, queue_cap=2 * B) \
        if use_native else _pil_frames(paths, args.height, args.width)

    overlay_dir = None
    if args.overlay:
        overlay_dir = Path(args.overlay)
        overlay_dir.mkdir(parents=True, exist_ok=True)

    buf, n_frames, t0 = [], 0, time.perf_counter()
    first = True
    snap_index: DescriptorIndex | None = None
    snap_xy = None
    snap_abs = -1
    n_rendered = 0
    for frame in loader:
        buf.append(frame)
        if len(buf) < B:
            continue
        imgs_np = np.stack(buf)
        imgs = jnp.asarray(imgs_np)
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
            keep = np.asarray(res.valid[i])
            snap_index = DescriptorIndex(ratio=0.75)
            snap_index.add(np.asarray(res.descriptors[i])[keep])
            # bank row j <-> snapshot keypoint position (for the overlay
            # lines; main.rs keeps the snapshot keypoints alongside usearch)
            snap_xy = (np.asarray(res.x[i])[keep], np.asarray(res.y[i])[keep])
            snap_abs = n_frames + i
            print(f"snapshot @ frame {snap_abs}: indexed "
                  f"{len(snap_index)} descriptors")
        qm = None
        if snap_index is not None:
            # batched 2-NN query against the persistent snapshot bank
            # (webcam demo's per-frame loop, main.rs:261-282); only
            # frames AFTER the snapshot query it — earlier frames in the
            # snapshot's own batch predate it (and the snapshot frame
            # would just self-match)
            after = (n_frames + np.arange(B)) > snap_abs          # [B]
            qm = snap_index.search(
                np.asarray(res.descriptors).reshape(-1, 128),
                valid=(np.asarray(res.valid)
                       & after[:, None]).reshape(-1))
            nm = np.asarray(qm.mask).reshape(B, -1).sum(axis=1)
            tag = "snapshot matches"
        else:
            nm = np.asarray(m.mask).sum(axis=1)
            tag = "matches"
        if overlay_dir is not None:
            kx = np.asarray(res.x)
            ky = np.asarray(res.y)
            ks = np.asarray(res.size)
            kv = np.asarray(res.valid)
            qi = np.asarray(qm.indices).reshape(B, -1) if qm else None
            qok = np.asarray(qm.mask).reshape(B, -1) if qm else None
            for b in range(B):
                _render_overlay(
                    overlay_dir, n_frames + b, imgs_np[b],
                    kx[b], ky[b], ks[b], kv[b],
                    match_idx=qi[b] if qi is not None else None,
                    match_ok=qok[b] if qok is not None else None,
                    snap_xy=snap_xy)
                n_rendered += 1
        n_frames += B
        print(f"batch: keypoints {nk.tolist()} {tag} {nm.tolist()}")
    dt = time.perf_counter() - t0
    if n_frames:
        note = " (incl. overlay rendering)" if overlay_dir else ""
        print(f"{n_frames} frames in {dt:.2f}s = {n_frames / dt:.1f} fps "
              f"(steady state){note}")
    if overlay_dir is not None and n_rendered:
        _write_filmstrip(overlay_dir, n_rendered)
        print(f"overlay: {n_rendered} frames + index.html in {overlay_dir}/")
    if tmp:
        tmp.cleanup()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
