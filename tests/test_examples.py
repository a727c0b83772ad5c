"""Smoke tests for the example entry points (reference parity: the
examples are part of the public surface — webcam/src/main.rs,
match_images/src/main.rs)."""

import subprocess
import sys
from pathlib import Path

import pytest

from local_features_tpu import native

REPO = Path(__file__).resolve().parent.parent


@pytest.mark.skipif(not native.available(),
                    reason="native frame loader unavailable")
def test_stream_features_snapshot_overlay(tmp_path):
    """The webcam-demo analog end-to-end: synthetic stream -> snapshot
    index -> per-frame 2-NN matching -> rendered overlay frames + viewer
    (reference UI overlay: webcam/src/main.rs:261-282)."""
    out = tmp_path / "overlay"
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "stream_features.py"),
         "--n-frames", "8", "--batch", "4", "--height", "96",
         "--width", "128", "--max-features", "100", "--snapshot", "2",
         "--overlay", str(out)],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin", "LF_PLATFORM": "cpu",
             "HOME": "/root"},
        cwd=str(REPO),
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "snapshot @ frame 2" in r.stdout
    pngs = sorted(out.glob("frame*.png"))
    assert len(pngs) == 8
    assert (out / "index.html").exists()
    # every rendered frame is a real image of the stream's shape
    from PIL import Image

    im = Image.open(pngs[-1])
    assert im.size == (128, 96)
