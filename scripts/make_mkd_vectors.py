"""Generate the committed MKD test-vector artifacts in the reference's
own (planned) schema.

The reference defines — but never populated — golden-vector tests at
local_features/src/mkd_ref.rs:393-453: JSON files of
``[{"patch": [f32; 1024], "descriptor": [f32; D]}, ...]`` with gates
``mse < 1e-8, max_diff < 1e-4`` for the PCA-whitened 128-D descriptor
(``test_vectors/mkd_pcawt.json``) and ``mse < 1e-5, max_diff < 1e-5``
for the unwhitened 238-D descriptor (``test_vectors/mkd_no_whitening.json``).

This script materializes those files from the NumPy golden model over a
deterministic, structurally-diverse patch set and commits them under
tests/data/mkd_vectors/.  Once committed, the vectors are a FROZEN
oracle: any later change to golden/ or ops/ that shifts descriptor
semantics fails tests/test_mkd_vectors.py against files that no longer
re-derive from the changed code.

Usage: python scripts/make_mkd_vectors.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from local_features_tpu.golden.mkd import mkd_descriptor, mkd_raw_descriptor  # noqa: E402
from local_features_tpu.pca import load_pca  # noqa: E402


def make_patches() -> list[np.ndarray]:
    """Deterministic 32x32 patches covering distinct gradient regimes."""
    n = 32
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float32) / (n - 1)
    rng = np.random.default_rng(1234)
    patches = [
        xx,                                        # pure x-gradient
        yy,                                        # pure y-gradient
        0.5 + 0.5 * np.sin(6.0 * np.pi * xx),      # vertical stripes
        np.exp(-(((xx - 0.5) ** 2 + (yy - 0.5) ** 2) / 0.04)),  # blob
        ((xx * 4).astype(int) + (yy * 4).astype(int)) % 2 * 1.0,  # checker
        np.clip(rng.normal(0.5, 0.25, (n, n)), 0, 1),  # white noise
        np.zeros((n, n), np.float32),              # flat (degenerate)
    ]
    # smooth natural-ish texture: low-pass filtered noise
    z = rng.normal(0, 1, (n, n))
    f = np.fft.fftfreq(n)
    lp = 1.0 / (1.0 + ((f[:, None] ** 2 + f[None, :] ** 2) * 400.0))
    tex = np.real(np.fft.ifft2(np.fft.fft2(z) * lp))
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    patches.append(tex)
    return [p.astype(np.float32) for p in patches]


def main() -> None:
    out_dir = Path(__file__).resolve().parent.parent / "tests" / "data" / \
        "mkd_vectors"
    out_dir.mkdir(parents=True, exist_ok=True)
    mean, proj = load_pca().attenuated

    raw_cases, pca_cases = [], []
    for p in make_patches():
        raw = mkd_raw_descriptor(p)
        white = mkd_descriptor(p, mean, proj)
        assert raw.shape == (238,) and white.shape == (128,)
        raw_cases.append({"patch": p.reshape(-1).tolist(),
                          "descriptor": raw.tolist()})
        pca_cases.append({"patch": p.reshape(-1).tolist(),
                          "descriptor": white.tolist()})

    (out_dir / "mkd_no_whitening.json").write_text(json.dumps(raw_cases))
    (out_dir / "mkd_pcawt.json").write_text(json.dumps(pca_cases))
    print(f"wrote {len(raw_cases)} cases to {out_dir}")


if __name__ == "__main__":
    main()
