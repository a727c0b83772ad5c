"""Image loading with reference-compatible grayscale conversion.

The reference examples load JPEGs with the Rust `image` crate (0.25) and
convert with ``DynamicImage::grayscale()`` before feeding f32 pixels to
the engine (examples/match_images/src/main.rs:45-61).  That conversion is
NOT the PIL ``convert("L")`` formula:

- `image` 0.25 computes integer Rec.709 luma
  ``(2126*R + 7152*G + 722*B) / 10000`` with truncating division into u8
  (src/color.rs, SRGB_LUMA), whereas PIL uses rounded Rec.601.
- The u8 -> f32 buffer conversion then divides by 255.

``load_gray_rust`` replicates the crate's arithmetic exactly so committed
match-set artifacts are comparable with reference runs up to JPEG-decoder
rounding (libjpeg vs zune-jpeg may differ by +-1 in a few RGB samples;
bitwise identity across decoders is not attainable).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_rgb(path: str) -> np.ndarray:
    """Decode to uint8 RGB [H, W, 3]."""
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def rgb_to_gray_rust(rgb: np.ndarray) -> np.ndarray:
    """u8 RGB -> f32 gray in [0, 1], image-crate 0.25 semantics."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    luma = (2126 * r + 7152 * g + 722 * b) // 10000  # truncating, like u8 div
    return luma.astype(np.float32) / 255.0


def load_gray_rust(path: str) -> np.ndarray:
    """f32 gray [H, W] in [0, 1] matching the reference examples' loader."""
    return rgb_to_gray_rust(load_rgb(path))


def load_gray_pil(path: str) -> np.ndarray:
    """f32 gray via PIL's Rec.601 "L" mode (kept for the demos)."""
    img = Image.open(path).convert("L")
    return np.asarray(img, dtype=np.float32) / 255.0
