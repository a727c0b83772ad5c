"""Tests for the native (C++) frame-ingestion runtime."""

import numpy as np
import pytest

from local_features_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native build unavailable: {native.build_error()}")


def test_gray_conversion(rng):
    u8 = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    got = native.gray_u8_to_f32(u8)
    np.testing.assert_allclose(got, u8.astype(np.float32) / 255.0,
                               atol=1e-7)


def test_rgb_conversion(rng):
    rgb = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    got = native.rgb_u8_to_gray_f32(rgb)
    ref = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
           + 0.114 * rgb[..., 2]).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_resize_identity(rng):
    img = rng.random((24, 32)).astype(np.float32)
    got = native.resize_bilinear(img, 24, 32)
    np.testing.assert_allclose(got, img, atol=1e-6)


def test_resize_downsample(rng):
    img = np.tile(rng.random((8, 8)).astype(np.float32), (4, 4))
    small = native.resize_bilinear(img, 16, 16)
    assert small.shape == (16, 16)
    assert np.isfinite(small).all()
    assert abs(float(small.mean()) - float(img.mean())) < 0.05


def _write_pgm(path, img_u8):
    h, w = img_u8.shape
    with open(path, "wb") as f:
        f.write(f"P5\n{w} {h}\n255\n".encode())
        f.write(img_u8.tobytes())


def _write_ppm(path, img_u8):
    h, w, _ = img_u8.shape
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(img_u8.tobytes())


def test_load_pnm(tmp_path, rng):
    g = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    p = tmp_path / "a.pgm"
    _write_pgm(p, g)
    got = native.load_pnm_gray(str(p))
    np.testing.assert_allclose(got, g.astype(np.float32) / 255.0, atol=1e-6)

    c = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    p2 = tmp_path / "b.ppm"
    _write_ppm(p2, c)
    got2 = native.load_pnm_gray(str(p2))
    ref2 = (0.299 * c[..., 0] + 0.587 * c[..., 1]
            + 0.114 * c[..., 2]).astype(np.float32) / 255.0
    np.testing.assert_allclose(got2, ref2, atol=1e-5)


def test_frame_pipeline_order_and_content(tmp_path, rng):
    frames = [rng.integers(0, 256, (16, 24), dtype=np.uint8)
              for _ in range(10)]
    paths = []
    for i, fr in enumerate(frames):
        p = tmp_path / f"f{i:03d}.pgm"
        _write_pgm(p, fr)
        paths.append(str(p))

    with native.FramePipeline(paths, 16, 24, n_threads=3,
                              queue_cap=4) as pipe:
        out = list(pipe)
    assert len(out) == 10
    for i, fr in enumerate(frames):
        np.testing.assert_allclose(out[i], fr.astype(np.float32) / 255.0,
                                   atol=1e-6)


def test_frame_pipeline_resize(tmp_path, rng):
    g = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    p = tmp_path / "a.pgm"
    _write_pgm(p, g)
    with native.FramePipeline([str(p)] * 3, 16, 24) as pipe:
        out = list(pipe)
    assert len(out) == 3 and out[0].shape == (16, 24)
    ref = native.resize_bilinear(g.astype(np.float32) / 255.0, 16, 24)
    np.testing.assert_allclose(out[0], ref, atol=1e-6)


def test_load_pnm_with_comments(tmp_path, rng):
    """PNM comments ('#' to end-of-line, legal between any header
    tokens) must not break the Python header probe (it previously read
    only 64 bytes and assumed the first 3 whitespace tokens were
    magic/w/h)."""
    g = rng.integers(0, 256, (12, 17), dtype=np.uint8)
    p = tmp_path / "c.pgm"
    comment = b"# " + b"x" * 80 + b"\n"
    with open(p, "wb") as f:
        f.write(b"P5\n" + comment + b"17 # width\n" + comment
                + b"12\n255\n")
        f.write(g.tobytes())
    got = native.load_pnm_gray(str(p))
    np.testing.assert_allclose(got, g.astype(np.float32) / 255.0, atol=1e-6)


@pytest.mark.skipif(not (native.available() and native.has_png()),
                    reason="built without libpng")
def test_load_png(tmp_path, rng):
    """Native PNG decode: gray is lossless-exact; RGB collapses through
    the same BT.601 kernel as the raw-RGB entry point."""
    from PIL import Image

    g = rng.integers(0, 256, (21, 33), dtype=np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(g, "L").save(p)
    got = native.load_image_gray(str(p))
    np.testing.assert_allclose(got, g.astype(np.float32) / 255.0, atol=0)

    c = rng.integers(0, 256, (19, 27, 3), dtype=np.uint8)
    p2 = tmp_path / "c.png"
    Image.fromarray(c, "RGB").save(p2)
    got2 = native.load_image_gray(str(p2))
    ref2 = native.rgb_u8_to_gray_f32(c)
    np.testing.assert_allclose(got2, ref2, atol=1e-6)
    assert native.probe_image(str(p2)) == (19, 27)


@pytest.mark.skipif(not (native.available() and native.has_jpeg()),
                    reason="built without libjpeg")
def test_load_jpeg(tmp_path, rng):
    """Native JPEG decode agrees with PIL's decode of the SAME file
    (both sit on libjpeg) after identical BT.601 collapse."""
    from PIL import Image

    # smooth image -> JPEG round trip is near-exact at quality 95
    yy, xx = np.mgrid[0:40, 0:56]
    c = np.stack([np.sin(xx / 9.0), np.cos(yy / 7.0),
                  np.sin((xx + yy) / 11.0)], axis=-1)
    c = ((c * 0.5 + 0.5) * 255).astype(np.uint8)
    p = tmp_path / "s.jpg"
    Image.fromarray(c, "RGB").save(p, quality=95)
    got = native.load_image_gray(str(p))
    dec = np.asarray(Image.open(p).convert("RGB"))
    ref = native.rgb_u8_to_gray_f32(dec)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    assert native.probe_image(str(p)) == (40, 56)


@pytest.mark.skipif(not (native.available() and native.has_png()),
                    reason="built without libpng")
def test_frame_pipeline_mixed_formats(tmp_path, rng):
    """The threaded loader decodes mixed PNM/PNG sources in order."""
    from PIL import Image

    g1 = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    g2 = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    p1 = tmp_path / "a.pgm"
    _write_pgm(p1, g1)
    p2 = tmp_path / "b.png"
    Image.fromarray(g2, "L").save(p2)
    with native.FramePipeline([str(p1), str(p2)], 16, 24) as pipe:
        out = list(pipe)
    assert len(out) == 2
    np.testing.assert_allclose(out[0], g1.astype(np.float32) / 255.0)
    np.testing.assert_allclose(out[1], g2.astype(np.float32) / 255.0)


def test_supports_suffix_gate():
    assert native.supports("x.pgm") and native.supports("x.ppm")
    assert native.supports("x.jpg") == native.has_jpeg()
    assert native.supports("x.png") == native.has_png()
    assert not native.supports("x.bmp")
