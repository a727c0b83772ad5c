"""Native (C++) host runtime: threaded frame-ingestion pipeline.

Built lazily with g++ into a shared library and bound via ctypes (no
pybind11 needed).  Provides:

- fast u8->f32 grayscale / BT.601 RGB->gray conversion
- bilinear resize
- PGM/PPM loading; JPEG/PNG when the system codecs (libjpeg/libpng)
  are present at build time (`has_jpeg()`/`has_png()` report the
  capabilities of the built library)
- `FramePipeline`: a multi-threaded prefetching loader that decodes,
  converts and resizes frames on worker threads while the TPU computes —
  the data-loader role the reference fills with its native camera/upload
  path (examples/webcam/src/camera.rs, vulkan/tasks_detect.rs:20-48).

Everything degrades gracefully: `available()` is False when no compiler
is present, the build retries without each missing codec, and callers
fall back to NumPy/PIL paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "frame_pipeline.cpp")
_LIB_PATH = os.path.join(_HERE, "_frame_pipeline.so")

_lib = None
_lock = threading.Lock()
_build_error: str | None = None


def _build() -> str | None:
    """Compile the shared library if needed; returns an error string.

    Tries the full codec set first, then drops JPEG/PNG individually so
    a machine without the system libraries still gets the PNM/raw core.
    """
    if (os.path.exists(_LIB_PATH)
            and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
        return None
    attempts = [
        (["-DLF_HAVE_JPEG", "-DLF_HAVE_PNG"], ["-ljpeg", "-lpng"]),
        (["-DLF_HAVE_JPEG"], ["-ljpeg"]),
        (["-DLF_HAVE_PNG"], ["-lpng"]),
        ([], []),
    ]
    last = ""
    for defines, libs in attempts:
        cmd = (["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"]
               + defines + ["-o", _LIB_PATH, _SRC] + libs)
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=240)
        except (OSError, subprocess.TimeoutExpired) as e:
            return f"g++ invocation failed: {e}"
        if proc.returncode == 0:
            return None
        last = proc.stderr
    return f"g++ failed:\n{last}"


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lf_gray_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.lf_rgb_u8_to_gray_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.lf_resize_bilinear_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.lf_load_pnm_gray.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.lf_load_pnm_gray.restype = ctypes.c_int
        lib.lf_load_image_gray.argtypes = lib.lf_load_pnm_gray.argtypes
        lib.lf_load_image_gray.restype = ctypes.c_int
        lib.lf_probe_image.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.lf_probe_image.restype = ctypes.c_int
        lib.lf_has_jpeg.restype = ctypes.c_int
        lib.lf_has_png.restype = ctypes.c_int
        lib.lf_pipeline_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int64]
        lib.lf_pipeline_create.restype = ctypes.c_void_p
        lib.lf_pipeline_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.lf_pipeline_next.restype = ctypes.c_int
        lib.lf_pipeline_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def has_jpeg() -> bool:
    lib = _load()
    return bool(lib and lib.lf_has_jpeg())


def has_png() -> bool:
    lib = _load()
    return bool(lib and lib.lf_has_png())


def supports(path: str) -> bool:
    """Whether the built library can decode `path` natively (by suffix)."""
    if not available():
        return False
    s = path.lower()
    if s.endswith((".pgm", ".ppm", ".pnm")):
        return True
    if s.endswith((".jpg", ".jpeg")):
        return has_jpeg()
    if s.endswith(".png"):
        return has_png()
    return False


def build_error() -> str | None:
    _load()
    return _build_error


def gray_u8_to_f32(src: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    out = np.empty(src.shape, np.float32)
    lib.lf_gray_u8_to_f32(src.ctypes.data, out.ctypes.data, src.size)
    return out


def rgb_u8_to_gray_f32(src: np.ndarray) -> np.ndarray:
    """[H, W, 3] u8 -> [H, W] f32 (BT.601)."""
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.uint8)
    h, w, _ = src.shape
    out = np.empty((h, w), np.float32)
    lib.lf_rgb_u8_to_gray_f32(src.ctypes.data, out.ctypes.data, h * w)
    return out


def resize_bilinear(src: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(src, dtype=np.float32)
    h, w = src.shape
    out = np.empty((oh, ow), np.float32)
    lib.lf_resize_bilinear_f32(src.ctypes.data, h, w, out.ctypes.data,
                               oh, ow)
    return out


def load_pnm_gray(path: str, oh: int = 0, ow: int = 0) -> np.ndarray:
    """Load a PGM/PPM as f32 gray, optionally resized to (oh, ow)."""
    lib = _load()
    sh = ctypes.c_int64()
    sw = ctypes.c_int64()
    if oh and ow:
        out = np.empty((oh, ow), np.float32)
        rc = lib.lf_load_pnm_gray(path.encode(), out.ctypes.data, oh, ow,
                                  ctypes.byref(sh), ctypes.byref(sw))
    else:
        # probe header first via a tiny read to size the buffer.
        # PNM headers may contain '#' comments between any tokens
        # (handled by the C++ decoder too, frame_pipeline.cpp:91).
        with open(path, "rb") as f:
            head = f.read(1024)
        clean = b"\n".join(
            ln.split(b"#", 1)[0] for ln in head.splitlines()
        )
        parts = clean.split()
        if len(parts) < 3:
            raise IOError(f"{path}: could not parse PNM header")
        h, w = int(parts[2]), int(parts[1])
        out = np.empty((h, w), np.float32)
        rc = lib.lf_load_pnm_gray(path.encode(), out.ctypes.data, 0, 0,
                                  ctypes.byref(sh), ctypes.byref(sw))
    if rc != 0:
        raise IOError(f"lf_load_pnm_gray({path}) failed with {rc}")
    return out


def probe_image(path: str) -> tuple[int, int]:
    """(height, width) of any supported image, without decoding pixels."""
    lib = _load()
    sh = ctypes.c_int64()
    sw = ctypes.c_int64()
    rc = lib.lf_probe_image(path.encode(), ctypes.byref(sh),
                            ctypes.byref(sw))
    if rc != 0:
        raise IOError(f"lf_probe_image({path}) failed with {rc}")
    return int(sh.value), int(sw.value)


def load_image_gray(path: str, oh: int = 0, ow: int = 0) -> np.ndarray:
    """Load any supported image (PNM always; JPEG/PNG when built with the
    system codecs) as f32 gray, optionally resized to (oh, ow)."""
    lib = _load()
    if not (oh and ow):
        oh_probe, ow_probe = probe_image(path)
        out = np.empty((oh_probe, ow_probe), np.float32)
        oh, ow = 0, 0
    else:
        out = np.empty((oh, ow), np.float32)
    sh = ctypes.c_int64()
    sw = ctypes.c_int64()
    rc = lib.lf_load_image_gray(path.encode(), out.ctypes.data, oh, ow,
                                ctypes.byref(sh), ctypes.byref(sw))
    if rc != 0:
        raise IOError(f"lf_load_image_gray({path}) failed with {rc}")
    return out


class FramePipeline:
    """Threaded prefetching frame loader -> f32 gray frames (PNM always;
    JPEG/PNG when the library was built with the system codecs).

    Iterates frames in order while worker threads decode ahead.
    """

    def __init__(self, paths: list[str], height: int, width: int,
                 n_threads: int = 4, queue_cap: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_build_error}")
        self._lib = lib
        self.height = height
        self.width = width
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.lf_pipeline_create(
            arr, len(self._paths), height, width, n_threads, queue_cap)
        self._n = len(paths)
        self._emitted = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is None or self._emitted >= self._n:
            raise StopIteration
        out = np.empty((self.height, self.width), np.float32)
        rc = self._lib.lf_pipeline_next(self._handle, out.ctypes.data)
        if rc == -100:
            raise StopIteration
        if rc != 0:
            self._emitted += 1
            raise IOError(f"frame {self._emitted - 1} failed to load ({rc})")
        self._emitted += 1
        return out

    def close(self):
        if self._handle is not None:
            self._lib.lf_pipeline_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
