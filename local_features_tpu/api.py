"""Public API: the `LocalFeatures` engine.

Mirrors the reference Python bindings
(python/src/lib.rs:43-149: LocalFeatures(max_image_width,
max_image_height, max_features, max_blobs, n_scales, pca) with
detect / detect_top_n) while being TPU-native underneath: construction
wires up jit caches (the analog of the reference's one-time taskgraph
compile + constant upload, vulkan/mod.rs:253-344); each distinct image
shape triggers one XLA compile and is cached thereafter.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as C
from .ops.frontend import FrontendConfig, detect_extract
from .pca import load_pca
from .types import FeaturesResult, Keypoint


class LocalFeatures:
    """Scale-space keypoint detector + MKD descriptor engine on TPU.

    Parameters mirror BuildTimeParams (lib.rs:55-75).  `max_image_*` are
    accepted for API parity but shapes are handled per-call: each distinct
    input (H, W) compiles once and is cached.
    """

    def __init__(
        self,
        max_image_width: int = 0,
        max_image_height: int = 0,
        max_features: int = 2000,
        max_blobs: int = 8000,
        n_scales: int = 4,
        pca: str = "liberty",
        patch_scale_factor: float = C.DEFAULT_PATCH_SCALE_FACTOR,
        sampler: str = "auto",
        interpret: bool = False,
    ):
        if sampler == "auto":
            # Pallas sampler on TPU; exact XLA gather elsewhere (CPU tests)
            sampler = "pallas" if jax.default_backend() != "cpu" else "xla"
        self.sampler = sampler
        self.max_image_width = max_image_width
        self.max_image_height = max_image_height
        self.max_features = int(max_features)
        self.max_blobs = int(max_blobs)
        self.n_scales = int(n_scales)
        self.pca_name = pca
        self.patch_scale_factor = float(patch_scale_factor)
        mean, proj = load_pca(pca).attenuated
        self._mean = jnp.asarray(mean)
        self._proj = jnp.asarray(proj)
        self._jit_cache: dict = {}

    # -- compiled pipeline -------------------------------------------------

    def _compiled(self, shape: tuple[int, int], all_blobs: bool) -> Callable:
        key = (shape, all_blobs)
        fn = self._jit_cache.get(key)
        if fn is None:
            cfg = FrontendConfig(
                n_scales=self.n_scales,
                max_blobs=self.max_blobs,
                max_keypoints=self.max_features,
                max_filtered=self.max_blobs if all_blobs else self.max_features,
                sampler=self.sampler,
            )

            @functools.partial(jax.jit, static_argnums=())
            def fn(img, top_n, min_size, psf):
                return detect_extract(
                    img, cfg, self._mean, self._proj, top_n, min_size, psf
                )

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    # -- public API --------------------------------------------------------

    def detect(self, img: np.ndarray) -> FeaturesResult:
        """All keypoints up to capacity (reference `detect_extract_all`)."""
        return self._run(img, top_n=self.max_blobs, min_size=0.0,
                         all_blobs=True)

    def detect_top_n(
        self, img: np.ndarray, n: int, min_size: float = 0.0
    ) -> FeaturesResult:
        """Strongest-n-blobs variant (reference `detect_top_n`,
        vulkan/mod.rs:353-361)."""
        n = min(int(n), self.max_blobs)
        return self._run(img, top_n=n, min_size=float(min_size),
                         all_blobs=n > self.max_features)

    def _run(self, img, top_n, min_size, all_blobs) -> FeaturesResult:
        img = np.asarray(img, dtype=np.float32)
        if img.ndim != 2:
            raise ValueError(f"expected [H, W] grayscale image, got {img.shape}")
        fn = self._compiled(img.shape, all_blobs)
        res = fn(jnp.asarray(img), jnp.int32(top_n),
                 jnp.float32(min_size), jnp.float32(self.patch_scale_factor))
        return self._to_host(res)

    @staticmethod
    def _to_host(res) -> FeaturesResult:
        valid = np.asarray(res.valid)
        n = int(np.asarray(res.n_keypoints))
        # valid slots are always a prefix (order-preserving compaction)
        kp = np.stack(
            [np.asarray(res.x)[:n], np.asarray(res.y)[:n],
             np.asarray(res.size)[:n], np.asarray(res.angle)[:n],
             np.asarray(res.response)[:n]], axis=1
        ).astype(np.float32)
        desc = np.asarray(res.descriptors)[:n]
        return FeaturesResult(
            keypoints_array=kp,
            descriptors=desc,
            dropped_blobs=int(np.asarray(res.dropped_blobs)),
            dropped_features=int(np.asarray(res.dropped_features)),
        )
