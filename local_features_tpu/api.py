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


def scale_space_footprint(n_scales: int) -> int:
    """Total right/bottom border footprint of the front-end's conv
    chain: base blur (radius 2) + SWT levels (radius 2 * 2^l for
    l = 0..n_scales+1) + fine-volume subs + mip-pyramid blurs.  An image
    mirror-extended by this many pixels produces scale-space /
    fine-volume / mip values inside its actual extent that match an
    exact-shape run (the one-shot-mirror argument,
    ops/scale_space.py:scale_space_prepad), to f32 summation order."""
    swt = 2 * (2 ** (n_scales + 2) - 1)       # sum of dilated radii
    return 2 + swt + 2 * 2 ** max(n_scales - 1, 0) + 32


def _prepad_canvas(img: np.ndarray, Hp: int, Wp: int, T: int) -> np.ndarray:
    """Place `img` at the origin of an (Hp, Wp) canvas, mirror-extended
    (edge-repeated symmetric — MirroredRepeat at pixel centers) by up to
    T pixels right/bottom, zero beyond.  Extending columns after rows
    makes the corner the two-axis symmetric extension."""
    from .ops.scale_space import mirror_index_np

    h, w = img.shape
    canvas = np.zeros((Hp, Wp), np.float32)
    ey = mirror_index_np(np.arange(h, min(h + T, Hp)), h)
    ex = mirror_index_np(np.arange(w, min(w + T, Wp)), w)
    block = np.empty((h + len(ey), w + len(ex)), np.float32)
    block[:h, :w] = img
    block[h:, :w] = img[ey]
    block[:, w:] = block[:, ex]
    canvas[: block.shape[0], : block.shape[1]] = block
    return canvas


class LocalFeatures:
    """Scale-space keypoint detector + MKD descriptor engine on TPU.

    Parameters mirror BuildTimeParams (lib.rs:55-75).  Two shape modes:

    - max_image_* = 0 (default): shapes handled per call — each distinct
      (H, W) compiles once and is cached (best per-frame throughput for
      fixed-size streams).
    - max_image_* > 0: the reference's one-engine-any-size contract
      (vulkan/mod.rs:271-291) — ONE compiled executable at the padded
      max shape serves every frame with H <= max_image_height and
      W <= max_image_width with zero recompilation.  Frames are placed
      at the origin of a mirror-extended canvas (exact scale-space
      values inside the actual extent; see scale_space_footprint) and
      the actual (h, w) flows through as traced scalars.  The price is
      computing at the padded max shape every call.
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
        self.interpret = bool(interpret)
        self.max_image_width = int(max_image_width)
        self.max_image_height = int(max_image_height)
        self._padded = self.max_image_width > 0 and self.max_image_height > 0
        self._footprint = scale_space_footprint(int(n_scales))
        if self._padded:
            self._pad_shape = (self.max_image_height + self._footprint,
                               self.max_image_width + self._footprint)
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
        key = (shape, all_blobs, self._padded)
        fn = self._jit_cache.get(key)
        if fn is None:
            cfg = FrontendConfig(
                n_scales=self.n_scales,
                max_blobs=self.max_blobs,
                max_keypoints=self.max_features,
                max_filtered=self.max_blobs if all_blobs else self.max_features,
                sampler=self.sampler, interpret=self.interpret,
            )

            if self._padded:
                @functools.partial(jax.jit, static_argnums=())
                def fn(img, top_n, min_size, psf, extent):
                    return detect_extract(
                        img, cfg, self._mean, self._proj, top_n, min_size,
                        psf, extent=extent,
                    )
            else:
                @functools.partial(jax.jit, static_argnums=())
                def fn(img, top_n, min_size, psf):
                    return detect_extract(
                        img, cfg, self._mean, self._proj, top_n, min_size, psf
                    )

            self._jit_cache[key] = fn
        return self._jit_cache[key]

    # -- public API --------------------------------------------------------

    def detect(self, img: np.ndarray) -> FeaturesResult:
        """All keypoints up to capacity (reference `detect_extract_all`).

        Capacity means `max_features` keypoint slots: blobs flow through
        at `max_blobs`, each blob can emit several orientations, and the
        strongest-first compaction keeps the first `max_features` of
        them (the excess is reported in `dropped_features`) — the same
        two-tier contract as the reference's max_blobs/max_features
        build params (lib.rs:55-75).
        """
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

    def detect_with_filter(
        self, img: np.ndarray, filter_blobs: Callable, min_size: float = 0.0
    ) -> FeaturesResult:
        """Host blob-filter escape hatch — parity with the reference's
        FilterBlobs trait (vulkan/mod.rs:125-131): runs the detect phase,
        hands the candidate blob SoA (x, y, size, contrast as numpy
        arrays) to `filter_blobs`, which returns the indices to keep, then
        runs the extract phase on the kept blobs.

        `filter_blobs(x, y, size, contrast) -> index array` may return at
        most `max_features` indices (excess is truncated, reported in
        dropped counters by the extract phase).
        """
        import jax.numpy as jnp_

        from .ops.detect import BlobArrays
        from .ops.frontend import FrontendConfig, detect_phase, extract_from_blobs

        img = np.asarray(img, dtype=np.float32)
        cfg = FrontendConfig(
            n_scales=self.n_scales, max_blobs=self.max_blobs,
            max_keypoints=self.max_features, max_filtered=self.max_features,
            sampler=self.sampler, interpret=self.interpret,
        )
        key = ("phase1", img.shape)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda im, ms: detect_phase(im, cfg, ms))
            self._jit_cache[("phase2", img.shape)] = jax.jit(
                lambda coarse, filt, psf: extract_from_blobs(
                    coarse, filt, cfg, self._mean, self._proj, psf))
        coarse, blobs = self._jit_cache[key](
            jnp.asarray(img), jnp.float32(min_size))

        valid = np.asarray(blobs.valid)
        n = int(valid.sum())
        x = np.asarray(blobs.x)[:n]
        y = np.asarray(blobs.y)[:n]
        size = np.asarray(blobs.size)[:n]
        contrast = np.asarray(blobs.contrast)[:n]
        keep = np.asarray(filter_blobs(x, y, size, contrast),
                          dtype=np.int64)[: self.max_features]

        F = self.max_features
        pad = lambda a: np.pad(a[keep].astype(np.float32), (0, F - len(keep)))
        filt = BlobArrays(
            x=jnp.asarray(pad(x)), y=jnp.asarray(pad(y)),
            size=jnp.asarray(pad(size)), contrast=jnp.asarray(pad(contrast)),
            level=jnp.asarray(np.pad(
                np.asarray(blobs.level)[:n][keep], (0, F - len(keep))
            ).astype(np.int32)),
            valid=jnp.asarray(np.arange(F) < len(keep)),
            n_total=blobs.n_total, n_dropped=blobs.n_dropped,
        )
        res = self._jit_cache[("phase2", img.shape)](
            coarse, filt, jnp.float32(self.patch_scale_factor))
        return self._to_host(res)

    def _dispatch_batch(self, imgs: np.ndarray, n: int | None,
                        min_size: float):
        """Submit one [B, H, W] batch to the device WITHOUT fetching —
        JAX dispatch is async, so the returned arrays are futures the
        caller can fetch later (detect_sequence overlaps batch k+1's
        compute with batch k's host fetch this way)."""
        from .ops.frontend import FrontendConfig
        from .parallel import batched_detect_extract

        imgs = np.asarray(imgs, dtype=np.float32)
        n = self.max_features if n is None else min(int(n), self.max_blobs)
        key = ("batch", imgs.shape)
        if key not in self._jit_cache:
            cfg = FrontendConfig(
                n_scales=self.n_scales, max_blobs=self.max_blobs,
                max_keypoints=self.max_features,
                max_filtered=self.max_features, sampler=self.sampler,
                interpret=self.interpret,
            )
            self._jit_cache[key] = jax.jit(
                lambda im, nn, ms, psf: batched_detect_extract(
                    im, cfg, self._mean, self._proj, nn, ms, psf))
        return self._jit_cache[key](
            jnp.asarray(imgs), jnp.int32(n), jnp.float32(min_size),
            jnp.float32(self.patch_scale_factor))

    def _fetch_batch(self, res, keep: int) -> list[FeaturesResult]:
        """ONE device->host transfer for a dispatched batch (fetching
        per frame costs ~9 tunnel round trips x ~30 ms each on remote
        TPUs — measured 3.2 frames/s on a 120-frame sequence vs ~30
        with the batched fetch), then host-side slicing."""
        host = jax.device_get(res)
        out = []
        for b in range(keep):
            one = jax.tree.map(lambda a, i=b: a[i], host)
            out.append(self._to_host(one))
        return out

    def detect_batch(
        self, imgs: np.ndarray, n: int | None = None, min_size: float = 0.0
    ) -> list[FeaturesResult]:
        """Batched detection over [B, H, W] frames (vmapped on device)."""
        imgs = np.asarray(imgs, dtype=np.float32)
        return self._fetch_batch(self._dispatch_batch(imgs, n, min_size),
                                 imgs.shape[0])

    def detect_sequence(
        self, frames: np.ndarray, n: int | None = None,
        min_size: float = 0.0, batch: int = 8,
    ) -> list[FeaturesResult]:
        """Extract features for an ordered [F, H, W] sequence at
        bench-level throughput: frames run through the vmapped batched
        front-end `batch` at a time (ONE device call per batch instead of
        one per frame), with the tail padded to the batch size so every
        batch hits the same compiled executable.

        The loop is software-pipelined one batch deep: batch k+1 is
        DISPATCHED before batch k's result is fetched, so the device
        computes k+1 while the host blocks on k's transfer — on remote
        (tunnelled) TPUs the per-batch round trip otherwise serializes
        fetch and compute (SEQ_TPU_r04: 13.5 fps vs 222 fps for the
        same executables in the dependency-chained bench)."""
        frames = np.asarray(frames, dtype=np.float32)
        F = frames.shape[0]
        if F == 0:
            return []
        batch = max(1, min(int(batch), F))
        out: list[FeaturesResult] = []
        pending: tuple | None = None     # (device result, frames to keep)
        for s in range(0, F, batch):
            chunk = frames[s: s + batch]
            pad = batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            res = self._dispatch_batch(chunk, n, min_size)
            if pending is not None:
                out.extend(self._fetch_batch(*pending))
            pending = (res, batch - pad)
        if pending is not None:
            out.extend(self._fetch_batch(*pending))
        return out

    def detect_match_sequence(
        self, frames: np.ndarray, n: int | None = None,
        min_size: float = 0.0, batch: int = 8, ratio: float = 0.8,
    ) -> tuple[list[FeaturesResult], list[np.ndarray]]:
        """Fused sequence front-end + consecutive mutual matching with
        descriptors KEPT ON DEVICE: returns (features, pair_matches)
        where pair_matches[f] is [M, 2] (kp of frame f, kp of frame
        f+1) — identical to running detect_sequence followed by
        ops.matching.match_consecutive (CPU-pinned by
        tests/test_api.py::test_detect_match_sequence_equals_serial).

        Motivation (SEQ_TPU_r04/r05 measurements): the split path
        fetches [B, max_features, 128] f32 descriptors per batch and
        re-uploads them for matching — ~8 MB per batch each way
        through a remote-TPU tunnel whose effective bandwidth is
        ~20 MB/s, making the sequence path BANDWIDTH-bound at ~13
        frames/s while the same executables sustain 222 inside the
        dependency-chained bench.  Matching on device drops the
        transfer to keypoint arrays + match indices (~0.4 MB/batch,
        20x less); the loop is software-pipelined one batch deep on
        top (dispatch k+1, then fetch k).

        The cross-batch seam pair (last frame of batch k, first frame
        of batch k+1) is matched on device too: the previous batch's
        final descriptor row is carried as device state.
        """
        from .ops.matching import mutual_match

        frames = np.asarray(frames, dtype=np.float32)
        F = frames.shape[0]
        if F == 0:
            return [], []
        if F == 1:
            return self.detect_batch(frames, n, min_size), []
        batch = max(1, min(int(batch), F))

        mkey = ("seqmatch", batch, self.max_features, float(ratio))
        if mkey not in self._jit_cache:
            def _match_block(desc, valid, prev_desc, prev_valid,
                             has_prev):
                # pairs: (prev, 0) then (0, 1) ... (B-2, B-1)
                da = jnp.concatenate([prev_desc[None], desc[:-1]], axis=0)
                va = jnp.concatenate([prev_valid[None] & has_prev,
                                      valid[:-1]], axis=0)
                m = jax.vmap(
                    lambda a, b, x, y: mutual_match(a, b, x, y,
                                                    ratio=ratio)
                )(da, desc, va, valid)
                return m.indices, m.mask, desc[-1], valid[-1]

            self._jit_cache[mkey] = jax.jit(_match_block)

        def _dispatch(chunk):
            pad = batch - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            return self._dispatch_batch(chunk, n, min_size), batch - pad

        feats: list[FeaturesResult] = []
        pair_matches: list[np.ndarray] = []
        K = self.max_features
        prev_desc = jnp.zeros((K, 128), jnp.float32)
        prev_valid = jnp.zeros((K,), bool)
        has_prev = jnp.zeros((), bool)
        pending = None    # (res, keep, match_idx, match_mask, first_keep)
        first = True
        for s in range(0, F, batch):
            res, keep = _dispatch(frames[s: s + batch])
            idx, mask, prev_desc, prev_valid = self._jit_cache[mkey](
                res.descriptors, res.valid, prev_desc, prev_valid,
                has_prev)
            has_prev = jnp.ones((), bool)
            if pending is not None:
                self._drain_seqmatch(pending, feats, pair_matches)
            pending = (res, keep, idx, mask, first)
            first = False
        self._drain_seqmatch(pending, feats, pair_matches)
        # matches were emitted per block as [seam, intra...]; drop the
        # lead seam of block 0 (no predecessor) — handled by first_keep
        return feats, pair_matches

    def _drain_seqmatch(self, pending, feats, pair_matches):
        """ONE host fetch for a (frontend result, match block) pair;
        appends per-frame features and per-pair [M, 2] match arrays."""
        res, keep, idx, mask, is_first = pending
        host = jax.device_get(
            (res.x, res.y, res.size, res.angle, res.response, res.valid,
             res.n_keypoints, res.dropped_blobs, res.dropped_features,
             idx, mask))
        (x, y, size, angle, resp, valid, nk, db, df, idx, mask) = host
        B = x.shape[0]
        for b in range(keep):
            nb = int(nk[b])
            kp = np.stack([x[b][:nb], y[b][:nb], size[b][:nb],
                           angle[b][:nb], resp[b][:nb]],
                          axis=1).astype(np.float32)
            feats.append(FeaturesResult(
                keypoints_array=kp,
                descriptors=None,
                dropped_blobs=int(db[b]), dropped_features=int(df[b])))
            # pair (b-1, b) of this block = match row b (row 0 is the
            # cross-batch seam pair; skipped for the very first block)
            if b == 0 and is_first:
                continue
            rows = np.flatnonzero(mask[b])
            pair_matches.append(
                np.stack([rows, idx[b][rows]], axis=1).astype(np.int64))

    def _run(self, img, top_n, min_size, all_blobs) -> FeaturesResult:
        img = np.asarray(img, dtype=np.float32)
        if img.ndim != 2:
            raise ValueError(f"expected [H, W] grayscale image, got {img.shape}")
        if self._padded:
            h, w = img.shape
            if h > self.max_image_height or w > self.max_image_width:
                raise ValueError(
                    f"image {img.shape} exceeds engine max "
                    f"({self.max_image_height}, {self.max_image_width})")
            canvas = _prepad_canvas(img, *self._pad_shape, self._footprint)
            fn = self._compiled(self._pad_shape, all_blobs)
            res = fn(jnp.asarray(canvas), jnp.int32(top_n),
                     jnp.float32(min_size),
                     jnp.float32(self.patch_scale_factor),
                     (jnp.int32(h), jnp.int32(w)))
            return self._to_host(res)
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
