"""Data-parallel batched front-end over a device mesh."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.frontend import FrontendConfig, FrontendResult, detect_extract


def make_mesh(devices=None, axis: str = "batch") -> Mesh:
    """1-D device mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def batched_detect_extract(
    imgs: jnp.ndarray,
    cfg: FrontendConfig,
    pca_mean: jnp.ndarray,
    pca_proj: jnp.ndarray,
    top_n,
    min_size,
    patch_scale_factor,
) -> FrontendResult:
    """vmap of the single-image front-end over a [B, H, W] frame batch.

    All per-frame shapes are static, so the batch dimension vectorizes
    cleanly; XLA fuses across frames where profitable.
    """
    fn = lambda img: detect_extract(
        img, cfg, pca_mean, pca_proj, top_n, min_size, patch_scale_factor
    )
    return jax.vmap(fn)(imgs)


def sharded_detect_extract(
    mesh: Mesh,
    cfg: FrontendConfig,
    axis: str = "batch",
):
    """Build a jitted, mesh-sharded batched front-end.

    Returns fn(imgs[B, H, W], pca_mean, pca_proj, top_n, min_size, psf)
    with B sharded over the mesh axis; every output keeps the same
    batch sharding.  B must be divisible by the mesh size.
    """
    in_shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def fn(imgs, pca_mean, pca_proj, top_n, min_size, psf):
        imgs = jax.lax.with_sharding_constraint(imgs, in_shard)
        return batched_detect_extract(
            imgs, cfg, pca_mean, pca_proj, top_n, min_size, psf
        )

    def run(imgs, pca_mean, pca_proj, top_n, min_size, psf):
        imgs = jax.device_put(imgs, in_shard)
        pca_mean = jax.device_put(pca_mean, rep)
        pca_proj = jax.device_put(pca_proj, rep)
        return fn(imgs, pca_mean, pca_proj, top_n, min_size, psf)

    return run
