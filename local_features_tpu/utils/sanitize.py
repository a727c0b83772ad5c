"""Runtime sanitizers: checkify-instrumented front-end invariants.

The reference gets memory-safety checking from Rust and vulkan
validation layers (SURVEY.md §5 "race detection / sanitizers"); the XLA
analog is `jax.experimental.checkify` — functional error channels that
survive jit.  `checked_detect_extract` wraps the whole front-end with
the invariants that would otherwise fail silently on device:

- every valid keypoint coordinate is finite and inside the image
- every valid keypoint's size is positive
- valid descriptor rows are finite and ~unit-norm
- drop counters are non-negative

Debug use only (the checks add device work): wrap a run in CI or while
bisecting a kernel, not in production serving.  jax.debug.print-style
NaN tracing belongs here too if a hunt ever needs it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..ops.frontend import FrontendConfig, detect_extract


def frontend_invariants(res, height: int, width: int) -> None:
    """checkify.check every front-end result invariant (trace-time)."""
    v = res.valid
    fin = lambda a: jnp.isfinite(a) | ~v
    checkify.check(jnp.all(fin(res.x)), "non-finite keypoint x")
    checkify.check(jnp.all(fin(res.y)), "non-finite keypoint y")
    checkify.check(
        jnp.all((res.x >= -1.0) & (res.x <= width) | ~v),
        "keypoint x outside image",
    )
    checkify.check(
        jnp.all((res.y >= -1.0) & (res.y <= height) | ~v),
        "keypoint y outside image",
    )
    checkify.check(jnp.all((res.size > 0.0) | ~v), "non-positive size")
    checkify.check(
        jnp.all(jnp.isfinite(res.descriptors) | ~v[:, None]),
        "non-finite descriptor",
    )
    norms = jnp.linalg.norm(res.descriptors, axis=-1)
    checkify.check(
        jnp.all((jnp.abs(norms - 1.0) < 1e-2) | ~v),
        "descriptor row not unit-norm",
    )
    checkify.check(res.dropped_blobs >= 0, "negative dropped_blobs")
    checkify.check(res.dropped_features >= 0, "negative dropped_features")


def checked_detect_extract(
    img,
    cfg: FrontendConfig,
    pca_mean,
    pca_proj,
    top_n,
    min_size=0.0,
    patch_scale_factor=24.0,
):
    """Run the front-end under checkify and raise on violated invariants.

    Returns the FrontendResult; raises checkify.JaxRuntimeError (via
    err.throw()) if any invariant failed on device.
    """

    def run(im):
        res = detect_extract(im, cfg, pca_mean, pca_proj, top_n, min_size,
                             patch_scale_factor)
        frontend_invariants(res, im.shape[0], im.shape[1])
        return res

    checked = checkify.checkify(jax.jit(run))
    err, res = checked(jnp.asarray(img))
    err.throw()
    return res
