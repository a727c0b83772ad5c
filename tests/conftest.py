"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware.

Must set the env vars BEFORE jax is imported anywhere.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (the real TPU); tests must
# force CPU, so override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def test_image(rng):
    """Small synthetic image with blob-like structure at several scales."""
    h, w = 96, 128
    img = np.zeros((h, w), dtype=np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for (cx, cy, s, a) in [
        (30, 30, 2.0, 1.0), (80, 40, 4.0, -0.8), (60, 70, 3.0, 0.9),
        (100, 20, 1.5, -1.0), (20, 70, 6.0, 0.7), (110, 75, 2.5, 0.85),
    ]:
        img += a * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    img += 0.05 * rng.standard_normal((h, w)).astype(np.float32)
    img = (img - img.min()) / (img.max() - img.min())
    return img.astype(np.float32)
