"""Observability: per-phase timing and device profiling.

The reference's observability surface is `log` tracing around submits,
readback-count debug logs, and drop counters in the result struct
(SURVEY.md §5).  TPU-native equivalents:
- drop counters live on FeaturesResult / FrontendResult (same contract)
- `phase_timer` wraps host-visible phases with wall-clock logging
- `device_trace` wraps a block in a jax.profiler trace for xprof dumps
SfM state serialization (checkpoint/resume) lives in sfm/io.py.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger("local_features_tpu")


@contextlib.contextmanager
def phase_timer(name: str, sync=None):
    """Log wall time of a phase.  Pass `sync=jax.block_until_ready`-able
    output getter to fence device work."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync() if callable(sync) else sync)
        logger.info("%s: %.2f ms", name, (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/lf_tpu_trace"):
    """jax.profiler trace context (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
