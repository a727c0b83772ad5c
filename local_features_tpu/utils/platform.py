"""Platform selection helper.

The hosting environment may pin JAX's platform via machinery that wins
over a `JAX_PLATFORMS=` process-env prefix (an env-forcing site hook),
so scripts that should run on CPU need the in-process override.  Setting
`LF_PLATFORM=cpu` (or `tpu`) and calling `apply_platform_env()` before
the first JAX computation does that reliably; tests do the equivalent in
conftest.py.
"""

from __future__ import annotations

import os


def apply_platform_env(var: str = "LF_PLATFORM",
                       default: str | None = None) -> str | None:
    """If env `var` is set (else `default`), force that JAX platform.

    Returns the applied value, if any.  Scripts that must never contend
    for the (single, tunneled) TPU pass default="cpu"."""
    value = os.environ.get(var) or default
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    return value or None
