"""Platform override helper.

This image's sitecustomize registers the TPU PJRT plugin (and imports
jax) at interpreter start, so ``JAX_PLATFORMS`` set afterwards is read too
late. CLIs call :func:`apply_platform_override` first thing; setting
``SATT_PLATFORM=cpu`` forces CPU (useful for tests/CI without a TPU).
"""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    platform = os.environ.get("SATT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
