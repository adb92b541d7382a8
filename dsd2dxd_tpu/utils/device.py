"""Device/platform selection helpers.

The axon TPU-tunnel plugin force-overrides ``JAX_PLATFORMS`` with
"axon,cpu", so the standard env var cannot pin the CPU backend on this
kind of host. ``DSD2DXD_JAX_PLATFORM`` provides an explicit override that
is applied through ``jax.config`` (which the plugin cannot preempt).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("DSD2DXD_JAX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
