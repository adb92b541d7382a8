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


def batch_devices() -> list:
    """Devices for file-level data parallelism: the CLI round-robins the
    file batch across them, one pipeline per device — the TPU analog of
    the reference's Rayon one-file-per-thread fan-out (reference
    src/main.rs:279-297; SURVEY.md §2.6)."""
    import jax

    return list(jax.devices())


def stream_mesh():
    """A 1-device-axis Mesh for sharding ONE stream's overlap-save tiles
    across every device (parallel/sharded.py), or None unless enabled
    with DSD2DXD_SHARD_STREAM=1. Opt-in: file-level DP is the better
    default for batches; tile-sharding wins for a single big file."""
    if os.environ.get("DSD2DXD_SHARD_STREAM") != "1":
        return None
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        return None
    return Mesh(np.array(devs), ("tile",))
