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
    enable_compile_cache()


def enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user dir.

    A transcoder CLI is a short-lived process: without this, every
    invocation re-pays the full XLA compile of its step (~30-100 s for
    the fused kernel through a TPU tunnel) before the first tile runs.
    With it, repeat runs at the same (chain, tile, depth, dither)
    config skip straight to execution.

    ``DSD2DXD_COMPILE_CACHE``: unset -> ``~/.cache/dsd2dxd_tpu/xla``
    (honoring ``XDG_CACHE_HOME``); a path -> that dir; ``0``/``off`` ->
    disabled. ``JAX_COMPILATION_CACHE_DIR``, if the user set it, wins.
    Best-effort: an uncreatable dir just leaves caching off.
    """
    want = os.environ.get("DSD2DXD_COMPILE_CACHE", "")
    if want.lower() in ("0", "off", "none"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured jax directly
    if want:
        cache_dir = want
    else:
        base = os.environ.get("XDG_CACHE_HOME",
                              os.path.join(os.path.expanduser("~"),
                                           ".cache"))
        cache_dir = os.path.join(base, "dsd2dxd_tpu", "xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # the per-tile steps compile in ~1-10 s on CPU — cache those too,
    # not just the multi-minute tunnel compiles
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


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
