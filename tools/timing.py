"""Shared device-timing harness for bench.py and the chip tools.

One copy of the digest/staged-tiles/timed-run pattern that bench.py,
chipcheck.py, blockbench.py and unpackbench.py each carried (VERDICT r3
weak 4), preserving BOTH protocols:

- ``min_of``: min-of-N (absolute throughput — the best run is the one
  least polluted by tunnel weather);
- ``interleaved_pairs``: alternating A,B reps with the median of
  per-pair ratios (the only trustworthy protocol for comparing two
  variants on a box whose clock wanders ±40%, CLAUDE.md).

The timed pass itself is the load-bearing part: dispatch every staged
tile (streaming state chains them on device), fold each output into a
tiny digest, and host-sync ONCE on the digest sum — per-tile host syncs
through the axon tunnel would measure its 25-45 ms scalar round-trip
jitter, and `block_until_ready` on small buffers returns early, so the
digest must depend on every output sample.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, Sequence


def make_digest():
    """Jitted (sum, max) reduction — tiny to fetch, depends on every
    element of the tile output."""
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda p: jnp.stack(
        [jnp.sum(p).astype(jnp.float32), jnp.max(p).astype(jnp.float32)]))


def stage_tiles(prep, rng, tile_bytes: int, n_tiles: int = 6,
                channels: int = 2):
    """Synthesize random DSD byte tiles, run the step's host-side prep,
    upload via chunked_device_put (the tunnel's >1 MiB cliff), and block
    until everything is resident."""
    import jax

    from dsd2dxd_tpu.pipeline.transfer import chunked_device_put

    tiles = [chunked_device_put(prep(
        rng.integers(0, 256, size=(channels, tile_bytes), dtype="uint8")))
        for _ in range(n_tiles)]
    jax.block_until_ready(tiles)
    return tiles


def timed_run(step, make_state, tiles, digest) -> float:
    """One timed pass over the staged tiles. See module docstring for
    why the single end sync must ride the stacked digests."""
    import jax.numpy as jnp
    import numpy as np

    state = make_state()
    t0 = time.perf_counter()
    ds = []
    for i, xt in enumerate(tiles):
        out, _peak, state = step(xt, state, i)
        ds.append(digest(out))
    np.asarray(jnp.stack(ds).sum(axis=0))
    return time.perf_counter() - t0


def min_of(fn: Callable[[], float], n: int = 3) -> float:
    return min(fn() for _ in range(n))


def interleaved_pairs(fa: Callable[[], float], fb: Callable[[], float],
                      pairs: int):
    """Alternate A,B and return (ta_list, tb_list, median per-pair
    ratio ta/tb). Callers warm both arms first — the first dispatch is
    where Mosaic compilation actually fails."""
    ta, tb = [], []
    for _ in range(pairs):
        ta.append(fa())
        tb.append(fb())
    ratios = [a / b for a, b in zip(ta, tb)]
    return ta, tb, statistics.median(ratios)


def xrt(audio_seconds: float, wall: float) -> float:
    return audio_seconds / wall
