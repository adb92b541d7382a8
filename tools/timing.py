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


def timed_run(step, make_state, tiles, digest, rounds: int = 1) -> float:
    """One timed pass over the staged tiles (looped `rounds` times,
    state chaining across rounds — inputs are never donated, only the
    state is, so re-dispatching the same staged tiles is free extra
    device work with zero extra staging). See module docstring for why
    the single end sync must ride the stacked digests."""
    import jax.numpy as jnp
    import numpy as np

    state = make_state()
    t0 = time.perf_counter()
    ds = []
    for r in range(rounds):
        for i, xt in enumerate(tiles):
            out, _peak, state = step(xt, state, r * len(tiles) + i)
            ds.append(digest(out))
    np.asarray(jnp.stack(ds).sum(axis=0))
    return time.perf_counter() - t0


def min_of(fn: Callable[[], float], n: int = 3) -> float:
    return min(fn() for _ in range(n))


def slope_run(step, make_state, tiles, digest, r_lo: int = 1,
              r_hi: int = 5, reps: int = 3) -> float:
    """DEVICE-ONLY seconds per tile-pass, by a two-point rounds slope.

    A single-fetch timed_run through the axon tunnel carries a ~27-29 ms
    blocking round-trip INTERCEPT on its one host sync (measured
    2026-08-20: a 256 MiB XLA add chained K times fetches in
    29.4 + 0.60*(K-1) ms — 855 GB/s slope, pure-intercept offset; and
    `block_until_ready` through the tunnel returns EARLY, so the sync
    cannot be hoisted off the timed path). At 16 MiB x 8 tile runs of
    40-130 ms that intercept understated deep-cell xRT by 25-75%.
    Timing the SAME staged tiles at two round counts and taking
    (t_hi - t_lo) / (r_hi - r_lo) cancels the intercept exactly; each
    arm is min-of-`reps` so tunnel weather hits the minima, not the
    difference."""
    t_lo = min_of(lambda: timed_run(step, make_state, tiles, digest,
                                    rounds=r_lo), reps)
    t_hi = min_of(lambda: timed_run(step, make_state, tiles, digest,
                                    rounds=r_hi), reps)
    return max(t_hi - t_lo, 1e-9) / (r_hi - r_lo)


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
