"""Headline benchmark: sustained device conversion throughput as a
real-time multiple (xRT) on the BASELINE.md config-1 path — DSD64 stereo
-> 24-bit 352.8 kHz PCM (Equiripple bank, TPDF dither).

Default mode measures the sustained per-tile conversion rate of the
compiled device step — 1-bit unpack -> phase-major FIR cascade -> level
-> TPDF dither -> 24-bit quantize -> peak — with streaming filter state
carried across tiles, every tile's PCM fully materialized on device and
consumed through a per-tile digest reduction; the digests are combined
and read back once at the end (the only REAL sync — np.asarray, since
block_until_ready on small buffers returns early through this tunnel,
and per-tile scalar reads would time the tunnel's 25-45 ms round-trip
jitter instead of the device). Inputs are pre-staged on device and
excluded from the timed region.

Why transfers are excluded from the headline: this environment reaches
its TPU through the experimental `axon` tunnel, whose throughput was
measured between 35 and 1100 MiB/s for IDENTICAL code minutes apart
(and with multi-second stalls) — a transfer-inclusive number here
measures tunnel weather, not the framework. The workload's actual wire
needs are tiny relative to any real attachment: 0.71 MiB/s of input and
2.8 MiB/s of output per 1x real-time, so a directly-attached PCIe host
(>10 GiB/s) amortizes transfers at >3000x real-time. `python bench.py
--e2e` times the full loop (chunked H2D + step + on-device s24 packing +
full D2H readback) through the tunnel for the record.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline is against the driver's 1000x-real-time-per-chip north star
(the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(e2e: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
    from dsd2dxd_tpu.ops.resample import StepConfig
    from dsd2dxd_tpu.pipeline.transfer import (
        chunked_device_put,
        pack24_device,
        unpack24_host,
    )

    from dsd2dxd_tpu.pipeline.engine import _cached_step

    in_hz = DsdRate.DSD64.hz
    tile_bytes = 16 * 1024 * 1024  # 16 MiB/ch per tile (~47.6 s of DSD64)
    cfg = StepConfig(channels=2, tile_bytes=tile_bytes, bit_depth=24,
                     dither=DitherType.TPDF, level_db=0.0)
    # The engine's dispatched device step: the fused single-pass Pallas
    # kernel on TPU, the XLA phase path elsewhere.
    step, make_state, prep = _cached_step(
        (FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800), cfg)
    digest = jax.jit(lambda p: jnp.stack(
        [jnp.sum(p).astype(jnp.float32), jnp.max(p).astype(jnp.float32)]))

    rng = np.random.default_rng(0)
    n_tiles = 8
    host_tiles = [rng.integers(0, 256, size=(2, tile_bytes), dtype=np.uint8)
                  for _ in range(n_tiles)]

    if not e2e:
        staged = [chunked_device_put(prep(t)) for t in host_tiles]
        jax.block_until_ready(staged)

    def run_once() -> float:
        """Dispatch all tiles (streaming state chains them on device) and
        sync once at the end: every tile's PCM is materialized (jit
        outputs are always written) and the digests depend on every
        sample. Per-tile host syncs would only measure the tunnel's
        25-45 ms scalar round-trip jitter, not the device."""
        state = make_state()
        t0 = time.perf_counter()
        digests = []
        for i in range(n_tiles):
            x = (chunked_device_put(prep(host_tiles[i])) if e2e
                 else staged[i])
            out, peak, state = step(x, state, i)
            if e2e:
                unpack24_host(np.asarray(pack24_device(out)))
            else:
                digests.append(digest(out))
        if not e2e:
            # one REAL host sync: np.asarray (block_until_ready on small
            # buffers returns early through the axon tunnel). Summing all
            # digests makes the sync depend on every tile's full PCM.
            np.asarray(jnp.stack(digests).sum(axis=0))
        return time.perf_counter() - t0

    run_once()  # compile + warmup
    best = min(run_once() for _ in range(3))

    audio_seconds = n_tiles * tile_bytes * 8 / in_hz
    xrt = audio_seconds / best
    name = "xrt_dsd64_stereo_to_352k8_24bit" + ("_e2e_tunnel" if e2e
                                                else "_device")
    print(json.dumps({
        "metric": name,
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1000.0, 3),
    }))


if __name__ == "__main__":
    main(e2e="--e2e" in sys.argv[1:])
