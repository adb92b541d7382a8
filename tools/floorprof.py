"""On-chip decomposition of the fused kernel's per-block floor.

The round-3 question: how much of the ~5.4-5.7 us/16KiB per-block cost
is tap-dependent FMA work vs tap-independent structure (block DMA,
8G-row unpack, Mosaic op/layout overhead, epilogue)? Two prior
measurements conflict in interpretation: a minimal-taps chain measured
at the same floor (structure-bound reading), while the FMA element
count also predicts the floor (compute-bound reading) — and the MXU
head wash supports the structural reading. This tool measures the
actual tap-dependence CURVE: synthetic pure-divide-by-2 chains with the
real DSD512->352.8k stage structure but tap counts scaled by
0/25/50/100%, each timed on chip. The zero intercept is the structural
floor; the slope is the real per-element FMA cost; the TPDF-vs-NONE
delta isolates the PRNG+quantize epilogue.

    python tools/floorprof.py [--block 65536] [--tile-mib 16]
    python tools/floorprof.py --check    (CPU interpret-mode smoke)
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

# real E-bank DSD512->352.8k structure (6 x /2; last stage is the sharp
# one and runs a-trous in-kernel). --stages 5 truncates to a /32
# structure (all-head, r_tail=1, the DSD64..256 -> 44.1k-family shape)
# to measure the floor WITHOUT the a-trous tail's undecimated waste.
REAL_TAPS = (18, 18, 22, 16, 18, 58)


def synth_chain(scale: float, n_stages: int = len(REAL_TAPS)):
    """Pure /2^n chain with REAL_TAPS[:n] counts scaled by `scale` (min
    2 taps — the kernel needs at least one term per phase). Taps are
    normalized hann windows: numerically tame, gain ~1."""
    from dsd2dxd_tpu.filters.design import Stage

    stages = []
    for n in REAL_TAPS[:n_stages]:
        m = max(2, int(round(n * scale)) & ~1)  # even, >= 2
        h = np.hanning(m + 2)[1:-1]
        h = (h / h.sum()).astype(np.float64)
        stages.append(Stage(taps=h, L=1, M=2))
    return tuple(stages)


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()  # reuse XLA compiles across tool runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=None,
                    help="input bytes per grid step (default: engine policy)")
    ap.add_argument("--tile-mib", type=int, default=16)
    ap.add_argument("--stages", type=int, default=len(REAL_TAPS),
                    help="number of /2 stages (6 = real /64 a-trous "
                         "structure, 5 = /32 all-head r_tail=1)")
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dsd2dxd_tpu.formats.dsd_types import DitherType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops.resample import StepConfig
    from dsd2dxd_tpu.pipeline.transfer import chunked_device_put

    in_hz = 22_579_200  # DSD512
    rng = np.random.default_rng(0)
    scales = (0.0, 0.25, 0.5, 1.0)
    dithers = (DitherType.NONE, DitherType.TPDF)
    for scale in scales:
        chain = synth_chain(scale, args.stages)
        _n_head, g, _r_tail = fused.fused_plan(chain)
        bb = args.block or fused.pick_block_bytes(chain, in_hz)
        tile = (args.tile_mib * 1024 * 1024 // bb) * bb
        if args.check:
            tile = bb * 2
        n_el = 0  # FMA elements per 16KiB block (cost-model bookkeeping)
        p_out = 8 * g
        lanes16 = 16384 // g
        for s in chain:
            if p_out > 1:
                p_out //= 2
                n_el += s.n_taps * p_out * lanes16
            else:
                n_el += s.n_taps * lanes16  # a-trous, undecimated
        row = [f"scale={scale:4.2f} taps={[s.n_taps for s in chain]} "
               f"g={g} block={bb} ({n_el / 1e6:.2f}M el/16KiB):"]
        for dither in dithers:
            cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=24,
                             dither=dither, level_db=0.0)
            try:
                step, halo_b, _layout = fused.make_fused_step(
                    chain, cfg, block_bytes=bb, emit="planes",
                    interpret=args.check)
            except Exception as e:
                row.append(f"{dither.name}: build failed "
                           f"({str(e).splitlines()[0][:60]})")
                continue
            tiles = [chunked_device_put(fused.prep_input(
                rng.integers(0, 256, size=(2, tile), dtype=np.uint8), g))
                for _ in range(2 if args.check else 6)]
            jax.block_until_ready(tiles)

            def run(rounds: int = 1):
                halo = jnp.asarray(fused.init_fused_halo(chain, 2))
                t0 = time.perf_counter()
                outs = []
                for r in range(rounds):
                    for i, xt in enumerate(tiles):
                        out, pk, halo = step(xt, halo,
                                             r * len(tiles) + i)
                        outs.append(out[0].astype(jnp.int32).sum()
                                    if isinstance(out, tuple) else
                                    out.astype(jnp.int32).sum())
                np.asarray(jnp.stack(outs).sum())
                return time.perf_counter() - t0

            try:
                run()
                if args.check:
                    best = run()
                else:
                    # two-point rounds slope: cancels the tunnel's
                    # ~28 ms blocking-fetch intercept, which inflated
                    # the per-16KiB floor fit by ~4-5 us at 16 MiB
                    # tiles (tools/timing.py slope_run rationale)
                    t1 = min(run(1) for _ in range(3))
                    t5 = min(run(5) for _ in range(3))
                    best = max(t5 - t1, 1e-9) / 4
            except Exception as e:
                row.append(f"{dither.name}: run failed "
                           f"({str(e).splitlines()[0][:80]})")
                continue
            n16 = len(tiles) * tile / 16384
            xrt = len(tiles) * tile * 8 / in_hz / best
            row.append(f"{dither.name}: {best / n16 * 1e6:5.2f} us/16KiB "
                       f"({xrt:5.0f}x DSD512RT)")
        print("  ".join(row))
    print("intercept at scale=0 = structural floor; slope vs el-count = "
          "FMA cost; TPDF-NONE delta = PRNG/quantize epilogue")
    return 0


if __name__ == "__main__":
    sys.exit(main())
