"""On-chip sweep of the fused kernel's per-grid-step block size.

DEFAULT_BLOCK_BYTES (16 KiB) sets how much input each Pallas grid step
consumes. All rate-matrix cells do ~5.2-5.7M slice-FMA elements per
16 KiB block (see round-3 cost model), so per-block overhead (grid
bookkeeping, DMA issue, rotate-heavy epilogues on short lanes) taxes
every cell equally in block units — and deep cells 4-8x harder in
real-time units, because they chew that many more input blocks per
audio second. This sweep measures whether a bigger block amortizes it.

    python tools/blockbench.py [--cells DSD512:352800,...]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

CELLS = [
    ("DSD64", 352800), ("DSD64", 88200),
    ("DSD256", 192000), ("DSD512", 352800),
]
BLOCKS = [8192, 16384, 32768, 65536, 131072]


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()  # reuse XLA compiles across tool runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default=None)
    ap.add_argument("--blocks", default=None)
    ap.add_argument("--tile-mib", type=int, default=16)
    ap.add_argument("--mxu", choices=["on", "off"], default="off",
                    help="MXU head on eligible cells (A/B vs slice-FMA; "
                         "chip bake-off was a wash, default off)")
    ap.add_argument("--unpack", choices=["bitcast", "legacy", "signmask"],
                    default="bitcast",
                    help="±1 unpack variant: bitcast sign-bit surgery "
                         "(default), legacy shift/and/convert/mul/add, or "
                         "signmask (2-op rows + stage-0 XOR; interleaved "
                         "A/B lives in tools/unpackbench.py)")
    args = ap.parse_args()
    mxu = args.mxu == "on"

    import jax
    import jax.numpy as jnp

    import timing

    from dsd2dxd_tpu.filters.design import get_chain
    from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops.resample import StepConfig
    from dsd2dxd_tpu.pipeline.engine import _tile_bytes_for

    if jax.default_backend() != "tpu":
        print(f"ERROR: backend is {jax.default_backend()}", file=sys.stderr)
        return 2

    if args.unpack == "legacy":
        # value = 1 - 2*bit(inv) == the pre-round-3 int→float unpack,
        # same op count (shift/and/convert/mul/add)
        fused._pm1 = lambda inv, shift: (
            ((inv >> shift) & 1).astype(jnp.float32) * -2.0 + 1.0)

    cells = CELLS
    if args.cells:
        cells = [(n, int(o)) for n, o in
                 (c.split(":") for c in args.cells.split(","))]
    blocks = BLOCKS if not args.blocks else [
        int(b) for b in args.blocks.split(",")]
    rng = np.random.default_rng(0)
    digest = timing.make_digest()

    for rate_name, out_hz in cells:
        rate = DsdRate[rate_name]
        chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
        big = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024,
                              rate.hz)
        cfg = StepConfig(channels=2, tile_bytes=big, bit_depth=24,
                         dither=DitherType.TPDF, level_db=0.0)
        rational = fused.fused_plan(chain) is None
        print(f"{rate_name}->{out_hz} tile={big} "
              f"({'rational' if rational else 'plain'}):")
        for bb in blocks:
            if big % bb:
                print(f"  block={bb:>7}: tile not divisible, skip")
                continue
            try:
                unpack = "signmask" if args.unpack == "signmask" else None
                if rational:
                    step, halo_b, _layout = fused.make_fused_rational_step(
                        chain, cfg, block_bytes=bb, emit="planes",
                        mxu=mxu, unpack=unpack)
                    n_head = fused.fused_rational_plan(chain)
                    g = fused.fused_plan(chain[:n_head])[1]

                    def make_state(chain=chain):
                        h, hist = fused.init_fused_rational_state(chain, 2)
                        return (jnp.asarray(h), hist)
                else:
                    step, halo_b, _layout = fused.make_fused_step(
                        chain, cfg, block_bytes=bb, emit="planes",
                        mxu=mxu, unpack=unpack)
                    g = fused.fused_plan(chain)[1]

                    def make_state(chain=chain):
                        return jnp.asarray(fused.init_fused_halo(chain, 2))
            except Exception as e:  # alignment/VMEM constraints
                print(f"  block={bb:>7}: build failed: {e}")
                continue
            tiles = timing.stage_tiles(
                lambda a, g=g: fused.prep_input(a, g), rng, big, n_tiles=6)

            try:
                # warm: first dispatch is where Mosaic fails
                timing.timed_run(step, make_state, tiles, digest)
            except Exception as e:
                print(f"  block={bb:>7}: run failed: "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            # rounds-slope: cancels the tunnel's ~28 ms fetch intercept,
            # which compressed every block-size delta toward zero
            best = timing.slope_run(step, make_state, tiles, digest)
            xrt = timing.xrt(len(tiles) * big * 8 / rate.hz, best)
            us_per_16k = best / (len(tiles) * big / 16384) * 1e6
            print(f"  block={bb:>7}: {xrt:6.0f}x RT   "
                  f"{us_per_16k:6.2f} us per 16KiB-equivalent")
    return 0


if __name__ == "__main__":
    sys.exit(main())
