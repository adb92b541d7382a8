"""On-chip interleaved A/B of the fused kernel's unpack variants.

unpack="bitcast" (_pm1: 3 int ops/row, stage-0 multiply) vs
unpack="signmask" (_sgn: 2 int ops/row, stage-0 XOR sign-flip) — see
ops/fused.py. The round-3 floor decomposition pinned the per-block
floor in tap-independent per-lane work (8G-row unpack + layout +
epilogue), so −1 op per unpacked element is a direct attack on it;
this tool decides whether it lands.

Both variants are built in ONE process and timed in alternating
pairs (A,B,A,B,...) with the median-of-pairs ratio reported — the only
trustworthy protocol on this box (clock flutters ±40%; device-only
numbers still vary ~±8% through the tunnel).

    python tools/unpackbench.py [--cells DSD512:352800,...] [--pairs 7]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

# floor-bound cells first (the lever's target), one shallow control
CELLS = [
    ("DSD512", 352800), ("DSD256", 192000), ("DSD256", 352800),
    ("DSD64", 88200), ("DSD64", 352800),
]


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()  # reuse XLA compiles across tool runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default=None)
    ap.add_argument("--pairs", type=int, default=7)
    ap.add_argument("--tile-mib", type=int, default=16)
    args = ap.parse_args()

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

    cells = CELLS
    if args.cells:
        cells = [(n, int(o)) for n, o in
                 (c.split(":") for c in args.cells.split(","))]
    rng = np.random.default_rng(0)
    digest = timing.make_digest()

    for rate_name, out_hz in cells:
        rate = DsdRate[rate_name]
        chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
        bb = fused.pick_block_bytes(chain, rate.hz)
        big = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024, rate.hz)
        cfg = StepConfig(channels=2, tile_bytes=big, bit_depth=24,
                         dither=DitherType.TPDF, level_db=0.0)
        rational = fused.fused_plan(chain) is None
        steps = {}
        try:
            for variant in ("bitcast", "signmask"):
                if rational:
                    step, _h, _l = fused.make_fused_rational_step(
                        chain, cfg, block_bytes=bb, emit="planes",
                        unpack=variant)
                    n_head = fused.fused_rational_plan(chain)
                    g = fused.fused_plan(chain[:n_head])[1]

                    def make_state(chain=chain):
                        h, hist = fused.init_fused_rational_state(chain, 2)
                        return (jnp.asarray(h), hist)
                else:
                    step, _h, _l = fused.make_fused_step(
                        chain, cfg, block_bytes=bb, emit="planes",
                        unpack=variant)
                    g = fused.fused_plan(chain)[1]

                    def make_state(chain=chain):
                        return jnp.asarray(fused.init_fused_halo(chain, 2))
                steps[variant] = step
        except Exception as e:  # Mosaic/XLA raise more than ValueError;
            # one bad cell must not kill the unattended overnight sweep
            print(f"{rate_name}->{out_hz}: build failed: "
                  f"{str(e).splitlines()[0][:160]}")
            continue
        tiles = timing.stage_tiles(
            lambda a, g=g: fused.prep_input(a, g), rng, big, n_tiles=6)

        def run(step):
            # per-arm rounds slope: a raw timed_run pair shares the
            # tunnel's ~28 ms fetch intercept, which compresses the
            # ratio toward 1 (a real 20% win read as ~13%)
            return timing.slope_run(step, make_state, tiles, digest,
                                    reps=1)

        # warm both compiles, then interleaved pairs; first dispatch is
        # where Mosaic compilation actually fails — skip the cell, not
        # the sweep
        try:
            timing.timed_run(steps["bitcast"], make_state, tiles, digest)
            timing.timed_run(steps["signmask"], make_state, tiles, digest)
        except Exception as e:
            print(f"{rate_name}->{out_hz}: run failed: "
                  f"{str(e).splitlines()[0][:160]}")
            continue
        ta_all, tb_all, med = timing.interleaved_pairs(
            lambda: run(steps["bitcast"]),
            lambda: run(steps["signmask"]), args.pairs)
        ratios = [a / b for a, b in zip(ta_all, tb_all)]
        audio = len(tiles) * big * 8 / rate.hz
        print(f"{rate_name}->{out_hz} block={bb} "
              f"({'rational' if rational else 'plain'}): "
              f"bitcast {audio / min(ta_all):6.0f}x  "
              f"signmask {audio / min(tb_all):6.0f}x  "
              f"speedup median {med:.3f} "
              f"(pairs: {' '.join(f'{r:.3f}' for r in ratios)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
