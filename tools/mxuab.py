"""On-chip interleaved A/B of the fused kernel's MXU composed head.

mxu=False (default: every stage as VPU slice-FMAs) vs mxu=True
(`mxu_head_count` leading stages composed into one bf16 systolic
matmul — see ops/fused.py). The round-4 single-fetch A/B read "wash",
but that protocol carried the tunnel's ~28 ms fetch intercept on both
arms (ratios compressed toward 1), and the intercept-free floor refit
(tools/floorprof.py slope run, 2026-08-20) moved FMA from ~26% to
~63% of the deep-cell block cost — so the question is live again.

Both variants build in ONE process; each arm is a rounds-slope
measurement (intercept-free) and arms alternate in pairs with the
median-of-pairs ratio reported (tools/timing.py).

    python tools/mxuab.py [--cells DSD512:352800,...] [--pairs 5]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

# the deep 44.1k cells standing nearest the floor (plain-path only:
# the MXU head applies to the fused cascade, rational heads included
# via their plain head chain)
CELLS = [
    ("DSD512", 352800), ("DSD256", 192000), ("DSD256", 1411200),
    ("DSD256", 352800),
]


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default=None)
    ap.add_argument("--pairs", type=int, default=5)
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
        big = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024, rate.hz)
        bb = fused.pick_block_bytes(chain, rate.hz)
        cfg = StepConfig(channels=2, tile_bytes=big, bit_depth=24,
                         dither=DitherType.TPDF, level_db=0.0)
        rational = fused.fused_plan(chain) is None
        steps = {}
        try:
            for mxu in (False, True):
                if rational:
                    step, _h, _lay = fused.make_fused_rational_step(
                        chain, cfg, block_bytes=bb, emit="planes",
                        mxu=mxu)
                    n_head = fused.fused_rational_plan(chain)
                    g = fused.fused_plan(chain[:n_head])[1]

                    def make_state(chain=chain):
                        h, hist = fused.init_fused_rational_state(chain, 2)
                        return (jnp.asarray(h), hist)
                else:
                    step, _h, _lay = fused.make_fused_step(
                        chain, cfg, block_bytes=bb, emit="planes",
                        mxu=mxu)
                    g = fused.fused_plan(chain)[1]

                    def make_state(chain=chain):
                        return jnp.asarray(fused.init_fused_halo(chain, 2))
                steps[mxu] = step
        except Exception as e:
            print(f"{rate_name}->{out_hz}: build failed: "
                  f"{str(e).splitlines()[0][:140]}")
            continue
        tiles = timing.stage_tiles(
            lambda a, g=g: fused.prep_input(a, g), rng, big, n_tiles=6)

        def run(step):
            return timing.slope_run(step, make_state, tiles, digest,
                                    reps=1)

        try:  # first dispatch is where Mosaic compilation fails
            timing.timed_run(steps[False], make_state, tiles, digest)
            timing.timed_run(steps[True], make_state, tiles, digest)
        except Exception as e:
            print(f"{rate_name}->{out_hz}: run failed: "
                  f"{str(e).splitlines()[0][:140]}")
            continue
        ta, tb, med = timing.interleaved_pairs(
            lambda: run(steps[False]), lambda: run(steps[True]),
            args.pairs)
        audio = len(tiles) * big * 8 / rate.hz
        ratios = [a / b for a, b in zip(ta, tb)]
        print(f"{rate_name}->{out_hz} block={bb} "
              f"({'rational' if rational else 'plain'}): "
              f"vpu {audio / min(ta):6.0f}x  mxu {audio / min(tb):6.0f}x  "
              f"t_vpu/t_mxu median {med:.3f} "
              f"(pairs: {' '.join(f'{r:.3f}' for r in ratios)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
