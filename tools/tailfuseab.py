"""On-chip interleaved A/B of the fused banded-tail finish kernel.

Arm A: the production rational planes step (Pallas head → XLA
banded-natural ×160/147 einsum → `make_finish_planes` epilogue).
Arm B: `finish="tail"` (`make_finish_rational`): the banded tail
matmul moves INTO the finish pass — no XLA window concat, no f32
result round-trip, no batched relayout (tools/ratprof.py attributed
~3.8 ms of the 14.3 ms DSD64→384k tile to that XLA segment).

Both arms build in ONE process; each arm is a rounds-slope
measurement (intercept-free) and arms alternate in pairs with the
median-of-pairs ratio reported (tools/timing.py).

    python tools/tailfuseab.py [--cells DSD64:384000,...] [--pairs 5]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

# the rational cells sitting furthest under the lightspeed model
# (LIGHTSPEED_r04.json: DSD64→384k 60%, DSD64→192k 87%, DSD128→384k
# 89%) plus the ratprof attribution cell
CELLS = [
    ("DSD64", 384000), ("DSD64", 192000), ("DSD128", 384000),
    ("DSD256", 192000),
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
        if fused.fused_plan(chain) is not None:
            print(f"{rate_name}->{out_hz}: not a rational cell, skipped")
            continue
        big = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024, rate.hz)
        bb = fused.pick_block_bytes(chain, rate.hz)
        cfg = StepConfig(channels=2, tile_bytes=big, bit_depth=24,
                         dither=DitherType.TPDF, level_db=0.0)
        n_head = fused.fused_rational_plan(chain)
        g = fused.fused_plan(chain[:n_head])[1]

        def make_state(chain=chain):
            h, hist = fused.init_fused_rational_state(chain, 2)
            return (jnp.asarray(h), hist)

        try:
            step_a, _h, _la = fused.make_fused_rational_step(
                chain, cfg, block_bytes=bb, emit="planes")
            step_b, _h2, _lb = fused.make_fused_rational_step(
                chain, cfg, block_bytes=bb, emit="planes", finish="tail")
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
            timing.timed_run(step_a, make_state, tiles, digest)
            timing.timed_run(step_b, make_state, tiles, digest)
        except Exception as e:
            print(f"{rate_name}->{out_hz}: run failed: "
                  f"{str(e).splitlines()[0][:140]}")
            continue
        ta, tb, med = timing.interleaved_pairs(
            lambda: run(step_a), lambda: run(step_b), args.pairs)
        audio = len(tiles) * big * 8 / rate.hz
        ratios = [a / b for a, b in zip(ta, tb)]
        print(f"{rate_name}->{out_hz} block={bb}: "
              f"planes {audio / min(ta):6.0f}x  tailfuse "
              f"{audio / min(tb):6.0f}x  t_planes/t_tail median {med:.3f} "
              f"(pairs: {' '.join(f'{r:.3f}' for r in ratios)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
