"""On-chip decomposition of a rational (48k-family) cell's step cost.

The 48k cells run `make_fused_rational_step`: the fused Pallas head
(pure ÷2^m) emits f32 base-rate samples, then XLA runs the ×160/147
banded-natural tail AND the whole finish_tile epilogue (threefry TPDF,
quantize, transpose, byte-plane split) — unlike the 44.1k cells, where
dither/quantize/planes all live in the kernel. The rate matrix hints
this XLA segment is expensive: DSD256→192k costs ~16.7 ms per 16 MiB
tile where its own ÷64 head class costs ~11.5 ms, yet the tail einsum
alone measures only 2.43 ms (tools/tailbanded.py) — so roughly half the
rational overhead is UNATTRIBUTED epilogue. This tool pins it with a
subtractive ladder, every rung a real jitted step over the same staged
tiles (tools/timing.py min-of-N protocol):

  prod      planes + TPDF @24     the production step (engine dispatch)
  nodither  planes + NONE @24     prod − nodither  = threefry PRNG
  f32       frames f32            nodither − f32   = quantize + planes
  head      fused head only       f32 − head       = tail einsum + f32
                                                     finish (gain/peak/
                                                     transpose)

    python tools/ratprof.py [--cell DSD256:192000] [--tile-mib 16]
    python tools/ratprof.py --check    (CPU interpret-mode smoke)
"""

from __future__ import annotations

import argparse
import dataclasses
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()  # reuse XLA compiles across tool runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", default="DSD256:192000")
    ap.add_argument("--tile-mib", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tiles", type=int, default=6)
    ap.add_argument("--check", action="store_true",
                    help="CPU interpret-mode smoke (tiny shapes)")
    args = ap.parse_args()
    rate_name, out_hz = args.cell.split(":")
    out_hz = int(out_hz)

    if args.check:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import timing

    from dsd2dxd_tpu.filters.design import get_chain
    from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops.resample import StepConfig
    from dsd2dxd_tpu.pipeline.engine import _tile_bytes_for

    rate = DsdRate[rate_name]
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    n_head = fused.fused_rational_plan(chain)
    assert n_head is not None, "cell is not rational (use floorprof)"
    head = tuple(chain[:n_head])
    g = fused.fused_plan(head)[1]
    bb = fused.pick_block_bytes(chain, rate.hz)
    interpret = args.check
    if args.check:
        # one kernel block, padded up to the chain's phase unit (CPU
        # backend: _tile_bytes_for would not fold the kernel block in)
        import math

        from dsd2dxd_tpu.ops.phase import (
            build_chain_plans,
            chain_tile_unit_bits,
        )

        unit_bits = chain_tile_unit_bits(build_chain_plans(chain))
        tile = math.lcm(unit_bits, bb * 8) // 8
    else:
        tile = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024, rate.hz)
    secs = tile * 8 / rate.hz
    print(f"{rate_name}->{out_hz}: head ÷{8 * g if g else '?'}-class "
          f"g={g} block={bb} tile={tile} ({secs:.2f}s audio)")

    def cfgi(depth, dither):
        return StepConfig(channels=2, tile_bytes=tile, bit_depth=depth,
                          dither=dither, level_db=0.0)

    def build(name):
        if name == "prod":
            step, _h, _lay = fused.make_fused_rational_step(
                chain, cfgi(24, DitherType.TPDF), block_bytes=bb,
                emit="planes", interpret=interpret)
        elif name == "finxla":
            # the pre-round-4 epilogue: threefry dither + XLA
            # quantize/plane split (prod - finxla = the Pallas finish
            # kernel's same-run win)
            step, _h, _lay = fused.make_fused_rational_step(
                chain, cfgi(24, DitherType.TPDF), block_bytes=bb,
                emit="planes", interpret=interpret, finish="xla")
        elif name == "nodither":
            step, _h, _lay = fused.make_fused_rational_step(
                chain, cfgi(24, DitherType.NONE), block_bytes=bb,
                emit="planes", interpret=interpret)
        elif name == "f32":
            step, _h = fused.make_fused_rational_step(
                chain, cfgi(32, DitherType.NONE), block_bytes=bb,
                interpret=interpret)
        elif name == "head":  # exactly the internal float-mode head
            hcfg = dataclasses.replace(cfgi(32, DitherType.NONE),
                                       level_db=0.0)
            hstep, _halo = fused.make_fused_step(
                head, hcfg, block_bytes=bb, interpret=interpret,
                jit=False, transpose=False)
            step = jax.jit(hstep, donate_argnums=(1,))
        else:  # plain24: the SAME head chain as its own int production
            # cell (in-kernel TPDF+quantize, byte-plane emission) — the
            # same-run comparator for the f32 head (cross-run matrix
            # numbers carry ±8% weather). NONE in --check: the on-core
            # PRNG has no CPU interpret lowering.
            step, _h, _lay = fused.make_fused_step(
                head, cfgi(24, DitherType.NONE if interpret
                           else DitherType.TPDF), block_bytes=bb,
                emit="planes", interpret=interpret)

        if name in ("head", "plain24"):
            def make_state():
                return jnp.asarray(fused.init_fused_halo(head, 2))
        else:
            def make_state():
                halo, hist = fused.init_fused_rational_state(chain, 2)
                return (jnp.asarray(halo), hist)

        return step, make_state

    rng = np.random.default_rng(7)
    tiles = timing.stage_tiles(lambda x: fused.prep_input(x, g), rng,
                               tile, n_tiles=args.tiles)
    digest = timing.make_digest()

    results = {}
    for name in ("prod", "finxla", "nodither", "f32", "head", "plain24"):
        step, make_state = build(name)
        # warm compile outside the timed region
        timing.timed_run(step, make_state, tiles[:1], digest)
        if args.check:
            results[name] = 0.0
            print(f"  {name:<8}: ok (interpret)")
            continue
        # rounds slope (not single-fetch min-of-N): the rungs are
        # differenced, and the tunnel's ~28 ms fetch intercept would
        # cancel in the differences but poison the absolute ms/tile
        # and xRT columns
        t = timing.slope_run(step, make_state, tiles, digest,
                             reps=args.runs) / len(tiles)
        results[name] = t
        print(f"  {name:<8}: {t * 1e3:7.2f} ms/tile  "
              f"({timing.xrt(secs, t):6.0f}x RT)")

    if not args.check:
        prng = results["prod"] - results["nodither"]
        qp = results["nodither"] - results["f32"]
        tail = results["f32"] - results["head"]
        fmode = results["head"] - results["plain24"]
        finwin = results["finxla"] - results["prod"]
        print(f"  ladder: head={results['head']*1e3:.2f}  "
              f"tail+f32fin={tail*1e3:.2f}  "
              f"finish(kernel)-over-f32={qp*1e3:.2f}  "
              f"in-kernel prng={prng*1e3:.2f} ms/tile  "
              f"[f32-vs-int-kernel mode: {fmode*1e3:+.2f}]  "
              f"[finish kernel vs xla: {finwin*1e3:+.2f} ms "
              f"({results['finxla']/results['prod']:.2f}x)]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
