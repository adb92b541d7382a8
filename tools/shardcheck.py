"""On-chip validation of the sharded fused body (VERDICT r4 item 4).

CI proves the dispatch, halo-state splitting, seed plumbing, and
masked-peak combine on the virtual CPU mesh in interpret mode
(tests/test_sharded.py); this script shows the PRODUCTION Pallas kernel
executing inside shard_map on real hardware — a 1-device mesh on the
tunneled chip (multi-chip is unavailable, CLAUDE.md), where Mosaic
compilation under shard_map, the on-core PRNG, and the real block sizes
actually run.

Checks per cell:
- NONE 24-bit + 32-bit: `convert_stream_tiled(body="fused")` is
  BIT-EXACT vs the streaming fused step run tile-by-tile with carried
  halo state and the same `_fused_seeds` derivation (the sharded body's
  contract — parallel/sharded._fused_tile_parts).
- TPDF 24-bit: quantization-error RMS vs the float path within the
  0.45-0.55 LSB TPDF+round band; two keys produce different noise.
- perf (--perf): rounds-slope interleaved A/B of the fused body vs the
  phase body inside the same 1-device shard_map (the measured reason
  the dispatch exists).

    python tools/shardcheck.py [--perf] [--cells DSD64:352800,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np

CELLS = [
    ("DSD64", 352800), ("DSD64", 88200),
    ("DSD128", 352800), ("DSD256", 352800),
    # rational: warm-hist tile body (bit-exact past the stream head)
    ("DSD64", 96000), ("DSD128", 192000),
]


def streaming_fused_oracle(planes, chain, cfg, key, in_hz, n_dev):
    """Tile-by-tile streaming fused steps with carried halo state —
    the bit-exactness oracle for the sharded body. Shared with
    tests/test_sharded.py (one copy, so the chip gate and the CI test
    cannot drift); interpret mode is picked from the backend so the
    same oracle runs on the chip and the virtual CPU mesh."""
    import dataclasses
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.parallel.sharded import _chain_unit_bytes, _fused_seeds

    c, total = planes.shape
    block = fused.pick_block_bytes(chain, in_hz)
    unit = math.lcm(_chain_unit_bytes(chain), block)
    tile_bytes = -(-total // (n_dev * unit)) * unit
    scfg = dataclasses.replace(cfg, channels=c, tile_bytes=tile_bytes)
    step, _ = fused.make_fused_step(
        chain, scfg, block_bytes=block,
        interpret=jax.default_backend() != "tpu", jit=False)
    g = fused.fused_plan(chain)[1]
    need = n_dev * tile_bytes
    padded = np.concatenate(
        [planes, np.full((c, need - total), 0x69, np.uint8)], axis=1)
    seeds = np.asarray(_fused_seeds(key, 0, n_dev))
    state = jnp.asarray(fused.init_fused_halo(chain, c))
    outs = []
    for t in range(n_dev):
        xw = fused.prep_input(np.ascontiguousarray(
            padded[:, t * tile_bytes:(t + 1) * tile_bytes]), g)
        o, _pk, state = step(xw, state, int(seeds[t]))
        outs.append(np.asarray(o))
    return np.concatenate(outs)


def streaming_rational_oracle(planes, chain, cfg, key, in_hz, n_dev):
    """Streaming rational fused steps (carried halo+hist) with the
    sharded body's seed derivation. The sharded warm-hist tile
    computes exactly the streaming values, so the comparison is
    BIT-EXACT past the stream head (the oracle starts hist at ZERO;
    sharded tile 0 warms its hist from the idle lead window —
    parallel/sharded._fused_rational_tile_parts docstring). Shared
    with tests/test_sharded.py."""
    import dataclasses
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.parallel.sharded import _chain_unit_bytes, _fused_seeds

    c, total = planes.shape
    block = fused.pick_block_bytes(chain, in_hz)
    unit = math.lcm(_chain_unit_bytes(chain), block)
    tile_bytes = -(-total // (n_dev * unit)) * unit
    scfg = dataclasses.replace(cfg, channels=c, tile_bytes=tile_bytes)
    step, _ = fused.make_fused_rational_step(
        chain, scfg, block_bytes=block,
        interpret=jax.default_backend() != "tpu", jit=False)
    halo0, hist0 = fused.init_fused_rational_state(chain, c)
    state = (jnp.asarray(halo0), hist0)
    g = fused.fused_plan(chain[:fused.fused_rational_plan(chain)])[1]
    need = n_dev * tile_bytes
    padded = np.concatenate(
        [planes, np.full((c, need - total), 0x69, np.uint8)], axis=1)
    seeds = np.asarray(_fused_seeds(key, 0, n_dev))
    outs = []
    for t in range(n_dev):
        xw = fused.prep_input(np.ascontiguousarray(
            padded[:, t * tile_bytes:(t + 1) * tile_bytes]), g)
        o, _pk, state = step(xw, state, int(seeds[t]))
        outs.append(np.asarray(o))
    return np.concatenate(outs)


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--perf", action="store_true")
    ap.add_argument("--cells", default=None)
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--tile-mib", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    import timing

    from dsd2dxd_tpu.filters.design import chain_ratio, get_chain
    from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops.dsm import synth_tone_dsd
    from dsd2dxd_tpu.ops.resample import StepConfig
    from dsd2dxd_tpu.parallel.sharded import (
        _chain_unit_bytes,
        _fused_seeds,
        _fused_tile_parts,
        _tile_chain_fn,
        convert_stream_tiled,
        halo_bytes_for,
    )

    if jax.default_backend() != "tpu":
        print(f"ERROR: backend is {jax.default_backend()}", file=sys.stderr)
        return 2

    mesh = Mesh(np.array(jax.devices()[:1]), ("tile",))
    n_dev = 1
    failures = 0
    cells = CELLS
    if args.cells:
        cells = [(n, int(o)) for n, o in
                 (c.split(":") for c in args.cells.split(","))]

    for rate_name, out_hz in cells:
        rate = DsdRate[rate_name]
        chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
        rational = fused.fused_plan(chain) is None
        if rational and fused.fused_rational_plan(chain) is None:
            print(f"{rate_name}->{out_hz}: no fused plan, skipped")
            continue
        ratio = chain_ratio(chain)
        # ~0.2 s of audio: enough for stats, small enough to stay quick
        n_bits = int(rate.hz * 0.2)
        planes = synth_tone_dsd(1000.0, n_bits / rate.hz, rate.hz,
                                amplitude=0.45, channels=2)
        key = jax.random.PRNGKey(0x5D5D)
        ok = True
        outs = {}
        for depth in (32, 24):
            cfg = StepConfig(channels=2, tile_bytes=0, bit_depth=depth,
                             dither=DitherType.NONE, level_db=0.0)
            got, peak = convert_stream_tiled(planes, chain, cfg, mesh,
                                             body="fused", in_hz=rate.hz)
            oracle = (streaming_rational_oracle if rational
                      else streaming_fused_oracle)
            ref = oracle(planes, chain, cfg, key, rate.hz,
                         n_dev)
            n = min(len(got), len(ref))
            # rational: skip the stream head (zero-hist oracle vs the
            # sharded tile-0 idle-warmed hist — see the oracle doc)
            s = 1000 if rational else 0
            if not np.array_equal(got[s:n], ref[s:n]):
                d = np.abs(got[s:n].astype(np.float64)
                           - ref[s:n].astype(np.float64)).max()
                print(f"  FAIL {depth}-bit NONE: sharded != streaming "
                      f"(max |d| {d})")
                ok = False
            outs[depth] = (got, peak)
        # TPDF on-core PRNG inside shard_map: error stats + key variation
        cfg_d = StepConfig(channels=2, tile_bytes=0, bit_depth=24,
                           dither=DitherType.TPDF, level_db=0.0)
        gd1, _ = convert_stream_tiled(planes, chain, cfg_d, mesh,
                                      body="fused", in_hz=rate.hz)
        gd2, _ = convert_stream_tiled(planes, chain, cfg_d, mesh,
                                      body="fused", in_hz=rate.hz,
                                      key=jax.random.PRNGKey(77))
        gf, _ = outs[32]
        n = min(len(gd1), len(gf))
        skip = n // 8
        f = gf[skip:n].astype(np.float64) * (1 << 23)
        e = gd1[skip:n].astype(np.float64) - f
        e = e[np.abs(f) < (1 << 23) - 4]  # chipcheck's clip guard
        rms = float(np.sqrt(np.mean(e ** 2)))
        mean = float(np.mean(e))
        if not (0.45 <= rms <= 0.55):
            print(f"  FAIL TPDF error RMS {rms:.3f} LSB outside "
                  f"[0.45, 0.55]")
            ok = False
        if abs(mean) > 0.02:
            print(f"  FAIL TPDF error mean {mean:.4f} LSB")
            ok = False
        if np.array_equal(gd1, gd2):
            print("  FAIL two keys produced identical dither")
            ok = False
        status = "OK" if ok else "FAIL"
        klass = ("bit-exact-past-head NONE 32/24" if rational
                 else "bit-exact NONE 32/24")
        print(f"{rate_name}->{out_hz}: sharded fused body {status} "
              f"({klass}, TPDF rms {rms:.3f} mean "
              f"{mean:+.4f})")
        failures += 0 if ok else 1

        if not args.perf or rational:
            # the perf A/B builds the plain parts; rational cells are
            # covered by the correctness pass above
            continue
        # slope A/B: fused vs phase body inside the same 1-device
        # shard_map, production tile size
        from dsd2dxd_tpu.pipeline.engine import _tile_bytes_for

        big = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024, rate.hz)
        block = fused.pick_block_bytes(chain, rate.hz)
        unit = math.lcm(_chain_unit_bytes(chain), block)
        big = -(-big // unit) * unit
        cfg_p = StepConfig(channels=2, tile_bytes=big, bit_depth=24,
                           dither=DitherType.TPDF, level_db=0.0)
        fn_local, halo_words, g = _fused_tile_parts(chain, cfg_p, block,
                                                    False)
        fn_fused = jax.jit(jax.shard_map(
            fn_local, mesh=mesh, in_specs=(P("tile", None, None),
                                           P("tile")),
            out_specs=(P("tile", None, None), P("tile")),
            check_vma=False))
        tile_fn = _tile_chain_fn(chain, cfg_p)

        def shard_phase(x, k, v):
            out, peaks = jax.vmap(tile_fn)(x, k, v)
            return out, jax.lax.pmax(jnp.max(peaks), "tile")

        fn_phase = jax.jit(jax.shard_map(
            shard_phase, mesh=mesh,
            in_specs=(P("tile", None, None), P("tile", None), P("tile")),
            out_specs=(P("tile", None, None), P()),
        ))
        rng = np.random.default_rng(0)
        halo_f = halo_words * g
        halo_p = halo_bytes_for(chain)
        digest = timing.make_digest()
        n_keep = int(big * 8 * ratio)

        def prep_f(a):
            pad = np.full((2, halo_f), 0x69, np.uint8)
            t = np.concatenate([pad, a], axis=1)
            return fused.prep_input(t, g)[None]

        def prep_p(a):
            pad = np.full((2, halo_p), 0x69, np.uint8)
            return np.concatenate([pad, a], axis=1)[None]

        tiles_f = timing.stage_tiles(prep_f, rng, big, n_tiles=4)
        rng = np.random.default_rng(0)
        tiles_p = timing.stage_tiles(prep_p, rng, big, n_tiles=4)
        seeds = jnp.arange(1, dtype=jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(0), 1)
        valids = jnp.full((1,), n_keep, dtype=jnp.int32)

        def step_f(xt, _state, _i):
            out, pk = fn_fused(xt, seeds)
            return out, pk, _state

        def step_p(xt, _state, _i):
            out, pk = fn_phase(xt, keys, valids)
            return out, pk, _state

        def run(step, tiles):
            return timing.slope_run(step, lambda: None, tiles, digest,
                                    reps=1)

        timing.timed_run(step_f, lambda: None, tiles_f, digest)
        timing.timed_run(step_p, lambda: None, tiles_p, digest)
        ta, tb, med = timing.interleaved_pairs(
            lambda: run(step_p, tiles_p), lambda: run(step_f, tiles_f),
            args.pairs)
        audio = len(tiles_f) * big * 8 / rate.hz
        # slope underflow: when one arm's t_hi-t_lo collapses into
        # measurement noise (a slow opposing arm starves it of warm
        # cache, or a tunnel stall lands between the two points) the
        # xrt explodes to nonsense — flag instead of reporting it
        # (observed: DSD256->352.8k "4.7e10x", CHIP_SHARDCHECK_r05.log)
        floor_s = 50e-6 * len(tiles_f)
        if min(tb) < floor_s or min(ta) < floor_s:
            print(f"  perf: slope underflow (t_phase {min(ta) * 1e3:.2f}"
                  f" / t_fused {min(tb) * 1e3:.2f} ms) — rerun on a "
                  f"calm tunnel")
        else:
            print(f"  perf: phase-body {audio / min(ta):6.0f}x  "
                  f"fused-body {audio / min(tb):6.0f}x  "
                  f"t_phase/t_fused median {med:.2f}")
    print(f"shardcheck: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
