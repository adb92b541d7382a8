"""On-chip ATTRIBUTION of the fused kernel's tap-independent floor.

tools/floorprof.py measured the floor's SIZE (scale-0 intercept ~7.6
us/16KiB at 64 KiB blocks) and its FMA slope, but not its composition:
the unpack's op count predicts ~0.8 us, DMA ~0.02 us, the scale-0
cascade ~1 us — leaving most of the intercept unattributed ("Mosaic
op/layout overheads", CLAUDE.md). This tool builds a LADDER of probe
kernels that share the production scaffold (same PrefetchScalarGridSpec,
double-buffered block DMA, scratch shapes, sublane batching, block
size) and truncate the body at successive points:

  dma     wait the block DMA, store a cast slice of the raw words
  fan     + the batch-sub-block fan-in (slice+concat relayout)
  unpack  + all 8G _pm1 phase rows (consumed by aligned-slice tree-sum)
  cas0    + the real scale-0 cascade + a-trous tail + peak (f32 out)
  full    the production kernel (make_fused_step, 24-bit TPDF planes)

Each rung's increment is one structural component's cost. Modes run
ROUND-ROBIN per repetition so every rung sees the same tunnel/clock
weather, and per-mode medians are compared (the box clock wanders
+-40%; CLAUDE.md timing rules).

    python tools/floorstrip.py [--block 65536] [--reps 8] [--tile-mib 16]
    python tools/floorstrip.py --check    (CPU interpret-mode smoke)

Structure under test is floorprof's synthetic DSD512->352.8k shape
(6 x /2 stages, scale-0 taps = 2 per stage, G=4, r_tail=2).
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

MODES = ("dma", "fan", "unpack", "cas0a", "cas0", "quant", "full")


def _probe_step(chain, cfg, block_bytes: int, mode: str,
                interpret: bool = False):
    """A fused-step lookalike that truncates the kernel body at `mode`.

    Returns (step(x_w, halo, seed) -> (out, peak, new_halo), halo_bytes).
    Scaffold (grid, specs, scratch, DMA, prologue) is copied from
    ops/fused.make_fused_step so the rungs differ ONLY in body ops.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dsd2dxd_tpu.formats.dsd_types import DitherType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops.fused import _pm1, _tree_sum

    if mode == "full":
        step, halo_b, _layout = fused.make_fused_step(
            chain, cfg, block_bytes=block_bytes, emit="planes",
            interpret=interpret)
        return step, halo_b

    plans, groups, tail, r_tail, halo = fused._fused_layout(chain)
    wdt = jnp.dtype(fused.word_dtype(groups))
    idle_word = int.from_bytes(bytes([fused.IDLE_BYTE]) * groups, "little")
    block_lanes = block_bytes // groups
    c = cfg.channels
    c_pad = -(-c // 4) * 4
    n_blocks = cfg.tile_bytes // block_bytes
    batch = fused.sublane_batch(c, block_lanes, r_tail)
    k_sub = block_lanes // batch
    r_rows = batch * c if batch > 1 else c_pad
    coef_tables = tuple(
        tuple(tuple(float(t.coef) for t in terms) for terms in p.terms)
        for p in plans)
    # mirrors _build_kernel's lane bookkeeping
    tail_need = [k_sub]
    for taps, d in reversed(tail):
        tail_need.insert(0, tail_need[0] + (len(taps) - 1) * d)
    need = [tail_need[0]]
    for p in reversed(list(plans)[1:]):
        need.insert(0, need[0] + p.hist_lanes)
    extra0 = halo - sum(p.hist_lanes for p in plans) - (tail_need[0] - k_sub)

    def kernel(seed_ref, x_hbm, out_ref, peak_ref, xb_vmem, sem):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        def dma(idx, s):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(idx * (batch * k_sub),
                                  halo + batch * k_sub)],
                xb_vmem.at[s], sem.at[s])

        @pl.when(i == 0)
        def _():
            dma(i, slot).start()

        @pl.when(i + 1 < n_blocks)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        xw = xb_vmem[slot]
        xi = (pltpu.bitcast(xw, jnp.int32) if xw.dtype == jnp.uint32
              else xw.astype(jnp.int32))
        if mode == "dma":
            # consume the block with the cheapest dependent store: cast
            # one aligned slice and broadcast it over the output rows
            sl = jax.lax.slice(xi, (0, halo), (1, halo + k_sub))
            out_ref[:, :] = jnp.broadcast_to(
                sl.astype(jnp.float32), (r_rows, k_sub))
            peak_ref[0, 0] = jnp.float32(0.0)
            return
        if batch > 1:
            xg = jnp.concatenate(
                [jax.lax.slice(xi, (0, b * k_sub),
                               (c, b * k_sub + halo + k_sub))
                 for b in range(batch)], axis=0)
        else:
            xg = xi
        if mode == "fan":
            out_ref[:, :] = jax.lax.slice(
                xg, (0, halo), (r_rows, halo + k_sub)).astype(jnp.float32)
            peak_ref[0, 0] = jnp.float32(0.0)
            return
        inv = ~xg
        rows = []
        for p in range(8 * groups):
            shift = 8 * (p // 8) + 7 - (p % 8)
            rows.append(_pm1(inv, shift))
        if mode == "unpack":
            # consume every phase row with a lane-ALIGNED slice (offset
            # `halo`, a multiple of 128) so the consume cost is adds, not
            # the cascade's unaligned-rotate slices
            out_ref[:, :] = _tree_sum([
                jax.lax.slice(r, (0, halo), (r_rows, halo + k_sub))
                for r in rows])
            peak_ref[0, 0] = jnp.float32(0.0)
            return
        # cas0: the real cascade + a-trous tail + peak, f32 out.
        # cas0a: identical op graph but every slice offset rounded DOWN
        # to a 128-lane boundary — numerically wrong on purpose; the
        # cas0-cas0a delta is the cascade's lane-ROTATE share (unaligned
        # slices are the only thing that changes).
        for j, plan in enumerate(plans):
            h = plan.hist_lanes
            k_out = need[j]
            new_rows = []
            for rho, terms in enumerate(plan.terms):
                contribs = []
                for t_idx, t in enumerate(terms):
                    start = (extra0 if j == 0 else 0) + h + t.base
                    if mode == "cas0a":
                        start &= ~127
                    sl = jax.lax.slice(rows[t.r_in], (0, start),
                                       (r_rows, start + k_out), (1, 1))
                    contribs.append(coef_tables[j][rho][t_idx] * sl)
                new_rows.append(_tree_sum(contribs))
            rows = new_rows
        z = rows[0]
        for t, (taps, d) in enumerate(tail):
            n_t = len(taps)
            k_out = tail_need[t + 1]
            contribs = []
            for k, coef in enumerate(taps):
                start = (n_t - 1) * d - k * d
                if mode == "cas0a":
                    start &= ~127
                contribs.append(jnp.float32(coef)
                                * jax.lax.slice(z, (0, start),
                                                (r_rows, start + k_out)))
            z = _tree_sum(contribs)
        mask = jnp.ones((r_rows, 1), dtype=jnp.float32)
        if r_tail > 1:
            lane_ids = jax.lax.broadcasted_iota(
                jnp.int32, (r_rows, k_sub), 1)
            mask = mask * (lane_ids % r_tail == 0).astype(jnp.float32)
        peak = jnp.max(jnp.abs(z) * mask)

        @pl.when(i == 0)
        def _():
            peak_ref[0, 0] = peak

        @pl.when(i > 0)
        def _():
            peak_ref[0, 0] = jnp.maximum(peak_ref[0, 0], peak)

        if mode == "quant":
            # production dither+quantize epilogue, int32 store — the
            # full-quant delta is then the u8 plane emission (in-kernel
            # byte split/concat) + the XLA phase-0 extraction/reshape
            scale = jnp.float32(1 << (cfg.bit_depth - 1))
            v = z * scale
            if cfg.dither is DitherType.TPDF:
                pltpu.prng_seed(seed_ref[0] * n_blocks + i)
                v = v + (fused._uniform01((r_rows, k_sub))
                         + fused._uniform01((r_rows, k_sub)) - 1.0)
            out_ref[:, :] = jnp.clip(jnp.round(v), -scale,
                                     scale - 1.0).astype(jnp.int32)
            return
        out_ref[:, :] = z

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((r_rows, k_sub), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c_pad, halo + batch * k_sub), wdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_dt = jnp.int32 if mode == "quant" else jnp.float32
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((r_rows, n_blocks * k_sub), out_dt),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )

    def step(x_w, halo_in, seed):
        xin = jnp.concatenate([halo_in, x_w], axis=1)
        if c_pad != c:
            pad = jnp.full((c_pad - c, xin.shape[1]), idle_word, dtype=wdt)
            xin_k = jnp.concatenate([xin, pad], axis=0)
        else:
            xin_k = xin
        out, peak = call(jnp.asarray([seed], dtype=jnp.int32), xin_k)
        return out, peak[0, 0], xin[:, xin.shape[1] - halo:]

    return jax.jit(step, donate_argnums=(1,)), halo * groups


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=65536)
    ap.add_argument("--tile-mib", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from floorprof import synth_chain
    from timing import make_digest

    from dsd2dxd_tpu.formats.dsd_types import DitherType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops.resample import StepConfig
    from dsd2dxd_tpu.pipeline.transfer import chunked_device_put

    in_hz = 22_579_200  # DSD512
    chain = synth_chain(0.0)  # scale-0 taps: the tap-independent floor
    _n_head, g, _rt = fused.fused_plan(chain)
    bb = args.block
    tile = (args.tile_mib * 1024 * 1024 // bb) * bb
    if args.check:
        tile = bb * 2
    cfg24 = StepConfig(
        channels=2, tile_bytes=tile, bit_depth=24,
        # interpret mode can't run the on-core PRNG (CLAUDE.md)
        dither=DitherType.NONE if args.check else DitherType.TPDF,
        level_db=0.0)
    rng = np.random.default_rng(0)
    digest = make_digest()

    steps = {}
    for mode in MODES:
        steps[mode] = _probe_step(chain, cfg24, bb, mode,
                                  interpret=args.check)
    tiles = [chunked_device_put(fused.prep_input(
        rng.integers(0, 256, size=(2, tile), dtype=np.uint8), g))
        for _ in range(2 if args.check else 6)]
    jax.block_until_ready(tiles)

    def run(mode) -> float:
        step, halo_b = steps[mode]
        halo = jnp.asarray(fused.init_fused_halo(chain, 2))
        t0 = time.perf_counter()
        ds = []
        for i, xt in enumerate(tiles):
            out, _pk, halo = step(xt, halo, i)
            ds.append(digest(out[0] if isinstance(out, tuple) else out))
        np.asarray(jnp.stack(ds).sum(axis=0))
        return time.perf_counter() - t0

    for mode in MODES:  # warm (compile) every rung before timing any
        run(mode)
    times = {m: [] for m in MODES}
    for _ in range(1 if args.check else args.reps):
        for mode in MODES:  # round-robin: same weather per rung
            times[mode].append(run(mode))

    n16 = len(tiles) * tile / 16384
    meds = {m: statistics.median(times[m]) for m in MODES}
    print(f"block={bb} tile={tile} reps={args.reps} "
          f"(us/16KiB-equiv, per-channel input bytes)")
    prev = 0.0
    for mode in MODES:
        us = meds[mode] / n16 * 1e6
        xrt = len(tiles) * tile * 8 / in_hz / meds[mode]
        print(f"  {mode:7s} {us:6.2f} us/16KiB  (+{us - prev:5.2f})  "
              f"[{xrt:6.0f}x DSD512RT]")
        prev = us
    print("increments: fan-dma = sub-block relayout; unpack-fan = 8G "
          "_pm1 rows + aligned consume; cas0a-unpack = cascade at 2 "
          "taps/stage with ALIGNED slices; cas0-cas0a = the lane-ROTATE "
          "premium of the real unaligned slices; quant-cas0 = dither+"
          "quantize (i32 store); full-quant = u8 plane emission + XLA "
          "phase-0 extraction.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
