"""On-chip decomposition of the fused kernel's DMA/grid floor.

tools/floorstrip.py attributed nearly the WHOLE tap-independent floor
(6.4 of 7.3 us/16KiB at 64 KiB blocks) to its `dma` rung — the grid
machinery + double-buffered block DMA + out-block streaming, before any
unpack or FMA runs.  At that rate a grid step spends ~25.6 us moving
~392 KiB (~15 GB/s aggregate), two orders of magnitude under v5e HBM.
This tool isolates WHICH part of that rung costs the time, with probe
kernels that all share the production scaffold (PrefetchScalarGridSpec,
VMEM scratch, DMA semaphores, block/batch geometry from ops/fused):

  noop     no input DMA at all; store a broadcast iota to the streamed
           out blocks          -> grid iteration + out-block pipeline
  noflush  production strided DMA, but out index_map pinned to (0,0)
           so Mosaic flushes the out block once, not per step
                               -> input DMA cost without out streaming
  dma      production strided DMA + streamed out blocks (the floorstrip
           `dma` rung minus its per-step XLA halo-concat prologue)
  halo0    same, but the copy excludes the halo overlap
  contig   input pre-relayout (outside the timed region) to one
           contiguous (c_pad, halo+block_lanes) slab per block; the
           per-step DMA is a single contiguous chunk
  bspec    no manual DMA: a standard auto-pipelined input BlockSpec
           over the same replicated layout
  relayout the XLA halo-replication pass alone (reshape+slice+concat+
           transpose), pricing what `contig`/`bspec` would add

Unlike the production step there is NO per-step XLA prologue: tiles are
staged fully padded and the probe steps are stateless, so the pallas
region is measured alone.  Modes run round-robin per repetition
(median-of-reps; the box clock wanders +-40%, CLAUDE.md timing rules).

    python tools/dmabench.py [--blocks 16384,65536,131072] [--reps 8]
    python tools/dmabench.py --check     (CPU interpret-mode smoke)
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

MODES = ("noop", "noflush", "dma", "halo0", "contig", "bspec", "relayout")

HALO = 128            # lanes, matches floorprof's synthetic DSD512 chain
CHANNELS = 2
IN_HZ = 22_579_200    # DSD512


def _geometry(block_bytes: int, groups: int, tile_bytes: int):
    from dsd2dxd_tpu.ops import fused

    block_lanes = block_bytes // groups
    batch = fused.sublane_batch(CHANNELS, block_lanes, 2)
    k_sub = block_lanes // batch
    c_pad = -(-CHANNELS // 4) * 4
    r_rows = batch * CHANNELS if batch > 1 else c_pad
    n_blocks = tile_bytes // block_bytes
    return block_lanes, batch, k_sub, c_pad, r_rows, n_blocks


def _make_relayout(block_lanes: int, n_blocks: int, c_pad: int):
    """Halo-replicate (c_pad, HALO + n*B) words -> (n*c_pad, HALO + B):
    window i is lanes [i*B, i*B + HALO + B) of the padded stream.  Both
    window parts are reshape views (HALO <= B), so the pass is one
    slice+concat+transpose — a single relayout sweep in XLA."""
    import jax
    import jax.numpy as jnp

    # Mosaic row-slices an (8,128)-tiled HBM memref only in 8-row units
    # at 8-aligned offsets, so each block becomes EIGHT rows of `lanes8`
    # (c_pad*win padded up to a multiple of 8*128) — the per-step DMA is
    # one (8, lanes8) chunk, fully contiguous in HBM.
    win = HALO + block_lanes
    lanes8 = -(-c_pad * win // (8 * 128)) * 128

    def relayout(xp):
        lead = xp[:, : n_blocks * block_lanes].reshape(
            c_pad, n_blocks, block_lanes)[:, :, :HALO]
        body = xp[:, HALO:].reshape(c_pad, n_blocks, block_lanes)
        w3 = jnp.concatenate([lead, body], axis=2)
        flat = w3.transpose(1, 0, 2).reshape(n_blocks, c_pad * win)
        flat = jnp.pad(flat, ((0, 0), (0, 8 * lanes8 - c_pad * win)))
        return flat.reshape(n_blocks * 8, lanes8)

    return jax.jit(relayout), lanes8


def _probe(block_bytes: int, groups: int, tile_bytes: int, mode: str,
           interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    block_lanes, batch, k_sub, c_pad, r_rows, n_blocks = _geometry(
        block_bytes, groups, tile_bytes)
    wdt = jnp.uint32
    win = HALO + block_lanes

    if mode == "relayout":
        rel, _l8 = _make_relayout(block_lanes, n_blocks, c_pad)
        return rel, dict(n_blocks=n_blocks)
    _rel, lanes8 = _make_relayout(block_lanes, n_blocks, c_pad)

    manual = mode in ("noop", "noflush", "dma", "halo0", "contig")

    def kernel(x_ref, out_ref, peak_ref, *scratch):
        i = pl.program_id(0)
        if manual and mode != "noop":
            xb_vmem, sem = scratch
            slot = jax.lax.rem(i, 2)

            if mode == "contig":
                def dma(idx, s):
                    return pltpu.make_async_copy(
                        x_ref.at[pl.ds(idx * 8, 8), :],
                        xb_vmem.at[s], sem.at[s])
            elif mode == "halo0":
                def dma(idx, s):
                    return pltpu.make_async_copy(
                        x_ref.at[:, pl.ds(idx * block_lanes, block_lanes)],
                        xb_vmem.at[s], sem.at[s])
            else:
                def dma(idx, s):
                    return pltpu.make_async_copy(
                        x_ref.at[:, pl.ds(idx * block_lanes, win)],
                        xb_vmem.at[s], sem.at[s])

            @pl.when(i == 0)
            def _():
                dma(i, slot).start()

            @pl.when(i + 1 < n_blocks)
            def _():
                dma(i + 1, 1 - slot).start()

            dma(i, slot).wait()
            xw = xb_vmem[slot]
        elif mode == "bspec":
            xw = x_ref[:, :]
        else:  # noop
            xw = None

        if xw is None:
            out_ref[:, :] = jnp.broadcast_to(
                jax.lax.broadcasted_iota(
                    jnp.int32, (1, k_sub), 1).astype(jnp.float32),
                (r_rows, k_sub))
        else:
            xi = pltpu.bitcast(xw, jnp.int32)
            sl = jax.lax.slice(
                xi, (0, xi.shape[1] - k_sub), (1, xi.shape[1]))
            out_ref[:, :] = jnp.broadcast_to(
                sl.astype(jnp.float32), (r_rows, k_sub))
        peak_ref[0, 0] = jnp.float32(0.0)

    out_idx = ((lambda i: (0, 0)) if mode == "noflush"
               else (lambda i: (0, i)))
    out_blocks = 1 if mode == "noflush" else n_blocks
    if mode == "bspec":
        in_specs = [pl.BlockSpec((8, lanes8), lambda i: (i, 0))]
        scratch = []
    else:
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        vm_shape = ((2, c_pad, block_lanes) if mode == "halo0"
                    else (2, 8, lanes8) if mode == "contig"
                    else (2, c_pad, win))
        scratch = [] if mode == "noop" else [
            pltpu.VMEM(vm_shape, wdt),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((r_rows, k_sub), out_idx),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_rows, out_blocks * k_sub), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )

    if mode in ("contig", "bspec"):
        def step(x_rep):
            out, _pk = call(x_rep)
            return out

        prep = None
    else:
        def step(xp):
            out, _pk = call(xp)
            return out

        prep = None

    return jax.jit(step), dict(n_blocks=n_blocks, prep=prep)


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", default="16384,65536,131072")
    ap.add_argument("--tile-mib", type=int, default=16)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--modes", default=",".join(MODES))
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from timing import make_digest

    from dsd2dxd_tpu.pipeline.transfer import chunked_device_put

    groups = 4
    modes = [m for m in args.modes.split(",") if m]
    blocks = [int(b) for b in args.blocks.split(",")]
    digest = make_digest()
    rng = np.random.default_rng(0)

    for bb in blocks:
        tile = (args.tile_mib * 1024 * 1024 // bb) * bb
        if args.check:
            tile = bb * 2
        (block_lanes, batch, k_sub, c_pad, r_rows,
         n_blocks) = _geometry(bb, groups, tile)
        steps = {}
        for m in modes:
            steps[m] = _probe(bb, groups, tile, m, interpret=args.check)

        # staged input: fully padded (c_pad, HALO + tile_words) u32 —
        # no per-step XLA prologue in any mode
        tile_words = tile // groups
        n_tiles = 2 if args.check else 6
        tiles = []
        for _ in range(n_tiles):
            xp = rng.integers(0, 2**32, size=(c_pad, HALO + tile_words),
                              dtype=np.uint32)
            tiles.append(chunked_device_put(xp))
        jax.block_until_ready(tiles)
        # contig/bspec consume the replicated layout; build it once per
        # tile OUTSIDE the timed region (relayout mode prices the pass)
        rep_tiles = None
        if any(m in ("contig", "bspec") for m in modes):
            rel, _l8 = _make_relayout(block_lanes, n_blocks, c_pad)
            rep_tiles = [rel(t) for t in tiles]
            jax.block_until_ready(rep_tiles)

        def run(mode) -> float:
            step, _meta = steps[mode]
            src = rep_tiles if mode in ("contig", "bspec") else tiles
            t0 = time.perf_counter()
            ds = []
            for xt in src:
                out = step(xt)
                ds.append(digest(out))
            np.asarray(jnp.stack(ds).sum(axis=0))
            return time.perf_counter() - t0

        for m in modes:
            run(m)  # warm every rung before timing any
        times = {m: [] for m in modes}
        for _ in range(1 if args.check else args.reps):
            for m in modes:
                times[m].append(run(m))

        n16 = n_tiles * tile / 16384
        print(f"-- block={bb} ({block_lanes} lanes, k_sub={k_sub}, "
              f"batch={batch}, n_blocks={n_blocks}/tile) --")
        for m in modes:
            med = statistics.median(times[m])
            us = med / n16 * 1e6
            # bytes the mode actually moves per 16KiB-equiv of input
            per_in = 16384 / bb  # blocks per 16KiB-equiv
            dma_b = {
                "noop": 0,
                "noflush": c_pad * (HALO + block_lanes) * 4,
                "dma": c_pad * (HALO + block_lanes) * 4,
                "halo0": c_pad * block_lanes * 4,
                "contig": c_pad * (HALO + block_lanes) * 4,
                "bspec": c_pad * (HALO + block_lanes) * 4,
                "relayout": 2 * c_pad * (HALO + block_lanes) * 4,
            }[m] * per_in
            out_b = (0 if m in ("noflush", "relayout")
                     else r_rows * k_sub * 4 * per_in)
            gbs = (dma_b + out_b) / max(us, 1e-9) / 1e3
            xrt = n_tiles * tile * 8 / IN_HZ / med
            print(f"  {m:8s} {us:6.2f} us/16KiB  [{xrt:6.0f}x DSD512RT]"
                  f"  ~{gbs:6.1f} GB/s moved")
    return 0


if __name__ == "__main__":
    sys.exit(main())
