"""Multi-device scaling: overlap-save tile parallelism + stream batching.

The reference scales with a CPU thread pool, one file per thread
(reference src/main.rs:148-163, 279-297). The TPU-native equivalents
(SURVEY.md §2.6, §5 "long-context" row):

- **stream parallelism (dp)**: a batch of independent streams (files)
  sharded across devices — no collectives;
- **tile parallelism (sp)**: ONE stream split into overlap-save tiles
  with (effective taps - 1) input halos; because the whole chain is FIR
  (no IIR state), tiles are independent and the sequential stream scan
  becomes pure data parallelism over the mesh.

Both are expressed with `jax.sharding.Mesh` + `shard_map`; peaks combine
with `jax.lax.pmax` over the mesh axes (the only cross-device
communication in the system — a scalar).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dsd2dxd_tpu.filters.design import Stage, chain_ratio
from dsd2dxd_tpu.formats.dsd_types import DitherType
from dsd2dxd_tpu.ops.phase import (
    build_chain_coefs,
    build_chain_plans,
    chain_tile_unit_bits,
    finish_tile,
    init_phase_hists,
    run_chain_phase,
    unpack_bits_phase,
)
from dsd2dxd_tpu.ops.resample import StepConfig, stage_history_len


def chain_halo_bits(chain: Sequence[Stage]) -> int:
    """Input-domain context (bits) that fully warms every stage of the
    cascade: sum of each stage's history mapped back through the
    cumulative decimation of the stages before it."""
    halo = 0
    cum = 1.0  # input samples per stage-input sample
    for s in chain:
        halo += math.ceil(stage_history_len(s) * cum)
        cum *= s.M / s.L
    return halo


def halo_bytes_for(chain: Sequence[Stage]) -> int:
    """Halo rounded up to whole bytes and to the phase-chain tile unit."""
    unit = chain_tile_unit_bits(build_chain_plans(chain))
    bits = chain_halo_bits(chain)
    return (-(-bits // unit)) * unit // 8


def _tile_chain_fn(chain, cfg: StepConfig):
    """Per-tile function: (C, halo+tile bytes) -> ((n_out, C), peak).

    Processes halo+tile through the phase-major cascade with zero initial
    history and keeps only the outputs belonging to the tile —
    translation invariance of the FIR cascade makes them equal to the
    streaming outputs. The cascade body and epilogue are ops/phase.py's
    own (run_chain_phase / finish_tile), so this path cannot drift from
    the streaming step."""
    ratio = chain_ratio(chain)
    dtype = jnp.dtype(cfg.dtype)
    plans = build_chain_plans(chain)
    coefs, n_terms = build_chain_coefs(plans, dtype)
    n_keep = int(cfg.tile_bytes * 8 * ratio)
    gain = 10.0 ** (cfg.level_db / 20.0)

    def fn(x_u8, key, n_valid=None):
        x = unpack_bits_phase(x_u8, dtype=dtype)
        zero_hists = init_phase_hists(plans, x.shape[0], dtype=dtype)
        x, _ = run_chain_phase(x, zero_hists, plans, coefs, n_terms)
        x = x[:, x.shape[1] - n_keep:]
        return finish_tile(x, cfg, key, gain, n_valid=n_valid)

    return fn


def _resolve_body(chain, body):
    """Pick the per-shard tile body: ("fused"|"phase", interpret, forced).

    ``body`` None/"auto" dispatches the production Pallas kernel
    (ops/fused.py) per shard whenever the default backend is TPU and the
    chain is plain-fused-eligible — on a real mesh each shard otherwise
    pays the ~10-15 HBM-pass phase-major cost the fused kernel exists to
    eliminate (VERDICT r4 weak 5). "phase" forces the XLA phase body
    (the CPU-mesh / dryrun gate); "fused" forces the kernel (interpret
    mode off-TPU, for virtual-mesh tests — NONE dither only there: the
    on-core PRNG has no CPU interpret lowering). The env knob
    DSD2DXD_SHARDED_BODY mirrors the argument for chip A/B tools;
    env-selected "fused" degrades gracefully to "phase" when the
    chain/cfg is ineligible, only the explicit argument raises."""
    forced = body == "fused"
    if body is None:
        body = os.environ.get("DSD2DXD_SHARDED_BODY", "auto")
        if body not in ("auto", "fused", "phase"):
            from dsd2dxd_tpu.utils.errors import ConfigError

            raise ConfigError(
                f"DSD2DXD_SHARDED_BODY={body!r} (want auto, fused or "
                f"phase)")
    if body == "auto":
        from dsd2dxd_tpu.ops import fused

        if (jax.default_backend() == "tpu"
                and (fused.fused_plan(chain) is not None
                     or fused.fused_rational_plan(chain) is not None)):
            return "fused", False, False
        return "phase", False, False
    if body == "fused":
        return "fused", jax.default_backend() != "tpu", forced
    if body != "phase":
        # loud for the explicit argument too (the env path already
        # raises ConfigError): a typo'd body= would otherwise silently
        # benchmark/validate the phase body under the fused name
        raise ValueError(f"body={body!r} (want None/'auto', 'fused' or "
                         f"'phase')")
    return "phase", False, False


def _fused_seeds(key, t0: int, n: int):
    """Per-tile i32 seeds for the fused body's in-kernel PRNG, derived
    from (key, absolute tile index) — same reproducible-per-file /
    decorrelated-across-tiles discipline as the phase body's
    fold_in(key, tile index), but a DIFFERENT noise stream (the plain
    kernel dithers with the on-core PRNG, not threefry): dithered
    fused-body output is stats-equivalent to the phase body, not
    bit-identical. Undithered output is bit-exact vs the STREAMING
    fused path (same kernel, same state semantics) and matches the
    phase body within the cross-path reduction-order tolerance the
    tests pin."""
    try:
        kd = np.asarray(jax.random.key_data(key))
    except Exception:
        kd = np.asarray(key)
    kd = kd.astype(np.uint64).reshape(-1)
    base = np.uint64(0)
    for w in kd:
        base = (base * np.uint64(0x9E3779B1) + w) & np.uint64(0xFFFFFFFF)
    s = (base + np.arange(t0, t0 + n, dtype=np.uint64)) \
        & np.uint64(0x7FFFFFFF)
    return jnp.asarray(s.astype(np.int32))


def _fused_masked_peak(peaks: np.ndarray, out: np.ndarray, n_valid: int,
                       n_keep: int, bit_depth: int) -> float:
    """Combine per-tile kernel peaks with valid-prefix masking.

    Full tiles keep the free in-kernel peak; all-pad tiles are excluded
    (the phase body masks them via finish_tile's n_valid); a partial
    final tile's peak is recomputed on host from the valid prefix for
    FLOAT output only — the engine's own discipline
    (pipeline/engine._drain: only check_level consumes the peak and it
    runs the float frames path; int tiles keep the kernel peak, which
    may include signal->idle-pad ringing past n_valid)."""
    peak = 0.0
    for t in range(out.shape[0]):
        v = min(max(n_valid - t * n_keep, 0), n_keep)
        if v == 0:
            continue
        if v == n_keep or bit_depth != 32:
            peak = max(peak, float(peaks[t]))
        else:
            peak = max(peak, float(np.abs(out[t, :v]).max()))
    return peak


def _fused_tile_parts(chain, cfg: StepConfig, block_bytes: int,
                      interpret: bool):
    """Build the fused per-shard body: (shard-local fn, halo_words,
    groups). ``fn(x_w (1, C, halo+tile words), seeds (1,)) ->
    ((1, n_out, C), (1,) peak)`` — the tile's halo-prefix words feed the
    kernel's own streaming halo state, so per-tile output is EXACTLY the
    streaming fused path's (same kernel, same state semantics), not just
    translation-invariance-equal. Raises ValueError when the chain/cfg
    is not kernel-expressible (callers fall back to the phase body)."""
    from dsd2dxd_tpu.ops import fused

    plan = fused.fused_plan(chain)
    if plan is None:
        raise ValueError("chain not eligible for the fused kernel")
    g = plan[1]
    if fused.word_rows(g) != 1:
        raise ValueError("word-row layouts have a row-grouped halo; the "
                         "sharded body only splits flat word prefixes")
    if interpret and cfg.dither is not DitherType.NONE:
        # the on-core PRNG has no CPU interpret lowering; raising HERE
        # (build time) lets env-selected "fused" degrade to the phase
        # body instead of crashing at the first dithered dispatch
        raise ValueError("dithered interpret builds cannot run the "
                         "kernel's on-core PRNG")
    step, _hb = fused.make_fused_step(chain, cfg, block_bytes=block_bytes,
                                      interpret=interpret, jit=False)
    halo_words = fused.init_fused_halo(chain, cfg.channels).shape[1]

    def fn(xw, seeds):
        out, peak, _new_halo = step(xw[0, :, halo_words:],
                                    xw[0, :, :halo_words], seeds[0])
        return out[None], peak.reshape(1)

    return fn, halo_words, g


def _fused_body(chain, cfg: StepConfig, channels: int, tile_bytes: int,
                block: int, plain: bool, interpret: bool):
    """Shared fused-body construction for the one-dispatch and chunked
    converters (one copy, so their tile geometry cannot drift —
    test_fused_body_chunked_matches_one_dispatch relies on it):
    (fn_local, prefix_bytes, g). ``prefix_bytes`` is the per-tile real
    -previous-bytes prefix ahead of the tile (plain: the kernel halo;
    rational: halo + one warm head block)."""
    sub_cfg = dataclasses.replace(cfg, channels=channels,
                                  tile_bytes=tile_bytes)
    if plain:
        fn, halo_words, g = _fused_tile_parts(chain, sub_cfg, block,
                                              interpret)
        return fn, halo_words * g, g
    return _fused_rational_tile_parts(chain, sub_cfg, block, interpret)


def _fused_rational_tile_parts(chain, cfg: StepConfig, block_bytes: int,
                               interpret: bool):
    """Fused per-shard body for the 48k-family chains (Pallas ÷2^m head
    + XLA ×160/147 tail): ``fn(x_w (1, C, halo+warm+tile words),
    seeds (1,)) -> ((1, n_keep, C), (1,) peak)``.

    The tile's prefix is [head halo | ONE head grid block of real
    previous input | tile]. A head-only warm pass over that block
    (same kernel, float mode — exactly how make_fused_rational_step
    runs its own head) yields (a) its new-halo output = the head's
    streaming halo state AT the tile start, and (b) its last p_in base
    samples = the rational tail's streaming history, both bit-exact
    (the kernel's per-output FMA order is position-independent — the
    same determinism the fused-vs-phase equivalence tests rest on).
    The main step then runs the tile exactly as the streaming engine
    would: float output is BIT-EXACT vs the streaming rational path
    past the stream head; dithered-quantized output shares the exact
    noise and geometry but the jitted program may fuse the tail
    einsum differently than an eager reference (±1 ulp → ±1 LSB at a
    few % of samples on CPU; on the TPU both lowerings hit the MXU
    identically and the chip gate measures exact —
    CHIP_SHARDCHECK_r05.log).
    An earlier lead-warmup variant instead prepended a full tile-unit
    of input and dropped its outputs — correct, but the unit is
    lcm(chain unit, grid block) ≈ 4.8-9.6 MiB for every 48k cell, so
    33-100% of each tile's head+tail work was discarded warmup
    (round-5 review); the warm block costs one ~64 KiB head pass
    instead. Returns (fn, prefix_bytes, g); raises ValueError when not
    expressible (callers fall back to the phase body). Dithered
    interpret builds are FINE here — the rational frames epilogue
    dithers with threefry, not the on-core PRNG."""
    import dataclasses

    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops.phase import build_plan, plan_banded_natural

    n_head = fused.fused_rational_plan(chain)
    if n_head is None:
        raise ValueError("chain is not fused-head + rational-tail shaped")
    head = tuple(chain[:n_head])
    g = fused.fused_plan(head)[1]
    if fused.word_rows(g) != 1:
        raise ValueError("word-row layouts have a row-grouped halo; the "
                         "sharded body only splits flat word prefixes")
    plan = build_plan(chain[-1], p_in=1)
    if plan_banded_natural(plan) is None:
        # the warm hist below is the banded tail's (C, p_in, 1) natural
        # suffix; non-banded rational stages keep the phase body
        raise ValueError("rational warm-hist body needs the banded tail")
    p_in = plan.p_in
    r_head = 1
    for s in head:
        r_head *= s.M
    n_warm = block_bytes * 8 // r_head
    if n_warm < p_in:
        raise ValueError(f"one {block_bytes}-byte head block yields "
                         f"{n_warm} base samples < p_in {p_in}")
    # same head config make_fused_rational_step builds internally
    # (fused.py: bit_depth=32, dither NONE, level 0, transpose=False)
    head_cfg = dataclasses.replace(cfg, bit_depth=32,
                                   dither=DitherType.NONE,
                                   level_db=0.0, tile_bytes=block_bytes)
    hstep, _ = fused.make_fused_step(head, head_cfg,
                                     block_bytes=block_bytes,
                                     interpret=interpret, jit=False,
                                     transpose=False)
    step, _hb = fused.make_fused_rational_step(
        chain, cfg, block_bytes=block_bytes, interpret=interpret,
        jit=False)
    halo_words = fused.init_fused_halo(head, cfg.channels).shape[1]
    warm_words = block_bytes // g

    def fn(xw, seeds):
        x = xw[0]
        y_warm, _pk, halo_main = hstep(
            x[:, halo_words:halo_words + warm_words],
            x[:, :halo_words], seeds[0])
        hist = y_warm[:, -p_in:][:, :, None]
        out, peak, _st = step(x[:, halo_words + warm_words:],
                              (halo_main, hist), seeds[0])
        return out[None], peak.reshape(1)

    return fn, halo_words * g + block_bytes, g


def make_sharded_convert(chain, cfg: StepConfig, mesh: Mesh,
                         stream_axis: str = "stream",
                         tile_axis: str = "tile"):
    """Build a jitted 2D-sharded converter over a ('stream', 'tile') mesh.

    Input:  (B, T, C, halo_bytes + tile_bytes) uint8 — B streams split
            into T overlap-save tiles each, sharded P(stream, tile) —
            plus per-tile PRNG keys (B, T, 2) and per-tile valid-output
            counts (B, T) int32 (frames of each tile that are real
            signal; trailing idle-pad FIR ringing past that count is
            masked out of the peak, same as every 1D path).
    Output: (B, T, n_out, C) PCM sharded the same way, plus the global
            peak (pmax over both mesh axes).
    """
    halo = halo_bytes_for(chain)
    tile_fn = _tile_chain_fn(chain, cfg)

    def shard_fn(x, keys, valids):
        # x: (b_local, t_local, C, halo+tile); vmap the tile fn over both.
        out, peaks = jax.vmap(jax.vmap(tile_fn))(x, keys, valids)
        peak = jnp.max(peaks)
        peak = jax.lax.pmax(jax.lax.pmax(peak, tile_axis), stream_axis)
        return out, peak

    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(stream_axis, tile_axis, None, None),
                  P(stream_axis, tile_axis, None),
                  P(stream_axis, tile_axis)),
        out_specs=(P(stream_axis, tile_axis, None, None), P()),
    )
    return jax.jit(mapped), halo


def split_overlap_save(planes: np.ndarray, n_tiles: int, tile_bytes: int,
                       halo_bytes: int) -> np.ndarray:
    """(C, B) stream -> (n_tiles, C, halo+tile) overlap-save tiles.
    The stream is zero-... idle-padded on the left (warmup) and on the
    right up to n_tiles*tile_bytes (callers trim outputs)."""
    c, total = planes.shape
    need = n_tiles * tile_bytes
    if total < need:
        pad = np.full((c, need - total), 0x69, dtype=np.uint8)
        planes = np.concatenate([planes, pad], axis=1)
    lead = np.full((c, halo_bytes), 0x69, dtype=np.uint8)
    padded = np.concatenate([lead, planes], axis=1)
    tiles = [padded[:, t * tile_bytes:t * tile_bytes + halo_bytes + tile_bytes]
             for t in range(n_tiles)]
    return np.stack(tiles)


def convert_stream_tiled(planes: np.ndarray, chain, cfg: StepConfig,
                         mesh: Mesh, key=None, body=None,
                         in_hz: int | None = None):
    """Convert one whole stream by sharding its overlap-save tiles over a
    1D mesh. Returns ((n_out, C) np.ndarray, peak).

    Note: unlike the streaming engine (zero initial filter state), the
    left warmup here is idle-pattern padding; outputs match the streaming
    path everywhere past the first halo's worth of samples.

    ``body``/``in_hz``: per-shard tile body selection (`_resolve_body`)
    — on TPU the production fused kernel runs inside shard_map, with
    each tile's halo prefix feeding the kernel's streaming halo state
    (exact streaming semantics); `in_hz` (input DSD rate) is forwarded
    to `fused.pick_block_bytes` for API parity with the engine (since
    the round-5 G=1 flip it no longer changes the chosen block).
    """
    assert len(mesh.axis_names) == 1, "convert_stream_tiled wants a 1D mesh"
    axis = mesh.axis_names[0]
    if key is None:
        key = jax.random.PRNGKey(0x5D5D)
    mode, interp, forced = _resolve_body(chain, body)
    if mode == "fused":
        try:
            return _convert_stream_tiled_fused(planes, chain, cfg, mesh,
                                               key, interp, in_hz)
        except ValueError:
            if forced:
                raise
            # chain/cfg not kernel-expressible: XLA phase body below
    n_dev = math.prod(mesh.devices.shape)
    c, total = planes.shape
    unit = _chain_unit_bytes(chain)
    tile_bytes = -(-total // (n_dev * unit)) * unit
    halo = halo_bytes_for(chain)
    tiles = split_overlap_save(planes, n_dev, tile_bytes, halo)
    # fold_in(key, absolute tile index): the SAME derivation the chunked
    # variant uses, so when the tile geometry matches (total bytes ==
    # n_tiles x cfg.tile_bytes) the two paths produce bit-identical PCM
    # even for dithered configs (pinned in tests/test_sharded.py).
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_dev))
    sub_cfg = dataclasses.replace(cfg, channels=c, tile_bytes=tile_bytes)
    tile_fn = _tile_chain_fn(chain, sub_cfg)

    def shard_fn(x, k, v):
        out, peaks = jax.vmap(tile_fn)(x, k, v)
        return out, jax.lax.pmax(jnp.max(peaks), axis)

    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None), P(axis)),
        out_specs=(P(axis, None, None), P()),
    ))
    ratio = chain_ratio(chain)
    n_valid = int(total * 8 * ratio)
    n_keep = int(tile_bytes * 8 * ratio)
    # per-tile valid-output counts: trailing pad ringing stays out of
    # the reported peak (finish_tile mask)
    valids = jnp.clip(n_valid - jnp.arange(n_dev) * n_keep, 0, n_keep
                      ).astype(jnp.int32)
    out, peak = fn(jnp.asarray(tiles), keys, valids)
    out = np.asarray(out).reshape(-1, c)
    return out[:n_valid], float(peak)


def _convert_stream_tiled_fused(planes: np.ndarray, chain,
                                cfg: StepConfig, mesh: Mesh, key,
                                interpret: bool, in_hz: int | None):
    """Fused-kernel variant of `convert_stream_tiled`: each shard runs
    the single-pass Pallas kernel with its tile's halo-prefix words as
    the kernel's own streaming halo state. Raises ValueError when the
    chain/cfg is not kernel-expressible."""
    from dsd2dxd_tpu.ops import fused

    axis = mesh.axis_names[0]
    n_dev = math.prod(mesh.devices.shape)
    c, total = planes.shape
    plain = fused.fused_plan(chain) is not None
    block = fused.pick_block_bytes(chain, in_hz)
    unit = math.lcm(_chain_unit_bytes(chain), block)
    tile_bytes = -(-total // (n_dev * unit)) * unit
    fn_local, halo, g = _fused_body(chain, cfg, c, tile_bytes, block,
                                    plain, interpret)
    tiles = split_overlap_save(planes, n_dev, tile_bytes, halo)
    x_w = fused.prep_input(tiles.reshape(n_dev * c, -1), g)
    x_w = x_w.reshape(n_dev, c, -1)
    seeds = _fused_seeds(key, 0, n_dev)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axis
    # annotation, and the body is purely per-shard (no collectives)
    fn = jax.jit(jax.shard_map(
        fn_local, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis)),
        out_specs=(P(axis, None, None), P(axis)), check_vma=False))
    out, peaks = fn(jnp.asarray(x_w), seeds)
    ratio = chain_ratio(chain)
    n_valid = int(total * 8 * ratio)
    n_keep = int(tile_bytes * 8 * ratio)
    out = np.asarray(out)
    peak = _fused_masked_peak(np.asarray(peaks), out, n_valid, n_keep,
                              cfg.bit_depth)
    return out.reshape(-1, c)[:n_valid], float(peak)


def _chain_unit_bytes(chain) -> int:
    return math.lcm(8, chain_tile_unit_bits(build_chain_plans(chain))) // 8


def convert_stream_tiled_chunked(read, chain, cfg: StepConfig, mesh: Mesh,
                                 sink, key=None, cancel=None, progress=None,
                                 total_bytes=None, max_bits=None,
                                 body=None, in_hz: int | None = None):
    """Streaming variant of `convert_stream_tiled`: bounded host memory.

    Instead of staging the whole stream (VERDICT r2 weak 4), reads
    macro-chunks of n_devices x cfg.tile_bytes, splits each into
    overlap-save tiles carried across chunk boundaries (the halo is the
    REAL previous bytes, so undithered outputs match the one-dispatch
    version everywhere past the very first halo; dithered outputs match
    when the tile geometry does — same tile_bytes — since both paths
    key tile noise by fold_in(key, absolute tile index)), and dispatches
    ONE jitted
    shard_map per chunk — fixed shapes, so the compile is reused for the
    whole stream (the old path recompiled per file length). Host RSS is
    O(n_devices x tile); uploads go through per-device
    `chunked_device_put` (the tunnel's >1 MiB cliff, CLAUDE.md).

    ``read(n)`` returns (C, m<=n) uint8 or None at EOF; ``sink`` receives
    (frames, C) PCM in order. Returns the stream peak (linear).
    Noise: tile t of chunk m uses fold_in(key, global tile index) — per
    -tile decorrelation matching the streaming engine's discipline.
    With the fused body (``body``/`_resolve_body`: the default on TPU)
    tile noise instead seeds the kernel's on-core PRNG by
    (_fused_seeds(key), global tile index) — same decorrelation
    discipline, different stream: dithered output is stats-equivalent
    to the phase body; undithered output is bit-exact vs the streaming
    fused path and reduction-order-equal to the phase body.
    """
    from jax.sharding import NamedSharding

    from dsd2dxd_tpu.pipeline.transfer import chunked_device_put

    assert len(mesh.axis_names) == 1
    axis = mesh.axis_names[0]
    if key is None:
        key = jax.random.PRNGKey(0x5D5D)
    devices = list(mesh.devices.flat)
    n_dev = len(devices)
    c = cfg.channels
    mode, interp, forced = _resolve_body(chain, body)
    unit = _chain_unit_bytes(chain)
    fused_g = None
    if mode == "fused":
        from dsd2dxd_tpu.ops import fused

        try:
            plain = fused.fused_plan(chain) is not None
            block = fused.pick_block_bytes(chain, in_hz)
            unit_f = math.lcm(unit, block)
            tile_bytes = max(unit_f, -(-cfg.tile_bytes // unit_f) * unit_f)
            fn_local, halo, fused_g = _fused_body(
                chain, cfg, c, tile_bytes, block, plain, interp)
            unit = unit_f
        except ValueError:
            if forced:
                raise
            mode = "phase"
            fused_g = None
    if mode == "phase":
        tile_bytes = max(unit, -(-cfg.tile_bytes // unit) * unit)
        halo = halo_bytes_for(chain)
        sub_cfg = dataclasses.replace(cfg, tile_bytes=tile_bytes)
        tile_fn = _tile_chain_fn(chain, sub_cfg)

        def shard_fn(x, k, v):
            out, peaks = jax.vmap(tile_fn)(x, k, v)
            return out, jax.lax.pmax(jnp.max(peaks), axis)

        fn = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None), P(axis)),
            out_specs=(P(axis, None, None), P()),
        ))
    else:
        # check_vma=False: see _convert_stream_tiled_fused
        fn = jax.jit(jax.shard_map(
            fn_local, mesh=mesh,
            in_specs=(P(axis, None, None), P(axis)),
            out_specs=(P(axis, None, None), P(axis)), check_vma=False,
        ))
    macro = n_dev * tile_bytes
    tile_sharding = NamedSharding(mesh, P(axis, None, None))
    key_sharding = NamedSharding(mesh, P(axis, None))
    valid_sharding = NamedSharding(mesh, P(axis))
    n_keep = int(tile_bytes * 8 * chain_ratio(chain))

    def upload(tiles):
        # per-device chunked puts sidestep the tunnel's large-transfer
        # cliff; the global array is assembled without further copies
        shards = [chunked_device_put(tiles[i:i + 1], devices[i])
                  for i in range(n_dev)]
        return jax.make_array_from_single_device_arrays(
            tiles.shape, tile_sharding, shards)

    ratio = chain_ratio(chain)
    carry = np.full((c, halo), 0x69, dtype=np.uint8)  # idle warmup
    consumed = 0
    valid_bits = 0
    emitted = 0
    peak = 0.0
    t_global = 0
    pending = None  # one-deep dispatch pipeline

    def drain(pending_item, peak):
        out, pk, n_valid = pending_item
        if fused_g is not None:
            out_np = np.asarray(out)
            peak = max(peak, _fused_masked_peak(np.asarray(pk), out_np,
                                                n_valid, n_keep,
                                                cfg.bit_depth))
            if n_valid > 0 and sink is not None:
                sink(out_np.reshape(-1, c)[:n_valid])
            return peak
        if n_valid > 0 and sink is not None:
            sink(np.asarray(out).reshape(-1, c)[:n_valid])
        return max(peak, float(pk))

    while True:
        if cancel is not None and cancel():
            from dsd2dxd_tpu.utils.errors import CancelledError

            raise CancelledError("Conversion canceled")
        # fill one macro-chunk, tolerating short (non-EOF) reads
        parts = []
        got = 0
        eof = False
        while got < macro:
            b = read(macro - got)
            if b is None:
                eof = True
                break
            parts.append(b)
            got += b.shape[1]
        if got == 0:
            break
        chunk = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=1)
        consumed += got
        valid_bits += got * 8
        if max_bits is not None:
            # trailing padding bits of a non-byte-aligned sample count
            # are never converted as signal (engine discipline)
            valid_bits = min(valid_bits, max_bits)
        if got < macro:
            pad = np.full((c, macro - got), 0x69, dtype=np.uint8)
            chunk = np.concatenate([chunk, pad], axis=1)
        padded = np.concatenate([carry, chunk], axis=1)
        tiles = np.stack([
            padded[:, t * tile_bytes:t * tile_bytes + halo + tile_bytes]
            for t in range(n_dev)])
        carry = padded[:, macro:]
        n_total = int(valid_bits * ratio)
        n_valid, emitted = n_total - emitted, n_total
        if fused_g is not None:
            from dsd2dxd_tpu.ops.fused import prep_input

            seeds = jax.device_put(_fused_seeds(key, t_global, n_dev),
                                   valid_sharding)
            t_global += n_dev
            xw = prep_input(tiles.reshape(n_dev * c, -1),
                            fused_g).reshape(n_dev, c, -1)
            out, pk = fn(upload(xw), seeds)
        else:
            keys = jax.device_put(
                jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    jnp.arange(t_global, t_global + n_dev)), key_sharding)
            # per-tile masked-peak valid counts (global output frames)
            valids = jax.device_put(
                jnp.clip(n_total - (t_global + jnp.arange(n_dev)) * n_keep,
                         0, n_keep).astype(jnp.int32), valid_sharding)
            t_global += n_dev
            out, pk = fn(upload(tiles), keys, valids)
        if pending is not None:
            peak = drain(pending, peak)
        pending = (out, pk, n_valid)
        if progress is not None and total_bytes:
            from dsd2dxd_tpu.formats.dsd_types import (
                ONE_HUNDRED_PERCENT,
                ProgressUpdate,
            )

            pct = min(100.0 * consumed / total_bytes, ONE_HUNDRED_PERCENT)
            progress(ProgressUpdate(percent=pct))
        if eof:
            break
    if pending is not None:
        peak = drain(pending, peak)
    return peak
