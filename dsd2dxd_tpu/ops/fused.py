"""Fused Pallas kernel for the ÷8 phase cascades (the flagship path).

The XLA phase-major path (ops/phase.py) materializes every stage's
output in HBM and re-reads the stream once per tap window — ~10-15
passes over gigabyte intermediates per tile. This kernel performs the
whole conversion in one pass: each grid step DMAs an overlapping
lane-block of raw DSD bytes (block + a ~40-byte halo) from HBM into
VMEM, unpacks to the (C, 8, K) phase layout, runs the full cascade of
s==1 sliced stages, applies level scale, TPDF/rect dither (on-core
PRNG), quantization, and a running peak, and writes one (C, K) output
block. HBM traffic drops to (input bytes + output samples) — the
speed-of-light for this op.

Eligibility: every stage plan must have lane_stride == 1 and the chain
must end at p_out == 1 — true exactly for the ÷8 chains (DSD64→352.8k,
DSD128→705.6k, DSD256→1411.2k), including BASELINE config 1. Other
chains run the XLA phase path (whose head is the same ÷8 structure).

Streaming state is the last `halo_bytes` of raw input per channel (byte
domain, overlap-save) instead of per-stage float histories; the first
tile is primed with the DSD idle pattern (0x69 = silence) rather than
the float path's zero samples, so the first ~halo*8/8 output samples
differ from the scipy oracle by design (documented; silence either way).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsd2dxd_tpu.filters.design import Stage
from dsd2dxd_tpu.formats.dsd_types import DitherType
from dsd2dxd_tpu.ops.phase import PhasePlan, build_chain_plans
from dsd2dxd_tpu.ops.resample import StepConfig

IDLE_BYTE = 0x69  # DSD silence (alternating ±1)
DEFAULT_BLOCK_BYTES = 16384  # lane-block per grid step (VMEM-sized)


def fused_eligible(plans: Sequence[PhasePlan]) -> bool:
    # rephasing (reshape+transpose) isn't expressible in the kernel, so
    # only natural stride-1 chains qualify: the ÷8 family
    return (all(p.rephase == 1 for p in plans)
            and plans[-1].p_out == 1
            and plans[0].p_in == 8)


def chain_halo_bytes(plans: Sequence[PhasePlan]) -> int:
    """Byte halo so every stage's left context is in-block: with s==1
    everywhere, stage j needs hist_lanes extra lanes of its input, and
    lanes are bytes at the top of the chain. Rounded up to 128 so DMA
    windows stay lane-tile aligned (the surplus is extra valid context)."""
    need = sum(p.hist_lanes for p in plans)
    return -(-need // 128) * 128


from dsd2dxd_tpu.ops.phase import tree_sum as _tree_sum  # shared reduction


def _uniform01(shape):
    """[0, 1) uniform from the on-core PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    return bits.astype(jnp.float32) * jnp.float32(2.0 ** -32) + 0.5


def _build_kernel(plans, coef_tables, cfg: StepConfig, block_bytes: int,
                  halo: int, gain: float, c_pad: int, n_blocks: int):
    c = c_pad
    c_real = cfg.channels
    scale = float(1 << (cfg.bit_depth - 1)) if cfg.bit_depth != 32 else 1.0
    # lanes each stage must produce: final block + downstream halos
    need = [block_bytes]
    for p in reversed(list(plans)[1:]):
        need.insert(0, need[0] + p.hist_lanes)
    # stage-0 input rows have `halo + block` lanes; its slices sit at the
    # right edge (halo may exceed the exact context after 128-alignment)
    extra0 = halo - sum(p.hist_lanes for p in plans)

    def kernel(seed_ref, x_hbm, out_ref, peak_ref, xb_vmem, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * block_bytes, halo + block_bytes)],
            xb_vmem, sem)
        cp.start()
        cp.wait()
        # Mosaic prefers flat 2D vectors: keep the stream as a LIST of
        # per-phase (C, K) f32 arrays instead of one (C, P, K) tensor.
        xi = xb_vmem[:, :].astype(jnp.int32)
        rows = [((xi >> (7 - r)) & 1).astype(jnp.float32) * 2.0 - 1.0
                for r in range(8)]
        for j, plan in enumerate(plans):
            h = plan.hist_lanes
            k_out = need[j]
            new_rows = []
            for rho, terms in enumerate(plan.terms):
                contribs = []
                for t_idx, t in enumerate(terms):
                    start = (extra0 if j == 0 else 0) + h + t.base
                    sl = jax.lax.slice(rows[t.r_in], (0, start),
                                       (c, start + k_out), (1, 1))
                    contribs.append(coef_tables[j][rho][t_idx] * sl)
                new_rows.append(_tree_sum(contribs))
            rows = new_rows
        y = rows[0]  # (C, block_bytes)
        if gain != 1.0:
            y = y * jnp.float32(gain)
        # peak over the REAL channels only (rows >= c_real are idle-pattern
        # padding whose residue must not leak into dsd_levels). A masked
        # reduction fuses; a row slice forced an extra materialization.
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
        mask = (row_ids < c_real).astype(jnp.float32)
        peak = jnp.max(jnp.abs(y) * mask)

        @pl.when(i == 0)
        def _():
            peak_ref[0, 0] = peak

        @pl.when(i > 0)
        def _():
            peak_ref[0, 0] = jnp.maximum(peak_ref[0, 0], peak)

        if cfg.bit_depth == 32:
            out_ref[:, :] = y.astype(jnp.float32)
            return
        v = y * jnp.float32(scale)
        if cfg.dither in (DitherType.TPDF, DitherType.RECTANGULAR):
            # unique stream per (tile, block): tile seeds are spaced by
            # n_blocks so block (t, i) never reuses (t', i') noise
            pltpu.prng_seed(seed_ref[0] * n_blocks + i)
            u1 = _uniform01((c, block_bytes))
            if cfg.dither is DitherType.TPDF:
                v = v + (u1 + _uniform01((c, block_bytes)) - 1.0)
            else:
                v = v + (u1 - 0.5)
        out_ref[:, :] = jnp.clip(
            jnp.round(v), -scale, scale - 1.0).astype(jnp.int32)

    return kernel


def make_fused_step(chain: Sequence[Stage], cfg: StepConfig,
                    block_bytes: int = DEFAULT_BLOCK_BYTES,
                    interpret: bool = False,
                    jit: bool = True, transpose: bool = True):
    """Build the fused per-tile step.

    step(x_u8 (C, tile_bytes), halo (C, halo_bytes) u8, seed i32) ->
        (pcm (n_out, C) — or (C, n_out) with transpose=False —, peak,
        new_halo)

    Tile must be a multiple of block_bytes. Raises ValueError for chains
    the kernel doesn't cover (caller falls back to ops/phase.py or the
    hybrid head+tail step below).
    """
    plans = build_chain_plans(chain)
    if not fused_eligible(plans):
        raise ValueError("chain not eligible for the fused /8 kernel")
    if cfg.tile_bytes % block_bytes != 0:
        raise ValueError(f"tile {cfg.tile_bytes} not a multiple of "
                         f"block {block_bytes}")
    if cfg.bit_depth == 32:
        if cfg.dither is not DitherType.NONE:
            # FPD (Dither Float) is applied by the phase path; fall back
            raise ValueError("fused kernel has no float-dither path")
    elif cfg.dither not in (DitherType.TPDF, DitherType.RECTANGULAR,
                            DitherType.NONE):
        raise ValueError(f"fused kernel has no {cfg.dither} path")
    halo = chain_halo_bytes(plans)
    coef_tables = tuple(
        tuple(tuple(float(t.coef) for t in terms) for terms in p.terms)
        for p in plans
    )
    gain = 10.0 ** (cfg.level_db / 20.0)
    c = cfg.channels
    # Mosaic u8 DMA slices need the sublane dim aligned to 4; pad the
    # channel rows (free: the VPU pads (2, K) tiles to 8 sublanes anyway).
    c_pad = -(-c // 4) * 4
    n_blocks = cfg.tile_bytes // block_bytes
    out_dtype = jnp.float32 if cfg.bit_depth == 32 else jnp.int32
    kernel = _build_kernel(plans, coef_tables, cfg, block_bytes, halo, gain,
                           c_pad, n_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # (C, halo+tile) in HBM
        ],
        out_specs=[
            pl.BlockSpec((c_pad, block_bytes), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((c_pad, halo + block_bytes), jnp.uint8),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, cfg.tile_bytes), out_dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )

    def step(x_u8, halo_in, seed, *, _transpose=transpose):
        xin = jnp.concatenate([halo_in, x_u8], axis=1)
        if c_pad != c:
            pad = jnp.full((c_pad - c, xin.shape[1]), IDLE_BYTE,
                           dtype=jnp.uint8)
            xin_k = jnp.concatenate([xin, pad], axis=0)
        else:
            xin_k = xin
        out, peak = call(jnp.asarray([seed], dtype=jnp.int32), xin_k)
        new_halo = xin[:, xin.shape[1] - halo:]
        pcm = out[:c].T if _transpose else out[:c]
        return pcm, peak[0, 0], new_halo

    return (jax.jit(step) if jit else step), halo


def init_fused_halo(chain: Sequence[Stage], channels: int) -> np.ndarray:
    plans = build_chain_plans(chain)
    return np.full((channels, chain_halo_bytes(plans)), IDLE_BYTE,
                   dtype=np.uint8)


# ---------------------------------------------------------------------------
# Hybrid: fused ÷8 head kernel + XLA phase-path tail
# ---------------------------------------------------------------------------


def hybrid_split(chain: Sequence[Stage]) -> int:
    """Length of the fused-head prefix: the natural ÷8 head (three ÷2
    stages taking the bit phases 8 -> 4 -> 2 -> 1). Returns 0 when the
    chain has no such prefix (48k chains start with ÷7)."""
    plans = build_chain_plans(chain)
    n = 0
    p = 8
    for plan in plans:
        if plan.rephase != 1 or plan.L != 1:
            break
        n += 1
        p = plan.p_out
        if p == 1:
            return n
    return 0


def make_hybrid_step(chain: Sequence[Stage], cfg: StepConfig,
                     block_bytes: int = DEFAULT_BLOCK_BYTES,
                     interpret: bool = False):
    """Fused ÷8 Pallas head + à-trous XLA tail in ONE jitted step — for
    deep 44.1k-multiple chains (÷16 .. ÷256) where the head does the
    DSD-rate work single-pass and the tail runs on an 8x-smaller stream.

    The tail stages are evaluated UNDECIMATED with dilated taps
    (z_{j+1}[n] = sum_k h_j[k] * z_j[n - k*d_j], d_j = prod of earlier
    tail Ms): every access is a stride-1 static slice, so none of the
    rephase reshape+transposes (whose (.., K, s) views XLA materializes
    with up to 64x tiling padding — HBM OOM at DSD512 tile sizes) appear.
    One strided extraction at the end picks every R_tail-th lane. Extra
    FLOPs vs decimated evaluation: ~sum(N_j) vs sum(N_j/2^j) taps/lane —
    cheap on the VPU next to the padding traffic it removes.

    Streaming state is a single raw-byte suffix: the head re-derives the
    tail's left context from ctx extra input bytes (head output lanes ==
    input bytes for a ÷8 head).

    step(x_u8, halo_bytes, seed) -> (pcm (n,C), peak, new_halo)
    """
    from dsd2dxd_tpu.ops.phase import tree_sum
    from dsd2dxd_tpu.ops.resample import (
        _dither_noise,
        dither_float32,
        quantize_int,
    )

    n_head = hybrid_split(chain)
    if n_head == 0 or n_head == len(chain):
        raise ValueError("chain has no hybrid head/tail split")
    head, tail = tuple(chain[:n_head]), tuple(chain[n_head:])
    if any(s.L != 1 for s in tail):
        raise ValueError("hybrid tail must be pure decimation")
    # dilations and left context, in head-output lanes (== input bytes)
    dils = []
    ctx = 0
    r_tail = 1
    for s in tail:
        dils.append(r_tail)
        ctx += (s.n_taps - 1) * r_tail
        r_tail *= s.M
    if cfg.tile_bytes % r_tail != 0:
        raise ValueError("tile not aligned to the tail decimation")
    ctx_pad = -(-ctx // block_bytes) * block_bytes
    head_cfg = StepConfig(channels=cfg.channels,
                          tile_bytes=cfg.tile_bytes + ctx_pad,
                          bit_depth=32, dither=DitherType.NONE, level_db=0.0)
    head_step, head_halo = make_fused_step(
        head, head_cfg, block_bytes=block_bytes, interpret=interpret,
        jit=False, transpose=False)
    # taps flipped so stage j reads A_j[l + (N_j-1)*d_j - k*d_j] as an
    # ascending static-offset sweep
    taps_tail = [tuple(float(v) for v in s.taps) for s in tail]
    gain = 10.0 ** (cfg.level_db / 20.0)
    n_loc = cfg.tile_bytes // r_tail
    state_bytes = head_halo + ctx_pad

    # per-stage output lengths (A_{j+1} lanes), back to front
    need = [ctx_pad - ctx + cfg.tile_bytes]
    for s, d in zip(reversed(tail), reversed(dils)):
        need.insert(0, need[0] + (s.n_taps - 1) * d)
    # need[0] == ctx_pad + tile == head output length
    assert need[0] == ctx_pad + cfg.tile_bytes, need

    def step(x_u8, state, seed):
        head_in = jnp.concatenate([state[:, head_halo:], x_u8], axis=1)
        mid, _hpeak, _ = head_step(head_in, state[:, :head_halo], seed)
        z = mid  # (C, ctx_pad + tile) f32
        for j, (taps, d) in enumerate(zip(taps_tail, dils)):
            n_t = len(taps)
            k_out = need[j + 1]
            contribs = []
            for k, coef in enumerate(taps):
                start = (n_t - 1) * d - k * d
                contribs.append(jnp.float32(coef)
                                * jax.lax.slice(z, (0, start),
                                                (z.shape[0], start + k_out)))
            z = tree_sum(contribs)
        # extract every r_tail-th lane (the only non-unit-stride access)
        zz = z[:, ctx_pad - ctx:]
        x = zz.reshape(zz.shape[0], n_loc, r_tail)[..., 0]
        if gain != 1.0:
            x = x * jnp.float32(gain)
        peak = jnp.max(jnp.abs(x))
        key = jax.random.PRNGKey(seed)
        if cfg.bit_depth == 32:
            out = (dither_float32(x, key)
                   if cfg.dither is DitherType.FPD else x)
        else:
            noise = _dither_noise(cfg.dither, key, x.shape, x.dtype)
            out = quantize_int(x, cfg.bit_depth, noise)
        new_state = jnp.concatenate([state, x_u8], axis=1)[:, -state_bytes:]
        return out.T, peak.astype(jnp.float32), new_state

    def make_state():
        return jnp.full((cfg.channels, state_bytes), IDLE_BYTE,
                        dtype=jnp.uint8)

    return jax.jit(step), make_state
