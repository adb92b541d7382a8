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

Coverage: every pure ÷2^k cascade runs single-pass (byte-group word
lanes for ÷8..÷32, in-kernel à-trous tails beyond — see fused_groups /
hybrid_split), and the 48k-family chains run the same kernel for their
÷2^m head with one XLA polyphase stage for the trailing ×160/147 family
conversion (make_fused_rational_step). Only CPU runs and configs the
kernel can't express (e.g. float dither) fall back to the XLA phase
path.

Streaming state is the last `halo_bytes` of raw input per channel (byte
domain, overlap-save) instead of per-stage float histories; the first
tile is primed with the DSD idle pattern (0x69 = silence) rather than
the float path's zero samples, so the first ~halo*8/8 output samples
differ from the scipy oracle by design (documented; silence either way).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsd2dxd_tpu.filters.design import Stage
from dsd2dxd_tpu.formats.dsd_types import DitherType
from dsd2dxd_tpu.utils.errors import ConfigError
from dsd2dxd_tpu.ops.phase import (
    PhasePlan,
    build_chain_plans,
    build_plan,
    plan_dense_coefs,
    plan_window,
)
from dsd2dxd_tpu.ops.resample import StepConfig

IDLE_BYTE = 0x69  # DSD silence (alternating ±1)
DEFAULT_BLOCK_BYTES = 16384  # lane-block per grid step (VMEM-sized)
DEEP_BLOCK_BYTES = 65536  # bigger grid block for high-input-rate chains


from dataclasses import dataclass


@dataclass(frozen=True)
class PlaneLayout:
    """Blocked layout of the kernel's byte-plane (emit="planes") output.

    Wire frame ``f`` of channel ``cc`` lives at row/col:
      batch > 1: i = f // (batch*sub_cols); b = (f // sub_cols) % batch;
                 row = b*channels + cc; col = i*sub_cols + f % sub_cols
      batch == 1: row = cc; col = f   (rows beyond `channels` are padding)
    The host interleaver (native dsdkit_interleave24/16, numpy fallback
    in pipeline/transfer.py) walks this to produce the wire stream.
    """

    channels: int
    rows: int       # sublane rows in the device array (batch*C or c_pad)
    batch: int      # sub-blocks stacked per grid step
    sub_cols: int   # emitted samples per sub-block per grid step
    cols: int       # total columns (= tile frames / batch)
    bit_depth: int  # 16 -> int16 (rows, cols); 20/24 -> u8 (3, rows, cols)


def fused_eligible(plans: Sequence[PhasePlan], groups: int = 1) -> bool:
    # rephasing (reshape+transpose) isn't expressible in the kernel, so
    # only stride-1 chains qualify. At groups=1 that is the natural ÷8
    # family; byte-group pre-splitting (p0 = 8*groups) extends it to every
    # pure ÷(8*groups) cascade — all the deep 44.1k chains.
    return (all(p.rephase == 1 and p.lane_stride == 1 for p in plans)
            and plans[-1].p_out == 1
            and plans[0].p_in == 8 * groups)


DEFAULT_MAX_GROUPS = 4  # see fused_groups: à-trous beats word rows on chip


def fused_groups(chain: Sequence[Stage], max_groups=None):
    """The byte-group count G that makes `chain` runnable by the fused
    kernel with p0 = 8G (stream sample i at phase i mod 8G), or None.

    G = R/8 for a pure integer decimation by R: one lane covers G stream
    bytes, so one lane step is 8G stream samples and every ÷2^k stage
    keeps lane stride 1 — the rephase reshape+transposes that kept deep
    chains off the single-pass kernel vanish. G ≤ 4 rides in one
    little-endian u8/u16/u32 word per lane (byte g of the word = phase
    group g); G ∈ {8, 16} splits each channel's u32 word stream into
    R = G/4 interleaved sublane ROW GROUPS (word w -> row w mod R, lane
    w div R — a cheap device-side transpose in the step prologue), so
    ÷64/÷128 chains can run fully phase-major.

    DEFAULT CAP: ``max_groups`` defaults to 4, i.e. ÷64/÷128 chains take
    the grouped-head + à-trous-tail hybrid, NOT word rows. Measured on
    chip (2026-08, byte-plane emission active, 16 MiB tiles, 24-bit
    TPDF): à-trous wins every deep cell — DSD512→352.8k 500x vs 420x,
    DSD256→176.4k 996x vs 754x, DSD256→88.2k 1093x vs 1083x,
    DSD128→88.2k 2039x vs 1480x. The 8G phase extractions each scan the
    full input window, so doubling/quadrupling the phase count costs
    more than the short undecimated tail stages it removes. Word rows
    remain selectable (``make_fused_step(groups=8|16)``), chip-validated,
    for hardware where the trade flips.
    """
    from fractions import Fraction

    r = Fraction(1)
    for s in chain:
        if s.L != 1:
            return None
        r *= s.M
    if r.denominator != 1 or r.numerator % 8 != 0:
        return None
    g = r.numerator // 8
    cap = max_groups if max_groups is not None else DEFAULT_MAX_GROUPS
    if g not in (1, 2, 4, 8, 16) or g > cap:
        return None
    plans = build_chain_plans(chain, p0=8 * g)
    return g if fused_eligible(plans, g) else None


def word_rows(groups: int) -> int:
    """Sublane row groups per channel: 1 for word-expressible G (≤4),
    G/4 u32-rows beyond."""
    return max(1, groups // 4)


_MXU_SPLITS = 3  # bf16 panel splits; see _mxu_panels


def mxu_head_count(head: Sequence[Stage], groups: int) -> int:
    """How many leading head stages to compose into ONE in-kernel MXU
    matmul (0 = none).

    The slice-FMA cascade is VPU-bound and stage 0 dominates it (p0
    output phases each scanning the input window). Composing the first
    stages down to p_out = 8 (cumulative decimation = `groups`) turns
    them into a single dense FIR evaluated as a block-diagonal matmul on
    the otherwise-idle MXU: out[rho*R + r, k] = sum_{p,w} g[rho,p,w] *
    B[p*R + r, k + w] with B the ±1 phase rows stacked on the sublane
    axis — i.e. kron(g_w, I_R) panels, one dot per window shift w.
    Composition (Noble identity: h0 * (h1 upsampled by M0) then
    decimate by M0*M1) is exact; the panel is built from f64 taps.

    Stopping at p_out = 8 keeps the matmul M dimension at p_out*R = 64+
    rows (R = 8 sublane rows: batch*C or the padded channel rows) —
    composing further would shrink M below an MXU tile while widening
    the dense window, strictly increasing systolic-array passes.

    Bake-off result: a WASH-to-LOSS on every measured cell, confirmed
    TWICE — round 3 single-fetch (DSD512→352.8k 539 vs 544x,
    DSD64→352.8k 3461 vs 3546x, DSD256→192k 700 vs 696x) and the
    round-5 intercept-free slope A/B (tools/mxuab.py 2026-08-20,
    median t_vpu/t_mxu: DSD512→352.8k 1.007, DSD256→192k 0.918,
    DSD256→352.8k 0.946 — the MXU arm is up to 8% SLOWER). The
    per-block floor is DMA + the 8G-row unpack, which the MXU head
    still pays in full; the FMA work it removes is not the binding
    cost. Kept as an opt-in (`make_fused_step(mxu=True)`) in case the
    trade flips on hardware with a wider VPU/MXU gap."""
    cum = 1
    n = 0
    for s in head:
        if s.L != 1 or cum * s.M > groups:
            break
        cum *= s.M
        n += 1
    return n


def _compose_stages(stages: Sequence[Stage]):
    """(f64 taps, M) of the single filter equivalent to the cascade of
    pure-decimation `stages` (filter-then-decimate composition)."""
    taps = np.asarray(stages[0].taps, dtype=np.float64)
    cum = stages[0].M
    for s in stages[1:]:
        up = np.zeros((len(s.taps) - 1) * cum + 1, dtype=np.float64)
        up[::cum] = np.asarray(s.taps, dtype=np.float64)
        taps = np.convolve(taps, up)
        cum *= s.M
    return taps, cum


def _mxu_panels(comp_plan: PhasePlan, r_rows: int):
    """Per-window-shift bf16 coefficient panels for the MXU head.

    Returns [(n_split*p_out*R, p_in*R) bf16] — for each lane shift w,
    kron(g[:, :, w], I_R) split into `_MXU_SPLITS` bf16 residual panels
    stacked on the M axis. The kernel's ±1 operand is EXACT in bf16, so
    only the coefficients need splitting: three residual levels give
    ~2^-27 relative coefficient error (vs bf16's 2^-9, or 2^-18 for
    two), keeping the composed stage's output within the f32 phase
    path's own rounding noise — measured on chip via tools/chipcheck.py
    (the MXU's raw bf16 default costs ~10^4 LSB at 24-bit, CLAUDE.md).
    One dot per w computes all splits: the M axis is n_split * p_out * R
    rows, full MXU row tiles, and the kernel band-sums the splits."""
    import ml_dtypes

    g3 = plan_dense_coefs(comp_plan, dtype=np.float64)
    _lo, w_len = plan_window(comp_plan)
    eye = np.eye(r_rows, dtype=np.float64)
    panels = []
    for w in range(w_len):
        ghat = np.kron(g3[:, :, w], eye)
        splits = []
        rem = ghat
        for _ in range(_MXU_SPLITS):
            s_b = rem.astype(ml_dtypes.bfloat16)
            splits.append(s_b)
            rem = rem - s_b.astype(np.float64)
        panels.append(np.concatenate(splits, axis=0))
    return panels


def chain_halo_lanes(chain: Sequence[Stage]) -> int:
    """Word-lane streaming halo of the fused step for `chain` — the
    SAME value make_fused_step sizes its state with: per-stage history
    plus the a-trous tail context of hybrid (÷64+) chains, rounded up
    to 128 so DMA windows stay lane-tile aligned. (A plans-based
    predecessor omitted the tail context, understating hybrid-chain
    state by whole lane tiles — a sizing trap for new callers.)"""
    return _fused_layout(chain)[4]


def chain_halo_bytes(chain: Sequence[Stage]) -> int:
    """Streaming-state bytes per channel: lane halo x bytes per lane
    (word dtype, x row groups for G=8/16) — equals the halo_bytes
    make_fused_step returns."""
    _plans, g, _tail, _rt, halo_lanes = _fused_layout(chain)
    return halo_lanes * g


from dsd2dxd_tpu.ops.phase import tree_sum as _tree_sum  # shared reduction


def _pm1(inv_word: jax.Array, shift: int) -> jax.Array:
    """±1.0f from bit `shift` of the COMPLEMENTED stream word, by bit
    surgery instead of int→float conversion: park the complement bit in
    the f32 sign position, OR in the 1.0f exponent, reinterpret. Three
    cheap int ops per phase row vs shift/and/convert/mul/sub — the 8G-row
    unpack is most of the kernel's per-block floor (round-3 floor
    decomposition), so this is the hot path. `<< 31` discards every bit
    except bit 0, so no mask is needed."""
    return pltpu.bitcast(((inv_word >> shift) << 31) | 0x3F800000,
                         jnp.float32)


_SIGN = np.int32(np.uint32(0x80000000))


def _sgn(inv_word: jax.Array, shift: int) -> jax.Array:
    """f32 SIGN MASK (0x80000000 / 0) from bit `shift` of the
    complemented stream word — the unpack="signmask" variant. Two int
    ops per phase row instead of _pm1's three; stage 0 then applies each
    coefficient as `bitcast(sign ^ coef_bits)` (an exact IEEE sign flip)
    instead of a multiply. Per-op the two forms are bit-identical (each
    stage-0 contribution is exactly ±coef either way — verified by an
    exhaustive isolated check and a full-cascade numpy replay); end to
    end the compiled kernels may still differ by 1-2 ulp on scattered
    samples because changing stage 0's ops shifts XLA's downstream
    FMA-contraction choices (measured: 3 samples in 2048 on random data,
    CPU interpret). Net: −1 vector op per unpacked element at equal
    stage-0 cost; whether that moves the tap-independent per-block floor
    (CLAUDE.md round-3 decomposition) is decided by an on-chip
    interleaved A/B (tools/unpackbench.py), not assumed."""
    return (inv_word << (31 - shift)) & _SIGN


def _uniform01(shape):
    """[0, 1) uniform from the on-core PRNG."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    return bits.astype(jnp.float32) * jnp.float32(2.0 ** -32) + 0.5


def _build_kernel(plans, coef_tables, cfg: StepConfig, k_sub: int,
                  halo: int, gain: float, n_blocks: int,
                  groups: int, tail, r_tail: int, batch: int, r_rows: int,
                  emit: str = "frames", out_shift: int = 0, rr: int = 1,
                  mxu_meta=None, unpack: str = "bitcast"):
    c_real = cfg.channels
    # Sublane batching: with C < 8 channels the cascade rows waste most
    # of each (8, 128) vector register (measured: C=1/2/4 take the SAME
    # wall time on chip). A grid step therefore processes `batch`
    # consecutive overlap-save SUB-BLOCKS of k_sub lanes each, stacked on
    # the sublane axis — (batch*C, halo + k_sub) rows, ~8 useful sublanes
    # regardless of channel count. Sub-blocks are independent given their
    # halo (same overlap-save argument as the grid itself), so the
    # cascade body is unchanged; only unpack fans wide lanes into rows.
    # (r_rows comes from the factory so the BlockSpec shapes and the
    # kernel's row arithmetic cannot drift apart.)
    block_lanes = batch * k_sub  # input lanes consumed per grid step
    scale = float(1 << (cfg.bit_depth - 1)) if cfg.bit_depth != 32 else 1.0
    # à-trous tail bookkeeping (lanes are head-output samples): stage t of
    # the tail is evaluated UNDECIMATED with dilation d_t, so every access
    # is a stride-1 static slice; tail_need[t+1] lanes come out of it.
    tail_need = [k_sub]
    for taps, d in reversed(tail):
        tail_need.insert(0, tail_need[0] + (len(taps) - 1) * d)
    # lanes each head stage must produce: the tail's input + downstream halos
    need = [tail_need[0]]
    for p in reversed(list(plans)[1:]):
        need.insert(0, need[0] + p.hist_lanes)
    # stage-0 input rows have `halo + k_sub` lanes; its slices sit at the
    # right edge (halo may exceed the exact context after 128-alignment)
    extra0 = halo - sum(p.hist_lanes for p in plans) - (tail_need[0] - k_sub)

    n_panels = mxu_meta[0] if mxu_meta else 0
    # unpack="signmask": stage-0 coefficients are applied by XOR against
    # the sign-mask rows, so precompute their IEEE-754 bit patterns.
    signmask = unpack == "signmask" and not mxu_meta
    coef_bits0 = (tuple(
        tuple(int(np.float32(c).view(np.int32)) for c in rho_terms)
        for rho_terms in coef_tables[0]) if signmask else None)

    def kernel(seed_ref, x_hbm, *refs):
        panel_refs = refs[:n_panels]
        out_ref, peak_ref, xb_vmem, sem = refs[n_panels:]
        i = pl.program_id(0)

        # Double-buffered block DMA: grid steps run sequentially on the
        # core and scratch persists across them, so step i kicks off the
        # HBM->VMEM copy for block i+1 into the other slot before it
        # waits on its own — the next block streams in while this one
        # computes. The old start();wait() exposed the full DMA latency
        # every block, a solid slice of the measured ~5.7us/16KiB floor.
        slot = jax.lax.rem(i, 2)

        def dma(idx, s):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(idx * block_lanes, halo + block_lanes)],
                xb_vmem.at[s], sem.at[s])

        @pl.when(i == 0)
        def _():
            dma(i, slot).start()

        @pl.when(i + 1 < n_blocks)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        # Mosaic prefers flat 2D vectors: keep the stream as a LIST of
        # per-phase (R, K) f32 arrays instead of one (R, P, K) tensor.
        # One lane is one little-endian WORD of `groups` stream bytes
        # (u8/u16/u32 for G=1/2/4 — the host views the byte planes as
        # words for free), so phase r = 8*(byte g of the word) + bitpos
        # is bit 8g + 7 - bitpos of the word: every one of the 8G phase
        # rows is a shift/mask away, with no gathers and no relayout.
        xw = xb_vmem[slot]
        xi = (pltpu.bitcast(xw, jnp.int32) if xw.dtype == jnp.uint32
              else xw.astype(jnp.int32))
        # Fan the word window into sublane-stacked sub-blocks ONCE per
        # row group (each sub-block with its own halo; pad rows dropped,
        # so every cascade row is real) — the 8G phase extractions then
        # run on full-sublane (R, halo+k_sub) shapes. With rr > 1 row
        # groups (G=8/16 word rows), group r holds u32 word r of each
        # G-byte lane at sublane rows [r*C, (r+1)*C) — all concat parts
        # share one sublane offset, which Mosaic's lane-concat requires.
        xg = []
        for r in range(rr):
            if batch > 1:
                xg.append(jnp.concatenate(
                    [jax.lax.slice(xi, (r * c_real, b * k_sub),
                                   ((r + 1) * c_real,
                                    b * k_sub + halo + k_sub))
                     for b in range(batch)], axis=0))
            elif rr > 1:
                xg.append(jax.lax.slice(
                    xi, (r * c_real, 0), ((r + 1) * c_real, xi.shape[1])))
            else:
                xg.append(xi)
        if mxu_meta:
            # MXU head (see mxu_head_count): plans[0] is the composed
            # stage. Unpack straight to ±1 bf16 (exact) stacked
            # phase-major on the sublane axis, then one dot per window
            # shift w against the kron(g_w, I_R) split panels; band-sum
            # the splits. The f32 phase rows for the composed stages
            # never materialize.
            w_len, lo_m = mxu_meta
            cp = plans[0]
            m_rows = cp.p_out * r_rows
            inv0 = ~xg[0]
            parts = []
            for p in range(8 * groups):
                shift = 8 * (p // 8) + 7 - (p % 8)
                parts.append(_pm1(inv0, shift).astype(jnp.bfloat16))
            b_all = jnp.concatenate(parts, axis=0)  # (p_in*R, win)
            k0 = need[0]
            contribs = []
            for w in range(w_len):
                start = extra0 + cp.hist_lanes + lo_m + w
                xw = jax.lax.slice(b_all, (0, start),
                                   (b_all.shape[0], start + k0))
                ow = jax.lax.dot_general(
                    panel_refs[w][:, :], xw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for s_i in range(_MXU_SPLITS):
                    contribs.append(jax.lax.slice(
                        ow, (s_i * m_rows, 0), ((s_i + 1) * m_rows, k0)))
            o_full = _tree_sum(contribs)  # (p_out*R, k0)
            rows = [jax.lax.slice(o_full, (rho * r_rows, 0),
                                  ((rho + 1) * r_rows, k0))
                    for rho in range(cp.p_out)]
            j_start = 1
        else:
            inv_g = [~x for x in xg]
            rows = []
            for p in range(8 * groups):
                b_idx = p // 8  # byte index inside the G-byte lane
                src = inv_g[b_idx // 4] if rr > 1 else inv_g[0]
                biw = b_idx % 4 if rr > 1 else b_idx
                shift = 8 * biw + 7 - (p % 8)
                rows.append(_sgn(src, shift) if signmask
                            else _pm1(src, shift))
            j_start = 0
        for j, plan in list(enumerate(plans))[j_start:]:
            h = plan.hist_lanes
            k_out = need[j]
            new_rows = []
            for rho, terms in enumerate(plan.terms):
                contribs = []
                for t_idx, t in enumerate(terms):
                    start = (extra0 if j == 0 else 0) + h + t.base
                    sl = jax.lax.slice(rows[t.r_in], (0, start),
                                       (r_rows, start + k_out), (1, 1))
                    if signmask and j == 0:
                        # exact ±coef: sign-mask row XOR coef bits
                        contribs.append(pltpu.bitcast(
                            sl ^ jnp.int32(coef_bits0[rho][t_idx]),
                            jnp.float32))
                    else:
                        contribs.append(coef_tables[j][rho][t_idx] * sl)
                new_rows.append(_tree_sum(contribs))
            rows = new_rows
        z = rows[0]  # (R, tail_need[0])
        # à-trous tail: dilated stride-1 slice-FMAs, all in VMEM. The
        # output stays undecimated (one sample per head-output lane); the
        # caller extracts every r_tail-th lane from the small final PCM.
        for t, (taps, d) in enumerate(tail):
            n_t = len(taps)
            k_out = tail_need[t + 1]
            contribs = []
            for k, coef in enumerate(taps):
                start = (n_t - 1) * d - k * d
                contribs.append(jnp.float32(coef)
                                * jax.lax.slice(z, (0, start),
                                                (r_rows, start + k_out)))
            z = _tree_sum(contribs)
        y = z  # (R, k_sub)
        if gain != 1.0:
            y = y * jnp.float32(gain)
        # peak over the REAL channels only (in the unbatched layout rows
        # >= c_real are idle-pattern padding whose residue must not leak
        # into dsd_levels; batched rows are all real), and over the REAL
        # decimation phase only when a tail is present (the discarded
        # intermediate-phase lanes are legitimate lowpass outputs but not
        # emitted samples). A masked reduction fuses; a row slice forced
        # an extra materialization.
        if batch > 1:
            mask = jnp.ones((r_rows, 1), dtype=jnp.float32)
        else:
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (r_rows, 1), 0)
            mask = (row_ids < c_real).astype(jnp.float32)
        if r_tail > 1:
            lane_ids = jax.lax.broadcasted_iota(
                jnp.int32, (r_rows, k_sub), 1)
            mask = mask * (lane_ids % r_tail == 0).astype(jnp.float32)
        peak = jnp.max(jnp.abs(y) * mask)

        @pl.when(i == 0)
        def _():
            peak_ref[0, 0] = peak

        @pl.when(i > 0)
        def _():
            peak_ref[0, 0] = jnp.maximum(peak_ref[0, 0], peak)

        if cfg.bit_depth == 32:
            y32 = y.astype(jnp.float32)
            if cfg.dither is DitherType.FPD:
                # "Dither Float": TPDF at the per-sample ulp (reference
                # README.md:236; ops/resample.dither_float32). The ulp is
                # extracted from the exponent BITS instead of
                # floor(log2(|x|)): masking the f32 to its exponent field
                # yields exactly 2^exp for normal values, and 0 for
                # zeros/denormals (where dither_float32's 1e-30 clamp
                # makes the noise unrepresentably small anyway).
                pltpu.prng_seed(seed_ref[0] * n_blocks + i)
                tpdf = (_uniform01((r_rows, k_sub))
                        + _uniform01((r_rows, k_sub)) - 1.0)
                ebits = pltpu.bitcast(y32, jnp.int32) & jnp.int32(0x7F800000)
                ulp = pltpu.bitcast(ebits, jnp.float32) * jnp.float32(2.0 ** -23)
                y32 = y32 + tpdf * ulp
            out_ref[:, :] = y32
            return
        v = y * jnp.float32(scale)
        if cfg.dither in (DitherType.TPDF, DitherType.RECTANGULAR):
            # unique stream per (tile, block): tile seeds are spaced by
            # n_blocks so block (t, i) never reuses (t', i') noise
            pltpu.prng_seed(seed_ref[0] * n_blocks + i)
            u1 = _uniform01((r_rows, k_sub))
            if cfg.dither is DitherType.TPDF:
                v = v + (u1 + _uniform01((r_rows, k_sub)) - 1.0)
            else:
                v = v + (u1 - 0.5)
        q = jnp.clip(jnp.round(v), -scale, scale - 1.0).astype(jnp.int32)
        if emit != "planes":
            out_ref[:, :] = q
            return
        # Byte-plane emission: the s24le/s16le wire bytes leave the
        # kernel directly (still in the blocked kernel layout — the host
        # interleaver walks it), killing the XLA de-block permute +
        # pack pass that cost ~35% of a batched int step (round-2 op
        # profile; VERDICT r2 item 1). 20-bit pre-shifts into the top of
        # the 24-bit container here (containers/pack.py semantics). The
        # three planes stack on the SUBLANE axis into one (3R, K) u8
        # store: one write per block, and the C-contiguous layout equals
        # (3, R, K) planes on the host for free.
        if out_shift:
            q = q << out_shift
        if cfg.bit_depth == 16:
            out_ref[:, :] = q.astype(jnp.int16)
            return
        out_ref[:, :] = jnp.concatenate(
            [(q & 0xFF), ((q >> 8) & 0xFF), ((q >> 16) & 0xFF)],
            axis=0).astype(jnp.uint8)

    return kernel


_WORD_DTYPES = {1: np.uint8, 2: np.uint16, 4: np.uint32}


def _take_phase0(x, r: int):
    """Every r-th minor-axis lane of 2D ``x`` — in its cheapest form.

    The à-trous tail leaves the kernel undecimated, so the step keeps
    decimation phase 0 on the XLA side. Chip A/Bs of the candidate
    lowerings (tools/deblockbench.py, DSD256→192k shapes, all variants
    bitwise-identical):

    - f32/i32: the FLAT 2D form ``x.reshape(rows, -1, r)[..., 0]`` costs
      +1.78 ms per 38.5 MB — the float path's old expression composed
      the same slice inside the 5D de-block reshape and paid +7.9 ms
      (~4.9 GB/s; 47% of the whole DSD256→192k head step), so callers
      must extract BEFORE the de-block reshape, not after. One-hot
      minor-axis contractions measured WORSE than the flat slice
      (+3.2/+3.0 ms) and are not used.
    - u8/i16 planes: bitcast byte pairs/quads to the wider word and mask
      the LOW part — LE lane order makes element [..., 0] the low bytes,
      so ``v & mask`` IS phase 0; pure bit moves, chained for r ≥ 8.
      +2.54 ms per 28.9 MB vs the flat slice's +4.41 ms.
    """
    if r == 1:
        return x
    rows = x.shape[0]
    if x.dtype == jnp.uint8:
        v, left = x, r
        while left > 1:
            s = 4 if left % 4 == 0 else 2
            v = jax.lax.bitcast_convert_type(
                v.reshape(rows, -1, s),
                jnp.uint32 if s == 4 else jnp.uint16)
            v = (v & 0xFF).astype(jnp.uint8)
            left //= s
        return v
    if x.dtype == jnp.int16:
        v, left = x, r
        while left > 1:
            v = jax.lax.bitcast_convert_type(
                v.reshape(rows, -1, 2), jnp.int32)
            v = (v & 0xFFFF).astype(jnp.int16)
            left //= 2
        return v
    return x.reshape(rows, -1, r)[..., 0]


def sublane_batch(channels: int, block_lanes: int, r_tail: int) -> int:
    """Sublane batch factor: stack 8/C overlap-save sub-blocks per grid
    step so the cascade uses ~8 sublane rows regardless of channel count
    (C=1/2/4 measured the SAME kernel wall time on chip — see
    _build_kernel). Halved until the sub-block stays lane-tile aligned
    and tail-decimation aligned."""
    if channels >= 8:
        return 1
    b_try = 8 // channels
    while b_try > 1 and (block_lanes % (b_try * 128) != 0
                         or (block_lanes // b_try) % r_tail != 0):
        b_try //= 2
    return max(1, b_try)


def fused_plan(chain: Sequence[Stage]):
    """(n_head, groups, r_tail) for running `chain` in the single-pass
    kernel, or None when it can't (rational stages before any ÷8 prefix).

    r_tail == 1: the whole chain runs phase-major in the kernel.
    r_tail > 1: the first n_head stages run phase-major (÷8·groups) and
    the rest run à-trous (dilated, undecimated) in the same kernel pass;
    the caller extracts every r_tail-th output lane.
    """
    g = fused_groups(chain)
    if g is not None:
        return (len(chain), g, 1)
    n_head, g = hybrid_split(chain)
    if n_head == 0:
        return None
    r_tail = 1
    for s in chain[n_head:]:
        r_tail *= s.M
    return (n_head, g, r_tail)


def pick_block_bytes(chain: Sequence[Stage], in_hz: int | None = None) -> int:
    """Grid block (input bytes per Pallas grid step) for `chain`.

    The kernel has a tap-independent per-block floor (block DMA + the
    8G-phase unpack + epilogue — measured on chip with a minimal-taps
    chain, round 3), so a bigger block amortizes it. Round-3 widened
    deep (DSD256/512-input) cells to 64 KiB (DSD512->352.8k 500->560x);
    the round-4 same-run sweeps widened the SHALLOW cells too —
    16->64 KiB measured +6-15% on every G>=2 cell tried (DSD64->88.2k
    4946->5371x, DSD64->176.4k 4417->4685x, DSD128->88.2k 2119->2345x,
    DSD128->176.4k 2590->2989x, DSD256->705.6k 1160->1176x) — so the
    old `deep` gate is gone for G>=2.

    The hard limit is block LANES, not bytes (the kernel unpacks 8G
    phase rows over the lane block, so VMEM scales with block_bytes/G):
    32768 lanes compiles and wins at G=2 (64 KiB); 65536 lanes fails
    Mosaic compilation (G=1 at 64 KiB, G=2 at 128 KiB, G=4 at 256 KiB).
    G=4 at 32768 lanes (128 KiB) compiled but measured no better than
    64 KiB (round 3), so bytes cap at 64 KiB. G=1 takes 32 KiB at EVERY
    input rate: the round-5 same-run 16-vs-32 slope A/B
    (/tmp/chip_blockg1_r5.log 2026-08-20, recorded in
    BENCH_r05_local.json) measured 32 KiB winning all three G=1 cells —
    DSD64->352.8k 6110->6275x (+2.7%), DSD128->705.6k 3046->3145x
    (+3.3%), DSD256->1411.2k 1505->1559x (+3.6%) — overturning the r4
    cross-run -2% on DSD64->352.8k that had split the choice by in_hz.
    ``in_hz`` is therefore no longer load-bearing (kept for API
    stability; callers that omit it now get the same kernel as the
    engine).

    Applies to both the plain fused step and the rational step's head
    (the decimation the kernel itself runs is what sets block count)."""
    plan = fused_plan(chain)
    if plan is None:
        n_head = fused_rational_plan(chain)
        if n_head is None:
            return DEFAULT_BLOCK_BYTES
        plan = fused_plan(chain[:n_head])
        if plan is None:  # pragma: no cover - rational implies plain head
            return DEFAULT_BLOCK_BYTES
    _n_head, g, r_tail = plan
    cap_lanes = 32768
    bb = min(DEEP_BLOCK_BYTES, g * cap_lanes)
    if (bb <= DEFAULT_BLOCK_BYTES
            or bb % (g * 128) != 0 or (bb // g) % r_tail != 0):
        return DEFAULT_BLOCK_BYTES
    return bb


def _fused_layout(chain: Sequence[Stage], groups=None):
    """(plans, groups, tail, r_tail, halo_lanes) shared by the step
    factory and the state initializer. `tail` is ((taps, dilation), ...)
    in head-output lanes.

    ``groups`` > DEFAULT_MAX_GROUPS explicitly opts a deep chain into
    G=8/16 word rows instead of the (faster, default) à-trous hybrid."""
    if (groups is not None and groups > DEFAULT_MAX_GROUPS
            and fused_groups(chain, max_groups=groups) == groups):
        plan = (len(chain), groups, 1)
    else:
        plan = fused_plan(chain)
    if plan is None:
        raise ValueError("chain not eligible for the fused kernel")
    n_head, g, r_tail = plan
    if groups is not None and groups != g:
        raise ValueError(f"chain wants {g} byte groups, caller asked "
                         f"for {groups}")
    plans = build_chain_plans(chain[:n_head], p0=8 * g)
    tail = []
    d = 1
    for s in chain[n_head:]:
        tail.append((tuple(float(v) for v in s.taps), d))
        d *= s.M
    tail_ctx = sum((len(taps) - 1) * dd for taps, dd in tail)
    halo_lanes = -(-(sum(p.hist_lanes for p in plans) + tail_ctx) // 128) * 128
    return plans, g, tuple(tail), r_tail, halo_lanes


def word_dtype(groups: int) -> np.dtype:
    """Host dtype of the kernel's input words (u32 beyond G=4; the
    row-group split to G-byte lanes happens on device)."""
    return np.dtype(_WORD_DTYPES[min(groups, 4)])


def prep_input(planes: np.ndarray, groups: int) -> np.ndarray:
    """View (C, n_bytes) u8 byte planes as the word stream the grouped
    kernel consumes — a free numpy reinterpretation, no copy."""
    if groups == 1:
        return planes
    return np.ascontiguousarray(planes).view(word_dtype(groups))


def make_fused_step(chain: Sequence[Stage], cfg: StepConfig,
                    block_bytes: int = DEFAULT_BLOCK_BYTES,
                    interpret: bool = False,
                    jit: bool = True, transpose: bool = True,
                    groups=None, emit: str = "frames", out_shift: int = 0,
                    mxu: bool | None = None, unpack: str | None = None):
    """Build the fused per-tile step for any chain `fused_plan` covers.

    step(x (C, tile_bytes/G) words, halo (C, halo_words) words, seed i32)
        -> (pcm (n_out, C) — or (C, n_out) with transpose=False —, peak,
        new_halo)

    With ``emit="planes"`` (int depths only) the kernel writes the WIRE
    bytes directly — (3, rows, cols) u8 little-endian byte planes for
    20/24-bit (20-bit pre-shifted by ``out_shift``), (rows, cols) int16
    for 16-bit — still in the blocked kernel layout described by the
    returned `PlaneLayout`; the host-side native interleaver
    (native: dsdkit_interleave24/16) produces the final frame-
    interleaved stream. This removes the XLA de-block permute and pack
    pass entirely. Returns (step, halo_bytes, layout) in this mode.

    With G > 1 byte groups the input is the byte stream viewed as
    little-endian u16/u32 words (`prep_input` — a free host-side view):
    one lane = one word = 8G stream samples, so the kernel runs a ÷8G
    cascade at p0 = 8G with every stage stride-1 and extracts each phase
    row with one shift/mask — see `fused_groups`. Chains deeper than ÷32
    (the widest word) run their remaining pure-decimation stages à-trous
    inside the same kernel pass (see `_build_kernel`). block_bytes is in
    INPUT bytes per grid step; the kernel's lane block is block_bytes/G.

    `groups` is optional and only asserts the auto-planned group count.
    Tile must be a multiple of block_bytes. Raises ValueError for chains
    the kernel doesn't cover (caller falls back to ops/phase.py).

    ``unpack`` selects the ±1 row construction: "bitcast" (default —
    _pm1 sign-bit surgery) or "signmask" (_sgn 2-op sign masks with
    stage-0 coefficients applied by XOR; candidate floor lever, chip
    A/B in tools/unpackbench.py). None reads DSD2DXD_UNPACK so chip
    tools can A/B the full engine path without code edits (read at
    step-build time; set it before the process builds any step).
    """
    if unpack is None:  # process-stable A/B switch for chip tools
        unpack = os.environ.get("DSD2DXD_UNPACK", "bitcast")
        if unpack not in ("bitcast", "signmask"):
            # A typo'd env var must fail LOUDLY: the engine treats
            # ValueError from step construction as "cfg not
            # kernel-expressible" and would silently fall back to the
            # phase path at kernel-sized (uncapped) tiles — a 5-10x
            # slowdown, or an HBM OOM on DSD512 (engine._make_step).
            raise ConfigError(
                f"DSD2DXD_UNPACK={unpack!r} (want bitcast or signmask)")
    if unpack not in ("bitcast", "signmask"):
        raise ValueError(f"unknown unpack variant {unpack!r}")
    if unpack == "signmask" and mxu:
        raise ValueError("signmask unpack does not apply to the MXU head "
                         "(its dot needs ±1 values, not sign masks)")
    plans, groups, tail, r_tail, halo_lanes = _fused_layout(chain, groups)
    if cfg.tile_bytes % block_bytes != 0:
        raise ValueError(f"tile {cfg.tile_bytes} not a multiple of "
                         f"block {block_bytes}")
    if block_bytes % (groups * 128) != 0:
        raise ValueError(f"block {block_bytes} not lane-aligned for "
                         f"{groups} groups")
    if (block_bytes // groups) % r_tail != 0:
        raise ValueError("kernel block not aligned to the tail decimation")
    if cfg.bit_depth == 32:
        if cfg.dither not in (DitherType.NONE, DitherType.FPD):
            raise ValueError(f"fused kernel has no {cfg.dither} float path")
    elif cfg.dither not in (DitherType.TPDF, DitherType.RECTANGULAR,
                            DitherType.NONE):
        raise ValueError(f"fused kernel has no {cfg.dither} path")
    wdt = jnp.dtype(word_dtype(groups))
    rr = word_rows(groups)
    idle_word = int.from_bytes(bytes([IDLE_BYTE]) * min(groups, 4), "little")
    block_lanes = block_bytes // groups
    tile_lanes = cfg.tile_bytes // groups  # output samples * r_tail
    gain = 10.0 ** (cfg.level_db / 20.0)
    c = cfg.channels
    rows_in = rr * c
    # Mosaic u8 DMA slices need the sublane dim aligned to 4; pad the
    # input rows for the copy (cascades drop the pad rows at unpack
    # time).
    c_pad = -(-rows_in // 4) * 4
    n_blocks = cfg.tile_bytes // block_bytes
    batch = sublane_batch(c, block_lanes, r_tail)
    k_sub = block_lanes // batch
    r_rows = batch * c if batch > 1 else (c if rr > 1 else c_pad)
    out_lanes = n_blocks * k_sub  # kernel output columns
    out_dtype = jnp.float32 if cfg.bit_depth == 32 else jnp.int32
    if emit not in ("frames", "planes"):
        raise ValueError(f"unknown emit mode {emit!r}")
    if emit == "planes" and cfg.bit_depth == 32:
        raise ValueError("byte-plane emission is for integer depths")
    # MXU head (opt-in; chip bake-off was a wash — see mxu_head_count):
    # compose the leading stages into one matmul when the layout
    # supports it (no word rows, full 8-sublane rows — the kron
    # identity block and the per-phase output slices then stay aligned
    # to the 8-sublane register tile).
    n_mxu = 0
    if mxu and rr == 1 and r_rows == 8:
        n_mxu = mxu_head_count(list(chain)[:len(plans)], groups)
    if mxu and not n_mxu:
        raise ValueError("chain/layout not eligible for the MXU head")
    if n_mxu:
        comp_taps, comp_m = _compose_stages(list(chain)[:n_mxu])
        comp_plan = build_plan(Stage(taps=comp_taps, L=1, M=comp_m),
                               8 * groups)
        plans_k = (comp_plan,) + tuple(plans[n_mxu:])
        lo_m, w_len = plan_window(comp_plan)
        panels_np = _mxu_panels(comp_plan, r_rows)
        mxu_meta = (w_len, lo_m)
    else:
        plans_k, panels_np, mxu_meta = plans, [], None
    coef_tables = tuple(
        tuple(tuple(float(t.coef) for t in terms) for terms in p.terms)
        for p in plans_k
    )
    kernel = _build_kernel(plans_k, coef_tables, cfg, k_sub, halo_lanes,
                           gain, n_blocks, groups, tail, r_tail,
                           batch, r_rows, emit, out_shift, rr, mxu_meta,
                           unpack)
    panel_args = [jnp.asarray(p, dtype=jnp.bfloat16) for p in panels_np]
    panel_specs = [
        pl.BlockSpec(p.shape, lambda i, *_: (0, 0),
                     memory_space=pltpu.VMEM)
        for p in panels_np
    ]

    if emit == "planes" and cfg.bit_depth in (20, 24):
        pcm_specs = [pl.BlockSpec((3 * r_rows, k_sub), lambda i, *_: (0, i),
                                  memory_space=pltpu.VMEM)]
        pcm_shapes = [jax.ShapeDtypeStruct((3 * r_rows, out_lanes),
                                           jnp.uint8)]
    elif emit == "planes":
        pcm_specs = [pl.BlockSpec((r_rows, k_sub), lambda i, *_: (0, i),
                                  memory_space=pltpu.VMEM)]
        pcm_shapes = [jax.ShapeDtypeStruct((r_rows, out_lanes), jnp.int16)]
    else:
        pcm_specs = [pl.BlockSpec((r_rows, k_sub), lambda i, *_: (0, i),
                                  memory_space=pltpu.VMEM)]
        pcm_shapes = [jax.ShapeDtypeStruct((r_rows, out_lanes), out_dtype)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # (C, halo+tile lanes) HBM
            *panel_specs,
        ],
        out_specs=[
            *pcm_specs,
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c_pad, halo_lanes + block_lanes), wdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            *pcm_shapes,
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )

    def _prologue(x_w, halo_in):
        if rr > 1:
            # split each channel's u32 word stream into rr interleaved
            # row groups: word w -> row (w mod rr)*C + c, lane w div rr
            # (one cheap XLA transpose over the input words; the kernel
            # then extracts every one of the 8G phase rows with a
            # contiguous-sublane slice + shift/mask)
            cw, lw = x_w.shape
            x_w = (x_w.reshape(cw, lw // rr, rr)
                   .transpose(2, 0, 1).reshape(rr * cw, lw // rr))
        xin = jnp.concatenate([halo_in, x_w], axis=1)
        if c_pad != rows_in:
            pad = jnp.full((c_pad - rows_in, xin.shape[1]), idle_word,
                           dtype=wdt)
            xin_k = jnp.concatenate([xin, pad], axis=0)
        else:
            xin_k = xin
        return xin, xin_k

    if emit == "planes":
        k2 = k_sub // r_tail
        layout = PlaneLayout(channels=c, rows=r_rows, batch=batch,
                             sub_cols=k2, cols=n_blocks * k2,
                             bit_depth=cfg.bit_depth)

        def step_planes(x_w, halo_in, seed):
            xin, xin_k = _prologue(x_w, halo_in)
            pcm, peak = call(jnp.asarray([seed], dtype=jnp.int32),
                             xin_k, *panel_args)
            new_halo = xin[:, xin.shape[1] - halo_lanes:]
            if r_tail > 1:
                # keep decimation phase 0 of the à-trous output; stays in
                # the blocked layout (no transpose anywhere on device)
                pcm = _take_phase0(pcm, r_tail)
            if cfg.bit_depth != 16:
                # (3R, cols) u8 -> (3, R, cols): identical C-contiguous
                # bytes, just the host-facing plane view
                pcm = pcm.reshape(3, r_rows, pcm.shape[1])
            return pcm, peak[0, 0], new_halo

        return ((jax.jit(step_planes, donate_argnums=(1,))
                 if jit else step_planes),
                halo_lanes * groups, layout)

    def step(x_w, halo_in, seed, *, _transpose=transpose):
        xin, xin_k = _prologue(x_w, halo_in)
        out, peak = call(jnp.asarray([seed], dtype=jnp.int32),
                         xin_k, *panel_args)
        new_halo = xin[:, xin.shape[1] - halo_lanes:]
        if batch > 1:
            # de-block the sublane batching with ONE permutation that
            # also performs the requested interleave transpose:
            # out[b*C + cc, i*k_sub + k] is (block i*batch + b, channel
            # cc, lane k). Two chained transposes (de-block then .T)
            # cost ~27% of the step (measured, op profile).
            k2 = k_sub // r_tail
            # keep decimation phase 0 of the à-trous output (the lane
            # phase is global: k_sub % r_tail == 0, so extraction on the
            # flat lanes commutes with the de-block reshape)
            o = _take_phase0(out, r_tail).reshape(batch, c, n_blocks, k2)
            if _transpose:
                pcm = (o.transpose(2, 0, 3, 1)
                       .reshape(n_blocks * batch * k2, c))
            else:
                pcm = (o.transpose(1, 2, 0, 3)
                       .reshape(c, n_blocks * batch * k2))
            return pcm, peak[0, 0], new_halo
        pcm = out[:c]
        if r_tail > 1:
            pcm = _take_phase0(pcm, r_tail)
        pcm = pcm.T if _transpose else pcm
        return pcm, peak[0, 0], new_halo

    return ((jax.jit(step, donate_argnums=(1,)) if jit else step),
            halo_lanes * groups)


def init_fused_halo(chain: Sequence[Stage], channels: int,
                    groups=None) -> np.ndarray:
    """Initial streaming state: idle-pattern words, (R*C, halo_words) —
    already in the kernel's row-group layout when G > 4 (R = G/4)."""
    _plans, g, _tail, _rt, halo_lanes = _fused_layout(chain, groups)
    idle_word = int.from_bytes(bytes([IDLE_BYTE]) * min(g, 4), "little")
    return np.full((word_rows(g) * channels, halo_lanes), idle_word,
                   dtype=word_dtype(g))


# ---------------------------------------------------------------------------
# Fused head + XLA rational tail (the 48k-family chains)
# ---------------------------------------------------------------------------


def fused_rational_plan(chain: Sequence[Stage]):
    """n_head when `chain` is a fused-kernel-eligible pure-decimation
    prefix followed by ONE trailing rational (L>1) stage — the shape of
    every 48k-family chain (filters/design._chain_48k: pure ÷2^m head
    down to base = out·147/160, then the ×160/147 family stage). None
    otherwise."""
    if len(chain) < 2 or chain[-1].L == 1:
        return None
    head = tuple(chain[:-1])
    if any(s.L != 1 for s in head):
        return None
    return len(head) if fused_plan(head) is not None else None


def kernel_covers(chain: Sequence[Stage], bit_depth: int, dither) -> bool:
    """Will a fused Pallas path (plain or fused-head+rational-tail) run
    this EFFECTIVE step config on TPU? Single source of truth for the
    engine's dispatch gate and its tile-sizing cap (pipeline/engine.py) —
    `make_fused_step`'s ValueErrors remain the backstop."""
    plain = fused_plan(chain) is not None
    rational = fused_rational_plan(chain) is not None
    if not (plain or rational):
        return False
    if dither is DitherType.NJAD:
        return False  # host requantizer: engine converts to float first
    if bit_depth == 32 and dither is not DitherType.NONE:
        # FPD runs in-kernel on the plain path and in the XLA epilogue on
        # the rational path; other dithers are meaningless for float out
        # (the phase path ignores them) and the kernel refuses them
        return dither is DitherType.FPD or rational
    if bit_depth != 32 and dither not in (DitherType.TPDF,
                                          DitherType.RECTANGULAR,
                                          DitherType.NONE):
        return False
    return True


_FINISH_BLOCK_LANES = (16384, 8192, 4096, 2048, 1024, 512, 256, 128)


def make_finish_planes(cfg: StepConfig, n_out: int, out_shift: int = 0,
                       interpret: bool = False):
    """Standalone Pallas epilogue for steps whose cascade tail runs in
    XLA (the rational ×160/147 stage): (C, n_out) f32 final-rate
    samples -> (wire byte planes, peak) with gain, peak, on-core
    TPDF/RECT dither, quantize and the s24le/s16 byte split in ONE
    kernel pass over full 8-sublane registers.

    Why: the XLA threefry epilogue cost 8.8 ms of a 25.5 ms
    DSD64->384k tile — threefry PRNG 2.47 ms + quantize/plane split
    6.30 ms (tools/ratprof.py ladder, on chip 2026-08-20) — while the
    plain kernel runs the identical epilogue in-pass for ~free. Noise
    here comes from the ON-CORE PRNG (per (seed, block) deterministic,
    the plain kernel's stream family), NOT make_phase_step's threefry —
    so equivalence is tested the plain kernel's way: NONE dither is
    bit-exact vs the XLA finish, TPDF/RECT statistics are asserted on
    real hardware (tools/chipcheck.py; interpret mode cannot execute
    the on-core PRNG).

    Layout: the returned ``finish(z, seed)`` free-reshapes
    (C, n_out) -> (C, n_blocks, batch, Lb) and transposes sub-blocks
    onto the sublane axis (rows b*C + cc — one XLA relayout at
    bandwidth), which IS the plain kernel's batched `PlaneLayout`, so
    the host interleaver consumes the output unchanged.

    Returns (finish, PlaneLayout), or None when not expressible
    (channels not a power-of-two divisor of 8, n_out not
    block-alignable, or a non-kernel dither).
    """
    c = cfg.channels
    if cfg.bit_depth == 32 or c < 1 or 8 % c != 0:
        return None
    if cfg.dither not in (DitherType.TPDF, DitherType.RECTANGULAR,
                          DitherType.NONE):
        return None
    batch = 8 // c
    lb = next((l for l in _FINISH_BLOCK_LANES
               if n_out % (batch * l) == 0), None)
    if lb is None:
        return None
    n_blocks = n_out // (batch * lb)
    rows = batch * c
    gain = 10.0 ** (cfg.level_db / 20.0)
    scale = float(1 << (cfg.bit_depth - 1))
    dither = cfg.dither
    depth16 = cfg.bit_depth == 16

    def kern(seed_ref, z_ref, out_ref, peak_ref):
        i = pl.program_id(0)
        y = z_ref[:, :]
        if gain != 1.0:
            y = y * jnp.float32(gain)
        peak = jnp.max(jnp.abs(y))

        @pl.when(i == 0)
        def _():
            peak_ref[0, 0] = peak

        @pl.when(i > 0)
        def _():
            peak_ref[0, 0] = jnp.maximum(peak_ref[0, 0], peak)

        v = y * jnp.float32(scale)
        if dither in (DitherType.TPDF, DitherType.RECTANGULAR):
            # unique stream per (tile, block), the plain kernel's
            # convention (the head runs dither-free in rational mode,
            # so the streams cannot collide within a step)
            pltpu.prng_seed(seed_ref[0] * n_blocks + i)
            u1 = _uniform01((rows, lb))
            if dither is DitherType.TPDF:
                v = v + (u1 + _uniform01((rows, lb)) - 1.0)
            else:
                v = v + (u1 - 0.5)
        q = jnp.clip(jnp.round(v), -scale, scale - 1.0).astype(jnp.int32)
        if out_shift:
            q = q << out_shift
        if depth16:
            out_ref[:, :] = q.astype(jnp.int16)
        else:
            out_ref[:, :] = jnp.concatenate(
                [(q & 0xFF), ((q >> 8) & 0xFF), ((q >> 16) & 0xFF)],
                axis=0).astype(jnp.uint8)

    if depth16:
        out_spec = pl.BlockSpec((rows, lb), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((rows, n_blocks * lb), jnp.int16)
    else:
        out_spec = pl.BlockSpec((3 * rows, lb), lambda i, *_: (0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((3 * rows, n_blocks * lb),
                                         jnp.uint8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((rows, lb), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=[out_spec,
                   pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                                memory_space=pltpu.SMEM)],
    )
    call = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[out_shape, jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret)
    layout = PlaneLayout(channels=c, rows=rows, batch=batch, sub_cols=lb,
                         cols=n_blocks * lb, bit_depth=cfg.bit_depth)

    def finish(z, seed):
        zb = (z.reshape(c, n_blocks, batch, lb).transpose(2, 0, 1, 3)
              .reshape(rows, n_blocks * lb))
        planes, peak = call(jnp.asarray([seed], dtype=jnp.int32), zb)
        if not depth16:
            planes = planes.reshape(3, rows, n_blocks * lb)
        return planes, peak[0, 0]

    return finish, layout


def make_fused_rational_step(chain: Sequence[Stage], cfg: StepConfig,
                             block_bytes: int = DEFAULT_BLOCK_BYTES,
                             interpret: bool = False, jit: bool = True,
                             emit: str = "frames", out_shift: int = 0,
                             mxu: bool | None = None,
                             unpack: str | None = None,
                             tail_block: int | None = None,
                             finish: str | None = None):
    """Single-pass kernel for the decimation head + one XLA polyphase
    stage for the trailing rational (×160/147) family conversion.

    ``finish`` (planes mode only): None = auto (the Pallas finish
    kernel whenever expressible — see make_finish_planes), "xla" =
    force the threefry finish_tile epilogue (bit-identical to
    make_phase_step's noise), "kernel" = require the Pallas finish
    (raises when ineligible). A fused banded-tail + finish kernel
    ("tail": the ×160/147 matmul in-kernel too) was built and chip
    -measured TWICE — v1 (in-kernel lane-concat) 0.60-0.63x and v2
    (split standard-form dots vs pre-transposed band panels)
    0.59-0.83x of this path on four production cells
    (tools/tailfuseab.py slope A/B, 2026-08-20) — and deleted: the
    XLA banded-natural einsum + standalone finish kernel IS the
    winning form.

    The head runs `make_fused_step` in float mode (no level/dither/
    quantize — those move to the tail so dither and peak act on the
    FINAL samples); the tail is ops/phase.py's own stage body + epilogue
    on the head's small PCM-rate output (~2-3 lanes of matmul window).
    In frames mode (and planes with finish="xla") noise is bit-identical
    to make_phase_step's: the same (0x5D5D, seed) threefry stream. The
    planes-mode Pallas finish uses the on-core PRNG instead (the plain
    kernel's stream family — NONE stays bit-exact, dither is
    stats-equivalent; chipcheck asserts it on hardware).

    step(x_w, (halo, hist), seed) -> (pcm (n_out, C), peak,
                                      (new_halo, new_hist))
    Returns (step, halo_bytes).

    ``emit="planes"`` (int depths): XLA fuses the wire-byte split into
    the same jit — step returns (3, C, n_out) u8 planes (16-bit:
    (C, n_out) int16) in channel-major order, described by a batch=1
    `PlaneLayout`, so the engine's blocked-plane drains (native
    interleaver / deplaner) consume it unchanged. Packing from the
    (C, n) PRE-transpose samples keeps n on the lane axis (the flat
    frame-major variant forced an XLA relayout that cost more than the
    pack pass it replaced — measured on chip).
    """
    import dataclasses

    from dsd2dxd_tpu.ops.phase import (
        _MATMUL_TERM_THRESHOLD,
        build_chain_coefs,
        build_plan,
        finish_tile,
        interleave_phases,
        plan_banded_natural,
        plan_banded_natural_blocks,
        stage_apply_phase,
        stage_apply_phase_matmul,
        stage_apply_rational_natural,
    )

    n_head = fused_rational_plan(chain)
    if n_head is None:
        raise ValueError("chain is not fused-head + rational-tail shaped")
    strict_finish = finish is not None
    if strict_finish and emit != "planes":
        raise ValueError(
            f"finish={finish!r} applies to emit='planes' only "
            f"(frames mode always runs the threefry XLA epilogue)")
    if finish is None:
        finish = os.environ.get("DSD2DXD_RATIONAL_FINISH", "auto")
        if finish not in ("auto", "xla", "kernel"):
            raise ConfigError(
                f"DSD2DXD_RATIONAL_FINISH={finish!r} "
                f"(want auto, xla or kernel)")
        if finish == "auto":
            finish = None
    head, rstage = tuple(chain[:n_head]), chain[-1]
    if cfg.dither is DitherType.NJAD:
        raise ValueError("NJAD requantizes on host; convert in float mode")
    head_cfg = dataclasses.replace(cfg, bit_depth=32,
                                   dither=DitherType.NONE, level_db=0.0)
    hstep, halo_bytes = make_fused_step(head, head_cfg, block_bytes,
                                        interpret=interpret, jit=False,
                                        transpose=False, mxu=mxu,
                                        unpack=unpack)
    plan = build_plan(rstage, p_in=1)
    r_head = 1
    for s in head:
        r_head *= s.M
    n_base = cfg.tile_bits // r_head
    if n_base % plan.p_in != 0:
        raise ValueError(
            f"tile emits {n_base} base samples, not aligned to the "
            f"rational stage's {plan.p_in} phases")
    dtype = jnp.dtype(cfg.dtype)
    banded = plan_banded_natural(plan)
    if banded is not None:
        # Banded-natural tail: the (160, 294) dense phase-major einsum is
        # only ~6% dense, and at Precision.HIGHEST its 94%-zeros operand
        # streams through the MXU six times. In NATURAL layout the band
        # collapses to one (p_out, ~164) dense einsum over free-reshape
        # block windows with no rephase/interleave transposes — measured
        # 3.10 -> 2.43 ms on chip for the DSD256->192k tail
        # (tools/tailbanded.py, 2026-08-17).
        band = jnp.asarray(banded[0], dtype=dtype)
        nhist = banded[1]
        # tail_block: row-block the band (plan_banded_natural_blocks) —
        # same taps/accumulation, ~3.4x fewer MACs at block=32. Opt-in
        # until a same-run interleaved chip A/B decides the default
        # (tools/tailbanded.py --ab).
        blocks = None
        if tail_block:
            blocks = [(lo, jnp.asarray(pan, dtype=dtype)) for lo, pan in
                      plan_banded_natural_blocks(banded[0], tail_block)]

        def tail(y, hist):
            return stage_apply_rational_natural(y.astype(dtype), hist,
                                                plan, band, nhist,
                                                blocks=blocks)
    else:
        coefs, n_terms = build_chain_coefs((plan,), dtype)
        apply = (stage_apply_phase_matmul
                 if n_terms[0] > _MATMUL_TERM_THRESHOLD
                 else stage_apply_phase)

        def tail(y, hist):
            z, new_hist = apply(y[:, None, :].astype(dtype), hist, plan,
                                coefs[0])
            return interleave_phases(z), new_hist

    gain = 10.0 ** (cfg.level_db / 20.0)
    base_key = jax.random.PRNGKey(0x5D5D)

    def step(x_w, state, seed):
        halo, hist = state
        y, _head_peak, new_halo = hstep(x_w, halo, seed)  # (C, n_base) f32
        z, new_hist = tail(y, hist)
        out, peak = finish_tile(z, cfg,
                                jax.random.fold_in(base_key, seed), gain)
        return out, peak, (new_halo, new_hist)

    if emit == "planes":
        if cfg.bit_depth == 32:
            raise ValueError("byte-plane emission is for integer depths")
        n_out = int(n_base * rstage.L) // rstage.M
        # Pallas finish (gain/peak/dither/quantize/plane split in one
        # kernel pass — see make_finish_planes for the measured XLA
        # epilogue cost it removes). Auto mode takes it whenever it is
        # expressible, EXCEPT dithered interpret builds (the on-core
        # PRNG has no CPU interpret lowering — those keep the threefry
        # XLA epilogue, which CPU tests compare bit-identically against
        # make_phase_step).
        if finish == "tail":
            # deleted kernel (see the finish docstring's chip verdict);
            # env-selected degrades to auto, explicit raises
            if strict_finish:
                raise ValueError(
                    "finish='tail' was removed: the fused banded-tail "
                    "kernel lost its chip A/B twice (0.59-0.83x)")
            finish = None
        fin = None
        if finish != "xla" and not (interpret and cfg.dither
                                    is not DitherType.NONE):
            fin = make_finish_planes(cfg, n_out, out_shift=out_shift,
                                     interpret=interpret)
        if finish == "kernel" and fin is None:
            if strict_finish:
                raise ValueError(
                    "finish kernel not expressible for this cfg")
            # env-selected "kernel": degrade to the XLA epilogue below
            # (like "tail" does) instead of raising — the engine treats
            # a ValueError as "chain not kernel-expressible" and would
            # abandon the whole fused path, Pallas head included.
        if fin is not None:
            finish_fn, layout = fin

            def step_planes_k(x_w, state, seed):
                halo, hist = state
                y, _hp, new_halo = hstep(x_w, halo, seed)
                z, new_hist = tail(y, hist)
                planes, peak = finish_fn(z, seed)
                return planes, peak, (new_halo, new_hist)

            return ((jax.jit(step_planes_k, donate_argnums=(1,)) if jit
                     else step_planes_k), halo_bytes, layout)

        layout = PlaneLayout(channels=cfg.channels, rows=cfg.channels,
                             batch=1, sub_cols=n_out, cols=n_out,
                             bit_depth=cfg.bit_depth)

        def step_planes(x_w, state, seed):
            out, peak, new_state = step(x_w, state, seed)
            # out is (n, C) = finish_tile's transpose; undo it so the
            # sample index stays on the LANE axis (XLA cancels .T.T)
            v = out.T.astype(jnp.uint32)
            if out_shift:
                v = v << out_shift
            if cfg.bit_depth == 16:
                wire = v.astype(jnp.int16)
            else:
                wire = jnp.stack([
                    (v & 0xFF).astype(jnp.uint8),
                    ((v >> 8) & 0xFF).astype(jnp.uint8),
                    ((v >> 16) & 0xFF).astype(jnp.uint8),
                ])
            return wire, peak, new_state

        return ((jax.jit(step_planes, donate_argnums=(1,)) if jit
                 else step_planes), halo_bytes, layout)

    return (jax.jit(step, donate_argnums=(1,)) if jit else step), halo_bytes


def init_fused_rational_state(chain: Sequence[Stage], channels: int,
                              dtype=jnp.float32):
    """(byte-halo words, rational-stage history) initial streaming state."""
    from dsd2dxd_tpu.ops.phase import build_plan, init_phase_hists

    n_head = fused_rational_plan(chain)
    if n_head is None:
        raise ValueError("chain is not fused-head + rational-tail shaped")
    plan = build_plan(chain[-1], p_in=1)
    return (init_fused_halo(chain[:n_head], channels),
            init_phase_hists((plan,), channels, dtype=dtype)[0])


# ---------------------------------------------------------------------------
# Head/tail split planning for chains deeper than the widest word
# ---------------------------------------------------------------------------


def hybrid_split(chain: Sequence[Stage]) -> tuple[int, int]:
    """(n_head, groups): the longest fused-eligible prefix — the stages
    covering a ÷(8G) decimation for the largest supported word size
    G ∈ {4, 2, 1} — leaving a nonempty pure-decimation tail. Returns
    (0, 0) when the chain has no such prefix (48k chains start the
    rational part too early)."""
    best = (0, 0)
    cum = 1
    for n in range(1, len(chain)):
        s = chain[n - 1]
        if s.L != 1:
            break
        cum *= s.M
        if cum % 8 != 0:
            continue
        g = cum // 8
        if g not in _WORD_DTYPES:  # row-group heads + tails: untested mix
            continue
        head = tuple(chain[:n])
        if fused_groups(head) == g:
            best = (n, g)
    if best[0] and all(s.L == 1 for s in chain[best[0]:]):
        return best
    return (0, 0)
