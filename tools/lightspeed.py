"""Speed-of-light model for every rate-matrix cell (host-side analysis).

For each (DSD rate -> PCM rate) cell of SURVEY.md §2.5 this computes,
from the actual compiled layout (fused plans, block size, halo, sublane
batch), the analytic performance bounds of the single-pass kernel on a
TPU v5e core and compares them to the measured on-chip numbers
(BENCH_r03_local.json). It answers "how far from speed-of-light is this
cell, and which wall is it standing against?" without needing the chip.

Components modeled per audio-second (stereo, 24-bit planes):

- ``hbm``     — pure memory: (input bytes x halo-redundancy + output
                wire bytes) at HBM bandwidth. The absolute ceiling;
                every cell is >50x away from it — this workload is
                overhead- and issue-bound, not bandwidth-bound.
- ``floor``   — the measured tap-independent cost of moving one input
                byte through the kernel (block DMA + 8G-row unpack +
                Mosaic op/layout overhead + epilogue structure):
                7.17 us per 16 KiB of per-channel input — the pooled
                zero-element intercept of the round-4 HEAD floorprof
                sweeps (tools/floorprof.py at 16 KiB and 64 KiB grid
                blocks; see the constant's comment for the fit).
- ``fir``     — FIR work alone: exact slice-FMA element counts from the
                phase plans via the kernel's own need[] recursion +
                undecimated a-trous tail elements + epilogue, at the
                VPU's ~0.96e12 vector elements/s (8 sublanes x 128
                lanes x ~0.94 GHz). Rational cells add their x160/147
                tail at its MEASURED on-chip cost per output value
                (see TAIL_S_PER_OUT_VALUE in cell_model) — the pure
                MXU MAC time is negligible; the layout/dispatch work
                around the einsum is what costs.
- ``model``   — the PRIMARY calibrated bound (round 5): per-(G,
                a-trous) floor+slope constants fit from the slope-
                protocol floorprof ladders (KERNEL_CAL), plus one
                measured per-output-value constant for the rational
                cells' extras (RATIONAL_EXTRA_S_PER_OUT). Against the
                r4 matrix it brackets 21/22 cells within 94-114%;
                cells BELOW 100% name real headroom, cells far above
                flag a stale or structurally-special measurement.
                The analytic floor+fir bound is kept as
                ``xrt_model_analytic``.

Usage: python tools/lightspeed.py [--json out.json]

Pure host-side: pins JAX to CPU; only filter design (cached) and plan
construction run. Reference behavior being modeled: the §2.5 rate
matrix (/root/reference/src/main.rs:85-96).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from dsd2dxd_tpu.filters.design import get_chain  # noqa: E402
from dsd2dxd_tpu.formats.dsd_types import DsdRate, FilterType  # noqa: E402
from dsd2dxd_tpu.ops import fused  # noqa: E402

# ---- hardware constants (TPU v5e, one core) -------------------------------
HBM_BW = 819e9          # bytes/s, v5e public spec
# Analytic VPU peak: 8 sublanes x 128 lanes x ~0.94 GHz. The kernel
# MEASURES 1.38 us/M no-halo el at 64 KiB grid blocks (intercept-free
# floorprof fit, 2026-08-20) = ~75% of this — per-term lane rotates
# (FIR slices are inherently 128-unaligned) plus the halo redundancy
# the fit's no-halo element counts fold into the slope. The model
# keeps the ANALYTIC rate with its own redundancy-inclusive element
# counts (using the measured slope here would double-count the halo);
# the model is therefore a slightly optimistic bound and measured
# cells land at 100-280% of it. Closure check on the deepest cell:
# DSD512->352.8k measured 5.61 us/16KiB = 2.1 floor + 2.57 M no-halo
# el x 1.38 measured slope (within 1%).
VPU_ELEMS = 0.96e12
# Recalibrated from the round-4 INTERCEPT-FREE floorprof sweeps at
# HEAD (tools/floorprof.py under the rounds-slope protocol, logs
# /tmp/chip_floorprof{,16}_slope_r4.log 2026-08-20): linear fit of
# us/16KiB-of-per-channel-input vs slice-FMA element count over
# scale = 0/0.25/0.5/1.0 of the real DSD512->352.8k tap structure.
# The earlier single-fetch sweeps carried the tunnel's ~28 ms blocking
# round-trip, which inflated the fit's intercept to 7.1-7.3 us; the
# slope protocol cancels it. Pooled (NONE+TPDF) zero-element
# intercepts: 2.07 us (64 KiB blocks) and 2.12 us (16 KiB blocks) —
# equal within noise, so the per-BLOCK floor component stays 0 and the
# floor is per-BYTE (8G-row unpack + Mosaic op/layout overhead +
# epilogue structure). Measured FMA slope: 1.38 us/M el at 64 KiB
# (vs the 1.04 analytic VPU rate used below — ~75% issue efficiency,
# the per-term lane rotates), 2.04 at 16 KiB (halo redundancy).
FLOOR_S_PER_BYTE = 2.1e-6 / 16384
FLOOR_S_PER_BLOCK = 0.0
UNPACK_OPS = 3          # bitcast unpack: int ops per stream bit (default)
EPILOGUE_OPS = 10       # level+dither+round+clip+planes, per output sample

# ---- round-5 per-G calibration (the PRIMARY xrt_model basis) --------------
# (floor intercept us per 16 KiB of per-channel input, FMA slope us per
# M slice-FMA elements in floorprof's no-halo bookkeeping), least-
# squares over the slope-protocol floorprof ladders at each G's
# PRODUCTION grid block — 8 points per G (4 tap scales x NONE/TPDF),
# stereo, emit="planes":
#   G=1 (32 KiB, /tmp/chip_floorg1_r5.log): floor 2.17, slope 2.01
#       (max resid 0.25 us)
#   G=2 (64 KiB, /tmp/chip_floorg2_r5.log): floor 1.13, slope 1.47
#       (max resid 0.16 us)
#   G=4 splits in TWO calibration classes (the round-4 single-class
#   G=4 cal left every pure-/32 cell 1.5-2x ABOVE model):
#   - pure /32 head (r_tail=1, 5-stage): floor 0.94, slope 1.00 —
#       pooled over three r5 ladders (TPDF arms of
#       /tmp/chip_floorg4s5{b,c}_r5.log + the credible NONE points of
#       the third run; the scale-0 NONE rung of EVERY floorprof
#       process measures systematically high — a first-measurement
#       warmup bias, dropped from fits; max resid 0.35 us)
#   - a-trous (r_tail>1, 6-stage /64): floor 2.32, slope 1.31 — the
#       clean fully-monotonic r5 retry, both arms pooled
#       (/tmp/chip_floorg4s6b_r5.log, max resid 0.10 us; consistent
#       with the round-4 2.07/1.38 fit within cross-run spread).
#   The gap between the two classes is the a-trous tail's cost beyond
#   its element count: dilated slice windows + the phase-0 extraction.
# Within-class structure the intercept+slope cannot see (sublane-batch
# geometry, epilogue variant) lands in the residual — that residual IS
# the per-cell headroom ranking.
KERNEL_CAL = {
    (1, False): (2.17, 2.01),
    (2, False): (1.13, 1.47),
    (4, False): (0.94, 1.00),
    (4, True): (2.32, 1.31),
}
# Rational cells: everything beyond the planes-emission head — the
# head's f32-emit penalty (a separate (C, n_base) f32 HBM round-trip,
# cost scaling with BASE-rate values, not input bytes: charging it per
# input byte overcharged low-rate cells 4x in the first refit), the
# banded x160/147 tail einsum, and the standalone finish kernel.
# Measured per HEAD G as (prod - plain24_comparator) / output values
# on ratprof ladders:
#   G=1 head: DSD64->384k, 14.29 - 8.00 ms per 47.6 s-audio tile
#       (BENCH_r04_local round4_levers_slope_protocol) = 1.72e-10
#   G=4 head: DSD128->192k, 5.59 - 4.20 ms per 27.3 s tile
#       (/tmp/chip_ratprof_g4_r5.log 2026-08-20) = 1.33e-10
#   G=2 head: DSD64->192k, 9.55 - 6.09 ms per 54.6 s tile
#       (/tmp/chip_ratprof_g2b_r5.log retry; the first attempt was
#       weather-hit) = 1.65e-10. The cell's matrix entry (7445x) was
#       arbitrated by a third measurement (5814x; ladder prod rung
#       5716x): two of three agree at ~5.7-5.8k, so the matrix entry
#       is a fast-weather outlier and the cell sits at ~101% of this
#       model — the apparent 130% residual was measurement, not
#       headroom.
RATIONAL_EXTRA_S_PER_OUT = {1: 1.72e-10, 2: 1.65e-10, 4: 1.33e-10}

CHANNELS = 2
OUT_BYTES_PER_SAMPLE = 3  # 24-bit byte planes on the wire

def _measured() -> dict:
    """Measured on-chip xRT per cell: the rate matrix, lifted by any
    same-run late-lever A/B arm for that cell (the matrix predates the
    late round-3 floor levers — see BENCH_r03_local's
    late_round3_floor_levers). max() means a refreshed matrix
    automatically supersedes the lever arms."""
    root = Path(__file__).resolve().parent.parent
    bench = None
    for name in ("BENCH_r05_local.json", "BENCH_r04_local.json",
                 "BENCH_r03_local.json"):
        p = root / name
        if p.exists():
            cand = json.loads(p.read_text())
            # in-progress round files may carry a null matrix
            if cand.get("rate_matrix_device_xrt"):
                bench = cand
                break
    if bench is None:
        return {}
    out = {}
    for rate, cells in bench.get("rate_matrix_device_xrt", {}).items():
        if not isinstance(cells, dict):
            continue
        for hz, xrt in cells.items():
            out[(rate, int(hz))] = xrt
    for lever in bench.get("late_round3_floor_levers", {}).values():
        if not isinstance(lever, dict):
            continue
        for cell, arms in lever.items():
            if not isinstance(arms, dict):
                continue
            parts = cell.split("_")
            rate, hz = parts[0], int(parts[1])
            chain = get_chain(FilterType.EQUIRIPPLE, DsdRate[rate], hz)
            prod_blk = fused.pick_block_bytes(chain, DsdRate[rate].hz)
            # cell keys may encode the measured grid-block size
            # (e.g. "_64k"); only count cells measured AT the
            # production block — exploratory configs are not the
            # engine path.
            blk = next((int(p[:-1]) * 1024 for p in parts[2:]
                        if p.endswith("k") and p[:-1].isdigit()), None)
            if blk is not None and blk != prod_blk:
                continue
            # within a cell, keep only PRODUCTION arms: a "blkNNk" arm
            # must match pick_block_bytes, and named variant arms must
            # be the shipped default (legacy / before_cross_run / the
            # opt-in mxu "on" are configs the engine does not run) —
            # max() over mixed arms would silently report whichever
            # experiment happened to win.
            prod_named = ("bitcast", "signmask", "after_cross_run", "off")
            cand = []
            for k, v in arms.items():
                if not isinstance(v, (int, float)):
                    continue
                if k.startswith("blk"):
                    if k == f"blk{prod_blk // 1024}k":
                        cand.append(v)
                elif k in prod_named:
                    cand.append(v)
            if not cand:
                continue
            key = (rate, hz)
            if key in out:
                out[key] = max(out[key], max(cand))
    return out


def cell_model(rate: DsdRate, out_hz: int) -> dict:
    """Analytic bounds for one cell; all times are s per audio-second."""
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    in_hz = rate.hz
    plan = fused.fused_plan(chain)
    rational = plan is None
    if rational:
        n_head = fused.fused_rational_plan(chain)
        if n_head is None:
            raise ValueError(
                f"{rate.name}->{out_hz}: chain is neither plain-fused "
                f"nor rational-head eligible; the kernel model does not "
                f"apply")
        head_chain = list(chain)[:n_head]
        plan = fused.fused_plan(head_chain)
        if plan is None:
            raise ValueError(
                f"{rate.name}->{out_hz}: rational head is not "
                f"kernel-eligible")
    else:
        n_head = len(chain)
        head_chain = list(chain)
    n_fused, groups, r_tail = plan
    plans, g, tail, _rt, halo_lanes = fused._fused_layout(head_chain)
    block_bytes = fused.pick_block_bytes(chain, in_hz)
    block_lanes = block_bytes // g
    batch = fused.sublane_batch(CHANNELS, block_lanes, r_tail)
    k_sub = block_lanes // batch
    # each sub-block re-reads halo_lanes of context
    redundancy = (halo_lanes + k_sub) / k_sub

    in_bytes = in_hz / 8 * CHANNELS                  # stream bytes/audio-s
    out_bytes = out_hz * OUT_BYTES_PER_SAMPLE * CHANNELS

    # -- exact per-sub-block lane accounting (mirrors _build_kernel) --------
    # Each sub-block produces k_sub word lanes of final head output and
    # must over-produce upstream: stage j emits need[j] lanes per phase,
    # the tail consumes tail_need lanes undecimated.
    tail_need = [k_sub]
    for taps, d in reversed(list(tail)):
        tail_need.insert(0, tail_need[0] + (len(taps) - 1) * d)
    need = [tail_need[0]]
    for p in reversed(list(plans)[1:]):
        need.insert(0, need[0] + p.hist_lanes)
    subblocks_per_s = (in_hz / 8) / block_bytes * batch

    # unpack: 8G phase rows over the sub-block window incl. halo
    unpack_elems = 8 * g * (halo_lanes + k_sub) * UNPACK_OPS
    # head stages: each (phase, lane) output accumulates len(terms[rho])
    # FMAs; stage j emits p_out x need[j]
    fir_elems = 0.0
    for p, n in zip(plans, need):
        fir_elems += sum(len(t) for t in p.terms) * n
    # a-trous tail: stage t emits tail_need[t+1] lanes, taps FMAs each
    for (taps, _d), n in zip(tail, tail_need[1:]):
        fir_elems += len(taps) * n
    unpack = unpack_elems * subblocks_per_s * CHANNELS
    fma = fir_elems * subblocks_per_s * CHANNELS
    epilogue = out_hz * CHANNELS * EPILOGUE_OPS

    # rational cells: the x160/147 banded-natural tail (one dense
    # (160, 164) einsum per 160 outputs, Precision.HIGHEST). Pure MXU
    # MAC time is negligible (~1e-5 s/audio-s); the real cost is the
    # XLA layout/elementwise work around the einsum, so the model uses
    # the MEASURED production-tail cost instead: 1.08 ms per 13.65 s
    # audio at 192k stereo on chip (tools/tailbanded.py "natural" under
    # the intercept-free digest-slope bench,
    # /tmp/chip_tailslope_r4.log 2026-08-20; the earlier 2.98 ms
    # carried tunnel round-trip) = 2.06e-10 s per output value, scaled
    # by output sample rate. Single-point calibration: per-value cost
    # at other tile sizes/rates varies with dispatch amortization
    # (DSD64 cells run 4x larger audio windows per tile), which is the
    # named residual for rational cells off the model.
    TAIL_S_PER_OUT_VALUE = 2.06e-10
    t_mxu = out_hz * CHANNELS * TAIL_S_PER_OUT_VALUE if rational else 0.0

    t_hbm = (in_bytes * redundancy + out_bytes) / HBM_BW
    n_blocks_per_s = (in_hz / 8) / block_bytes
    t_floor = (in_hz / 8) * FLOOR_S_PER_BYTE + n_blocks_per_s * FLOOR_S_PER_BLOCK
    t_vpu = (unpack + fma + epilogue) / VPU_ELEMS + t_mxu
    t_fir = (fma + epilogue) / VPU_ELEMS + t_mxu  # floor already has unpack

    # ---- calibrated model (round-5 per-G fit; the PRIMARY bound) ------
    # no-halo element bookkeeping, identical to tools/floorprof.py's
    # n_el loop so the calibration and the prediction share a basis
    p_o = 8 * g
    lanes16 = 16384 // g
    el16 = 0.0
    for s in head_chain:
        if p_o > 1:
            p_o //= 2
            el16 += s.n_taps * p_o * lanes16
        else:
            el16 += s.n_taps * lanes16  # a-trous, undecimated
    floor_us, slope_us = KERNEL_CAL[(g, r_tail > 1)]
    us16 = floor_us + el16 / 1e6 * slope_us
    t_cal = (in_hz / 8 / 16384) * us16 * 1e-6
    if rational:
        t_cal += out_hz * CHANNELS * RATIONAL_EXTRA_S_PER_OUT[g]
    return {
        "rational": rational,
        "groups": g,
        "block_bytes": block_bytes,
        "redundancy": round(redundancy, 3),
        "fma_elems_per_s": int(fma),
        "el16_nohalo_M": round(el16 / 1e6, 3),
        "xrt_hbm": 1.0 / t_hbm,
        "xrt_floor": 1.0 / t_floor,
        "xrt_fir": 1.0 / t_fir,
        "xrt_vpu": 1.0 / t_vpu,
        "xrt_model": 1.0 / t_cal,
        "xrt_model_analytic": 1.0 / (t_floor + t_fir),
        "floor_share": t_floor / (t_floor + t_fir),
        "cal_floor_share": floor_us / us16,
    }


CELLS = [
    (DsdRate.DSD64, [88200, 96000, 176400, 192000, 352800, 384000]),
    (DsdRate.DSD128, [88200, 96000, 176400, 192000, 352800, 384000,
                      705600]),
    (DsdRate.DSD256, [88200, 96000, 176400, 192000, 352800, 384000,
                      705600, 1411200]),
    (DsdRate.DSD512, [352800]),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=Path, default=None,
                    help="also write the full model as JSON")
    args = ap.parse_args()
    measured = _measured()
    rows = []
    print(f"{'cell':>18} {'meas':>6} {'model':>6} {'%model':>6} "
          f"{'floor':>7} {'fir':>7} {'hbm':>8}  floor%")
    for rate, outs in CELLS:
        for hz in outs:
            m = cell_model(rate, hz)
            meas = measured.get((rate.name, hz))
            pct = f"{100 * meas / m['xrt_model']:.0f}%" if meas else "-"
            tag = " (tail=measured const)" if m["rational"] else ""
            print(f"{rate.name:>8}->{hz / 1000:>7.1f}k "
                  f"{meas or '-':>6} {m['xrt_model']:>6.0f} {pct:>6} "
                  f"{m['xrt_floor']:>7.0f} {m['xrt_fir']:>7.0f} "
                  f"{m['xrt_hbm']:>8.0f}  {m['floor_share']:>5.0%}{tag}")
            rows.append({"cell": f"{rate.name}->{hz}", "measured": meas,
                         **m})
    ranked = sorted((r for r in rows if r["measured"]),
                    key=lambda r: r["measured"] / r["xrt_model"])
    if ranked:
        worst = ", ".join(
            f"{r['cell']} {100 * r['measured'] / r['xrt_model']:.0f}%"
            for r in ranked[:4])
        print(f"most headroom (lowest measured/model): {worst}")
    if args.json:
        args.json.write_text(json.dumps({
            "constants": {"hbm_bw": HBM_BW, "vpu_elems": VPU_ELEMS,
                          "kernel_cal": {f"G{g}_{'atrous' if a else 'pure'}":
                                         v for (g, a), v in
                                         KERNEL_CAL.items()},
                          "rational_extra_s_per_out":
                              RATIONAL_EXTRA_S_PER_OUT,
                          "floor_s_per_byte": FLOOR_S_PER_BYTE,
                          "floor_s_per_block": FLOOR_S_PER_BLOCK},
            "cells": rows}, indent=1))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
