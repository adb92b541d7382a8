"""On-chip (real Mosaic) validation of the fused Pallas kernels.

CI runs the kernels in interpret mode on CPU (tests/test_fused.py);
this script re-runs the equivalence checks against the XLA phase path
on the real TPU, where Mosaic compilation, DMA windows, and the on-core
PRNG actually execute. Run after any kernel change:

    python tools/chipcheck.py            # correctness
    python tools/chipcheck.py --perf     # + per-cell throughput table

Checks per cell (every fused-eligible rate pair):
- float path: max |fused - phase| < 2e-6 over 3 streamed tiles
- int24 path (no dither): |diff| <= 5 LSB (f32 summation order only)
- TPDF dither statistics on-chip: quantization-error RMS within 10% of
  the 0.5 LSB TPDF+rounding floor (var = 2/12 dither + 1/12 round
  = 0.25 -> RMS 0.5; matches the 0.45-0.55 band the code enforces),
  mean < 0.01 LSB, and two different tiles produce different noise
- peak parity within 1e-4
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


CELLS = [
    ("DSD64", 352800), ("DSD64", 176400), ("DSD64", 88200),
    ("DSD128", 705600), ("DSD128", 352800), ("DSD128", 176400),
    ("DSD128", 88200),
    ("DSD256", 1411200), ("DSD256", 705600), ("DSD256", 352800),
    ("DSD256", 176400), ("DSD256", 88200),
    ("DSD512", 352800),
    # 48k family: fused ÷2^m head + XLA ×160/147 tail (fused_rational)
    ("DSD64", 384000), ("DSD64", 192000), ("DSD64", 96000),
    ("DSD128", 384000), ("DSD128", 192000), ("DSD128", 96000),
    ("DSD256", 384000), ("DSD256", 192000), ("DSD256", 96000),
]


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()  # reuse XLA compiles across tool runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--perf", action="store_true",
                    help="also print a per-cell throughput table")
    ap.add_argument("--tile-mib", type=int, default=2,
                    help="tile size per channel for correctness checks")
    ap.add_argument("--only", default=None,
                    help="run only cells matching RATE:OUT substring, "
                         "e.g. '96000' or 'DSD64' (splits long runs)")
    ap.add_argument("--no-correctness", action="store_true",
                    help="skip the equivalence/stats checks (perf only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dsd2dxd_tpu.filters.design import chain_ratio, get_chain
    from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
    from dsd2dxd_tpu.ops.fused import (
        fused_plan,
        init_fused_halo,
        make_fused_step,
        pick_block_bytes,
        prep_input,
    )
    from dsd2dxd_tpu.ops.phase import (
        build_chain_plans,
        init_phase_hists,
        make_phase_step,
    )
    from dsd2dxd_tpu.ops.resample import StepConfig

    if jax.default_backend() != "tpu":
        print(f"ERROR: default backend is {jax.default_backend()}, "
              f"this script validates the real-Mosaic path", file=sys.stderr)
        return 2
    from dsd2dxd_tpu.ops.fused import (
        fused_rational_plan,
        init_fused_rational_state,
        make_fused_rational_step,
    )
    from dsd2dxd_tpu.pipeline.engine import _tile_bytes_for

    failures = 0
    rng = np.random.default_rng(0)
    cells = [c for c in CELLS
             if args.only is None or args.only in f"{c[0]}:{c[1]}"]

    def cell_build(chain, in_hz):
        """(make_step(cfg) -> (step, halo_bytes), init_state(), g, label)
        for whichever fused path covers `chain`. Uses the engine's own
        block-size policy so this validates the production build."""
        bb = pick_block_bytes(chain, in_hz)
        plan = fused_plan(chain)
        if plan is not None:
            n_head, g, r_tail = plan
            return ((lambda cfg: make_fused_step(chain, cfg,
                                                 block_bytes=bb)),
                    (lambda: jnp.asarray(init_fused_halo(chain, 2))),
                    g, f"head={n_head} G={g} r_tail={r_tail} blk={bb}")
        n_head = fused_rational_plan(chain)
        if n_head is None:
            return None
        g = fused_plan(chain[:n_head])[1]

        def init_state():
            halo, hist = init_fused_rational_state(chain, 2)
            return (jnp.asarray(halo), hist)

        return ((lambda cfg: make_fused_rational_step(chain, cfg,
                                                      block_bytes=bb)),
                init_state, g,
                f"head={n_head} G={g} tail=x{chain[-1].L}/{chain[-1].M} "
                f"blk={bb}")

    for rate_name, out_hz in (() if args.no_correctness else cells):
        rate = DsdRate[rate_name]
        chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
        built = cell_build(chain, rate.hz)
        if built is None:
            print(f"{rate_name}->{out_hz}: no fused plan (skipped)")
            continue
        make_step, init_state, g, label = built
        tile = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024,
                               rate.hz)
        ratio = chain_ratio(chain)

        # float + int24 equivalence vs phase path, streamed
        ok = True
        for depth in (32, 24):
            cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=depth,
                             dither=DitherType.NONE, level_db=-1.0)
            fstep, halo_bytes = make_step(cfg)
            pstep = make_phase_step(chain, cfg)
            h_f = init_state()
            h_p = init_phase_hists(build_chain_plans(chain), 2)
            for t in range(3):
                x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
                of, pf, h_f = fstep(prep_input(x, g), h_f, t)
                op, pp, h_p = pstep(x, h_p, jax.random.PRNGKey(t))
                of, op = np.asarray(of), np.asarray(op)
                skip = int(halo_bytes * 8 * ratio) + 1 if t == 0 else 0
                if depth == 32:
                    err = float(np.max(np.abs(of[skip:] - op[skip:])))
                    bad = err > 2e-6
                else:
                    err = int(np.abs(of[skip:].astype(np.int64)
                                     - op[skip:].astype(np.int64)).max())
                    bad = err > 5
                pk = abs(float(pf) - float(pp))
                if bad or (t > 0 and pk > 1e-4):
                    print(f"FAIL {rate_name}->{out_hz} depth={depth} "
                          f"tile={t}: err={err} peak_delta={pk:.2e}")
                    failures += 1
                    ok = False

        # TPDF statistics: compare dithered-quantized against the exact
        # float path; the quantization error of TPDF + round has
        # var = 2/12 + 1/12 = 0.25 LSB^2 -> RMS 0.5 LSB... measured
        # against the UNROUNDED signal the error is dither+round:
        # RMS = sqrt(3/12) ~= 0.5 LSB
        cfg_f = StepConfig(channels=2, tile_bytes=tile, bit_depth=32,
                           dither=DitherType.NONE, level_db=0.0)
        cfg_d = StepConfig(channels=2, tile_bytes=tile, bit_depth=24,
                           dither=DitherType.TPDF, level_db=0.0)
        fstep_f, halo_bytes = make_step(cfg_f)
        fstep_d, _ = make_step(cfg_d)
        h_a = init_state()
        h_b = init_state()
        errs = []
        outs = []
        for t in range(2):
            x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
            xf, _, h_a = fstep_f(prep_input(x, g), h_a, t)
            xd, _, h_b = fstep_d(prep_input(x, g), h_b, t)
            skip = int(halo_bytes * 8 * ratio) + 1 if t == 0 else 0
            f = np.asarray(xf).astype(np.float64)[skip:] * (1 << 23)
            e = np.asarray(xd).astype(np.float64)[skip:] - f
            # random bytes are not a valid DSM stream: shallow chains keep
            # enough broadband energy to exceed full scale, where the int
            # path clips — restrict the noise statistics to headroom
            e = e[np.abs(f) < (1 << 23) - 4]
            errs.append(e)
            outs.append(np.asarray(xd)[skip:])
        e = np.concatenate(errs)
        rms = float(np.sqrt(np.mean(e ** 2)))
        mean = float(np.mean(e))
        # dither var 2/12 + rounding var 1/12 = 0.25 -> RMS 0.5 LSB
        if not (0.45 < rms < 0.55) or abs(mean) > 0.01:
            print(f"FAIL {rate_name}->{out_hz} TPDF stats: "
                  f"rms={rms:.4f} LSB mean={mean:.4f}")
            failures += 1
            ok = False
        n = min(len(outs[0]), len(outs[1]))
        if np.array_equal(outs[0][:n], outs[1][:n]):
            print(f"FAIL {rate_name}->{out_hz}: tiles 0/1 share noise")
            failures += 1
            ok = False

        # Byte-plane emission (emit="planes"): wire bytes from the
        # kernel must equal the frames path + host packing, on real
        # Mosaic u8 stores. Plain cells validate the in-kernel plane
        # split; rational cells validate the Pallas FINISH kernel
        # (make_finish_planes — gain/quantize/plane split; its NONE
        # output must be bit-exact vs the frames path).
        from dsd2dxd_tpu.pipeline.transfer import interleave_planes

        cfg24 = StepConfig(channels=2, tile_bytes=tile, bit_depth=24,
                           dither=DitherType.NONE, level_db=-1.0)
        # at the PRODUCTION grid block (pick_block_bytes) — the
        # default 16 KiB divides the hz-keyed tile too, so without
        # this the 64 KiB-block plane layout deep cells actually run
        # would never be validated on chip
        bb24 = pick_block_bytes(chain, rate.hz)
        if fused_plan(chain) is not None:
            fstep24, _ = make_fused_step(chain, cfg24, block_bytes=bb24)
            pstep24, _, layout = make_fused_step(chain, cfg24,
                                                 block_bytes=bb24,
                                                 emit="planes")
            st_f = lambda: jnp.asarray(init_fused_halo(chain, 2))  # noqa: E731
        else:
            fstep24, _ = make_step(cfg24)
            pstep24, _, layout = make_fused_rational_step(
                chain, cfg24, block_bytes=bb24, emit="planes")
            if layout.batch == 1:
                print(f"WARN {rate_name}->{out_hz}: rational planes fell "
                      f"back to the XLA finish (layout ineligible)")
            st_f = init_state
        x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
        of, _, _ = fstep24(prep_input(x, g), st_f(), 0)
        op, _, _ = pstep24(prep_input(x, g), st_f(), 0)
        of = np.asarray(of)
        vv = (of.reshape(-1).astype(np.int64)
              & 0xFFFFFF).astype(np.uint32)
        b = np.empty((len(vv), 3), np.uint8)
        b[:, 0] = vv & 0xFF
        b[:, 1] = (vv >> 8) & 0xFF
        b[:, 2] = (vv >> 16) & 0xFF
        if interleave_planes(np.asarray(op), layout,
                             of.shape[0]) != b.tobytes():
            print(f"FAIL {rate_name}->{out_hz}: byte-plane emission "
                  f"!= frames wire bytes")
            failures += 1
            ok = False

        # Rational cells: the PRODUCTION dither path is the finish
        # kernel's ON-CORE PRNG (frames mode above asserted the
        # threefry stats) — assert the same TPDF statistics through
        # planes + deplane.
        if fused_plan(chain) is None:
            from dsd2dxd_tpu.pipeline.transfer import deplane_frames

            dstep, _, dlayout = make_fused_rational_step(
                chain, cfg_d, block_bytes=bb24, emit="planes")
            h_e = init_state()
            h_f2 = init_state()
            errs_k = []
            for t in range(2):
                x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
                xf, _, h_e = fstep_f(prep_input(x, g), h_e, t)
                xd, _, h_f2 = dstep(prep_input(x, g), h_f2, t)
                skip = int(halo_bytes * 8 * ratio) + 1 if t == 0 else 0
                f = np.asarray(xf).astype(np.float64) * (1 << 23)
                ints = deplane_frames(np.asarray(xd), dlayout,
                                      f.shape[0]).astype(np.float64)
                e = (ints - f)[skip:]
                e = e[np.abs(f[skip:]) < (1 << 23) - 4]
                errs_k.append(e)
            ek = np.concatenate(errs_k)
            rms_k = float(np.sqrt(np.mean(ek ** 2)))
            mean_k = float(np.mean(ek))
            if not (0.45 < rms_k < 0.55) or abs(mean_k) > 0.01:
                print(f"FAIL {rate_name}->{out_hz} finish-kernel TPDF "
                      f"stats: rms={rms_k:.4f} LSB mean={mean_k:.4f}")
                failures += 1
                ok = False

        # FPD (float "Dither Float") statistics: TPDF at the per-sample
        # ulp, in-kernel on the plain path / XLA epilogue on rational.
        # Against the undithered float output the added noise is
        # TPDF-distributed in ulp units: RMS sqrt(1/6) ~= 0.408 ulp,
        # |e| <= 1 ulp.
        cfg_fpd = StepConfig(channels=2, tile_bytes=tile, bit_depth=32,
                             dither=DitherType.FPD, level_db=0.0)
        fstep_fpd, _ = make_step(cfg_fpd)
        h_c = init_state()
        h_d = init_state()
        ulp_errs = []
        for t in range(2):
            x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
            xf, _, h_c = fstep_f(prep_input(x, g), h_c, t)
            xd, _, h_d = fstep_fpd(prep_input(x, g), h_d, t)
            skip = int(halo_bytes * 8 * ratio) + 1 if t == 0 else 0
            f = np.asarray(xf).astype(np.float64)[skip:]
            d = np.asarray(xd).astype(np.float64)[skip:]
            fb = np.asarray(xf)[skip:].view(np.int32)
            ulp = (fb & 0x7F800000).view(np.float32).astype(np.float64) * 2**-23
            keep = ulp > 0
            ulp_errs.append((d - f)[keep] / ulp[keep])
        eu = np.concatenate(ulp_errs)
        rms_u = float(np.sqrt(np.mean(eu ** 2)))
        # TPDF noise var 1/6 plus the f32 rounding of the sum (var 1/12):
        # total 0.25 -> RMS 0.5 ulp (measured 0.500). Max |e|: 1 ulp
        # dither + 0.5 ulp rounding in-binade, but when the dither pushes
        # the sum across a binade boundary the rounding happens at DOUBLE
        # the undithered value's ulp -> |e| can legitimately reach
        # exactly 2.0 (observed: DSD256->96k max=2.0000, rms=0.4999).
        if not (0.44 < rms_u < 0.56) or np.abs(eu).max() > 2.05:
            print(f"FAIL {rate_name}->{out_hz} FPD stats: "
                  f"rms={rms_u:.4f} ulp max={np.abs(eu).max():.4f}")
            failures += 1
            ok = False
        if ok:
            print(f"OK   {rate_name}->{out_hz}: {label} "
                  f"tpdf_rms={rms:.3f} LSB fpd_rms={rms_u:.3f} ulp")

    if args.perf:
        print("\nthroughput (24-bit TPDF, 16 MiB tiles, device-only):")
        import timing

        digest = timing.make_digest()
        from dsd2dxd_tpu.pipeline.engine import _cached_step

        for rate_name, out_hz in cells:
            rate = DsdRate[rate_name]
            chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
            # rate.hz keys pick_block_bytes: without it the tile aligns
            # to the 16 KiB default and is NOT divisible by the hz-keyed
            # 64 KiB grid block, so _cached_step would silently fall
            # back to the XLA phase path (e.g. DSD256->384000) and the
            # table would benchmark the wrong path.
            big = _tile_bytes_for(chain, 16 * 1024 * 1024, rate.hz)
            cfg = StepConfig(channels=2, tile_bytes=big, bit_depth=24,
                             dither=DitherType.TPDF, level_db=0.0)
            step, make_state, prep, _layout = _cached_step(
                (FilterType.EQUIRIPPLE, rate, out_hz), cfg,
                want_planes=True)
            tiles = timing.stage_tiles(prep, rng, big, n_tiles=6)

            # compile/warm, then the two-point rounds slope — a
            # single-fetch min-of-3 carries the tunnel's ~28 ms blocking
            # round-trip and understated deep cells by 25-75%
            timing.timed_run(step, make_state, tiles, digest)
            per_pass = timing.slope_run(step, make_state, tiles, digest)
            xrt = timing.xrt(len(tiles) * big * 8 / rate.hz, per_pass)
            print(f"  {rate_name}->{out_hz}: {xrt:.0f}x RT")

    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
