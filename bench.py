"""Headline benchmark: sustained device conversion throughput as a
real-time multiple (xRT) on the BASELINE.md config-1 path — DSD64 stereo
-> 24-bit 352.8 kHz PCM (Equiripple bank, TPDF dither).

Default mode measures the sustained per-tile conversion rate of the
compiled device step — 1-bit unpack -> phase-major FIR cascade -> level
-> TPDF dither -> 24-bit quantize -> peak — with streaming filter state
carried across tiles, every tile's PCM fully materialized on device and
consumed through a per-tile digest reduction; the digests are combined
and read back once at the end (the only REAL sync — np.asarray, since
block_until_ready on small buffers returns early through this tunnel,
and per-tile scalar reads would time the tunnel's 25-45 ms round-trip
jitter instead of the device). Inputs are pre-staged on device and
excluded from the timed region.

Why transfers are excluded from the headline: this environment reaches
its TPU through the experimental `axon` tunnel, whose throughput was
measured between 35 and 1100 MiB/s for IDENTICAL code minutes apart
(and with multi-second stalls) — a transfer-inclusive number here
measures tunnel weather, not the framework. The workload's actual wire
needs are tiny relative to any real attachment: 0.71 MiB/s of input and
2.8 MiB/s of output per 1x real-time, so a directly-attached PCIe host
(>10 GiB/s) amortizes transfers at >3000x real-time. `python bench.py
--e2e` times the full loop (chunked H2D + step + on-device s24 packing +
full D2H readback) through the tunnel for the record.

`--config N` (1-5) instead runs BASELINE.md's end-to-end workload N
through the real engine/CLI — container parse -> tunnel H2D -> device
DSP -> D2H -> host dither/pack/FLAC -> file writes — on cached
synthesized fixtures (the reference's stereo test files are stripped
from the snapshot). These numbers INCLUDE the tunnel's transfer
pathologies and are therefore lower bounds on any real attachment.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
vs_baseline is against the driver's 1000x-real-time-per-chip north star
(the reference publishes no numbers — BASELINE.md).
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from pathlib import Path

import numpy as np

_CACHE = Path(__file__).parent / "bench_cache"


def _tone_planes(rate_hz: int, seconds: float, channels: int = 2):
    """Cached DSM tone synthesis (the host delta-sigma loop runs ~0.25x
    real-time): synthesize one second once, then tile it — the modulator
    is near-periodic at 1 kHz so seams are inaudible and irrelevant to
    throughput."""
    _CACHE.mkdir(exist_ok=True)
    base = _CACHE / f"tone_{rate_hz}_{channels}.npy"
    if base.exists():
        one = np.load(base)
    else:
        from dsd2dxd_tpu.ops.dsm import synth_tone_dsd

        one = synth_tone_dsd(1000.0, 1.0, rate_hz, amplitude=0.5,
                             channels=channels)
        np.save(base, one)
    reps = max(1, int(round(seconds)))
    return np.tile(one, (1, reps))


def _fixture_dsf(name: str, rate_hz: int, seconds: float,
                 id3: bytes | None = None) -> Path:
    from dsd2dxd_tpu.formats.dsf import write_dsf

    path = _CACHE / name
    if not path.exists():
        write_dsf(path, _tone_planes(rate_hz, seconds), rate_hz,
                  lsb_first=True, id3=id3)
    return path


class _CountingOut(io.RawIOBase):
    """Byte-counting stdout sink for the raw-stdout config."""

    def __init__(self):
        self.n = 0

    def write(self, b) -> int:  # type: ignore[override]
        self.n += len(b)
        return len(b)

    def flush(self) -> None:
        pass


def main(e2e: bool = False) -> None:
    import jax

    if jax.default_backend() != "tpu":
        # A CPU number recorded under a TPU metric name would poison the
        # round record; the __main__ probe normally prevents reaching
        # here, but guard the direct-call path too.
        _emit_unreachable(
            "xrt_dsd64_stereo_to_352k8_24bit"
            + ("_e2e_tunnel" if e2e else "_device"),
            note=f"backend is {jax.default_backend()}, not TPU; a CPU "
                 "number under a TPU metric name would poison the round "
                 "record — no measurement taken")
        raise SystemExit(0)

    from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
    from dsd2dxd_tpu.ops.resample import StepConfig
    from dsd2dxd_tpu.pipeline.transfer import (
        chunked_device_put,
        interleave_planes,
        pack24_device,
        unpack24_host,
    )

    from dsd2dxd_tpu.pipeline.engine import _cached_step

    in_hz = DsdRate.DSD64.hz
    tile_bytes = 16 * 1024 * 1024  # 16 MiB/ch per tile (~47.6 s of DSD64)
    cfg = StepConfig(channels=2, tile_bytes=tile_bytes, bit_depth=24,
                     dither=DitherType.TPDF, level_db=0.0)
    # The engine's dispatched device step: the fused single-pass Pallas
    # kernel on TPU, the XLA phase path elsewhere.
    step, make_state, prep, layout = _cached_step(
        (FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800), cfg,
        want_planes=True)
    sys.path.insert(0, str(Path(__file__).parent / "tools"))
    import timing

    digest = timing.make_digest()

    rng = np.random.default_rng(0)
    n_tiles = 8
    from dsd2dxd_tpu.filters.design import chain_ratio, get_chain

    n_frames = int(tile_bytes * 8 * chain_ratio(
        get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)))
    host_tiles = [rng.integers(0, 256, size=(2, tile_bytes), dtype=np.uint8)
                  for _ in range(n_tiles)]

    if not e2e:
        staged = [chunked_device_put(prep(t)) for t in host_tiles]
        jax.block_until_ready(staged)

    def run_e2e() -> float:
        """Full-path variant: per-tile H2D upload + device step + D2H
        drain with a one-deep pipeline (CLAUDE.md: never a bare host
        sync in a per-tile loop — D2H+host-interleave of tile i-1
        overlaps tile i's upload+compute, like the engine's drain
        worker; a serial drain counted 8 full tunnel round-trips as
        framework time)."""
        state = make_state()
        t0 = time.perf_counter()

        def drain(dev_out) -> None:
            # the kernel emitted wire byte planes; one native host pass
            # interleaves them (pipeline/transfer.py). Derive the frame
            # count from the chain ratio (the engine's n_valid
            # discipline) — a hardcoded ÷8 would walk the native
            # interleaver out of bounds if this bench ever moves to a
            # deeper cell.
            if layout is not None:
                interleave_planes(np.asarray(dev_out), layout, n_frames)
            else:
                unpack24_host(np.asarray(dev_out))

        pending = None  # tile i-1's device output, drained while i runs
        for i in range(n_tiles):
            x = chunked_device_put(prep(host_tiles[i]))
            out, peak, state = step(x, state, i)
            this = out if layout is not None else pack24_device(out)
            if pending is not None:
                drain(pending)
            pending = this
        if pending is not None:
            drain(pending)
        return time.perf_counter() - t0

    audio_seconds = n_tiles * tile_bytes * 8 / in_hz
    if e2e:
        # transfer-inclusive: the tunnel round-trip is part of what's
        # being measured, so a plain min-of-3 is the honest protocol
        run_e2e()  # compile + warmup
        xrt = audio_seconds / timing.min_of(run_e2e, 3)
    else:
        # device-only: the two-point rounds slope cancels the tunnel's
        # ~28 ms blocking-fetch intercept (tools/timing.py slope_run —
        # a single-fetch min-of-3 understated this headline by ~30%)
        timing.timed_run(step, make_state, staged, digest)  # compile
        xrt = audio_seconds / timing.slope_run(
            step, make_state, staged, digest)
    name = "xrt_dsd64_stereo_to_352k8_24bit" + ("_e2e_tunnel" if e2e
                                                else "_device")
    print(json.dumps({
        "metric": name,
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1000.0, 3),
    }))


def _emit(metric: str, audio_s: float, wall_s: float) -> None:
    xrt = audio_s / wall_s
    print(json.dumps({
        "metric": metric,
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 1000.0, 3),
    }))


def _convert(src: Path, out_dir: Path, **kw) -> float:
    """One engine conversion; returns wall seconds."""
    from dsd2dxd_tpu.pipeline.engine import Converter

    from dsd2dxd_tpu.formats.dsd_types import FilterType

    out_dir.mkdir(parents=True, exist_ok=True)
    kw.setdefault("filt", FilterType.EQUIRIPPLE)
    conv = Converter.from_container(
        out_dir=out_dir, append_rate=False, base_dir=src.parent,
        input_path=src, level_db=0.0, **kw)
    t0 = time.perf_counter()
    conv.do_conversion()
    return time.perf_counter() - t0


def config_n(n: int) -> None:
    """BASELINE.md end-to-end config N, through the tunnel (see module
    docstring for why these are lower bounds)."""
    import tempfile

    from dsd2dxd_tpu.formats.dsd_types import DitherType, OutputType

    tmp = Path(tempfile.mkdtemp(prefix="dsd2dxd_bench_"))
    if n == 1:
        # DSD64 planar .dsf -> 24-bit 352.8k WAV, TPDF
        src = _fixture_dsf("bench64.dsf", 2_822_400, 24.0)
        audio = 24.0
        _convert(src, tmp / "w", bit_depth=24, output=OutputType.WAV,
                 output_rate=352800, dither=DitherType.TPDF)  # warm compile
        wall = _convert(src, tmp / "w2", bit_depth=24, output=OutputType.WAV,
                        output_rate=352800, dither=DitherType.TPDF)
        _emit("xrt_cfg1_dsd64_dsf_to_352k8_24bit_wav_e2e", audio, wall)
    elif n == 2:
        # raw interleaved DSD64 stdin -> raw s24le 176.4k stdout
        from dsd2dxd_tpu.formats.dsd_types import (
            DsdRate,
            Endianness,
            FilterType,
            FmtType,
        )
        from dsd2dxd_tpu.pipeline.engine import Converter

        planes = _tone_planes(2_822_400, 24.0)
        audio = planes.shape[1] * 8 / 2_822_400
        raw = _CACHE / "bench64_i.dsd"
        if not raw.exists():
            # byte-interleaved MSB-first, the 1kHz_stereo_i.dsd layout
            inter = np.empty((planes.shape[1] * 2,), dtype=np.uint8)
            inter[0::2] = planes[0]
            inter[1::2] = planes[1]
            raw.write_bytes(inter.tobytes())

        def run_once() -> float:
            conv = Converter.new(
                bit_depth=24, output=OutputType.STDOUT, level_db=0.0,
                output_rate=176400, out_dir=None, dither=DitherType.TPDF,
                fmt=FmtType.INTERLEAVED, endian=Endianness.MSB_FIRST,
                input_rate=DsdRate.DSD64, block_size=4096, channels=2,
                filt=FilterType.EQUIRIPPLE, append_rate=False,
                base_dir=tmp, input_path=raw)
            sink = _CountingOut()
            real = sys.stdout
            sys.stdout = type("S", (), {"buffer": sink})()  # engine writes here
            try:
                t0 = time.perf_counter()
                conv.do_conversion()
                dt = time.perf_counter() - t0
            finally:
                sys.stdout = real
            assert sink.n > 0
            return dt

        run_once()
        _emit("xrt_cfg2_raw_i_dsd64_to_s24le_176k4_stdout_e2e", audio,
              run_once())
    elif n == 3:
        # DSD128 .dsf -> 88.2k FLAC, 20-bit, NJAD
        src = _fixture_dsf("bench128.dsf", 5_644_800, 16.0)
        audio = 16.0
        _convert(src, tmp / "w", bit_depth=20, output=OutputType.FLAC,
                 output_rate=88200, dither=DitherType.NJAD)
        wall = _convert(src, tmp / "w2", bit_depth=20, output=OutputType.FLAC,
                        output_rate=88200, dither=DitherType.NJAD)
        _emit("xrt_cfg3_dsd128_dsf_to_88k2_flac_20bit_njad_e2e", audio, wall)
    elif n == 4:
        # DSD256 -> 32f AIFF at a 48k-multiple rate, plus DSD512 -> 352.8k
        # (the only valid DSD512 cell); combined wall clock
        src256 = _fixture_dsf("bench256.dsf", 11_289_600, 8.0)
        src512 = _fixture_dsf("bench512.dsf", 22_579_200, 8.0)
        # 32-bit float rides in AIFC (AIFF has no float sample type)
        kw256 = dict(bit_depth=32, output=OutputType.AIFC, output_rate=384000,
                     dither=DitherType.FPD)
        kw512 = dict(bit_depth=32, output=OutputType.AIFC, output_rate=352800,
                     dither=DitherType.FPD)
        _convert(src256, tmp / "w", **kw256)
        _convert(src512, tmp / "w", **kw512)
        wall = (_convert(src256, tmp / "w2", **kw256)
                + _convert(src512, tmp / "w2", **kw512))
        _emit("xrt_cfg4_dsd256_384k_dsd512_352k8_f32_aiff_e2e", 16.0, wall)
    elif n == 5:
        # recursive batch -> 24-bit FLAC with ID3 copy, multi-stream
        from dsd2dxd_tpu.cli.dsd2dxd import run as cli_run
        from dsd2dxd_tpu.formats.dff import write_dff
        from dsd2dxd_tpu.formats.id3 import Id3Frame, Id3Tag

        tag = Id3Tag(frames=[Id3Frame.text_frame("TIT2", "1kHz Test Tone"),
                             Id3Frame.text_frame("TPE1", "bench"),
                             Id3Frame.text_frame("TALB", "Bench Tones")])
        batch = _CACHE / "batch"
        (batch / "sub").mkdir(parents=True, exist_ok=True)
        _fixture_dsf("batch/a64.dsf", 2_822_400, 12.0, id3=tag.to_bytes())
        _fixture_dsf("batch/sub/b64.dsf", 2_822_400, 12.0)
        dff = batch / "c128.dff"
        if not dff.exists():
            write_dff(dff, _tone_planes(5_644_800, 8.0), 5_644_800,
                      id3=tag.to_bytes())
        audio = 12.0 + 12.0 + 8.0
        for sub in ("w", "w2"):
            out = tmp / sub
            out.mkdir()
            t0 = time.perf_counter()
            rc = cli_run(["-R", "-o", "f", "-q", "-p", str(out), str(batch)])
            wall = time.perf_counter() - t0
            assert rc == 0
            assert len(list(out.rglob("*.flac"))) == 3
        _emit("xrt_cfg5_recursive_batch_flac_id3_e2e", audio, wall)
    else:
        raise SystemExit(f"unknown config {n}")


def _await_tpu(budget_s: float, probe_timeout_s: float = 180.0) -> bool:
    """Wait (bounded) for the TPU to be reachable before benchmarking.

    When the axon tunnel is down, jax device discovery HANGS in-process
    (>5 min, measured 2026-08-18) — it never raises — so probing must
    happen in a killable subprocess. Retrying inside a budget covers
    tunnel flaps; returning False lets the caller emit a well-formed
    "no measurement" JSON line instead of hanging the driver or —
    worse — silently benchmarking the CPU fallback and recording it as
    a TPU number."""
    import subprocess

    # A tiny budget still gets one bounded probe (30 s floor) rather
    # than a 3-minute hang-then-kill.
    probe_timeout_s = min(probe_timeout_s, max(30.0, budget_s))
    deadline = time.monotonic() + budget_s
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.default_backend() == 'tpu'"],
                timeout=probe_timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        time.sleep(min(60.0, max(1.0, deadline - time.monotonic())))


# keep in lockstep with config_n's _emit calls: the null-measurement
# marker must land under the SAME metric name as a successful run, or a
# consumer joining bench records by metric never sees the gap
_CFG_METRICS = {
    1: "xrt_cfg1_dsd64_dsf_to_352k8_24bit_wav_e2e",
    2: "xrt_cfg2_raw_i_dsd64_to_s24le_176k4_stdout_e2e",
    3: "xrt_cfg3_dsd128_dsf_to_88k2_flac_20bit_njad_e2e",
    4: "xrt_cfg4_dsd256_384k_dsd512_352k8_f32_aiff_e2e",
    5: "xrt_cfg5_recursive_batch_flac_id3_e2e",
}


def _emit_unreachable(metric: str, note: str = None) -> None:
    print(json.dumps({
        "metric": metric,
        "value": None,
        "unit": "x_realtime",
        "vs_baseline": None,
        "note": note or ("TPU tunnel unreachable (device discovery hung "
                         "past the probe budget); no measurement taken"),
    }))


if __name__ == "__main__":
    import os

    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()  # reuse XLA compiles across bench runs

    ap = argparse.ArgumentParser()
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--config", type=int, default=None,
                    help="run BASELINE.md end-to-end config 1-5")
    ap.add_argument("--tpu-wait", type=float, default=float(
        os.environ.get("DSD2DXD_BENCH_TPU_WAIT_S", "900")),
        help="seconds to wait for the TPU tunnel before emitting a "
             "null-measurement JSON line (0 = probe once)")
    a = ap.parse_args()
    if not _await_tpu(a.tpu_wait):
        if a.config is not None:
            _emit_unreachable(_CFG_METRICS.get(
                a.config, f"xrt_cfg{a.config}_e2e"))
        else:
            _emit_unreachable("xrt_dsd64_stereo_to_352k8_24bit"
                              + ("_e2e_tunnel" if a.e2e else "_device"))
        raise SystemExit(0)
    if a.config is not None:
        config_n(a.config)
    else:
        main(e2e=a.e2e)
