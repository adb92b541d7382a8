"""Signal oracles over the REAL reference fixtures (SURVEY.md §4.2-4.3):
pink-noise spectral rolloff, single-bit impulse response extraction, and
the byte-verified container ground truths, run through the full engine.
"""

from pathlib import Path

import numpy as np
import pytest

from dsd2dxd_tpu.formats.dsd_types import (
    DitherType,
    DsdRate,
    Endianness,
    FilterType,
    FmtType,
    OutputType,
)
from dsd2dxd_tpu.pipeline.engine import Converter

REF = Path("/root/reference/test")

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference fixtures not mounted")


def _collect(conv):
    tiles = []
    conv._run(None, None, lambda t: tiles.append(t))
    return np.concatenate(tiles, axis=0)


def _convert_to_float(path, out_hz, filt=FilterType.EQUIRIPPLE, **kw):
    return _collect(Converter.from_container(
        bit_depth=32, output=OutputType.WAV, level_db=0.0, output_rate=out_hz,
        out_dir=kw.get("out_dir"), dither=DitherType.NONE, filt=filt,
        append_rate=False, base_dir=path.parent, input_path=path))


def _convert_raw_to_float(path, out_hz, *, fmt, endian, channels,
                          dither=DitherType.NONE):
    return _collect(Converter.new(
        bit_depth=32, output=OutputType.STDOUT, level_db=0.0,
        output_rate=out_hz, out_dir=None, dither=dither, fmt=fmt,
        endian=endian, input_rate=DsdRate.DSD64, block_size=4096,
        channels=channels, filt=FilterType.EQUIRIPPLE, append_rate=False,
        base_dir=path.parent, input_path=path))


def test_pinknoise_spectral_rolloff(tmp_path):
    """SURVEY §4.3c: pink noise through the chain — in-band spectrum
    follows 1/f; out-of-band follows the filter's rolloff; no alias
    energy concentration in the audio band."""
    pcm = _convert_to_float(REF / "pinknoise_stereo_128.dsf", 88200,
                            out_dir=tmp_path)
    x = pcm[4000:, 0].astype(np.float64)
    n = len(x)
    X = np.abs(np.fft.rfft(x * np.hanning(n))) ** 2
    freqs = np.fft.rfftfreq(n, 1 / 88200)

    def band_power(lo, hi):
        sel = (freqs >= lo) & (freqs < hi)
        return X[sel].mean()

    # pink noise: power density ~1/f -> each octave's mean density halves
    p1 = band_power(500, 1000)
    p2 = band_power(1000, 2000)
    p3 = band_power(2000, 4000)
    p4 = band_power(8000, 16000)
    assert 0.3 < p2 / p1 < 0.8          # ~0.5 expected
    assert 0.3 < p3 / p2 < 0.8
    # 4 octaves below 1 kHz band: ~1/16 density
    assert p4 / p1 < 0.25
    # delta-sigma noise must not alias into the top of the audio band:
    # 18-20 kHz density stays at/below the pink trend (measured ~0.04*p1;
    # a rising DSD noise shelf would blow through this)
    p_hi = band_power(18000, 20000)
    assert p_hi < p4
    assert p_hi / p1 < 0.1


def test_real_impulse_fixture():
    """SURVEY §4.3b with the actual test/impulse_mono_toggle.dsd: a single
    flipped bit in the idle pattern reproduces the cascade impulse
    response at the output."""
    from dsd2dxd_tpu.filters.design import get_chain
    from dsd2dxd_tpu.ops.resample import upfirdn_reference

    got = _convert_raw_to_float(
        REF / "impulse_mono_toggle.dsd", 352800, fmt=FmtType.INTERLEAVED,
        endian=Endianness.MSB_FIRST, channels=1,
        dither=DitherType.FPD)[:, 0].astype(np.float64)

    raw = np.fromfile(REF / "impulse_mono_toggle.dsd", dtype=np.uint8)
    bits = np.unpackbits(raw[None, :], axis=1).astype(np.float64) * 2 - 1
    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    ref = bits
    for s in chain:
        ref = upfirdn_reference(s.taps, ref, s.L, s.M)
    ref = ref[0][:len(got)]
    assert np.max(np.abs(got - ref)) < 1e-5
    # the flipped bit must be visible as a localized impulse response
    delta = got - np.median(got)
    peak_idx = int(np.argmax(np.abs(delta)))
    assert abs(peak_idx - 2048) < 64  # byte 2048 of 4096 (SURVEY §4.2)


def test_dsd64_container_ground_truth():
    """Byte-verified §4.2 facts through the parser: 1kHz_mono_p.dsf is
    DSD64 mono LSB-first, 5.000 s, block 4096."""
    from dsd2dxd_tpu.formats.dsf import open_dsf

    src, meta = open_dsf(REF / "1kHz_mono_p.dsf")
    assert meta.channels == 1
    assert meta.rate is DsdRate.DSD64
    assert meta.block_size == 4096
    assert meta.sample_count == 14_112_000  # exactly 5.000 s
    assert src.info.endianness is Endianness.LSB_FIRST


def test_raw_equals_container_payload(tmp_path):
    """§4.2: 1kHz_mono_p.dsd == the .dsf's payload; converting both must
    give identical PCM (modulo the dsf's final-block sample trim)."""
    a = _convert_to_float(REF / "1kHz_mono_p.dsf", 352800, out_dir=tmp_path)
    b = _convert_raw_to_float(
        REF / "1kHz_mono_p.dsd", 352800, fmt=FmtType.PLANAR,
        endian=Endianness.LSB_FIRST, channels=1)
    n = min(len(a), len(b))
    np.testing.assert_allclose(a[:n], b[:n], atol=1e-6)
