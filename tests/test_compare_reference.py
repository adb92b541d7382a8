"""Self-diff smoke for tools/compare_reference.py (SURVEY.md §7.2 M5):
the harness can't be validated against the real reference binary here
(absent submodule, no network), but it must correctly classify our own
outputs — bitexact vs itself, dither-equivalent across seeds."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from dsd2dxd_tpu.formats.dsd_types import DitherType, FilterType, OutputType


@pytest.fixture(scope="module")
def two_takes(tmp_path_factory, tone_dsd64_stereo_dsf, monkeypatch_module):
    """The same file converted twice with different dither seeds."""
    from dsd2dxd_tpu.pipeline.engine import Converter

    outs = []
    for seed in ("", "take2"):
        monkeypatch_module.setenv("DSD2DXD_SEED", seed)
        d = tmp_path_factory.mktemp(f"take_{seed or 'a'}")
        conv = Converter.from_container(
            bit_depth=24, output=OutputType.WAV, level_db=0.0,
            output_rate=352800, out_dir=d, dither=DitherType.TPDF,
            filt=FilterType.EQUIRIPPLE, append_rate=False,
            base_dir=tone_dsd64_stereo_dsf.parent,
            input_path=tone_dsd64_stereo_dsf)
        conv.do_conversion()
        outs.append(conv.output_path())
    monkeypatch_module.delenv("DSD2DXD_SEED", raising=False)
    return outs


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


def test_self_diff_bitexact(two_takes):
    import compare_reference as cr

    r = cr.compare_pair(two_takes[0], two_takes[0], raw=None, channels=2,
                        bits_override=None, max_shift=16)
    assert r["verdict"] == "bitexact"
    assert r["offset"] == 0 and r["max_lsb"] == 0.0


def test_seed_diff_is_dither_equivalent(two_takes):
    """Two seeds => different TPDF realizations => nonzero deltas whose
    RMS is sqrt(2)*0.408 = 0.577 LSB (difference of two independent
    TPDF streams), comfortably inside the 0.8 LSB dither-equiv gate."""
    import compare_reference as cr

    r = cr.compare_pair(two_takes[0], two_takes[1], raw=None, channels=2,
                        bits_override=None, max_shift=16)
    assert r["verdict"] == "dither-equiv"
    assert 0.0 < r["rms_lsb"] <= 0.8
    assert 0.3 < r["rms_lsb"]  # two real independent noise streams


def test_alignment_recovers_known_shift(tmp_path):
    """Simulated group-delay mismatch: `ref` starts 63 frames into the
    stream, so `ours` leads and must align at offset == +63 (positive
    lag = ours is shifted forward to meet ref) and come out bitexact."""
    import compare_reference as cr

    from dsd2dxd_tpu.containers.wav import WavWriter

    rng = np.random.default_rng(3)
    x = (rng.normal(0, 0.2, size=(30000, 2)) * (1 << 23)).astype(np.int32)
    a, b = tmp_path / "a.wav", tmp_path / "b.wav"
    for path, arr in ((a, x[63:]), (b, x)):
        with open(path, "wb") as f:
            w = WavWriter(f, 2, 352800, 24)
            w.write(arr)
            w.finalize()
    r = cr.compare_pair(a, b, raw=None, channels=2, bits_override=None,
                        max_shift=128)
    assert r["offset"] == 63
    assert r["verdict"] == "bitexact"


def test_raw_and_float_paths(tmp_path):
    import compare_reference as cr

    x = (np.sin(2 * np.pi * np.arange(20000) / 50.0) * 0.4)
    xi = np.round(x * (1 << 23)).astype(np.int64)
    raw = tmp_path / "a.raw"
    b = np.empty((len(xi), 3), dtype=np.uint8)
    v = (xi & 0xFFFFFF).astype(np.uint32)
    b[:, 0] = v & 0xFF
    b[:, 1] = (v >> 8) & 0xFF
    b[:, 2] = (v >> 16) & 0xFF
    raw.write_bytes(b.tobytes())
    r = cr.compare_pair(raw, raw, raw="s24le", channels=1,
                        bits_override=None, max_shift=4)
    assert r["verdict"] == "bitexact"
