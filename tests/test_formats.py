"""Container parser/writer tests, validated against the byte-verified
reference fixtures (SURVEY.md §4.2) plus self round-trips."""

import io
from pathlib import Path

import numpy as np
import pytest

from dsd2dxd_tpu.formats.dsd_types import DsdRate, Endianness, FmtType
from dsd2dxd_tpu.formats.dff import open_dff, parse_dff, write_dff
from dsd2dxd_tpu.formats.dsf import open_dsf, parse_dsf_header, write_dsf
from dsd2dxd_tpu.formats.source import DsdSource, DsdStreamInfo, raw_source, reverse_bits


class TestDsfParse:
    def test_mono_fixture(self, reference_fixtures):
        """Ground truth from SURVEY.md §4.2: DSD64 mono, LSB-first,
        14_112_000 samples/ch = 5.000 s, block 4096, no ID3."""
        src, meta = open_dsf(reference_fixtures / "test/1kHz_mono_p.dsf")
        assert meta.channels == 1
        assert meta.sample_rate == 2_822_400
        assert meta.rate is DsdRate.DSD64
        assert meta.bits_per_sample == 1
        assert meta.endianness is Endianness.LSB_FIRST
        assert meta.sample_count == 14_112_000
        assert meta.block_size == 4096
        assert meta.metadata_offset == 0
        assert src.info.duration_seconds == pytest.approx(5.0)

    def test_dsd128_stereo_fixture(self, reference_fixtures):
        src, meta = open_dsf(reference_fixtures / "test/1kHz_stereo_128.dsf")
        assert meta.channels == 2
        assert meta.rate is DsdRate.DSD128
        assert meta.sample_count == 11_289_600
        assert src.info.duration_seconds == pytest.approx(2.0)

    def test_payload_matches_raw_twin(self, reference_fixtures):
        """README.md:205: the _p .dsd file equals the .dsf minus header."""
        src, meta = open_dsf(reference_fixtures / "test/1kHz_mono_p.dsf")
        raw = (reference_fixtures / "test/1kHz_mono_p.dsd").read_bytes()
        got = src.read(4096)
        # Canonical planes are MSB-first; the file is LSB-first, so compare
        # after applying the same normalization to the raw twin.
        expect = reverse_bits(np.frombuffer(raw[:4096], dtype=np.uint8))
        np.testing.assert_array_equal(got[0], expect)

    def test_broken_id3_fixture_parses(self, reference_fixtures):
        """Lying file-size field + truncated ID3 must not break parsing
        (id3_test/1kHz_mono_brokenid3.dsf, SURVEY.md §4.2)."""
        src, meta = open_dsf(reference_fixtures / "id3_test/1kHz_mono_brokenid3.dsf")
        assert meta.channels == 1
        assert src.info.id3 is not None
        assert src.info.id3[:3] == b"ID3"

    def test_full_stream_length(self, reference_fixtures):
        src, meta = open_dsf(reference_fixtures / "test/1kHz_mono_p.dsf")
        total = 0
        while True:
            block = src.read(65536)
            if block is None:
                break
            total += block.shape[1]
        assert total == meta.sample_count // 8


class TestDffParse:
    def test_stereo_fixture(self, reference_fixtures):
        """Ground truth from SURVEY.md §4.2: DSD64 stereo, FRM8 size lies,
        2_116_800 data bytes, ID3 chunk with known frames."""
        src, meta = open_dff(reference_fixtures / "id3_test/dff/1kHz_stereo_i.dff")
        assert meta.channels == 2
        assert meta.channel_ids == ("SLFT", "SRGT")
        assert meta.sample_rate == 2_822_400
        assert meta.data_size == 2_116_800
        assert meta.version == 0x01050000
        assert meta.id3 is not None

    def test_data_matches_raw_twin(self, reference_fixtures):
        """The DFF's DSD chunk equals test/1kHz_stereo_i.dsd byte-for-byte."""
        src, meta = open_dff(reference_fixtures / "id3_test/dff/1kHz_stereo_i.dff")
        raw = (reference_fixtures / "test/1kHz_stereo_i.dsd").read_bytes()
        block = src.read(1024)
        assert block.shape == (2, 1024)
        # byte-interleaved L,R -> deinterleaved planes (MSB-first already)
        expect = np.frombuffer(raw[: 2 * 1024], dtype=np.uint8).reshape(-1, 2).T
        np.testing.assert_array_equal(block, expect)

    def test_broken_id3_fixture_parses(self, reference_fixtures):
        src, meta = open_dff(
            reference_fixtures / "id3_test/dff/1kHz_stereo_i_brokenid3.dff"
        )
        assert meta.channels == 2
        assert meta.data_size == 2_116_800


class TestRoundTrip:
    def test_dsf_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        planes = rng.integers(0, 256, size=(2, 5000), dtype=np.uint8)
        path = tmp_path / "rt.dsf"
        write_dsf(path, planes, 2_822_400, lsb_first=True)
        src, meta = open_dsf(path)
        assert meta.channels == 2
        assert meta.sample_count == 5000 * 8
        got = src.read(5000)
        np.testing.assert_array_equal(got, planes)
        assert src.read(5000) is None

    def test_dsf_roundtrip_msb(self, tmp_path):
        planes = np.arange(512, dtype=np.uint8).reshape(1, 512)
        path = tmp_path / "rt_msb.dsf"
        write_dsf(path, planes, 5_644_800, lsb_first=False)
        src, meta = open_dsf(path)
        assert meta.rate is DsdRate.DSD128
        assert meta.endianness is Endianness.MSB_FIRST
        np.testing.assert_array_equal(src.read(512), planes)

    def test_dff_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        planes = rng.integers(0, 256, size=(2, 3000), dtype=np.uint8)
        path = tmp_path / "rt.dff"
        write_dff(path, planes, 2_822_400)
        src, meta = open_dff(path)
        assert meta.channels == 2
        assert meta.sample_rate == 2_822_400
        np.testing.assert_array_equal(src.read(3000), planes)

    def test_dff_roundtrip_with_id3(self, tmp_path):
        from dsd2dxd_tpu.formats.id3 import Id3Frame, Id3Tag

        tag = Id3Tag()
        tag.set_text("TIT2", "Round Trip")
        planes = np.zeros((1, 64), dtype=np.uint8)
        path = tmp_path / "rt_id3.dff"
        write_dff(path, planes, 2_822_400, id3=tag.to_bytes())
        src, meta = open_dff(path)
        assert meta.id3 is not None
        from dsd2dxd_tpu.formats.id3 import parse_id3

        parsed = parse_id3(meta.id3)
        assert parsed.get_text("TIT2") == "Round Trip"


class TestSource:
    def test_planar_lsb_normalization(self):
        # one byte per channel, LSB-first: bit-reverse expected
        data = bytes([0b00000001, 0b10000000])
        info = DsdStreamInfo(
            channels=2, rate=DsdRate.DSD64, fmt=FmtType.PLANAR,
            endianness=Endianness.LSB_FIRST, block_size=1,
        )
        src = DsdSource(io.BytesIO(data), info)
        out = src.read(1)
        assert out[0, 0] == 0b10000000
        assert out[1, 0] == 0b00000001

    def test_interleaved_deinterleave(self):
        data = bytes([1, 2, 3, 4, 5, 6])
        src = raw_source(io.BytesIO(data), 2, DsdRate.DSD64,
                         FmtType.INTERLEAVED, Endianness.MSB_FIRST, 1)
        out = src.read(3)
        np.testing.assert_array_equal(out, [[1, 3, 5], [2, 4, 6]])

    def test_planar_block_boundary_reads(self):
        """Reads not aligned to the planar block size must stitch correctly."""
        rng = np.random.default_rng(2)
        planes = rng.integers(0, 256, size=(2, 4096 * 3), dtype=np.uint8)
        interleaved_blocks = planes.reshape(2, 3, 4096).transpose(1, 0, 2).tobytes()
        info = DsdStreamInfo(
            channels=2, rate=DsdRate.DSD64, fmt=FmtType.PLANAR,
            endianness=Endianness.MSB_FIRST, block_size=4096,
        )
        src = DsdSource(io.BytesIO(interleaved_blocks), info)
        chunks = []
        while True:
            b = src.read(1000)
            if b is None:
                break
            chunks.append(b)
        got = np.concatenate(chunks, axis=1)
        np.testing.assert_array_equal(got, planes)

    def test_sample_count_trims_padding(self):
        """DSF zero-pads the final block; the sample count must trim it."""
        planes = np.ones((1, 100), dtype=np.uint8)
        padded = np.zeros((1, 4096), dtype=np.uint8)
        padded[:, :100] = planes
        info = DsdStreamInfo(
            channels=1, rate=DsdRate.DSD64, fmt=FmtType.PLANAR,
            endianness=Endianness.MSB_FIRST, block_size=4096,
            sample_count=100 * 8,
        )
        src = DsdSource(io.BytesIO(padded.tobytes()), info)
        out = src.read(4096)
        assert out.shape == (1, 100)
        assert src.read(4096) is None


def test_dsf_zero_block_size_raises(tmp_path):
    """block_size=0 used to loop empty super-block reads into a silent
    header-only output (exit 0, total data loss); huge values would
    allocate block_size*channels at once. Both are FormatError now."""
    import struct

    from dsd2dxd_tpu.formats.dsf import parse_dsf_header
    from dsd2dxd_tpu.utils.errors import FormatError

    from dsd2dxd_tpu.formats.dsf import write_dsf
    from dsd2dxd_tpu.ops.dsm import synth_tone_dsd

    p = tmp_path / "t.dsf"
    write_dsf(p, synth_tone_dsd(1000.0, 0.01, 2_822_400), 2_822_400)
    raw = bytearray(p.read_bytes())
    # fmt chunk starts at 28; block_size is at offset 28+4+8+4*6+8 = 72
    for bad in (0, 0xFFFFFFFF):
        struct.pack_into("<I", raw, 72, bad)
        import io
        with pytest.raises(FormatError):
            parse_dsf_header(io.BytesIO(bytes(raw)))


def test_dsf_lying_metadata_pointer_bounded(tmp_path):
    """A metadata pointer aimed into the audio data must not slurp the
    rest of the file: the reader now reads the 10-byte ID3 header and
    only the syncsafe-declared size."""
    from dsd2dxd_tpu.formats.dsf import open_dsf, write_dsf
    from dsd2dxd_tpu.ops.dsm import synth_tone_dsd

    p = tmp_path / "t.dsf"
    write_dsf(p, synth_tone_dsd(1000.0, 0.05, 2_822_400), 2_822_400)
    raw = bytearray(p.read_bytes())
    import struct
    struct.pack_into("<Q", raw, 20, 40)  # pointer into the header/data
    p.write_bytes(bytes(raw))
    src, _meta = open_dsf(p)  # must not raise nor read ~the whole file
    assert src.info.id3 is None  # no ID3 magic at the lied-about offset


def test_parser_fuzz_only_clean_errors():
    """Parsers must degrade to FormatError/None on arbitrary garbage —
    never struct.error / ZeroDivisionError / MemoryError (the CLI maps
    Dsd2DxdError to the documented red [ERROR]; anything else is a bug
    in the parser's defenses). Mutations seed from REAL headers so the
    fuzz reaches deep branches, not just the magic check."""
    import io as _io

    from dsd2dxd_tpu.formats.dff import parse_dff
    from dsd2dxd_tpu.formats.dsf import parse_dsf_header, write_dsf
    from dsd2dxd_tpu.formats.id3 import parse_id3
    from dsd2dxd_tpu.ops.dsm import synth_tone_dsd
    from dsd2dxd_tpu.utils.errors import FormatError

    rng = np.random.default_rng(0xF422)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = Path(td) / "s.dsf"
        write_dsf(p, synth_tone_dsd(1000.0, 0.01, 2_822_400), 2_822_400)
        dsf_seed = bytearray(p.read_bytes())
    id3_seed = bytearray(
        b"ID3\x03\x00\x00\x00\x00\x00\x20TIT2\x00\x00\x00\x05\x00\x00"
        b"\x00Tone" + bytes(10))
    dff_seed = bytearray(
        b"FRM8" + (0).to_bytes(8, "big") + b"DSD "
        + b"FVER" + (4).to_bytes(8, "big") + bytes(4)
        + b"PROP" + (30).to_bytes(8, "big") + b"SND "
        + b"FS  " + (4).to_bytes(8, "big") + (2822400).to_bytes(4, "big")
        + b"CHNL" + (2).to_bytes(8, "big") + (0).to_bytes(2, "big")
        + b"DSD " + (64).to_bytes(8, "big") + bytes(64))
    for name, parse, seed in (
            ("dsf", lambda b: parse_dsf_header(_io.BytesIO(b)), dsf_seed),
            ("dff", lambda b: parse_dff(_io.BytesIO(b)), dff_seed),
            ("id3", parse_id3, id3_seed)):
        for trial in range(300):
            buf = bytearray(seed)
            for _ in range(rng.integers(1, 6)):
                i = rng.integers(0, len(buf))
                buf[i] = rng.integers(0, 256)
            if rng.integers(0, 4) == 0:  # truncate
                buf = buf[:rng.integers(0, len(buf))]
            try:
                parse(bytes(buf))
            except FormatError:
                pass
            except Exception as e:  # pragma: no cover - the failure mode
                raise AssertionError(
                    f"{name} fuzz trial {trial}: {type(e).__name__}: {e}"
                ) from e
