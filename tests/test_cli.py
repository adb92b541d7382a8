"""CLI surface tests mirroring the reference's system-level shell suites
(SURVEY.md §4.1; run_all_tests.sh / build_test_*.sh behaviors)."""

import io
import struct
import sys
from pathlib import Path

import numpy as np
import pytest

from dsd2dxd_tpu.cli import dsd2dxd as cli
from dsd2dxd_tpu.cli import dsd_levels as levels_cli


@pytest.fixture(scope="module")
def tone_dir(tmp_path_factory):
    """A directory tree with DSD fixtures for batch/recursion tests."""
    from dsd2dxd_tpu.formats.dsf import write_dsf
    from dsd2dxd_tpu.ops.dsm import synth_tone_dsd

    root = tmp_path_factory.mktemp("clitree")
    planes = synth_tone_dsd(1000.0, 0.25, 2_822_400, amplitude=0.5, channels=2)
    write_dsf(root / "a.dsf", planes, 2_822_400, lsb_first=True)
    sub = root / "sub"
    sub.mkdir()
    write_dsf(sub / "b.dsf", planes, 2_822_400, lsb_first=True)
    (root / "cover.jpg").write_bytes(b"\xff\xd8fakejpeg")
    return root


def test_defaults_match_reference():
    args = cli.build_parser().parse_args([])
    assert (args.channels, args.fmt, args.bitdepth, args.filttype) == (2, "I", 24, "E")
    assert (args.endianness, args.bs, args.rate, args.inrate) == ("M", 4096, 352800, 1)
    assert (args.output, args.level, args.dither) == ("S", 0.0, None)
    enums = cli.parse_enums(args)
    from dsd2dxd_tpu.formats.dsd_types import DitherType

    # dither default: T unless 32-bit (then F) — reference src/main.rs:165-169
    assert enums["dither"] is DitherType.TPDF
    args32 = cli.build_parser().parse_args(["-b", "32"])
    assert cli.parse_enums(args32)["dither"] is DitherType.FPD


def test_strict_and_lenient_enum_parsing():
    from dsd2dxd_tpu.formats.dsd_types import FilterType, OutputType

    # strict: bad dither char errors (reference src/main.rs:176-180)
    args = cli.build_parser().parse_args(["-d", "Z"])
    with pytest.raises(ValueError):
        cli.parse_enums(args)
    # strict: bad fmt char errors (src/main.rs:187-190)
    args = cli.build_parser().parse_args(["-f", "Q"])
    with pytest.raises(ValueError):
        cli.parse_enums(args)
    # lenient: bad filter/output chars fall back (src/main.rs:204, 213)
    args = cli.build_parser().parse_args(["-t", "Z", "-o", "Z"])
    enums = cli.parse_enums(args)
    assert enums["filt"] is FilterType.EQUIRIPPLE
    assert enums["output"] is OutputType.STDOUT
    # NJAD accepted (extension over reference v2.7.0 — README.md:74)
    args = cli.build_parser().parse_args(["-d", "N"])
    from dsd2dxd_tpu.formats.dsd_types import DitherType

    assert cli.parse_enums(args)["dither"] is DitherType.NJAD


def test_batch_recursive_wav(tone_dir, tmp_path):
    rc = cli.run(["-R", "-o", "w", "-b", "16", "-r", "88200",
                  "-p", str(tmp_path), str(tone_dir), "-q"])
    assert rc == 0
    # tree mirrored relative to base_dir = tone_dir.PARENT (main.rs:266
    # takes paths[0].parent() even for a directory), so the input
    # directory's own name is kept in the output tree
    d = tmp_path / tone_dir.name
    assert (d / "a.wav").exists()
    assert (d / "sub" / "b.wav").exists()
    # artwork copied (reference src/main.rs:43-46)
    assert (d / "cover.jpg").exists()


def test_no_recurse_skips_directories_entirely(tone_dir, tmp_path):
    """Without -R a directory argument is not traversed AT ALL
    (reference README.md:109-112: 'provide explicit file paths if you
    don't want recursion') — an earlier version expanded one level."""
    rc = cli.run(["-o", "w", "-r", "88200", "-p", str(tmp_path),
                  str(tone_dir), "-q"])
    assert rc == 0
    assert not (tmp_path / "a.wav").exists()
    assert not (tmp_path / "sub" / "b.wav").exists()
    # explicit file paths still convert without -R
    rc = cli.run(["-o", "w", "-r", "88200", "-p", str(tmp_path),
                  str(tone_dir / "a.dsf"), "-q"])
    assert rc == 0
    assert (tmp_path / "a.wav").exists()


def test_append_rate_suffix(tone_dir, tmp_path):
    rc = cli.run(["-a", "-o", "w", "-r", "96000", "-p", str(tmp_path),
                  str(tone_dir / "a.dsf"), "-q"])
    assert rc == 0
    assert (tmp_path / "a_96K.wav").exists()


def test_missing_output_dir_errors(tone_dir):
    rc = cli.run(["-o", "w", "-p", "/nonexistent-dir-xyz",
                  str(tone_dir / "a.dsf"), "-q"])
    assert rc == 1


def test_version_flag(capsys):
    # clap derives --version (reference src/main.rs:41)
    with pytest.raises(SystemExit) as ei:
        cli.run(["--version"])
    assert ei.value.code == 0
    assert "dsd2dxd" in capsys.readouterr().out


def test_dsd_levels_requires_an_input():
    """Unlike dsd2dxd (stdin assumed), the reference's dsd_levels
    requires >=1 input (dsd_levels/main.rs:34 required=true): usage
    error, exit 2."""
    with pytest.raises(SystemExit) as ei:
        levels_cli.run([])
    assert ei.value.code == 2


def test_dsd_levels_version_flag(capsys):
    # reference dsd_levels also derives it (dsd_levels/main.rs:27-31)
    with pytest.raises(SystemExit) as ei:
        levels_cli.run(["-V"])
    assert ei.value.code == 0
    assert "dsd_levels" in capsys.readouterr().out


def test_nonexistent_input_hard_errors(tmp_path):
    # the reference's canonicalize()? aborts the run (src/main.rs:256-260)
    rc = cli.run(["-o", "w", "-p", str(tmp_path), "/no/such/file.dsf", "-q"])
    assert rc == 1


def test_unexpanded_glob_warns_and_skips(tone_dir, tmp_path):
    # globs that the shell failed to expand are warned about and skipped,
    # not fatal (reference src/main.rs:246-251)
    rc = cli.run(["-o", "w", "-p", str(tmp_path), "*.nothing",
                  str(tone_dir / "a.dsf"), "-q"])
    assert rc == 0
    assert (tmp_path / "a.wav").exists()


def test_invalid_rate_pair_errors(tone_dir, tmp_path):
    # DSD64 -> 705600 is invalid (SURVEY.md §2.5 matrix)
    rc = cli.run(["-o", "w", "-r", "705600", "-p", str(tmp_path),
                  str(tone_dir / "a.dsf"), "-q"])
    assert rc == 1


def test_stdin_to_stdout(tone_dir, tmp_path, monkeypatch, capsysbinary):
    """Raw planar stdin -> raw s24le stdout (build_test_mono.sh path)."""
    from dsd2dxd_tpu.formats.dsf import open_dsf
    from dsd2dxd_tpu.formats.source import reverse_bits

    src, meta = open_dsf(tone_dir / "a.dsf")
    blocks = []
    while True:
        p = src.read(65536)
        if p is None:
            break
        blocks.append(reverse_bits(p))
    payload = np.concatenate(blocks, axis=1)
    # interleave planar blocks of 4096 as a .dsf data section does
    pad = (-payload.shape[1]) % 4096
    payload = np.pad(payload, ((0, 0), (0, pad)), constant_values=0x55)
    chunks = [payload[:, o:o + 4096].tobytes()
              for o in range(0, payload.shape[1], 4096)]
    raw = b"".join(chunks)

    monkeypatch.setattr("sys.stdin", io.TextIOWrapper(io.BytesIO(raw)))
    rc = cli.run(["-f", "P", "-e", "L", "-c", "2", "-q", "-"])
    assert rc == 0
    out = capsysbinary.readouterr().out
    n_frames = len(out) // (3 * 2)
    assert n_frames == payload.shape[1] * 8 // 8  # bits/8 decimation
    # decode a slice and confirm the tone is there
    b = np.frombuffer(out, dtype=np.uint8).reshape(-1, 3)
    vals = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16))
    vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
    x = vals.reshape(-1, 2)[30000:80000, 0].astype(np.float64) / 2 ** 23
    assert abs(np.sqrt(np.mean(x ** 2)) * np.sqrt(2) - 0.5) < 0.02


def test_dsd_levels_cli(tone_dir, capsys):
    rc = levels_cli.run(["-r", "352800", str(tone_dir / "a.dsf"), "-q"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "a.dsf: peak level =" in err
    assert "Highest peak level:" in err
    db = float(err.split("Highest peak level:")[1].split("dBFS")[0])
    assert -7.0 < db < -4.0


def test_dsd_levels_stdin(tone_dir, monkeypatch, capsys):
    """dsd_levels '-' reads stdin (reference dsd_levels/main.rs:129-134)."""
    import io

    from dsd2dxd_tpu.formats.dsf import open_dsf
    from dsd2dxd_tpu.formats.source import reverse_bits

    src, _ = open_dsf(tone_dir / "a.dsf")
    blocks = []
    while True:
        p = src.read(65536)
        if p is None:
            break
        blocks.append(reverse_bits(p))
    payload = np.concatenate(blocks, axis=1)
    pad = (-payload.shape[1]) % 4096
    payload = np.pad(payload, ((0, 0), (0, pad)), constant_values=0x55)
    raw = b"".join(payload[:, o:o + 4096].tobytes()
                   for o in range(0, payload.shape[1], 4096))
    monkeypatch.setattr("sys.stdin", io.TextIOWrapper(io.BytesIO(raw)))
    rc = levels_cli.run(["-f", "P", "-e", "L", "-c", "2", "-q", "-"])
    assert rc == 0
    err = capsys.readouterr().err
    assert "stdin: peak level =" in err
