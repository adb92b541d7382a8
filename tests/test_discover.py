"""Input discovery / output layout tests (reference: src/main.rs:216-277,
README.md:109-119)."""

from pathlib import Path

from dsd2dxd_tpu.formats.discover import (
    build_output_path,
    compute_base_dir,
    copy_artwork,
    find_dsd_files,
    rate_suffix,
)
from dsd2dxd_tpu.formats.dsd_types import OutputType


def _mk(tmp_path, rel):
    p = tmp_path / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"")
    return p


def test_find_recursive(tmp_path):
    a = _mk(tmp_path, "a.dsf")
    b = _mk(tmp_path, "sub/b.dff")
    c = _mk(tmp_path, "sub/deep/c.dsd")
    _mk(tmp_path, "sub/readme.txt")
    got = find_dsd_files([tmp_path], recurse=True)
    assert got == [a, b, c]


def test_find_nonrecursive_skips_directories(tmp_path):
    """README.md:109-112: without -R directories are not traversed —
    not even one level (parity fix; the old behavior listed immediate
    files)."""
    _mk(tmp_path, "a.dsf")
    _mk(tmp_path, "sub/b.dff")
    got = find_dsd_files([tmp_path], recurse=False)
    assert got == []


def test_explicit_files_kept(tmp_path):
    a = _mk(tmp_path, "x.dsf")
    got = find_dsd_files([a], recurse=False)
    assert got == [a]


def test_rate_suffix():
    """-a suffixes (reference README.md:171-173): _96K, _88_2K style."""
    assert rate_suffix(96000) == "_96K"
    assert rate_suffix(88200) == "_88_2K"
    assert rate_suffix(352800) == "_352_8K"
    assert rate_suffix(1411200) == "_1411_2K"
    assert rate_suffix(192000) == "_192K"


def test_output_path_stdin():
    p = build_output_path(None, Path("/x"), None, OutputType.WAV, 352800, False)
    assert p.name == "output.wav"


def test_output_path_mirrors_tree(tmp_path):
    inp = _mk(tmp_path, "music/album/track.dsf")
    out = tmp_path / "out"
    out.mkdir()
    p = build_output_path(inp, tmp_path, out, OutputType.FLAC, 88200, False)
    assert p == out / "music/album/track.flac"


def test_output_path_append_rate(tmp_path):
    inp = _mk(tmp_path, "t.dsf")
    p = build_output_path(inp, tmp_path, None, OutputType.WAV, 96000, True)
    assert p.name == "t_96K.wav"


def test_base_dir_single_input(tmp_path):
    inp = _mk(tmp_path, "d/t.dsf")
    assert compute_base_dir([inp]) == inp.parent
    # a single DIRECTORY input also uses its parent (main.rs:266 takes
    # paths[0].parent() unconditionally), so -p mirrors out/<dir>/...
    assert compute_base_dir([inp.parent]) == tmp_path


def test_base_dir_common_ancestor(tmp_path):
    a = _mk(tmp_path, "x/a.dsf")
    b = _mk(tmp_path, "y/b.dsf")
    # parent OF the common prefix (main.rs:271-273 common_path_all(...)
    # .parent()), so the mirrored tree keeps the ancestor directory name
    assert compute_base_dir([a, b]) == tmp_path.parent
    # same-directory files: common prefix is the dir, base is its parent
    c = _mk(tmp_path, "x/c.dsf")
    assert compute_base_dir([a, c]) == tmp_path


def test_copy_artwork(tmp_path):
    inp = _mk(tmp_path, "src/t.dsf")
    art = _mk(tmp_path, "src/cover.jpg")
    dest = tmp_path / "dest"
    dest.mkdir()
    copied = copy_artwork(inp, dest)
    assert [p.name for p in copied] == ["cover.jpg"]
    assert (dest / "cover.jpg").exists()
