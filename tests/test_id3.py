"""ID3v2 parse/edit/write tests, including the broken-tag tolerance the
reference fixtures encode (SURVEY.md §4.2)."""

import pytest

from dsd2dxd_tpu.formats.dff import open_dff
from dsd2dxd_tpu.formats.dsf import open_dsf
from dsd2dxd_tpu.formats.id3 import Id3Tag, id3_to_vorbis_comments, parse_id3


def test_dff_fixture_tag_frames(reference_fixtures):
    """Known ground truth (SURVEY.md §4.2): TIT2/TPE1/TALB contents."""
    _, meta = open_dff(reference_fixtures / "id3_test/dff/1kHz_stereo_i.dff")
    tag = parse_id3(meta.id3)
    assert tag is not None
    assert tag.get_text("TIT2") == "1kHz Test Tone DSD64"
    assert tag.get_text("TPE1") == "clone206"
    assert tag.get_text("TALB") == "clone206's Greatest Test Tone Hits"


def test_truncated_dsf_tag_degrades_gracefully(reference_fixtures):
    """id3_test/1kHz_mono_brokenid3.dsf: declared tag size overruns EOF,
    TALB frame cut mid-payload -> parse what exists, flag truncation."""
    src, meta = open_dsf(reference_fixtures / "id3_test/1kHz_mono_brokenid3.dsf")
    tag = parse_id3(src.info.id3)
    assert tag is not None
    assert tag.truncated


def test_truncated_dff_tag_degrades_gracefully(reference_fixtures):
    _, meta = open_dff(
        reference_fixtures / "id3_test/dff/1kHz_stereo_i_brokenid3.dff"
    )
    # Tag may be cut entirely or partially; parsing must not raise.
    if meta.id3 is not None:
        parse_id3(meta.id3)


def test_roundtrip_and_album_append():
    tag = Id3Tag()
    tag.set_text("TALB", "Some Album")
    tag.set_text("TIT2", "Tone")
    tag.append_to_album(" [352800]")  # -a behavior (reference src/main.rs:121-124)
    blob = tag.to_bytes()
    back = parse_id3(blob)
    assert back.get_text("TALB") == "Some Album [352800]"
    assert back.get_text("TIT2") == "Tone"


def test_vorbis_mapping():
    tag = Id3Tag()
    tag.set_text("TIT2", "Title")
    tag.set_text("TPE1", "Artist")
    tag.set_text("TALB", "Album")
    comments = dict(id3_to_vorbis_comments(tag))
    assert comments == {"TITLE": "Title", "ARTIST": "Artist", "ALBUM": "Album"}


def test_id3v22_read():
    """ID3v2.2 tags (3-char IDs, 3-byte sizes) read and upgrade to v2.3
    IDs — the reference's `id3` crate reads v2.2 (VERDICT r1 weak 8)."""
    def frame22(fid: bytes, text: str) -> bytes:
        data = b"\x00" + text.encode("latin-1")
        return fid + len(data).to_bytes(3, "big") + data

    body = (frame22(b"TT2", "Old Title") + frame22(b"TP1", "Old Artist")
            + frame22(b"TAL", "Old Album"))
    size = len(body)
    blob = (b"ID3" + bytes([2, 0, 0])
            + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                     (size >> 7) & 0x7F, size & 0x7F]) + body)
    tag = parse_id3(blob)
    assert tag is not None and not tag.truncated
    assert tag.get_text("TIT2") == "Old Title"
    assert tag.get_text("TPE1") == "Old Artist"
    assert tag.get_text("TALB") == "Old Album"
    # round-trips as a v2.3+ tag
    back = parse_id3(tag.to_bytes())
    assert back.get_text("TIT2") == "Old Title"


def test_id3v22_truncated_degrades():
    data = b"\x00Partial Ti"
    body = b"TT2" + (len(data) + 20).to_bytes(3, "big") + data
    size = len(body)
    blob = (b"ID3" + bytes([2, 0, 0])
            + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                     (size >> 7) & 0x7F, size & 0x7F]) + body)
    tag = parse_id3(blob)
    assert tag is not None and tag.truncated


def _v22_blob(body: bytes, flags: int = 0) -> bytes:
    size = len(body)
    return (b"ID3" + bytes([2, 0, flags])
            + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                     (size >> 7) & 0x7F, size & 0x7F]) + body)


def _frame22(fid: bytes, data: bytes) -> bytes:
    return fid + len(data).to_bytes(3, "big") + data


def test_id3v22_unknown_frames_dropped_not_invented():
    """Unmapped v2.2 frames must be DROPPED: an invented 4-char ID like
    'WXX?' is invalid v2.3 and aborts other parsers' frame loops,
    truncating everything after it in the re-serialized tag."""
    body = (_frame22(b"WXX", b"\x00desc\x00http://x")
            + _frame22(b"TT2", b"\x00Title")
            + _frame22(b"TAL", b"\x00Album"))
    tag = parse_id3(_v22_blob(body))
    assert tag.get_text("TIT2") == "Title"
    assert tag.get_text("TALB") == "Album"
    assert all(f.frame_id.isalnum() for f in tag.frames)
    # the round-tripped tag keeps every mapped frame
    back = parse_id3(tag.to_bytes())
    assert back.get_text("TALB") == "Album"


def test_id3v22_pic_converts_to_apic_layout():
    """PIC bodies (enc + 3-char format + type + desc\\0 + image) must be
    rewritten to APIC's layout (enc + MIME\\0 + type + desc\\0 + image)."""
    img = b"\xff\xd8fakejpegdata"
    pic = b"\x00" + b"JPG" + b"\x03" + b"cover\x00" + img
    tag = parse_id3(_v22_blob(_frame22(b"PIC", pic)))
    (fr,) = [f for f in tag.frames if f.frame_id == "APIC"]
    assert fr.data[0:1] == b"\x00"
    mime, rest = fr.data[1:].split(b"\x00", 1)
    assert mime == b"image/jpeg"
    assert rest == b"\x03" + b"cover\x00" + img


def test_pic_unknown_format_gets_generic_mime():
    """Blank/unknown PIC format fields must NOT produce malformed MIME
    strings like "image/" — readers reject those APIC frames (round-2
    advisor finding)."""
    from dsd2dxd_tpu.formats.id3 import _pic_to_apic

    for fmt in (b"\x00\x00\x00", b"XYZ"):
        out = _pic_to_apic(b"\x00" + fmt + b"\x03" + b"d\x00" + b"IMG")
        mime = out[1:].split(b"\x00", 1)[0]
        assert mime == b"application/octet-stream"


def test_apic_pictures_decodes_frames():
    from dsd2dxd_tpu.formats.id3 import Id3Frame, Id3Tag, apic_pictures

    img = b"\x89PNGfakepngpayload"
    apic = b"\x00" + b"image/png\x00" + b"\x03" + b"front cover\x00" + img
    tag = Id3Tag(frames=[Id3Frame("APIC", apic)])
    (pic,) = apic_pictures(tag)
    assert (pic.pic_type, pic.mime, pic.description) == (3, "image/png",
                                                        "front cover")
    assert pic.data == img


def test_apic_pictures_utf16_description():
    from dsd2dxd_tpu.formats.id3 import Id3Frame, Id3Tag, apic_pictures

    desc = "ジャケット".encode("utf-16")  # with BOM
    apic = (b"\x01" + b"image/jpeg\x00" + b"\x04" + desc + b"\x00\x00"
            + b"JPEGDATA")
    tag = Id3Tag(frames=[Id3Frame("APIC", apic)])
    (pic,) = apic_pictures(tag)
    assert pic.description == "ジャケット"
    assert pic.data == b"JPEGDATA"


def test_id3v22_compression_flag_skips_tag():
    """v2.2 flag 0x40 means whole-tag compression (no defined scheme):
    ignore the tag body instead of misparsing frame bytes as a v2.3
    extended header."""
    body = _frame22(b"TT2", b"\x00Title")
    tag = parse_id3(_v22_blob(body, flags=0x40))
    assert tag is not None and tag.frames == []


def _unsync(b: bytes) -> bytes:
    return b.replace(b"\xff", b"\xff\x00")


def test_v23_tag_level_unsync_deapplied():
    """An unsynchronised v2.3 tag (flag 0x80; 0x00 stuffed after every
    0xFF over the whole body) must parse to the original frames — the
    stuffed bytes corrupted binary payloads (APIC) and the loop desynced
    on non-syncsafe sizes, silently dropping the rest of the tag."""
    import struct

    img = b"\xff\xd8\xff\xe0" + bytes([0xFF, 0x00, 0x7F]) * 20
    apic = b"\x00image/jpeg\x00\x03cover\x00" + img
    frames = [(b"TIT2", b"\x00Tone \xff loud"), (b"APIC", apic)]
    body = b""
    for fid, data in frames:
        body += fid + struct.pack(">I", len(data)) + b"\x00\x00" + data
    stuffed = _unsync(body)
    blob = (b"ID3" + bytes([3, 0, 0x80])
            + bytes([(len(stuffed) >> 21) & 0x7F, (len(stuffed) >> 14) & 0x7F,
                     (len(stuffed) >> 7) & 0x7F, len(stuffed) & 0x7F])
            + stuffed)
    tag = parse_id3(blob)
    assert [f.frame_id for f in tag.frames] == ["TIT2", "APIC"]
    assert tag.frames[0].text() == "Tone \xff loud"
    assert tag.frames[1].data == apic


def test_v24_frame_unsync_and_dli_deapplied():
    """v2.4 per-frame unsync (format flag 0x02) and the data-length
    indicator (0x01) must both be undone, and the flag bits cleared so
    the re-serialized (v2.3-dialect) tag does not claim unsync."""
    import struct

    payload = b"\x00Year \xff 2024"
    stuffed = _unsync(payload)
    data = bytes([0, 0, 0, len(payload)]) + stuffed  # DLI + unsynced
    size = len(data)
    body = (b"TIT2"
            + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                     (size >> 7) & 0x7F, size & 0x7F])
            + struct.pack(">H", 0x03) + data)
    blob = (b"ID3" + bytes([4, 0, 0])
            + bytes([(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
                     (len(body) >> 7) & 0x7F, len(body) & 0x7F]) + body)
    tag = parse_id3(blob)
    assert tag.frames[0].data == payload
    assert tag.frames[0].flags & 0x03 == 0


def test_tyer_skipped_when_tdrc_present():
    """Tags upgraded v2.3->v2.4 keep TYER alongside TDRC; only the full
    TDRC timestamp may become DATE (duplicate DATE fields make players
    show the legacy year)."""
    tag = Id3Tag()
    tag.set_text("TDRC", "2024-05-01")
    tag.set_text("TYER", "2024")
    cm = dict(id3_to_vorbis_comments(tag))
    assert cm["DATE"] == "2024-05-01"
    assert [k for k, _ in id3_to_vorbis_comments(tag)].count("DATE") == 1


def test_v23_serialization_reencodes_utf8_text_frames():
    """text_frame builds encoding 3 (UTF-8), which exists only in
    ID3v2.4; to_bytes() on a v2.2/v2.3 tag must re-encode (latin-1 when
    it fits, else UTF-16 with BOM) or strict v2.3 readers reject the
    frame. v2.4 serialization keeps UTF-8."""
    tag = Id3Tag(version=(3, 0))
    tag.set_text("TALB", "Album")
    tag.set_text("TIT2", "Titél テ")  # not latin-1-encodable
    back = parse_id3(tag.to_bytes())
    assert back.version[0] == 3
    for fr in back.frames:
        if fr.frame_id.startswith("T"):
            assert fr.data[0] in (0, 1)  # v2.3-legal encodings only
    assert back.get_text("TALB") == "Album"
    assert back.get_text("TIT2") == "Titél テ"

    tag4 = Id3Tag(version=(4, 0))
    tag4.set_text("TIT2", "Titél テ")
    back4 = parse_id3(tag4.to_bytes())
    assert back4.frames[0].data[0] == 3  # v2.4 keeps UTF-8
    assert back4.get_text("TIT2") == "Titél テ"
