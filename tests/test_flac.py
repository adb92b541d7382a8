"""FLAC encoder (native C++) round-trip tests against the pure-Python
decoder oracle, plus the engine/CLI FLAC paths (SURVEY.md §4.3e: golden
re-parse of every written container, FLAC MD5)."""

import math

import numpy as np
import pytest

from dsd2dxd_tpu.formats.flac_decode import decode_flac

native = pytest.importorskip("dsd2dxd_tpu.native").lib
if native is None:
    pytest.skip("native extension unavailable", allow_module_level=True)


def encode(x: np.ndarray, rate=88200, bps=16, block=4096) -> bytes:
    enc = native.flac_new(rate, x.shape[1], bps, block)
    payload = b""
    for off in range(0, len(x), 3000):  # feed in odd-sized chunks
        native.flac_feed(enc, x[off:off + 3000])
        payload += native.flac_drain(enc)
    native.flac_finish(enc)
    payload += native.flac_drain(enc)
    hdr = native.flac_header(enc, True)
    native.flac_free(enc)
    return hdr + payload


def roundtrip(x, **kw):
    blob = encode(x, **kw)
    st = decode_flac(blob)
    np.testing.assert_array_equal(st.samples, x)
    assert st.md5_ok
    return st, blob


def _tone(n, channels, amp, bps, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    chans = []
    for c in range(channels):
        x = amp * np.sin(2 * np.pi * t / 39.7 + 0.3 * c)
        x = x + rng.normal(0, amp * 1e-3, n)
        chans.append(x)
    x = np.stack(chans, axis=1)
    lim = 1 << (bps - 1)
    return np.clip(np.round(x), -lim, lim - 1).astype(np.int32)


@pytest.mark.parametrize("channels", [6, 8])
def test_roundtrip_multichannel(channels):
    """FLAC carries up to 8 channels (5.1 DSF sources land here as 6);
    C!=2 must take the independent-channel path (no stereo decorrelation,
    flac.cc gates assignments on channels==2) and still round-trip
    bit-exactly with a passing MD5."""
    x = _tone(12000, channels, 1 << 21, 24, seed=3)
    st, blob = roundtrip(x, bps=24)
    assert st.channels == channels
    # vs the RAW stream size (bps/8 bytes/sample), not int32 nbytes —
    # the 4 B/sample bound was looser than VERBATIM and could not fail
    assert len(blob) < x.size * 3 * 0.9


@pytest.mark.parametrize("bps", [16, 20, 24])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_tonal(bps, channels):
    x = _tone(20000, channels, (1 << (bps - 2)), bps)
    st, blob = roundtrip(x, bps=bps)
    assert st.bits_per_sample == bps
    assert st.channels == channels
    # tonal content must actually compress, measured against the RAW
    # stream size (bps/8 bytes/sample) — int32 nbytes made this vacuous
    assert len(blob) < x.size * (bps // 8) * 0.9


def test_roundtrip_noise_and_extremes():
    rng = np.random.default_rng(1)
    lim = 1 << 23
    x = rng.integers(-lim, lim, size=(10000, 2), dtype=np.int32)
    x[:10, 0] = lim - 1
    x[:10, 1] = -lim
    _st, blob = roundtrip(x, bps=24)
    # incompressible noise must fall back to VERBATIM subframes: rice
    # coding has no size cap (k<=30 -> up to ~31 bits/sample), so the
    # stream must stay within TRUE raw size (3 B/sample at 24-bit) +
    # container overhead; the old int32-nbytes bound (4 B/sample) was
    # above even the rice worst case and could not catch the regression
    assert len(blob) < x.size * 3 * 1.02, len(blob) / (x.size * 3)


def test_threaded_encode_byte_identical(monkeypatch):
    """The persistent worker pool (DSDKIT_FLAC_THREADS override makes it
    exercisable on a 1-core box) must produce byte-identical output to
    the single-threaded encode — block fan-out only changes scheduling,
    never the stream."""
    import os

    # the ref encode must be genuinely serial even when the ambient env
    # carries a benchmarking override (CLAUDE.md workflow)
    monkeypatch.delitem(os.environ, "DSDKIT_FLAC_THREADS", raising=False)
    x = _tone(40000, 2, 6000, 16, seed=3)
    ref = encode(x)
    monkeypatch.setitem(os.environ, "DSDKIT_FLAC_THREADS", "4")
    got = encode(x)
    assert got == ref


def test_flac_new_rejects_out_of_contract_params():
    from dsd2dxd_tpu.utils.errors import ConfigError

    for bad in [(88200, 2, 32, 4096),   # bps>24: int32 side-channel UB
                (88200, 2, 2, 4096),    # bps<4: below spec
                (88200, 9, 16, 4096),   # >8 channels
                (88200, 0, 16, 4096),
                (0, 2, 16, 4096),
                (88200, 2, 16, 8)]:     # block_size below spec floor
        with pytest.raises(ConfigError):
            native.flac_new(*bad)


def test_njad_quantize_rejects_channel_mismatch():
    from dsd2dxd_tpu.utils.errors import ConfigError

    st = native.njad_new(2)
    x = np.zeros((16, 3), dtype=np.float32)  # 3 columns vs 2-ch handle
    with pytest.raises(ConfigError):
        native.njad_quantize(st, x, 24)
    native.njad_free(st)


def test_roundtrip_sparse_spikes_hit_rice_escape():
    """Near-silence with rare full-scale spikes: partitions adapt k ~ 0,
    so each spike's quotient is ~2^23 — the rice writer's chunked-unary
    slow path and its up-front capacity bound (flac.cc write_rice) must
    both hold. Would overflow/corrupt the stream if either regressed."""
    rng = np.random.default_rng(7)
    x = rng.integers(-2, 3, size=(12000, 2), dtype=np.int32)
    spikes = rng.integers(0, len(x), size=24)
    x[spikes, 0] = (1 << 23) - 1
    x[spikes[:12], 1] = -(1 << 23)
    roundtrip(x, bps=24)


def test_roundtrip_constant_and_silence():
    x = np.zeros((9000, 2), dtype=np.int32)
    x[4096:8192] = 1234
    st, blob = roundtrip(x)
    assert len(blob) < 1500  # constant blocks are nearly free


def test_partial_final_block():
    x = _tone(4096 + 777, 2, 8000, 16)
    roundtrip(x)


def test_rate_code_from_streaminfo():
    # 352800 has no frame-header rate code; decoder must use STREAMINFO
    x = _tone(6000, 2, 8000, 16)
    st, _ = roundtrip(x, rate=352800)
    assert st.sample_rate == 352800


def test_vorbis_comments_from_id3(tmp_path):
    from dsd2dxd_tpu.containers.flac import FlacWriter
    from dsd2dxd_tpu.formats.id3 import Id3Frame, Id3Tag

    tag = Id3Tag()
    tag.set_text("TIT2", "1kHz Test Tone DSD64")
    tag.set_text("TPE1", "clone206")
    tag.set_text("TALB", "Greatest Test Tone Hits")
    x = _tone(5000, 2, 8000, 16)
    p = tmp_path / "t.flac"
    with open(p, "wb") as f:
        w = FlacWriter(f, 2, 88200, 16, id3=tag.to_bytes())
        w.write(x)
        w.finalize()
    st = decode_flac(p.read_bytes())
    np.testing.assert_array_equal(st.samples, x)
    assert st.md5_ok
    assert st.comments.get("TITLE") == "1kHz Test Tone DSD64"
    assert st.comments.get("ARTIST") == "clone206"
    assert st.comments.get("ALBUM") == "Greatest Test Tone Hits"


def test_compression_ratio_floor(tmp_path):
    """Pin a compression-ratio floor so the LPC-order-8 speed choice
    stays a measured trade (VERDICT r2 item 6): a 24-bit tone must
    compress far below VERBATIM, pink-ish noise must still beat it."""
    from dsd2dxd_tpu.containers.flac import FlacWriter

    rng = np.random.default_rng(0)
    n = 352800  # 1 s at 352.8k
    t = np.arange(n) / 352800.0
    tone = (0.5 * np.sin(2 * np.pi * 1000.0 * t) * (1 << 23)
            ).astype(np.int32)
    tone = np.stack([tone, np.roll(tone, 7)], axis=1)
    # pink-ish: integrated white noise, high-pass bounded
    w = rng.normal(0, 1.0, size=n)
    pink = np.cumsum(w) - np.linspace(0, np.sum(w), n)
    pink = pink / np.max(np.abs(pink)) * 0.4 * (1 << 23)
    pink = np.stack([pink, pink * 0.9], axis=1).astype(np.int32)

    def ratio(x):
        p = tmp_path / "r.flac"
        with open(p, "wb") as f:
            wtr = FlacWriter(f, 2, 352800, 24)
            wtr.write(x)
            wtr.finalize()
        st = decode_flac(p.read_bytes())
        assert st.md5_ok
        return p.stat().st_size / (x.size * 3)

    r_tone = ratio(tone)
    r_pink = ratio(pink)
    assert r_tone < 0.45, r_tone
    assert r_pink < 0.75, r_pink


@pytest.mark.parametrize("bps,channels,block,kind", [
    (4, 1, 16, "tone"),        # spec floor bps + minimum block size
    (8, 3, 192, "mixed"),      # odd channel count, tiny blocks
    (12, 5, 1152, "noise"),    # odd bps, 5ch
    (17, 7, 4096, "mixed"),    # non-byte-aligned bps, 7ch
    (23, 2, 32768, "tone"),    # maximum block size
    (24, 8, 576, "noise"),     # max channels, small blocks
])
def test_roundtrip_parameter_corners(bps, channels, block, kind):
    """Seeded sweep over encoder-contract corners the targeted tests
    don't hit (odd bit depths, odd channel counts, spec-floor and
    spec-ceiling block sizes): every combination must round-trip
    bit-exactly with a passing MD5 through the oracle decoder."""
    rng = np.random.default_rng(bps * 100 + channels)
    n = 3 * block + 257  # several blocks + a ragged tail
    lim = 1 << (bps - 1)
    if kind == "tone":
        x = _tone(n, channels, max(1, lim >> 2), bps, seed=channels)
    elif kind == "noise":
        x = rng.integers(-lim, lim, size=(n, channels), dtype=np.int32)
    else:  # mixed: tone + noise bursts + silence
        x = _tone(n, channels, max(1, lim >> 3), bps, seed=channels)
        x[n // 3:n // 2] = rng.integers(-lim, lim,
                                        size=(n // 2 - n // 3, channels),
                                        dtype=np.int32)
        x[2 * n // 3:] = 0
    st, _ = roundtrip(x, bps=bps, block=block)
    assert st.bits_per_sample == bps
    assert st.channels == channels


def test_lpc_order_selection(monkeypatch):
    """Per-block LPC order selection (flac.cc lpc_analyze): the order is
    chosen from the Levinson recursion's own per-order error terms up to
    the DSDKIT_FLAC_ORDER cap (default 8). Pins three properties:
    (a) every cap round-trips bit-exactly with a passing MD5,
    (b) on AR(12) material — which order 8 cannot model — cap 12 must
        compress measurably better than cap 8,
    (c) on AR(2) material the selector must NOT pay for the headroom:
        cap 8 lands within 1% of cap 2 (it picks the low order itself).
    """
    import os

    from scipy import signal

    n = 60000

    def ar_material(poles, seed):
        r = np.random.default_rng(seed)
        # stable AR filter: poles inside the unit circle
        z = 0.97 * np.exp(1j * np.linspace(0.1, 2.6, poles // 2))
        a = np.real(np.poly(np.concatenate([z, np.conj(z)])))
        x = signal.lfilter([1.0], a, r.normal(0, 1.0, n))
        x = x / np.max(np.abs(x)) * (1 << 21)
        return np.stack([x, np.roll(x, 13)], axis=1).astype(np.int32)

    def size_at(cap, x):
        monkeypatch.setitem(os.environ, "DSDKIT_FLAC_ORDER", str(cap))
        blob = encode(x, bps=24)
        st = decode_flac(blob)
        np.testing.assert_array_equal(st.samples, x)
        assert st.md5_ok
        return len(blob)

    ar12 = ar_material(12, seed=5)
    s8 = size_at(8, ar12)
    s12 = size_at(12, ar12)
    s16 = size_at(16, ar12)
    assert s12 < s8 * 0.995, (s8, s12)
    assert s16 <= s12 * 1.005, (s12, s16)

    ar2 = ar_material(2, seed=6)
    s2_low = size_at(2, ar2)
    s2_cap8 = size_at(8, ar2)
    assert s2_cap8 <= s2_low * 1.01, (s2_low, s2_cap8)

    # out-of-contract values are ignored (fall back to default 8):
    # the stream must be byte-count-identical to the cap-8 encode of
    # the same material, not merely round-trippable
    monkeypatch.setitem(os.environ, "DSDKIT_FLAC_ORDER", "99")
    blob = encode(ar12, bps=24)
    st = decode_flac(blob)
    assert st.md5_ok
    assert len(blob) == s8, (len(blob), s8)
    monkeypatch.delitem(os.environ, "DSDKIT_FLAC_ORDER", raising=False)


def test_apic_artwork_becomes_picture_block(tmp_path):
    """Embedded art must survive into FLAC as a PICTURE block (type 6),
    byte-identical — VERDICT r2 missing item 2 ("tags copied where
    possible", reference README.md:7). Source tag uses the v2.2 PIC
    dialect, the DSF path the fixtures exercise."""
    from dsd2dxd_tpu.formats.dsd_types import (
        DitherType, FilterType, OutputType)
    from dsd2dxd_tpu.formats.dsf import write_dsf
    from dsd2dxd_tpu.ops.dsm import synth_tone_dsd
    from dsd2dxd_tpu.pipeline.engine import Converter

    img = b"\xff\xd8\xff\xe0" + bytes(range(256)) * 4  # fake JPEG
    pic = b"\x00" + b"JPG" + b"\x03" + b"cover\x00" + img
    body = b"PIC" + len(pic).to_bytes(3, "big") + pic
    size = len(body)
    id3 = (b"ID3" + bytes([2, 0, 0])
           + bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F]) + body)
    src = tmp_path / "art.dsf"
    planes = synth_tone_dsd(1000.0, 0.1, 2_822_400, amplitude=0.4, channels=2)
    write_dsf(src, planes, 2_822_400, lsb_first=True, id3=id3)
    conv = Converter.from_container(
        bit_depth=24, output=OutputType.FLAC, level_db=0.0,
        output_rate=352800, out_dir=tmp_path, dither=DitherType.TPDF,
        filt=FilterType.EQUIRIPPLE, append_rate=False, base_dir=tmp_path,
        input_path=src)
    conv.do_conversion()
    st = decode_flac((tmp_path / "art.flac").read_bytes())
    assert st.md5_ok
    (ptype, mime, desc, data) = st.pictures[0]
    assert (ptype, mime, desc) == (3, "image/jpeg", "cover")
    assert data == img


def test_oversized_picture_measured_in_encoded_bytes(tmp_path):
    """The 16 MiB PICTURE guard must measure the ENCODED body: a CJK
    description whose str length looks small expands 3x in UTF-8 and can
    push a legal-looking image over the 24-bit block limit — that must
    drop the artwork with a warning, not crash header writing with
    OverflowError (round-3 review finding)."""
    import io

    from dsd2dxd_tpu.containers.flac import FlacWriter, _picture_body
    from dsd2dxd_tpu.formats.id3 import ApicPicture

    # str lengths sum to ~15.5M (< 0xFFFFFF+pad would have passed the old
    # guard) but the UTF-8 description alone encodes to ~2.4 MiB
    pic = ApicPicture(3, "image/jpeg", "世" * 800_000,
                      b"\xff" * (14 * 1024 * 1024))
    assert len(_picture_body(pic)) > 0xFFFFFF
    w = FlacWriter(io.BytesIO(), 2, 88200, 24)
    w._pictures = [pic]
    w._comments = []
    w.f = io.BytesIO()
    w._write_header()  # must not raise; oversized art dropped
    assert w._pictures == []


def test_partial_tile_peak_not_int_magnitude(tmp_path):
    """_run's returned stream peak is documented linear/post-level; with
    an int-frames sink (FLAC) and a partial final tile the recompute must
    NOT replace the kernel's normalized peak with a raw int32 magnitude
    (round-3 review finding: gate on float output)."""
    from dsd2dxd_tpu.formats.dsd_types import (
        DitherType, FilterType, OutputType)
    from dsd2dxd_tpu.formats.dsf import write_dsf
    from dsd2dxd_tpu.ops.dsm import synth_tone_dsd
    from dsd2dxd_tpu.pipeline.engine import Converter

    planes = synth_tone_dsd(1000.0, 0.11, 2_822_400, amplitude=0.4,
                            channels=2)
    src = tmp_path / "p.dsf"
    write_dsf(src, planes, 2_822_400, lsb_first=True)
    conv = Converter.from_container(
        bit_depth=24, output=OutputType.FLAC, level_db=0.0,
        output_rate=352800, out_dir=tmp_path, dither=DitherType.TPDF,
        filt=FilterType.EQUIRIPPLE, append_rate=False, base_dir=tmp_path,
        input_path=src)
    frames = []
    peak = conv._run(None, None, frames.append)
    assert frames and frames[-1].dtype == np.int32
    assert 0.0 < peak < 2.0  # normalized, not ~2^23


def test_decode_rejects_truncated_picture_block():
    """A PICTURE block whose declared field lengths overrun its body must
    raise the decoder's ValueError contract, not struct.error
    (round-3 review finding)."""
    x = _tone(6000, 2, 1 << 13, 16)
    blob = bytearray(encode(x))
    assert blob[:4] == b"fLaC"
    # STREAMINFO header: clear the last-block bit, then splice in a lying
    # PICTURE block (declares a 100-byte body, provides 8) marked last.
    blob[4] &= 0x7F
    si_size = int.from_bytes(blob[5:8], "big")
    insert_at = 8 + si_size
    bad = bytes([0x80 | 6]) + (100).to_bytes(3, "big") + b"\x00" * 8
    blob[insert_at:insert_at] = bad
    with pytest.raises(ValueError):
        decode_flac(bytes(blob))


def test_njad_quantizer_basic():
    x = (0.5 * np.sin(2 * np.pi * np.arange(30000) / 47.3)).astype(np.float32)
    x = np.stack([x, x * 0.9], axis=1)
    st = native.njad_new(2)
    got = native.njad_quantize(st, x, 24)
    native.njad_free(st)
    # quantization error bounded by 1 LSB (floor/ceil choice)
    err = got.astype(np.float64) - x.astype(np.float64) * 2 ** 23
    assert np.abs(err).max() <= 1.0 + 1e-6
    # deterministic: same input, same state -> same output
    st2 = native.njad_new(2)
    got2 = native.njad_quantize(st2, x, 24)
    native.njad_free(st2)
    np.testing.assert_array_equal(got, got2)


_TIE_EPS = 1e-9  # FMA-vs-plain double divergence is a few ulps of O(1)


def _njad_oracle(x: np.ndarray, bits: int,
                 arbiter: np.ndarray | None = None) -> np.ndarray:
    """Pure-Python mirror of native/src/njad.cc with leading digits
    computed by a plain divide loop — an independent oracle for the
    table-guided integer fast path (a round-3 bug made
    leading_digit_ll(10..15, 100..127, ...) return 10..19, silently
    indexing the histogram out of bounds; this test pins against that
    class of regression). Same Benford constants, same scaled-score
    comparison, same decay. The native build compiles the score terms
    with FMA contraction (-O3 -march=native), so scores can differ from
    pure doubles by a few ulps: where |slo - shi| < _TIE_EPS the
    decision is a coin-flip between roundings and the oracle defers to
    `arbiter` (the native output) to keep state in lockstep; clear
    decisions must match exactly."""
    kb = [0.0, 0.301029995663981, 0.176091259055681, 0.124938736608300,
          0.096910013008056, 0.079181246047625, 0.066946789630613,
          0.057991946977687, 0.051152522447381, 0.045757490560675]
    frames, channels = x.shape
    counts = [[0.0] * 10 for _ in range(channels)]
    totals = [0.0] * channels
    lim = 1 << (bits - 1)
    scale = float(lim)

    def digit(v: float) -> int:
        a = abs(int(v))
        if a == 0:
            return 0
        while a >= 10:
            a //= 10
        return a

    def score(c: int, d: int) -> float:
        total = totals[c] + (1.0 if d > 0 else 0.0)
        if total <= 0.0:
            return 0.0
        return sum(abs((counts[c][i] + (1.0 if i == d else 0.0)) / total
                       - kb[i]) for i in range(1, 10))

    out = np.empty((frames, channels), dtype=np.int32)
    for i in range(frames):
        for c in range(channels):
            xs = float(x[i, c]) * scale
            lo = math.floor(xs)
            hi = lo + 1.0
            dlo, dhi = digit(lo), digit(hi)
            if dlo > 0 and dhi > 0:
                tp = totals[c] + 1.0
                e = [counts[c][k] - kb[k] * tp for k in range(10)]
                s0 = sum(abs(e[k]) for k in range(1, 10))
                slo = s0 - abs(e[dlo]) + abs(e[dlo] + 1.0)
                shi = s0 - abs(e[dhi]) + abs(e[dhi] + 1.0)
            else:
                slo, shi = score(c, dlo), score(c, dhi)
            if (arbiter is not None and abs(slo - shi) < _TIE_EPS
                    and arbiter[i, c] in (lo, hi)):
                take_lo = arbiter[i, c] == lo
            else:
                take_lo = slo <= shi
            pick, dpick = (lo, dlo) if take_lo else (hi, dhi)
            if dpick > 0:
                counts[c][dpick] += 1.0
                totals[c] += 1.0
                if totals[c] > 1024.0:
                    for k in range(1, 10):
                        counts[c][k] *= 0.5
                    totals[c] *= 0.5
            out[i, c] = min(max(int(round(pick)), -lim), lim - 1)
    return out


def test_njad_matches_python_oracle():
    rng = np.random.default_rng(7)
    n = 4000
    # mix of quiet (small ints, exercising the 10..19/100..127 digit
    # ranges) and loud material, plus exact-integer landings
    x = np.concatenate([
        1e-3 * rng.standard_normal(n // 2),
        0.9 * np.sin(2 * np.pi * np.arange(n // 2) / 33.7),
    ]).astype(np.float32)
    x = np.stack([x, np.roll(x, 13)], axis=1)
    st = native.njad_new(2)
    got = native.njad_quantize(st, x, 24)
    native.njad_free(st)
    np.testing.assert_array_equal(got, _njad_oracle(x, 24, arbiter=got))
    # 16-bit hits the small-candidate ranges even harder
    st = native.njad_new(2)
    got16 = native.njad_quantize(st, x, 16)
    native.njad_free(st)
    np.testing.assert_array_equal(got16, _njad_oracle(x, 16, arbiter=got16))


def test_njad_near_silence_memo_matches_oracle():
    """Digital silence and sub-LSB material drive the native encoder's
    memoized near-silence branch (njad.cc: a candidate is 0, the
    decision depends only on the histogram and is cached on a version
    stamp). Interleaving tone bursts between the silence runs bumps the
    histogram so the memo must invalidate and re-derive; the
    un-memoized Python oracle pins byte-identity across all of it."""
    rng = np.random.default_rng(3)
    lsb24 = 2.0 ** -23
    seg = 400
    parts = [
        np.zeros(seg),                                   # lo == 0, hi == 1
        0.7 * np.sin(2 * np.pi * np.arange(seg) / 19.3),  # histogram churn
        0.4 * lsb24 * np.abs(rng.standard_normal(seg)),   # xs in (0, 1)
        -0.4 * lsb24 * np.abs(rng.standard_normal(seg)),  # lo == -1, hi == 0
        np.zeros(seg),                                    # memo hit run
        0.3 * np.sin(2 * np.pi * np.arange(seg) / 7.1),   # churn again
        np.zeros(seg),                                    # re-derive + hit
    ]
    x = np.concatenate(parts).astype(np.float32)
    x = np.stack([x, np.roll(x, seg // 2)], axis=1)
    for bits in (24, 16):
        st = native.njad_new(2)
        got = native.njad_quantize(st, x, bits)
        native.njad_free(st)
        np.testing.assert_array_equal(
            got, _njad_oracle(x, bits, arbiter=got))


def test_njad_rejects_over_16_channels():
    """>16 channels would alias onto ch[0]'s Benford histogram if clamped;
    the native layer rejects and the loader raises instead."""
    from dsd2dxd_tpu.utils.errors import ConfigError

    with pytest.raises(ConfigError):
        native.njad_new(17)
    with pytest.raises(ConfigError):
        native.njad_new(0)


def test_engine_baseline3_dsd128_flac_20bit_njad(tmp_path):
    """BASELINE.md config 3: DSD128 .dsf -> 88.2k FLAC, 20-bit, NJAD."""
    from dsd2dxd_tpu.formats.dsd_types import (
        DitherType, FilterType, OutputType)
    from dsd2dxd_tpu.formats.dsf import write_dsf
    from dsd2dxd_tpu.ops.dsm import synth_tone_dsd
    from dsd2dxd_tpu.pipeline.engine import Converter

    src = tmp_path / "tone128.dsf"
    planes = synth_tone_dsd(1000.0, 0.3, 5_644_800, amplitude=0.5, channels=2)
    write_dsf(src, planes, 5_644_800, lsb_first=True)
    conv = Converter.from_container(
        bit_depth=20, output=OutputType.FLAC, level_db=0.0, output_rate=88200,
        out_dir=tmp_path, dither=DitherType.NJAD, filt=FilterType.EQUIRIPPLE,
        append_rate=False, base_dir=tmp_path, input_path=src)
    conv.do_conversion()
    st = decode_flac((tmp_path / "tone128.flac").read_bytes())
    assert st.md5_ok
    assert (st.sample_rate, st.channels, st.bits_per_sample) == (88200, 2, 20)
    x = st.samples[3000:, 0].astype(np.float64) / 2 ** 19
    rms = np.sqrt(np.mean(x ** 2))
    assert abs(rms * np.sqrt(2) - 0.5) < 0.01


def test_flac_writer_close_is_idempotent_and_covers_abort(tmp_path):
    """A conversion error between construction and finalize must not
    leak the native encoder (and its worker pool): close() releases it,
    is idempotent, and is safe after finalize() too (the engine calls
    it belt-and-braces on every exit path)."""
    import io

    from dsd2dxd_tpu.containers.flac import FlacWriter

    # abort path: never finalized
    w = FlacWriter(io.BytesIO(), 2, 88200, 24)
    w.write(np.zeros((128, 2), dtype=np.int32))
    w.close()
    w.close()  # idempotent
    assert w._enc is None
    # normal path: finalize frees, close after is a no-op
    buf = io.BytesIO()
    w2 = FlacWriter(buf, 2, 88200, 24)
    w2.write(np.zeros((128, 2), dtype=np.int32))
    w2.finalize()
    w2.close()
    assert w2._enc is None
    from dsd2dxd_tpu.formats.flac_decode import decode_flac
    decoded = decode_flac(buf.getvalue())
    assert decoded.md5_ok


def test_njad_threaded_byte_identical(monkeypatch):
    """Channel-parallel NJAD (DSDKIT_NJAD_THREADS override makes the
    threaded path exercisable on a 1-core box) must be byte-identical
    to the serial walk: channels never share feedback state, so the
    per-channel thread split only changes scheduling. Covers state
    carry across multiple quantize calls too."""
    import os

    rng = np.random.default_rng(7)
    # two tiles > the 4096-frame threading threshold, distinct channels
    tiles = [
        np.stack([0.4 * np.sin(2 * np.pi * np.arange(20000) / 37.1),
                  rng.uniform(-0.6, 0.6, 20000)], axis=1).astype(np.float32)
        for _ in range(2)
    ]
    monkeypatch.delitem(os.environ, "DSDKIT_NJAD_THREADS", raising=False)
    monkeypatch.setitem(os.environ, "DSDKIT_NJAD_THREADS", "1")
    st = native.njad_new(2)
    ref = [native.njad_quantize(st, t, 24) for t in tiles]
    native.njad_free(st)
    monkeypatch.setitem(os.environ, "DSDKIT_NJAD_THREADS", "4")
    st = native.njad_new(2)
    got = [native.njad_quantize(st, t, 24) for t in tiles]
    native.njad_free(st)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)


def test_njad_digit_variants_bit_identical(monkeypatch):
    """digit_pair has two compiled forms (integer divide, default;
    threshold ladder, DSDKIT_NJAD_DIGIT=ladder — measured slower under
    the feedback loop but kept exercisable). They must agree everywhere,
    especially at digit boundaries (99->100, 999->1000, -100->-99 and
    the decade-drop cases). Values < 2^24 survive the float32 input
    exactly, so the boundary set reaches the quantizer unrounded."""
    import os

    bounds = []
    for p10 in [1, 10, 100, 1000, 10**4, 10**5, 10**6, 10**7]:
        for d in range(1, 10):
            for off in (-2, -1, 0, 1, 2):
                v = d * p10 + off
                if 0 < v < 2 ** 24:
                    bounds.extend([v, -v])
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        np.array(bounds, dtype=np.int64),
        rng.integers(-2 ** 23, 2 ** 23, 20000),
        np.zeros(64, dtype=np.int64),  # silence memo path
    ])
    x = (vals.astype(np.float64) / 2 ** 31).astype(np.float32)
    x = np.stack([x, x[::-1]], axis=1)

    monkeypatch.delitem(os.environ, "DSDKIT_NJAD_DIGIT", raising=False)
    st = native.njad_new(2)
    ref = native.njad_quantize(st, x, 32)
    native.njad_free(st)
    monkeypatch.setitem(os.environ, "DSDKIT_NJAD_DIGIT", "ladder")
    st = native.njad_new(2)
    got = native.njad_quantize(st, x, 32)
    native.njad_free(st)
    np.testing.assert_array_equal(ref, got)
