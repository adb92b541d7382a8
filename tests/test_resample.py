"""Device DSP core tests: streaming-vs-oracle equivalence, dither and
quantization semantics, end-to-end signal fidelity (SURVEY.md §4.3 test
plan items a-c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsd2dxd_tpu.filters.design import Stage, chain_ratio, get_chain
from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
from dsd2dxd_tpu.ops.dsm import synth_tone_dsd
from dsd2dxd_tpu.ops.resample import (
    StepConfig,
    init_hists,
    make_step,
    quantize_int,
    stage_apply_streaming,
    stage_history_len,
    unpack_bits,
    upfirdn_reference,
)


def test_unpack_bits_msb():
    x = jnp.asarray(np.array([[0b10110001, 0b00000001]], dtype=np.uint8))
    got = np.asarray(unpack_bits(x))
    expect = np.array([1, -1, 1, 1, -1, -1, -1, 1, -1, -1, -1, -1, -1, -1, -1, 1],
                      dtype=np.float32)
    np.testing.assert_array_equal(got[0], expect)


@pytest.mark.parametrize("L,M,n", [(1, 2, 14), (1, 2, 48), (1, 7, 52),
                                   (5, 21, 60), (10, 21, 44), (20, 21, 64),
                                   (1, 8, 96)])
def test_streaming_matches_upfirdn(L, M, n):
    rng = np.random.default_rng(0)
    taps = rng.standard_normal(n)
    st = Stage(taps=taps, L=L, M=M)
    h = stage_history_len(st)
    S = 21 * M * 4
    x = rng.standard_normal((2, S * 5))
    ref = upfirdn_reference(taps, x, L, M)
    tapsj = jnp.asarray(taps, dtype=jnp.float32)
    hist = jnp.zeros((2, h), dtype=jnp.float32)
    outs = []
    for t in range(5):
        y, hist = stage_apply_streaming(
            jnp.asarray(x[:, t * S:(t + 1) * S], dtype=jnp.float32),
            hist, st, tapsj)
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)
    assert got.shape == ref.shape
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert err < 1e-5


def test_quantize_semantics():
    x = jnp.asarray([0.0, 0.5, -1.0, 1.0, 2.0], dtype=jnp.float32)
    got = np.asarray(quantize_int(x, 16, None))
    np.testing.assert_array_equal(got, [0, 16384, -32768, 32767, 32767])
    got20 = np.asarray(quantize_int(jnp.asarray([1.0, -1.0]), 20, None))
    np.testing.assert_array_equal(got20, [2**19 - 1, -(2**19)])


def test_tpdf_dither_statistics():
    cfg_shape = (2, 100_000)
    from dsd2dxd_tpu.ops.resample import _dither_noise

    d = np.asarray(_dither_noise(DitherType.TPDF, jax.random.PRNGKey(0),
                                 cfg_shape, jnp.float32))
    assert abs(d.mean()) < 0.01
    assert abs(d.std() - 1 / np.sqrt(6)) < 0.01  # TPDF over ±1 LSB
    assert np.abs(d).max() <= 1.0
    r = np.asarray(_dither_noise(DitherType.RECTANGULAR, jax.random.PRNGKey(1),
                                 cfg_shape, jnp.float32))
    assert np.abs(r).max() <= 0.5
    assert _dither_noise(DitherType.NONE, jax.random.PRNGKey(2),
                         cfg_shape, jnp.float32) is None


@pytest.fixture(scope="module")
def tone_planes():
    return synth_tone_dsd(1000.0, 0.5, 2_822_400, amplitude=0.5, channels=1)


def _run_chain_step(planes, chain, cfg, n_tiles=1):
    step = make_step(chain, cfg)
    hists = init_hists(chain, cfg.channels)
    key = jax.random.PRNGKey(7)
    outs, peaks = [], []
    for t in range(n_tiles):
        sl = planes[:, t * cfg.tile_bytes:(t + 1) * cfg.tile_bytes]
        out, peak, hists = step(jnp.asarray(sl), hists,
                                jax.random.fold_in(key, t))
        outs.append(np.asarray(out))
        peaks.append(float(peak))
    return np.concatenate(outs, axis=0), max(peaks)


def test_full_chain_f32_error_below_dither_floor(tone_planes):
    """f32 device arithmetic vs f64 host oracle: numerical noise must stay
    below the 24-bit TPDF dither floor (RMS 0.41 LSB)."""
    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    bits = np.unpackbits(tone_planes, axis=1).astype(np.float64) * 2 - 1
    y = bits
    for s in chain:
        y = upfirdn_reference(s.taps, y, s.L, s.M)
    cfg = StepConfig(channels=1, tile_bytes=tone_planes.shape[1],
                     bit_depth=32, dither=DitherType.NONE, level_db=0.0)
    got, peak = _run_chain_step(tone_planes, chain, cfg)
    got = got[:, 0].astype(np.float64)
    ref = y[0][:len(got)]
    err = got - ref
    lsb24 = 2.0 ** -23
    assert np.sqrt(np.mean(err ** 2)) < 0.41 * lsb24
    assert np.abs(err).max() < 4 * lsb24
    assert abs(peak - np.abs(got).max()) < 1e-6


def test_tone_roundtrip_24bit(tone_planes):
    """1 kHz tone fixture oracle (SURVEY.md §4.3a): frequency, amplitude,
    and the noise floor of the synthesized DSD source."""
    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    cfg = StepConfig(channels=1, tile_bytes=tone_planes.shape[1],
                     bit_depth=24, dither=DitherType.TPDF, level_db=0.0)
    pcm, _ = _run_chain_step(tone_planes, chain, cfg)
    x = pcm[20000:150000, 0].astype(np.float64) / 2 ** 23
    n = len(x)
    X = np.fft.rfft(x * np.hanning(n))
    freqs = np.fft.rfftfreq(n, 1 / 352800)
    assert abs(freqs[np.argmax(np.abs(X))] - 1000.0) < 5.0
    rms = np.sqrt(np.mean(x ** 2))
    assert abs(rms * np.sqrt(2) - 0.5) < 0.01


def test_level_scaling_linearity(tone_planes):
    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    base = StepConfig(channels=1, tile_bytes=tone_planes.shape[1],
                      bit_depth=32, dither=DitherType.NONE, level_db=0.0)
    up = StepConfig(channels=1, tile_bytes=tone_planes.shape[1],
                    bit_depth=32, dither=DitherType.NONE, level_db=-6.0)
    y0, p0 = _run_chain_step(tone_planes, chain, base)
    y1, p1 = _run_chain_step(tone_planes, chain, up)
    gain = 10 ** (-6.0 / 20.0)
    np.testing.assert_allclose(y1, y0 * gain, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(p1, p0 * gain, rtol=1e-4)


def test_impulse_response_extraction():
    """Impulse fixture oracle (SURVEY.md §4.3b): a single flipped bit in
    the DSD idle pattern must reproduce the cascade impulse response."""
    from dsd2dxd_tpu.ops.dsm import synth_impulse_dsd

    planes = synth_impulse_dsd(n_bytes=32768, toggle_byte=16384)
    chain = get_chain(FilterType.DSD2PCM, DsdRate.DSD64, 352800)
    cfg = StepConfig(channels=1, tile_bytes=planes.shape[1],
                     bit_depth=32, dither=DitherType.NONE, level_db=0.0)
    got, _ = _run_chain_step(planes, chain, cfg)
    got = got[:, 0].astype(np.float64)
    # Oracle: same bit pattern through f64 upfirdn
    bits = np.unpackbits(planes, axis=1).astype(np.float64) * 2 - 1
    ref = upfirdn_reference(chain[0].taps, bits, 1, 8)[0][:len(got)]
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # The impulse (vs the idle background) must appear as the decimated taps
    delta = ref - np.median(ref)
    assert np.abs(delta).max() > 0.5 * np.abs(chain[0].taps).max()
