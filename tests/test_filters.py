"""Filter-bank design contract tests (SURVEY.md §2.5 matrix; reference
README.md:128-134, 252-254)."""

import numpy as np
import pytest
from scipy import signal

from dsd2dxd_tpu.filters.design import chain_input_multiple, chain_ratio, get_chain
from dsd2dxd_tpu.formats.dsd_types import (
    DsdRate,
    FilterType,
    check_filter_choice,
    valid_output_rates,
)

ALL_E_CONFIGS = [
    (FilterType.EQUIRIPPLE, r, out)
    for r in DsdRate
    for out in valid_output_rates(r)
]
BANK_CONFIGS = (
    [(FilterType.XLD, DsdRate.DSD64, o) for o in (88200, 176400, 352800)]
    + [(FilterType.DSD2PCM, DsdRate.DSD64, 352800)]
    + [(FilterType.CHEBYSHEV, DsdRate.DSD128, o) for o in (88200, 176400, 352800)]
)


def cascade_response(chain, in_hz, freqs):
    """Cascade magnitude response at analog frequencies, including the 1/L
    gain of zero-stuffed interpolation (freqz is 2π-periodic, which models
    post-decimation folding automatically)."""
    H = np.ones(len(freqs), dtype=complex)
    fs = in_hz
    for s in chain:
        w = 2 * np.pi * np.asarray(freqs) / (fs * s.L)
        _, h = signal.freqz(s.taps, worN=w)
        H *= h / s.L
        fs = fs * s.L / s.M
    return H


@pytest.mark.parametrize("filt,in_rate,out_hz", ALL_E_CONFIGS + BANK_CONFIGS)
def test_chain_structure(filt, in_rate, out_hz):
    chain = get_chain(filt, in_rate, out_hz)
    from fractions import Fraction

    assert chain_ratio(chain) == Fraction(out_hz, in_rate.hz)
    for s in chain:
        # Reference contract: symmetric, even tap count (README.md:252-254)
        assert s.n_taps % 2 == 0
        np.testing.assert_allclose(s.taps, s.taps[::-1], rtol=0, atol=1e-12)
    assert chain_input_multiple(chain) % 1 == 0


@pytest.mark.parametrize("filt,in_rate,out_hz", ALL_E_CONFIGS + BANK_CONFIGS)
def test_passband_flat_and_unity(filt, in_rate, out_hz):
    chain = get_chain(filt, in_rate, out_hz)
    f = np.linspace(10.0, 20_000.0, 64)
    mag_db = 20 * np.log10(np.abs(cascade_response(chain, in_rate.hz, f)))
    # Flat to 20 kHz within a small fraction of a dB; D (the deliberately
    # short Gesemann-style bank) gets a looser budget.
    tol = 0.01 if filt is not FilterType.DSD2PCM else 0.05
    assert np.max(np.abs(mag_db)) < tol


@pytest.mark.parametrize("filt,in_rate,out_hz", ALL_E_CONFIGS + BANK_CONFIGS)
def test_audio_band_alias_rejection(filt, in_rate, out_hz):
    """Everything that folds into [0, 20 kHz] must be crushed. The D bank
    is intentionally leaky (README.md:242 lineage) but still far below
    the delta-sigma noise floor."""
    chain = get_chain(filt, in_rate, out_hz)
    in_hz = in_rate.hz
    worst = 0.0
    for f in np.linspace(100.0, 20_000.0, 16):
        aliases = []
        k = 1
        while k * out_hz - f < in_hz / 2:
            for fa in (k * out_hz - f, k * out_hz + f):
                if 0 < fa < in_hz / 2:
                    aliases.append(fa)
            k += 1
        if aliases:
            mags = np.abs(cascade_response(chain, in_hz, aliases))
            worst = max(worst, float(np.sqrt(np.sum(mags**2))))
    worst_db = 20 * np.log10(worst + 1e-30)
    limit = -80.0 if filt is FilterType.DSD2PCM else -110.0
    assert worst_db < limit, worst_db


def _transition_width(chain, in_hz, out_hz, floor_db=-90.0):
    """Width (Hz) from the last -1 dB point to the first point at/below
    floor_db, measured on the full cascade around output Nyquist."""
    nyq = out_hz / 2.0
    f = np.linspace(0.2 * nyq, 1.4 * nyq, 4096)
    mag_db = 20 * np.log10(np.abs(cascade_response(chain, in_hz, f)) + 1e-300)
    flat = f[mag_db > -1.0]
    stopped = f[mag_db <= floor_db]
    assert len(flat) and len(stopped), "transition outside the probed band"
    return float(stopped.min() - flat.max())


def test_bank_differentiation_x_tighter_than_e():
    """The X bank's character is a measurably NARROWER transition and
    deeper stopband than E on the same cell (filters/design.py:191-195);
    a bank-swap regression (E taps accidentally served for X) must fail
    here (VERDICT r2 weak 5). Measured at 88.2k where the transition is
    proportionally tightest: E width ~17.0 kHz, X ~14.0 kHz."""
    in_rate, out_hz = DsdRate.DSD64, 88200
    e = get_chain(FilterType.EQUIRIPPLE, in_rate, out_hz)
    x = get_chain(FilterType.XLD, in_rate, out_hz)
    we = _transition_width(e, in_rate.hz, out_hz)
    wx = _transition_width(x, in_rate.hz, out_hz)
    assert wx < 0.9 * we, (wx, we)
    # and the quality stages are genuinely different tables
    assert not np.array_equal(e[-1].taps, x[-1].taps)
    # X's design stopband is deeper (135 vs 120 dB): check the quality
    # stage tables directly, past each one's own stopband edge
    for bank, floor in ((e, -112.0), (x, -127.0)):
        s = bank[-1]
        w = np.linspace(0.7 * np.pi, np.pi, 512)
        _, h = signal.freqz(s.taps, worN=w)
        assert 20 * np.log10(np.abs(h).max() + 1e-300) < floor


def test_bank_differentiation_c_distinct_rolloff():
    """C (Dolph-Chebyshev window design, reference README.md:232
    "natural sound with slight rolloff") has a measurably different
    transition shape from E: monotone (no equiripple structure), flatter
    through 0.65x Nyquist, then a steeper fall that lands >15 dB deeper
    at Nyquist. A bank-swap regression (E served for C) fails all three
    (VERDICT r2 weak 5)."""
    in_rate, out_hz = DsdRate.DSD128, 88200
    e = get_chain(FilterType.EQUIRIPPLE, in_rate, out_hz)
    c = get_chain(FilterType.CHEBYSHEV, in_rate, out_hz)
    assert not np.array_equal(e[-1].taps, c[-1].taps)
    nyq = out_hz / 2.0
    f = np.linspace(0.45 * nyq, 1.0 * nyq, 512)
    mc = 20 * np.log10(np.abs(cascade_response(c, in_rate.hz, f)) + 1e-300)
    me = 20 * np.log10(np.abs(cascade_response(e, in_rate.hz, f)) + 1e-300)
    assert np.all(np.diff(mc) < 0.05), "C transition must be monotone"
    # measured (2026-08): at 0.65 nyq E = -1.1 dB, C = -0.03 dB; at
    # nyq E = -66 dB, C = -92 dB
    i65 = np.argmin(np.abs(f - 0.65 * nyq))
    assert mc[i65] > -0.3 and me[i65] < -0.7, (mc[i65], me[i65])
    assert mc[-1] < me[-1] - 15.0, (mc[-1], me[-1])


def test_bank_differentiation_d_short_and_leaky():
    """D mirrors the original dsd2pcm's single short FIR
    (filters/design.py:_dsd2pcm_stage): ONE stage of <=128 taps where E
    runs a cascade, with a deliberately leaky transition (tens of dB less
    Nyquist rejection than E)."""
    d = get_chain(FilterType.DSD2PCM, DsdRate.DSD64, 352800)
    e = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    assert len(d) == 1 and d[0].M == 8
    assert d[0].n_taps <= 128
    assert len(e) > 1
    nyq = 352800 / 2.0
    (md,) = np.abs(cascade_response(d, DsdRate.DSD64.hz, [nyq]))
    (me,) = np.abs(cascade_response(e, DsdRate.DSD64.hz, [nyq]))
    # leaky by design, but still filtering: between -6 and -40 dB at
    # output Nyquist, tens of dB above E's rejection there
    assert -40.0 < 20 * np.log10(md) < -6.0
    assert 20 * np.log10(md) > 20 * np.log10(me + 1e-300) + 30.0


def test_invalid_combinations_rejected():
    with pytest.raises(ValueError):
        check_filter_choice(FilterType.XLD, DsdRate.DSD128, 88200)
    with pytest.raises(ValueError):
        check_filter_choice(FilterType.DSD2PCM, DsdRate.DSD64, 176400)
    with pytest.raises(ValueError):
        check_filter_choice(FilterType.CHEBYSHEV, DsdRate.DSD64, 88200)
    with pytest.raises(ValueError):
        check_filter_choice(FilterType.EQUIRIPPLE, DsdRate.DSD512, 88200)
    with pytest.raises(ValueError):
        check_filter_choice(FilterType.EQUIRIPPLE, DsdRate.DSD64, 705600)


def test_disk_cache_roundtrip(tmp_path, monkeypatch):
    import dsd2dxd_tpu.filters.design as design

    monkeypatch.setattr(design, "_CACHE_DIR", tmp_path)
    design.get_chain.cache_clear()
    c1 = design.get_chain(FilterType.DSD2PCM, DsdRate.DSD64, 352800)
    design.get_chain.cache_clear()
    c2 = design.get_chain(FilterType.DSD2PCM, DsdRate.DSD64, 352800)
    assert len(c1) == len(c2)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a.taps, b.taps)
        assert (a.L, a.M) == (b.L, b.M)
    design.get_chain.cache_clear()


def test_unmeetable_spec_raises_instead_of_caching(monkeypatch):
    """A design the growth loop cannot bring to spec must raise — not
    return (and permanently cache) a best-effort alias-leaking filter.
    The measurement is stubbed to always fail so the loop exhausts
    instantly; the contract under test is the raise, not remez."""
    import dsd2dxd_tpu.filters.design as design

    monkeypatch.setattr(design, "_remez_lowpass",
                        lambda n, *a, **k: np.zeros(design._even(n)))
    monkeypatch.setattr(design, "_measure", lambda *a: (1.0, 0.0))
    with pytest.raises(design.FilterDesignError):
        design._verified_lowpass(176400.0, 20000.0, 24000.0, 120.0)
