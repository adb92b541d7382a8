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
