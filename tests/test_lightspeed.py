"""Smoke for tools/lightspeed.py — the analytic speed-of-light model.

The model's constants are chip-measured and can't be validated here;
what CAN be pinned is the arithmetic: the per-cell accounting must
mirror the kernel's own layout (need[] recursion, block/batch
geometry), components must be ordered sanely (model <= each pure
component bound; HBM far above everything), and every rate-matrix cell
must produce a finite model without raising.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import lightspeed  # noqa: E402

from dsd2dxd_tpu.formats.dsd_types import DsdRate  # noqa: E402


def test_every_cell_models_finite():
    for rate, outs in lightspeed.CELLS:
        for hz in outs:
            m = lightspeed.cell_model(rate, hz)
            assert m["xrt_model"] > 0, (rate, hz)
            # the ANALYTIC bound is a serial composition and can't beat
            # its components; the calibrated primary model (per-G
            # measured floor+slope) is a separate basis and may
            assert (m["xrt_model_analytic"]
                    <= m["xrt_floor"] + 1e-9), (rate, hz)
            assert (m["xrt_model_analytic"]
                    <= m["xrt_fir"] + 1e-9), (rate, hz)
            # this workload is nowhere near bandwidth-bound
            assert m["xrt_hbm"] > 10 * m["xrt_model"], (rate, hz)
            assert 0.0 < m["floor_share"] < 1.0
            assert 0.0 < m["cal_floor_share"] < 1.0
            # the two bases agree within the measured spread (the
            # calibrated model landed 92-110% of chip on every cell;
            # the analytic bound is looser but the same order)
            ratio = m["xrt_model"] / m["xrt_model_analytic"]
            assert 0.4 < ratio < 4.0, (rate, hz, ratio)


def test_rational_cells_flagged():
    m = lightspeed.cell_model(DsdRate.DSD64, 96000)
    assert m["rational"]
    m = lightspeed.cell_model(DsdRate.DSD64, 88200)
    assert not m["rational"]


def test_deep_cells_pay_proportional_floor():
    """The floor scales with input bytes: DSD512 pays ~8x DSD64's."""
    f64 = lightspeed.cell_model(DsdRate.DSD64, 352800)["xrt_floor"]
    f512 = lightspeed.cell_model(DsdRate.DSD512, 352800)["xrt_floor"]
    ratio = f64 / f512
    assert 6.0 < ratio < 9.0, ratio  # 64 KiB blocks shave the per-block part
