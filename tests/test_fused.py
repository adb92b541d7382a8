"""Fused Pallas kernel tests (interpret mode on CPU): equivalence with
the XLA phase path, eligibility dispatch, streaming halo semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsd2dxd_tpu.filters.design import get_chain
from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
from dsd2dxd_tpu.ops.fused import (
    chain_halo_bytes,
    fused_eligible,
    init_fused_halo,
    make_fused_step,
)
from dsd2dxd_tpu.ops.phase import (
    build_chain_plans,
    init_phase_hists,
    make_phase_step,
)
from dsd2dxd_tpu.ops.resample import StepConfig

DIV8_CONFIGS = [
    (DsdRate.DSD64, 352800),
    (DsdRate.DSD128, 705600),
    (DsdRate.DSD256, 1411200),
]


def test_eligibility():
    for rate, out_hz in DIV8_CONFIGS:
        plans = build_chain_plans(get_chain(FilterType.EQUIRIPPLE, rate, out_hz))
        assert fused_eligible(plans)
    # rational and deep chains are not eligible
    assert not fused_eligible(
        build_chain_plans(get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 96000)))
    assert not fused_eligible(
        build_chain_plans(get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 88200)))
    with pytest.raises(ValueError):
        make_fused_step(
            get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 88200),
            StepConfig(channels=2, tile_bytes=16384, bit_depth=24,
                       dither=DitherType.TPDF, level_db=0.0), interpret=True)


@pytest.mark.parametrize("rate,out_hz", DIV8_CONFIGS)
@pytest.mark.parametrize("channels", [1, 2])
def test_fused_matches_phase_streaming(rate, out_hz, channels):
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    plans = build_chain_plans(chain)
    tile = 16384 * 2
    cfg = StepConfig(channels=channels, tile_bytes=tile, bit_depth=32,
                     dither=DitherType.NONE, level_db=-2.0)
    fstep, halo = make_fused_step(chain, cfg, interpret=True)
    assert halo == chain_halo_bytes(plans)
    pstep = make_phase_step(chain, cfg)
    rng = np.random.default_rng(5)
    h_f = jnp.asarray(init_fused_halo(chain, channels))
    h_p = init_phase_hists(plans, channels)
    key = jax.random.PRNGKey(0)
    for t in range(3):
        x = rng.integers(0, 256, size=(channels, tile), dtype=np.uint8)
        of, pf, h_f = fstep(x, h_f, t)
        op, pp, h_p = pstep(x, h_p, key)
        of, op = np.asarray(of), np.asarray(op)
        assert of.shape == op.shape
        # tile 0: idle-pattern vs zero warmup differs within the halo
        skip = halo if t == 0 else 0
        assert np.max(np.abs(of[skip:] - op[skip:])) < 2e-6
        if t > 0:
            assert abs(float(pf) - float(pp)) < 1e-4


HYBRID_CONFIGS = [
    (DsdRate.DSD64, 176400),   # ÷16
    (DsdRate.DSD64, 88200),    # ÷32
    (DsdRate.DSD128, 88200),   # ÷64
]


@pytest.mark.parametrize("rate,out_hz", HYBRID_CONFIGS)
@pytest.mark.parametrize("bit_depth,dither", [(32, DitherType.NONE),
                                              (24, DitherType.TPDF)])
def test_hybrid_matches_phase_streaming(rate, out_hz, bit_depth, dither):
    """The à-trous hybrid (fused ÷8 head + dilated tail) is the TPU
    production path for deep 44.1k chains — keep it in lockstep with the
    phase path (CLAUDE.md invariant), including the int/dither epilogue."""
    from dsd2dxd_tpu.filters.design import chain_ratio
    from dsd2dxd_tpu.ops.fused import make_hybrid_step

    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    tile = 16384 * 2
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=bit_depth,
                     dither=dither, level_db=-1.0)
    hstep, make_state = make_hybrid_step(chain, cfg, interpret=True)
    pstep = make_phase_step(chain, cfg)
    state = make_state()
    hists = init_phase_hists(build_chain_plans(chain), 2)
    rng = np.random.default_rng(7)
    ratio = chain_ratio(chain)
    # tile 0 warmup: idle-byte state priming vs the phase path's zero
    # float histories — outputs differ within the state's reach
    skip = int(state.shape[1] * 8 * ratio) + 1
    for t in range(3):
        x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
        oh, ph, state = hstep(x, state, t)
        op, pp, hists = pstep(x, hists, jax.random.PRNGKey(t))
        oh, op = np.asarray(oh), np.asarray(op)
        assert oh.shape == op.shape
        s = skip if t == 0 else 0
        if bit_depth == 32:
            assert np.max(np.abs(oh[s:] - op[s:])) < 2e-6
        else:
            d = np.abs(oh[s:].astype(np.int64) - op[s:].astype(np.int64))
            assert d.max() <= 5  # f32 summation-order differences only
        if t > 0:
            assert abs(float(ph) - float(pp)) < 1e-4


def test_fused_quantized_int24():
    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    tile = 16384
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=24,
                     dither=DitherType.NONE, level_db=0.0)
    fstep, halo = make_fused_step(chain, cfg, interpret=True)
    pstep = make_phase_step(chain, cfg)
    rng = np.random.default_rng(6)
    x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
    of, _, _ = fstep(x, jnp.asarray(init_fused_halo(chain, 2)), 0)
    op, _, _ = pstep(x, init_phase_hists(build_chain_plans(chain), 2),
                     jax.random.PRNGKey(0))
    d = np.abs(np.asarray(of)[halo:].astype(np.int64)
               - np.asarray(op)[halo:].astype(np.int64))
    assert d.max() <= 5  # f32 ordering differences only
