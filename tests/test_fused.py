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
    fused_groups,
    fused_plan,
    init_fused_halo,
    make_fused_step,
    prep_input,
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
    # rational chains are not eligible at any group count
    assert not fused_eligible(
        build_chain_plans(get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 96000)))
    assert fused_groups(
        get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 96000)) is None
    # rational chains have no fused plan at all: the factory refuses
    with pytest.raises(ValueError):
        make_fused_step(
            get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 96000),
            StepConfig(channels=2, tile_bytes=16384, bit_depth=24,
                       dither=DitherType.TPDF, level_db=0.0), interpret=True)
    # deep ÷2^k chains are not eligible ungrouped...
    assert not fused_eligible(
        build_chain_plans(get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 88200)))
    # ...but ARE eligible with byte-group words up to u32 (G=4)
    assert fused_groups(
        get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 176400)) == 2
    assert fused_groups(
        get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 88200)) == 4
    # ÷64/÷128 exceed the widest word: the DEFAULT plan is the
    # grouped-head + à-trous-tail hybrid (measured faster on chip than
    # G=8/16 word rows — see fused_groups docstring)...
    assert fused_groups(
        get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD128, 88200)) is None
    # ...but word rows remain selectable by raising the cap
    assert fused_groups(
        get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD128, 88200),
        max_groups=16) == 8
    assert fused_groups(
        get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD256, 88200),
        max_groups=16) == 16


GROUPED_CONFIGS = [
    (DsdRate.DSD64, 176400, 2),   # ÷16, u16 lanes
    (DsdRate.DSD64, 88200, 4),    # ÷32, u32 lanes
    (DsdRate.DSD256, 352800, 4),  # ÷32 at DSD256 rates
]


@pytest.mark.parametrize("rate,out_hz,g", GROUPED_CONFIGS)
@pytest.mark.parametrize("bit_depth,dither", [(32, DitherType.NONE),
                                              (24, DitherType.NONE)])
def test_grouped_fused_matches_phase_streaming(rate, out_hz, g, bit_depth,
                                               dither):
    """Byte-group word lanes (p0 = 8G) make deep ÷2^k chains single-pass;
    keep them in lockstep with the phase path."""
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    assert fused_groups(chain) == g
    tile = 16384 * 2
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=bit_depth,
                     dither=dither, level_db=-1.5)
    fstep, halo_bytes = make_fused_step(chain, cfg, interpret=True, groups=g)
    pstep = make_phase_step(chain, cfg)
    rng = np.random.default_rng(9)
    h_f = jnp.asarray(init_fused_halo(chain, 2, groups=g))
    h_p = init_phase_hists(build_chain_plans(chain), 2)
    key = jax.random.PRNGKey(0)
    for t in range(3):
        x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
        of, pf, h_f = fstep(prep_input(x, g), h_f, t)
        op, pp, h_p = pstep(x, h_p, key)
        of, op = np.asarray(of), np.asarray(op)
        assert of.shape == op.shape
        skip = halo_bytes * 8 // (8 * g) + 1 if t == 0 else 0
        if bit_depth == 32:
            assert np.max(np.abs(of[skip:] - op[skip:])) < 2e-6
        else:
            d = np.abs(of[skip:].astype(np.int64)
                       - op[skip:].astype(np.int64))
            assert d.max() <= 5
        if t > 0:
            assert abs(float(pf) - float(pp)) < 1e-4


@pytest.mark.parametrize("rate,out_hz", DIV8_CONFIGS)
@pytest.mark.parametrize("channels", [1, 2])
def test_fused_matches_phase_streaming(rate, out_hz, channels):
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    plans = build_chain_plans(chain)
    tile = 16384 * 2
    cfg = StepConfig(channels=channels, tile_bytes=tile, bit_depth=32,
                     dither=DitherType.NONE, level_db=-2.0)
    fstep, halo = make_fused_step(chain, cfg, interpret=True)
    assert halo == chain_halo_bytes(chain)
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


DEEP_CONFIGS = [
    (DsdRate.DSD128, 88200),   # ÷64: head ÷32 (G=4) + 1-stage à-trous tail
    (DsdRate.DSD256, 88200),   # ÷128: head ÷32 (G=4) + 2-stage tail
    (DsdRate.DSD512, 352800),  # ÷64 at the highest input rate
]


def _synthetic_div256_chain():
    """÷256 pure-decimation chain (not a matrix cell): exercises a
    3-stage à-trous tail, deeper than any production cell's."""
    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD256, 88200)
    from dsd2dxd_tpu.filters.design import Stage

    return tuple(chain) + (Stage(taps=chain[-1].taps, L=1, M=2),)


def test_word_rows_optin_matches_phase():
    """G=8 word rows (u32 row groups) stay selectable via the explicit
    `groups` override and in lockstep with the phase path — kept
    chip-validated as the alternative layout for hardware where the
    à-trous-vs-word-rows trade flips (see fused_groups docstring)."""
    from dsd2dxd_tpu.filters.design import chain_ratio

    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD128, 88200)
    tile = 16384 * 2
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=32,
                     dither=DitherType.NONE, level_db=-1.0)
    fstep, halo_bytes = make_fused_step(chain, cfg, interpret=True,
                                        groups=8)
    pstep = make_phase_step(chain, cfg)
    state = jnp.asarray(init_fused_halo(chain, 2, groups=8))
    assert state.shape[0] == 4  # 2 row groups x 2 channels
    hists = init_phase_hists(build_chain_plans(chain), 2)
    rng = np.random.default_rng(3)
    skip = int(halo_bytes * 8 * chain_ratio(chain)) + 1
    for t in range(2):
        x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
        oh, ph, state = fstep(prep_input(x, 8), state, t)
        op, pp, hists = pstep(x, hists, jax.random.PRNGKey(t))
        s = skip if t == 0 else 0
        assert np.max(np.abs(np.asarray(oh)[s:] - np.asarray(op)[s:])) < 2e-6


def test_hybrid_atrous_three_stage_tail():
    """÷256: head ÷32 (G=4) + THREE à-trous tail stages (r_tail=8)."""
    from dsd2dxd_tpu.filters.design import chain_ratio
    from dsd2dxd_tpu.ops.fused import fused_plan

    chain = _synthetic_div256_chain()
    n_head, g, r_tail = fused_plan(chain)
    assert (n_head, g, r_tail) == (5, 4, 8)
    tile = 16384 * 2
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=32,
                     dither=DitherType.NONE, level_db=-1.0)
    fstep, halo_bytes = make_fused_step(chain, cfg, interpret=True)
    pstep = make_phase_step(chain, cfg)
    state = jnp.asarray(init_fused_halo(chain, 2))
    hists = init_phase_hists(build_chain_plans(chain), 2)
    rng = np.random.default_rng(11)
    skip = int(halo_bytes * 8 * chain_ratio(chain)) + 1
    for t in range(2):
        x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
        oh, ph, state = fstep(prep_input(x, g), state, t)
        op, pp, hists = pstep(x, hists, jax.random.PRNGKey(t))
        oh, op = np.asarray(oh), np.asarray(op)
        assert oh.shape == op.shape
        s = skip if t == 0 else 0
        assert np.max(np.abs(oh[s:] - op[s:])) < 2e-6
        if t > 0:
            assert abs(float(ph) - float(pp)) < 1e-4


@pytest.mark.parametrize("rate,out_hz", DEEP_CONFIGS)
@pytest.mark.parametrize("bit_depth,dither", [(32, DitherType.NONE),
                                              (24, DitherType.NONE)])
def test_deep_chain_fused_matches_phase_streaming(rate, out_hz, bit_depth,
                                                  dither):
    """÷64+ chains run the grouped head + in-kernel à-trous tail — the
    TPU production path for the deepest 44.1k cells (measured faster
    than word rows once byte-plane emission removed the epilogue cost);
    keep it in lockstep with the phase path, incl. the int epilogue.
    (TPDF uses the on-core PRNG, which has no CPU interpret-mode lowering
    — its statistics are asserted on real hardware, tools/chipcheck.py.)"""
    from dsd2dxd_tpu.filters.design import chain_ratio
    from dsd2dxd_tpu.ops.fused import fused_plan

    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    n_head, g, r_tail = fused_plan(chain)
    assert n_head < len(chain) and r_tail > 1 and g == 4
    tile = 16384 * 2
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=bit_depth,
                     dither=dither, level_db=-1.0)
    fstep, halo_bytes = make_fused_step(chain, cfg, interpret=True)
    pstep = make_phase_step(chain, cfg)
    state = jnp.asarray(init_fused_halo(chain, 2))
    hists = init_phase_hists(build_chain_plans(chain), 2)
    rng = np.random.default_rng(7)
    ratio = chain_ratio(chain)
    # tile 0 warmup: idle-word state priming vs the phase path's zero
    # float histories — outputs differ within the state's reach
    skip = int(halo_bytes * 8 * ratio) + 1
    for t in range(3):
        x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
        oh, ph, state = fstep(prep_input(x, g), state, t)
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
            # peak is over emitted (phase-0) samples only, matching the
            # phase path's decimated peak
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


RATIONAL_CONFIGS = [
    # (rate, out_hz, block_bytes, tile_bytes): tiles are the smallest
    # multiple of both the kernel block and the chain unit (2^m·147 bits)
    (DsdRate.DSD64, 384000, 2688, 18816),    # ÷8 head (G=1) + ×160/147
    (DsdRate.DSD64, 96000, 10752, 75264),    # ÷32 head (G=4) + ×160/147
    (DsdRate.DSD256, 96000, 10752, 75264),   # ÷128 head (à-trous tail)
]

# Heavier single-combo config (interpret-mode cost is high at this tile
# size): block sized so the head runs sublane batch=4 — pins the batched
# de-block permutation on the rational path in CI (round-2 advisor
# finding — previously hardware-only coverage via chipcheck).
SINGLE_COMBO_RATIONAL = [
    (DsdRate.DSD64, 384000, 21504, 150528),   # batch=4 rational head
]


@pytest.mark.parametrize("rate,out_hz,block,tile,bit_depth,dither", [
    *[(r, o, b, t, d, k) for (r, o, b, t) in RATIONAL_CONFIGS
      for (d, k) in [(32, DitherType.NONE), (32, DitherType.FPD),
                     (24, DitherType.TPDF)]],
    *[(r, o, b, t, 24, DitherType.TPDF)
      for (r, o, b, t) in SINGLE_COMBO_RATIONAL],
])
def test_fused_rational_matches_phase_streaming(rate, out_hz, block, tile,
                                                bit_depth, dither):
    """48k-family chains: fused ÷2^m head + XLA ×160/147 tail must stay
    in lockstep with the pure phase path — including the dithered int
    epilogue, which runs in XLA with the SAME threefry stream as
    make_phase_step (noise is bit-identical, so int outputs may differ
    only by f32-rounding ties)."""
    from dsd2dxd_tpu.ops.fused import (
        fused_plan,
        fused_rational_plan,
        init_fused_rational_state,
        make_fused_rational_step,
    )

    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    n_head = fused_rational_plan(chain)
    assert n_head == len(chain) - 1
    g = fused_plan(chain[:n_head])[1]
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=bit_depth,
                     dither=dither, level_db=-1.5)
    rstep, halo_bytes = make_fused_rational_step(chain, cfg,
                                                 block_bytes=block,
                                                 interpret=True)
    pstep = make_phase_step(chain, cfg)
    halo, hist = init_fused_rational_state(chain, 2)
    state = (jnp.asarray(halo), hist)
    h_p = init_phase_hists(build_chain_plans(chain), 2)
    rng = np.random.default_rng(13)
    base_key = jax.random.PRNGKey(0x5D5D)
    from dsd2dxd_tpu.filters.design import chain_ratio

    skip = int(halo_bytes * 8 * chain_ratio(chain)) + 2
    for t in range(3):
        x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
        of, pf, state = rstep(prep_input(x, g), state, t)
        op, pp, h_p = pstep(x, h_p, jax.random.fold_in(base_key, t))
        of, op = np.asarray(of), np.asarray(op)
        assert of.shape == op.shape
        s = skip if t == 0 else 0
        if bit_depth == 32:
            assert np.max(np.abs(of[s:] - op[s:])) < 2e-6
        else:
            d = np.abs(of[s:].astype(np.int64) - op[s:].astype(np.int64))
            # identical noise: differences are f32 summation-order only.
            # The banded-natural tail and the phase path's dense matmul
            # sum the taps in different orders; vs an f64 oracle the
            # natural form is the MORE accurate of the two (max 3.3 vs
            # 4.2 LSB24 on white noise), so 3 here is two orderings
            # diverging in opposite directions, not a real error.
            assert d.max() <= 3
        if t > 0:
            assert abs(float(pf) - float(pp)) < 1e-4


def test_fused_rational_plan_shapes():
    from dsd2dxd_tpu.ops.fused import fused_plan, fused_rational_plan

    # every 48k-family E cell is fused-head + rational-tail shaped
    for rate, outs in ((DsdRate.DSD64, (96000, 192000, 384000)),
                       (DsdRate.DSD128, (96000, 192000, 384000)),
                       (DsdRate.DSD256, (96000, 192000, 384000))):
        for out in outs:
            chain = get_chain(FilterType.EQUIRIPPLE, rate, out)
            n_head = fused_rational_plan(chain)
            assert n_head == len(chain) - 1, (rate, out)
            assert chain[-1].L == 160 and chain[-1].M == 147
            assert fused_plan(chain[:n_head]) is not None
    # pure-decimation chains are NOT rational-shaped
    assert fused_rational_plan(
        get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)) is None


def test_kernel_covers_predicate():
    """ops/fused.kernel_covers is the single source of truth for the
    engine's dispatch gate and tile-sizing cap — pin its edges."""
    from dsd2dxd_tpu.ops.fused import kernel_covers

    plain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    rational = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 96000)
    assert kernel_covers(plain, 24, DitherType.TPDF)
    assert kernel_covers(plain, 32, DitherType.NONE)
    assert kernel_covers(rational, 24, DitherType.RECTANGULAR)
    # FPD float dither: in-kernel on the plain path (round 3), XLA
    # epilogue on the rational path
    assert kernel_covers(plain, 32, DitherType.FPD)
    assert kernel_covers(rational, 32, DitherType.FPD)
    # other dithers are meaningless for float output: phase path only
    assert not kernel_covers(plain, 32, DitherType.TPDF)
    # NJAD requantizes on host; engine rewrites the cfg to float first
    assert not kernel_covers(plain, 24, DitherType.NJAD)


@pytest.mark.parametrize("rate,out_hz,depth,shift,big_endian,groups", [
    (DsdRate.DSD64, 352800, 24, 0, False, None),   # flagship, batch=4
    (DsdRate.DSD64, 352800, 24, 0, True, None),    # AIFF byte order
    (DsdRate.DSD256, 88200, 24, 0, False, None),   # a-trous tail extract
    (DsdRate.DSD256, 88200, 24, 0, False, 16),     # G=16 word rows opt-in
    (DsdRate.DSD64, 352800, 16, 0, False, None),   # int16 single-plane
    (DsdRate.DSD64, 176400, 20, 4, False, None),   # 20-in-24 kernel shift
])
def test_planes_emission_matches_frames_path(rate, out_hz, depth, shift,
                                             big_endian, groups):
    """emit="planes" must produce byte-identical wire data to the frames
    path + host packers, through both the numpy and native interleavers
    (VERDICT r2 item 1: in-kernel byte-plane PCM output)."""
    from dsd2dxd_tpu.native import lib as native
    from dsd2dxd_tpu.pipeline.transfer import (
        interleave_planes_numpy,
    )

    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    g = groups if groups is not None else fused_plan(chain)[1]
    tile = 16384 * 2
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=depth,
                     dither=DitherType.NONE, level_db=0.0)
    fstep, _h = make_fused_step(chain, cfg, interpret=True, groups=groups)
    pstep, _h2, layout = make_fused_step(chain, cfg, interpret=True,
                                         emit="planes", out_shift=shift,
                                         groups=groups)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
    # one halo per step: the jitted steps donate their state argument
    of, pkf, _ = fstep(prep_input(x, g),
                       jnp.asarray(init_fused_halo(chain, 2, groups=groups)),
                       0)
    op, pkp, _ = pstep(prep_input(x, g),
                       jnp.asarray(init_fused_halo(chain, 2, groups=groups)),
                       0)
    of, opn = np.asarray(of), np.asarray(op)
    assert float(pkf) == float(pkp)
    n = of.shape[0]
    v = of.astype(np.int64) << shift
    if depth == 16:
        expect = (of.astype(np.int16).byteswap() if big_endian
                  else of.astype(np.int16)).tobytes()
    else:
        b = np.empty((n * 2, 3), np.uint8)
        vv = (v.reshape(-1) & 0xFFFFFF).astype(np.uint32)
        order = (2, 1, 0) if big_endian else (0, 1, 2)
        b[:, order[0]] = vv & 0xFF
        b[:, order[1]] = (vv >> 8) & 0xFF
        b[:, order[2]] = (vv >> 16) & 0xFF
        expect = b.tobytes()
    assert interleave_planes_numpy(opn, layout, n, big_endian) == expect
    if native is not None:
        assert native.interleave_planes(opn, layout, n,
                                        big_endian) == expect
    # frame-major int32 reconstruction (the FLAC drain path)
    from dsd2dxd_tpu.pipeline.transfer import (
        deplane_frames,
        deplane_frames_numpy,
    )

    want = (of.astype(np.int64) << shift).astype(np.int32)
    np.testing.assert_array_equal(deplane_frames_numpy(opn, layout, n), want)
    if native is not None:
        np.testing.assert_array_equal(deplane_frames(opn, layout, n), want)
    # partial final tile: the interleaver trims to n_valid frames
    n_part = n - 37
    assert (interleave_planes_numpy(opn, layout, n_part, big_endian)
            == expect[:n_part * 2 * (2 if depth == 16 else 3)])


@pytest.mark.parametrize("depth,shift", [(24, 0), (16, 0), (20, 4)])
def test_rational_planes_match_frames(depth, shift):
    """Rational-step emit="planes": both finishes — the default Pallas
    finish kernel (batched PlaneLayout, on-core epilogue; NONE dither
    runs in interpret mode since it needs no PRNG) and the forced
    finish="xla" threefry epilogue (batch=1 layout) — must interleave
    to the same wire bytes as the frames output + host packers, and the
    FLAC-side deplaner must invert exactly."""
    from dsd2dxd_tpu.ops.fused import (
        PlaneLayout,
        init_fused_rational_state,
        make_fused_rational_step,
    )
    from dsd2dxd_tpu.pipeline.transfer import (
        deplane_frames,
        interleave_planes,
    )

    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 384000)
    cfg = StepConfig(channels=2, tile_bytes=18816, bit_depth=depth,
                     dither=DitherType.NONE, level_db=-1.0)
    fstep, _h = make_fused_rational_step(chain, cfg, block_bytes=2688,
                                         interpret=True)
    kstep, _hk, klayout = make_fused_rational_step(
        chain, cfg, block_bytes=2688, interpret=True, emit="planes",
        out_shift=shift)
    pstep, _h2, layout = make_fused_rational_step(
        chain, cfg, block_bytes=2688, interpret=True, emit="planes",
        out_shift=shift, finish="xla")
    assert isinstance(layout, PlaneLayout) and layout.batch == 1
    # auto mode picked the Pallas finish: batched sublane layout
    assert isinstance(klayout, PlaneLayout) and klayout.batch == 4
    assert klayout.rows == 8
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, size=(2, 18816), dtype=np.uint8)

    def st():
        halo, hist = init_fused_rational_state(chain, 2)
        return (jnp.asarray(halo), hist)

    of, pkf, _ = fstep(x, st(), 0)
    ow, pkw, _ = pstep(x, st(), 0)
    ok, pkk, _ = kstep(x, st(), 0)
    of, ow, ok = np.asarray(of), np.asarray(ow), np.asarray(ok)
    n = of.shape[0]
    assert layout.cols == n
    assert klayout.batch * klayout.cols == n
    assert float(pkf) == float(pkw) == float(pkk)
    v = (of.reshape(-1).astype(np.int64) << shift)
    if depth == 16:
        expect = of.astype(np.int16).tobytes()
    else:
        b = np.empty((len(v), 3), np.uint8)
        vv = (v & 0xFFFFFF).astype(np.uint32)
        b[:, 0] = vv & 0xFF
        b[:, 1] = (vv >> 8) & 0xFF
        b[:, 2] = (vv >> 16) & 0xFF
        expect = b.tobytes()
    assert interleave_planes(ow, layout, n) == expect
    assert interleave_planes(ok, klayout, n) == expect
    np.testing.assert_array_equal(
        deplane_frames(ow, layout, n),
        (of.astype(np.int64) << shift).astype(np.int32))
    np.testing.assert_array_equal(
        deplane_frames(ok, klayout, n),
        (of.astype(np.int64) << shift).astype(np.int32))


def test_planes_emission_atrous_extraction():
    """emit="planes" on an r_tail>1 chain (synthetic ÷256): the phase-0
    extraction happens on the blocked planes without any transpose."""
    from dsd2dxd_tpu.pipeline.transfer import interleave_planes_numpy

    chain = _synthetic_div256_chain()
    g = fused_plan(chain)[1]
    tile = 16384 * 2
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=24,
                     dither=DitherType.NONE, level_db=0.0)
    fstep, _h = make_fused_step(chain, cfg, interpret=True)
    pstep, _h2, layout = make_fused_step(chain, cfg, interpret=True,
                                         emit="planes")
    rng = np.random.default_rng(8)
    x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
    of, _, _ = fstep(prep_input(x, g),
                     jnp.asarray(init_fused_halo(chain, 2)), 0)
    op, _, _ = pstep(prep_input(x, g),
                     jnp.asarray(init_fused_halo(chain, 2)), 0)
    of, opn = np.asarray(of), np.asarray(op)
    vv = (of.reshape(-1).astype(np.int64) & 0xFFFFFF).astype(np.uint32)
    b = np.empty((len(vv), 3), np.uint8)
    b[:, 0] = vv & 0xFF
    b[:, 1] = (vv >> 8) & 0xFF
    b[:, 2] = (vv >> 16) & 0xFF
    assert interleave_planes_numpy(opn, layout, of.shape[0]) == b.tobytes()


def test_planes_emission_unbatched_layout():
    """batch==1 layout (sublane batching disabled): rows are c_pad with
    idle padding; the interleaver reads only the real channel rows."""
    from dsd2dxd_tpu.pipeline.transfer import interleave_planes_numpy

    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    tile = 16384
    cfg = StepConfig(channels=8, tile_bytes=tile, bit_depth=24,
                     dither=DitherType.NONE, level_db=0.0)
    fstep, _h = make_fused_step(chain, cfg, interpret=True)
    pstep, _h2, layout = make_fused_step(chain, cfg, interpret=True,
                                         emit="planes")
    assert layout.batch == 1
    rng = np.random.default_rng(6)
    x = rng.integers(0, 256, size=(8, tile), dtype=np.uint8)
    of, _, _ = fstep(x, jnp.asarray(init_fused_halo(chain, 8)), 0)
    op, _, _ = pstep(x, jnp.asarray(init_fused_halo(chain, 8)), 0)
    of, opn = np.asarray(of), np.asarray(op)
    vv = (of.reshape(-1).astype(np.int64) & 0xFFFFFF).astype(np.uint32)
    b = np.empty((len(vv), 3), np.uint8)
    b[:, 0] = vv & 0xFF
    b[:, 1] = (vv >> 8) & 0xFF
    b[:, 2] = (vv >> 16) & 0xFF
    assert interleave_planes_numpy(opn, layout, of.shape[0]) == b.tobytes()


@pytest.mark.parametrize("channels", [3, 5, 6])
def test_multichannel_fused_planes_and_streaming(channels):
    """C>2 sources (5.0/5.1 DSF channel types; raw `-c N`,
    /root/reference/src/main.rs:50-52): odd channel counts exercise the
    sublane-batch edge cases (C=3 -> batch=2 with 6 rows, C=5/6 ->
    batch=1 with idle-padded rows). Fused frames must match the phase
    path, and the planes emission + both interleavers + deplaner must
    agree with the frames output — previously only C∈{1,2,8} had CI
    coverage."""
    from dsd2dxd_tpu.native import lib as native
    from dsd2dxd_tpu.pipeline.transfer import (
        deplane_frames,
        deplane_frames_numpy,
        interleave_planes_numpy,
    )

    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    tile = 16384 * 2
    cfg = StepConfig(channels=channels, tile_bytes=tile, bit_depth=24,
                     dither=DitherType.NONE, level_db=0.0)
    fstep, halo_bytes = make_fused_step(chain, cfg, interpret=True)
    pstep = make_phase_step(chain, cfg)
    plstep, _h, layout = make_fused_step(chain, cfg, interpret=True,
                                         emit="planes")
    assert layout.batch == (2 if channels == 3 else 1)
    rng = np.random.default_rng(11)
    h_f = jnp.asarray(init_fused_halo(chain, channels))
    h_pl = jnp.asarray(init_fused_halo(chain, channels))
    h_p = init_phase_hists(build_chain_plans(chain), channels)
    key = jax.random.PRNGKey(0)
    for t in range(2):
        x = rng.integers(0, 256, size=(channels, tile), dtype=np.uint8)
        of, pf, h_f = fstep(x, h_f, t)
        opl, ppl, h_pl = plstep(x, h_pl, t)
        op, pp, h_p = pstep(x, h_p, key)
        of, op, opl = np.asarray(of), np.asarray(op), np.asarray(opl)
        assert of.shape == op.shape == (tile * 8 // 8, channels)
        skip = halo_bytes if t == 0 else 0
        d = np.abs(of[skip:].astype(np.int64) - op[skip:].astype(np.int64))
        assert d.max() <= 5
        assert float(pf) == float(ppl)
        # planes -> wire bytes and frame-major int32 must invert exactly
        n = of.shape[0]
        vv = (of.reshape(-1).astype(np.int64) & 0xFFFFFF).astype(np.uint32)
        b = np.empty((len(vv), 3), np.uint8)
        b[:, 0] = vv & 0xFF
        b[:, 1] = (vv >> 8) & 0xFF
        b[:, 2] = (vv >> 16) & 0xFF
        expect = b.tobytes()
        assert interleave_planes_numpy(opl, layout, n) == expect
        np.testing.assert_array_equal(deplane_frames_numpy(opl, layout, n),
                                      of.astype(np.int32))
        if native is not None:
            assert native.interleave_planes(opl, layout, n) == expect
            np.testing.assert_array_equal(deplane_frames(opl, layout, n),
                                          of.astype(np.int32))


def test_rational_batched_config_actually_batches():
    """The 21504-byte RATIONAL_CONFIGS block must exercise batch>1, or
    the CI coverage it exists for silently evaporates."""
    from dsd2dxd_tpu.ops.fused import sublane_batch

    assert sublane_batch(2, 21504, 1) == 4
    # and the original small-block configs were batch=1 (why the advisor
    # flagged the gap)
    assert sublane_batch(2, 2688, 1) == 1


def test_kernel_covers_implies_step_constructs():
    """kernel_covers decides the engine's tile-size cap BEFORE
    _cached_step picks a path; if construction then raised for a covered
    config, the engine would fall back to the XLA phase path with
    un-capped rate-scaled tiles (DSD512 rephase-padding OOM). Assert the
    predicate and the constructors agree on every rate-matrix cell x
    effective (depth, dither) combo (round-2 advisor finding)."""
    from dsd2dxd_tpu.formats.dsd_types import valid_output_rates
    from dsd2dxd_tpu.ops.fused import (
        DEFAULT_BLOCK_BYTES,
        fused_plan,
        kernel_covers,
        make_fused_rational_step,
        make_fused_step,
    )
    from dsd2dxd_tpu.ops.phase import build_chain_plans, chain_tile_unit_bits

    # effective configs as the engine computes them (pipeline/engine._run:
    # NJAD/level-check/32-bit become float mode; NJAD/level-check dither
    # becomes NONE)
    combos = [(d, k) for d in (16, 20, 24) for k in
              (DitherType.TPDF, DitherType.RECTANGULAR, DitherType.NONE)]
    combos += [(32, DitherType.NONE), (32, DitherType.FPD)]
    import math

    for rate in DsdRate:
        for out_hz in valid_output_rates(rate):
            chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
            unit = math.lcm(
                chain_tile_unit_bits(build_chain_plans(chain)),
                DEFAULT_BLOCK_BYTES * 8)
            for depth, dither in combos:
                if not kernel_covers(chain, depth, dither):
                    continue
                cfg = StepConfig(channels=2, tile_bytes=unit // 8,
                                 bit_depth=depth, dither=dither,
                                 level_db=0.0)
                try:
                    if fused_plan(chain) is not None:
                        make_fused_step(chain, cfg, jit=False)
                    else:
                        make_fused_rational_step(chain, cfg, jit=False)
                except ValueError as e:
                    raise AssertionError(
                        f"kernel_covers said yes but construction failed "
                        f"for {rate} -> {out_hz} {depth}b {dither}: {e}")


def test_pick_block_bytes_policy():
    """Round-5 policy: every G>=2 cell gets the 64 KiB grid block
    (same-run 16->64 KiB sweeps measured +6-15% on shallow cells too),
    and G=1 cells take 32 KiB at EVERY input rate — the round-5
    same-run slope A/B measured 32 KiB winning all three G=1 cells
    (+2.7 to +3.6%, /tmp/chip_blockg1_r5.log), overturning the r4
    cross-run DSD64->352.8k loss that had split the choice by in_hz.
    in_hz no longer affects the choice (rate-less callers compile the
    SAME kernel as the engine). The chosen block must satisfy the
    kernel's own alignment constraints for the cell it's chosen for."""
    from dsd2dxd_tpu.ops.fused import (
        DEEP_BLOCK_BYTES,
        DEFAULT_BLOCK_BYTES,
        fused_rational_plan,
        pick_block_bytes,
    )
    from dsd2dxd_tpu.formats.dsd_types import valid_output_rates

    for rate in DsdRate:
        for out_hz in valid_output_rates(rate):
            chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
            if fused_plan(chain) is None and fused_rational_plan(chain) is None:
                continue
            bb = pick_block_bytes(chain, rate.hz)
            plan = fused_plan(chain) or fused_plan(
                chain[:fused_rational_plan(chain)])
            _, g, r_tail = plan
            if g > 1:
                # byte-capped at 64 KiB; lanes never exceed 32768
                assert bb == DEEP_BLOCK_BYTES, (rate, out_hz)
                assert bb // g <= 32768
            else:
                assert bb == 2 * DEFAULT_BLOCK_BYTES, (rate, out_hz)
            # in_hz is no longer load-bearing for any G
            assert pick_block_bytes(chain) == bb
            assert bb % (g * 128) == 0 and (bb // g) % r_tail == 0


def test_mxu_head_optin_matches_phase():
    """The opt-in MXU head (compose leading stages into one in-kernel
    bf16x3-split matmul) stays in lockstep with the phase path — kept
    chip-measured as a wash vs the slice-FMA cascade (see
    mxu_head_count docstring) for hardware where that trade flips."""
    from dsd2dxd_tpu.filters.design import chain_ratio
    from dsd2dxd_tpu.ops.fused import mxu_head_count

    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 88200)
    assert mxu_head_count(chain, 4) > 0
    tile = 16384 * 2
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=32,
                     dither=DitherType.NONE, level_db=-1.0)
    fstep, halo_bytes = make_fused_step(chain, cfg, interpret=True,
                                        mxu=True)
    pstep = make_phase_step(chain, cfg)
    state = jnp.asarray(init_fused_halo(chain, 2))
    hists = init_phase_hists(build_chain_plans(chain), 2)
    rng = np.random.default_rng(7)
    skip = int(halo_bytes * 8 * chain_ratio(chain)) + 1
    for t in range(2):
        x = rng.integers(0, 256, size=(2, tile), dtype=np.uint8)
        oh, ph, state = fstep(prep_input(x, 4), state, t)
        op, pp, hists = pstep(x, hists, jax.random.PRNGKey(t))
        s = skip if t == 0 else 0
        # bf16x3 coefficient splits: ~2^-27 relative coefficient error,
        # bounded well under the f32 phase path's own rounding noise
        assert np.max(np.abs(np.asarray(oh)[s:] - np.asarray(op)[s:])) < 5e-6
    with pytest.raises(ValueError):
        # word-row layouts are not MXU-eligible: opting in must raise,
        # not silently fall back
        make_fused_step(get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD128,
                                  88200),
                        cfg, interpret=True, groups=8, mxu=True)


def test_kernel_covers_implies_buildable():
    """Round-2 advisor: the engine caps tile sizes based on
    fused.kernel_covers, but dispatch in _cached_step has a broader
    failure surface — if step construction raised for a covered config,
    the engine would silently fall back to the XLA phase path while
    keeping full rate-scaled tiles (the DSD512 rephase-padding OOM the
    4x cap exists to prevent). Pin: kernel_covers(chain, depth, dither)
    == True implies the factory _cached_step would call actually
    constructs, at the exact tile/block sizes the engine picks."""
    import math

    from dsd2dxd_tpu.formats.dsd_types import valid_output_rates
    from dsd2dxd_tpu.ops.fused import (
        fused_plan,
        kernel_covers,
        make_fused_rational_step,
        make_fused_step,
        pick_block_bytes,
    )
    from dsd2dxd_tpu.ops.phase import chain_tile_unit_bits

    # the PRODUCTION tile target, spelled literally: conftest shrinks
    # engine._DEFAULT_TILE_TARGET to 512 KiB for suite speed, and a
    # construction failure that only manifests at production-size tiles
    # (the DSD512 fallback-OOM scenario this test exists for) must not
    # be validated at the shrunken size. Step construction is lazy (no
    # trace), so full-size tiles cost nothing here.
    _PROD_TILE_TARGET = 4 * 1024 * 1024  # engine.py _DEFAULT_TILE_TARGET
    combos = [(16, DitherType.TPDF), (20, DitherType.TPDF),
              (24, DitherType.TPDF), (24, DitherType.RECTANGULAR),
              (24, DitherType.NONE), (32, DitherType.NONE),
              (32, DitherType.FPD)]
    n_built = 0
    for rate in DsdRate:
        for out_hz in valid_output_rates(rate):
            chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
            block = pick_block_bytes(chain, rate.hz)
            # _tile_bytes_for's TPU branch, replicated (tests pin CPU):
            # tile = ceil(target / lcm(chain unit, grid block)) units
            unit_bits = math.lcm(
                chain_tile_unit_bits(build_chain_plans(chain)), block * 8)
            target_bits = _PROD_TILE_TARGET * int(rate) * 8
            tile = max(1, -(-target_bits // unit_bits)) * unit_bits // 8
            assert tile % block == 0, (rate, out_hz)
            for depth, dither in combos:
                if not kernel_covers(chain, depth, dither):
                    continue
                cfg = StepConfig(channels=2, tile_bytes=tile,
                                 bit_depth=depth, dither=dither,
                                 level_db=-0.5)
                plain = fused_plan(chain) is not None
                make = make_fused_step if plain else make_fused_rational_step
                # both emit modes the engine requests (planes for int
                # depths with a container sink, frames otherwise)
                make(chain, cfg, block_bytes=block, jit=False)
                if depth != 32:
                    make(chain, cfg, block_bytes=block, jit=False,
                         emit="planes", out_shift=4 if depth == 20 else 0)
                n_built += 1
    assert n_built > 100  # 22 cells x ~6 covered combos


SIGNMASK_CONFIGS = [
    # (rate, out_hz, block, tile, bit_depth) — shallow G=1, word-group
    # G=4, and a deep à-trous tail; float exposes sub-LSB deviations,
    # int covers the production quantized path.
    (DsdRate.DSD64, 352800, 2048, 8192, 24),    # G=1 shallow, int
    (DsdRate.DSD256, 352800, 2048, 8192, 32),   # G=4 word lanes, float
    (DsdRate.DSD128, 88200, 2048, 8192, 32),    # ÷64: à-trous tail
]


@pytest.mark.parametrize("rate,out_hz,block,tile,bit_depth",
                         SIGNMASK_CONFIGS)
def test_signmask_unpack_matches_bitcast(rate, out_hz, block, tile,
                                         bit_depth):
    """unpack="signmask" (2-op sign-mask rows + stage-0 XOR coefficient
    application) against the default bitcast ±1 unpack. Per-op the two
    are exact (every stage-0 contribution is ±coef either way — see
    _sgn), but the compiled kernels may differ by a couple of ulps on
    scattered samples because the stage-0 graph change shifts XLA's
    downstream FMA-contraction choices. So: float compares at a few-ulp
    relative tolerance, int at ≤1 LSB."""
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=bit_depth,
                     dither=DitherType.NONE, level_db=-1.0)
    s_a, halo = make_fused_step(chain, cfg, block_bytes=block,
                                interpret=True)
    s_b, halo_b = make_fused_step(chain, cfg, block_bytes=block,
                                  interpret=True, unpack="signmask")
    assert halo == halo_b
    g = fused_plan(chain)[1]
    rng = np.random.default_rng(11)
    # separate halos: the jitted steps donate their state argument
    h_a = jnp.asarray(init_fused_halo(chain, 2))
    h_b = jnp.asarray(init_fused_halo(chain, 2))
    for t in range(2):
        x = prep_input(rng.integers(0, 256, size=(2, tile),
                                    dtype=np.uint8), g)
        oa, pa, h_a = s_a(x, h_a, t)
        ob, pb, h_b = s_b(x, h_b, t)
        oa, ob = np.asarray(oa), np.asarray(ob)
        if bit_depth == 32:
            np.testing.assert_allclose(ob, oa, rtol=1e-6, atol=1e-9)
            assert abs(float(pa) - float(pb)) <= 1e-6 * max(float(pa), 1e-9)
        else:
            assert np.max(np.abs(oa.astype(np.int64)
                                 - ob.astype(np.int64))) <= 1
            assert abs(float(pa) - float(pb)) <= 1e-6


@pytest.mark.parametrize("rate,out_hz", [(DsdRate.DSD64, 352800),
                                         (DsdRate.DSD256, 352800)])
def test_signmask_planes_matches_bitcast(rate, out_hz):
    """The PRODUCTION int path is emit="planes"; if a chip A/B ever
    flips the default unpack to signmask, this is the combination the
    engine runs. Deplaned frames from the signmask planes step must be
    within 1 LSB of the bitcast planes step (same contraction-jitter
    bound as the frames-mode test), with identical PlaneLayouts and
    matching peaks."""
    from dsd2dxd_tpu.pipeline.transfer import deplane_frames_numpy

    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    cfg = StepConfig(channels=2, tile_bytes=8192, bit_depth=24,
                     dither=DitherType.NONE, level_db=-1.0)
    s_a, _h, lay_a = make_fused_step(chain, cfg, block_bytes=2048,
                                     interpret=True, emit="planes")
    s_b, _h2, lay_b = make_fused_step(chain, cfg, block_bytes=2048,
                                      interpret=True, emit="planes",
                                      unpack="signmask")
    assert lay_a == lay_b
    g = fused_plan(chain)[1]
    rng = np.random.default_rng(12)
    h_a = jnp.asarray(init_fused_halo(chain, 2))
    h_b = jnp.asarray(init_fused_halo(chain, 2))
    for t in range(2):
        x = prep_input(rng.integers(0, 256, size=(2, 8192),
                                    dtype=np.uint8), g)
        oa, pa, h_a = s_a(x, h_a, t)
        ob, pb, h_b = s_b(x, h_b, t)
        fa = deplane_frames_numpy(np.asarray(oa), lay_a, lay_a.cols)
        fb = deplane_frames_numpy(np.asarray(ob), lay_b, lay_b.cols)
        assert np.max(np.abs(fa.astype(np.int64)
                             - fb.astype(np.int64))) <= 1
        assert abs(float(pa) - float(pb)) <= 1e-6


def test_signmask_rational_head():
    """The rational builder forwards unpack= to its fused head; the tail
    and epilogue are shared XLA code, so outputs agree to the same
    contraction jitter (dither runs in the XLA epilogue — exercisable on
    CPU, unlike the in-kernel PRNG)."""
    from dsd2dxd_tpu.ops.fused import (
        fused_rational_plan,
        init_fused_rational_state,
        make_fused_rational_step,
    )

    rate, out_hz, block, tile = DsdRate.DSD64, 384000, 2688, 18816
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=24,
                     dither=DitherType.TPDF, level_db=0.0)
    s_a, _ = make_fused_rational_step(chain, cfg, block_bytes=block,
                                      interpret=True)
    s_b, _ = make_fused_rational_step(chain, cfg, block_bytes=block,
                                      interpret=True, unpack="signmask")
    g = fused_plan(chain[:fused_rational_plan(chain)])[1]
    rng = np.random.default_rng(12)
    # the jitted step donates its state: each variant needs its own
    h, hist = init_fused_rational_state(chain, 2)
    st_a = (jnp.asarray(h), hist)
    h2, hist2 = init_fused_rational_state(chain, 2)
    st_b = (jnp.asarray(h2), hist2)
    for t in range(2):
        x = prep_input(rng.integers(0, 256, size=(2, tile),
                                    dtype=np.uint8), g)
        oa, pa, st_a = s_a(x, st_a, t)
        ob, pb, st_b = s_b(x, st_b, t)
        assert np.max(np.abs(np.asarray(oa).astype(np.int64)
                             - np.asarray(ob).astype(np.int64))) <= 1


def test_signmask_rejects_mxu_and_unknown():
    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    cfg = StepConfig(channels=2, tile_bytes=8192, bit_depth=24,
                     dither=DitherType.NONE, level_db=0.0)
    with pytest.raises(ValueError, match="MXU"):
        make_fused_step(chain, cfg, block_bytes=2048, interpret=True,
                        mxu=True, unpack="signmask")
    with pytest.raises(ValueError, match="unpack"):
        make_fused_step(chain, cfg, block_bytes=2048, interpret=True,
                        unpack="nope")


def test_unpack_env_typo_raises_config_error(monkeypatch):
    """A typo'd DSD2DXD_UNPACK must raise ConfigError, NOT ValueError:
    the engine swallows ValueError from step construction as "cfg not
    kernel-expressible" and would silently fall back to the phase path
    at kernel-sized tiles (a 5-10x slowdown, or an HBM OOM on DSD512)
    while the user believes they are A/B-ing an unpack variant."""
    from dsd2dxd_tpu.utils.errors import ConfigError

    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 352800)
    cfg = StepConfig(channels=2, tile_bytes=8192, bit_depth=24,
                     dither=DitherType.NONE, level_db=0.0)
    monkeypatch.setenv("DSD2DXD_UNPACK", "signmsk")
    with pytest.raises(ConfigError, match="DSD2DXD_UNPACK"):
        make_fused_step(chain, cfg, block_bytes=2048, interpret=True)


def test_rational_explicit_finish_requires_planes():
    """An explicit finish= with emit="frames" must raise, not be
    silently ignored: the finish dispatch lives in the planes branch,
    and before this contract a strict finish= caller got the plain
    frames step back with no indication their choice never applied.
    The removed "tail" kernel's name stays a loud error too (its chip
    A/B loss is recorded in the finish docstring)."""
    from dsd2dxd_tpu.ops.fused import make_fused_rational_step

    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 384000)
    cfg = StepConfig(channels=2, tile_bytes=18816, bit_depth=24,
                     dither=DitherType.NONE, level_db=0.0)
    for mode in ("kernel", "xla"):
        with pytest.raises(ValueError, match="planes"):
            make_fused_rational_step(chain, cfg, block_bytes=2688,
                                     interpret=True, finish=mode)
    with pytest.raises(ValueError, match="removed"):
        make_fused_rational_step(chain, cfg, block_bytes=2688,
                                 interpret=True, emit="planes",
                                 finish="tail")


def test_rational_env_kernel_falls_back_when_ineligible(monkeypatch):
    """DSD2DXD_RATIONAL_FINISH=kernel on a cfg where the finish kernel
    is not expressible (dithered interpret build — the on-core PRNG has
    no CPU lowering) must degrade to the XLA epilogue like =tail does,
    NOT raise: the engine swallows ValueError as "not
    kernel-expressible" and would abandon the whole fused-rational
    path, Pallas head included. The explicit finish="kernel" argument
    keeps the strict raise."""
    from dsd2dxd_tpu.ops.fused import make_fused_rational_step

    chain = get_chain(FilterType.EQUIRIPPLE, DsdRate.DSD64, 384000)
    cfg = StepConfig(channels=2, tile_bytes=18816, bit_depth=24,
                     dither=DitherType.TPDF, level_db=0.0)
    with pytest.raises(ValueError, match="finish kernel"):
        make_fused_rational_step(chain, cfg, block_bytes=2688,
                                 interpret=True, emit="planes",
                                 finish="kernel")
    monkeypatch.setenv("DSD2DXD_RATIONAL_FINISH", "kernel")
    step, _h, layout = make_fused_rational_step(chain, cfg,
                                                block_bytes=2688,
                                                interpret=True,
                                                emit="planes")
    assert callable(step) and layout.batch == 1


@pytest.mark.parametrize("dtype", ["uint8", "int16", "int32", "float32"])
@pytest.mark.parametrize("r", [1, 2, 4, 8])
def test_take_phase0_matches_strided_slice(dtype, r):
    """_take_phase0 replaces the XLA strided [..., 0] phase extraction
    (chip-measured ~4.9 GB/s — 7.9 ms of a 16.7 ms DSD256->192k head
    step, tools/deblockbench.py) with bitcast pair/quad masking (u8/i16
    planes) or a one-hot minor-axis contraction (f32/i32 frames). The
    contract is BITWISE identity with the slice for every emission
    dtype and every power-of-two r_tail the ÷64+ chains produce."""
    from dsd2dxd_tpu.ops.fused import _take_phase0

    rng = np.random.default_rng(17 * r)
    rows, lanes = 24, 128 * 3 * r
    if dtype == "float32":
        x = rng.standard_normal((rows, lanes)).astype(np.float32)
    else:
        info = np.iinfo(dtype)
        x = rng.integers(info.min, info.max, size=(rows, lanes),
                         endpoint=True).astype(dtype)
    want = x.reshape(rows, lanes // r, r)[..., 0]
    got = np.asarray(jax.jit(lambda v: _take_phase0(v, r))(x))
    assert got.dtype == want.dtype
    assert np.array_equal(got, want)
