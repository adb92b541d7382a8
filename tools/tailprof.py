"""On-chip cost breakdown of the fused-rational step (48k family).

The rational cells (e.g. DSD256->192k) spend ~35% of the step outside
the fused head (CLAUDE.md). This times each piece in isolation at
production shapes — head kernel, window stack, x160/147 einsum at
several MXU precisions, epilogue — so the optimization target is
measured, not guessed.

    python tools/tailprof.py [--cell DSD256:192000] [--tile-mib 16]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def bench(fn, args, n=20):
    import jax

    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()  # reuse XLA compiles across tool runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", default="DSD256:192000")
    ap.add_argument("--tile-mib", type=int, default=16)
    args = ap.parse_args()
    rate_name, out_hz = args.cell.split(":")
    out_hz = int(out_hz)

    import jax
    import jax.numpy as jnp

    from dsd2dxd_tpu.filters.design import get_chain
    from dsd2dxd_tpu.formats.dsd_types import DitherType, DsdRate, FilterType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops.phase import (
        build_chain_coefs,
        build_plan,
        finish_tile,
        interleave_phases,
        plan_window,
        stage_apply_phase_matmul,
    )
    from dsd2dxd_tpu.ops.resample import StepConfig
    from dsd2dxd_tpu.pipeline.engine import _tile_bytes_for
    from dsd2dxd_tpu.pipeline.transfer import chunked_device_put

    if jax.default_backend() != "tpu":
        print("ERROR: needs the real TPU", file=sys.stderr)
        return 2

    rate = DsdRate[rate_name]
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    n_head = fused.fused_rational_plan(chain)
    assert n_head is not None, "cell is not rational"
    head, rstage = tuple(chain[:n_head]), chain[-1]
    tile = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024, rate.hz)
    bb = fused.pick_block_bytes(chain, rate.hz)
    cfg = StepConfig(channels=2, tile_bytes=tile, bit_depth=24,
                     dither=DitherType.TPDF, level_db=0.0)
    import dataclasses
    head_cfg = dataclasses.replace(cfg, bit_depth=32,
                                   dither=DitherType.NONE, level_db=0.0)
    hstep, halo_b = fused.make_fused_step(head, head_cfg, block_bytes=bb,
                                          jit=False, transpose=False)
    g = fused.fused_plan(head)[1]
    rng = np.random.default_rng(0)
    x = chunked_device_put(fused.prep_input(
        rng.integers(0, 256, size=(2, tile), dtype=np.uint8), g))
    halo = jnp.asarray(fused.init_fused_halo(head, 2))
    secs = tile * 8 / rate.hz
    print(f"{rate_name}->{out_hz} tile={tile} blk={bb} "
          f"audio={secs:.2f}s per tile")

    # 1. head kernel alone
    f_head = jax.jit(lambda xw, h: hstep(xw, h, 0)[0])
    t = bench(f_head, (x, halo))
    print(f"  head kernel          : {t*1e3:7.2f} ms  ({secs/t:6.0f}x RT)")
    y = jax.block_until_ready(f_head(x, halo))  # (C, n_base) f32

    plan = build_plan(rstage, p_in=1)
    dtype = jnp.float32
    coefs, n_terms = build_chain_coefs((plan,), dtype)
    hist = jnp.zeros((2, plan.p_in, plan.hist_lanes), dtype)
    lo, w_len = plan_window(plan)
    print(f"  tail plan: p_out={plan.p_out} stride={plan.lane_stride} "
          f"W={w_len} terms={n_terms[0]} hist={plan.hist_lanes}")

    # 2. full tail (windows + einsum + hist)
    f_tail = jax.jit(lambda yy, hh: stage_apply_phase_matmul(
        yy[:, None, :], hh, plan, coefs[0])[0])
    t = bench(f_tail, (y, hist))
    print(f"  tail apply (HIGHEST) : {t*1e3:7.2f} ms  ({secs/t:6.0f}x RT)")
    z = jax.block_until_ready(f_tail(y, hist))

    # 3. windows alone (strided slices + stack)
    import dsd2dxd_tpu.ops.phase as phase_mod

    def windows_only(yy, hh):
        xx = phase_mod.rephase(yy[:, None, :], plan.rephase)
        c, p_in, k_in = xx.shape
        H = plan.hist_lanes
        s = plan.lane_stride
        n_out = k_in * p_in * plan.L // plan.M
        k_out = n_out // plan.p_out
        xin = jnp.concatenate([hh, xx], axis=2) if H else xx
        ws = []
        for w in range(w_len):
            start = H + lo + w
            limit = start + (k_out - 1) * s + 1
            ws.append(jax.lax.slice(xin, (0, 0, start), (c, p_in, limit),
                                    (1, 1, s)))
        return jnp.stack(ws, axis=3)
    f_win = jax.jit(windows_only)
    t = bench(f_win, (y, hist))
    print(f"  window stack alone   : {t*1e3:7.2f} ms  ({secs/t:6.0f}x RT)")
    xw = jax.block_until_ready(f_win(y, hist))

    # 4. einsum alone at each precision
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        p = getattr(jax.lax.Precision, prec)
        f_dot = jax.jit(lambda ww, _p=p: jnp.einsum(
            "crkw,prw->cpk", ww, coefs[0],
            preferred_element_type=jnp.float32, precision=_p))
        t = bench(f_dot, (xw,))
        print(f"  einsum {prec:<8}      : {t*1e3:7.2f} ms  "
              f"({secs/t:6.0f}x RT)")

    # 5. epilogue: interleave + finish_tile + plane pack
    base_key = jax.random.PRNGKey(0x5D5D)

    def epilogue(zz):
        out, peak = finish_tile(interleave_phases(zz), cfg,
                                jax.random.fold_in(base_key, 0), 1.0)
        v = out.T.astype(jnp.uint32)
        wire = jnp.stack([(v & 0xFF).astype(jnp.uint8),
                          ((v >> 8) & 0xFF).astype(jnp.uint8),
                          ((v >> 16) & 0xFF).astype(jnp.uint8)])
        return wire, peak
    f_epi = jax.jit(epilogue)
    t = bench(f_epi, (z,))
    print(f"  epilogue+planes      : {t*1e3:7.2f} ms  ({secs/t:6.0f}x RT)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
