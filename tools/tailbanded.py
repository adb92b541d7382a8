"""A/B alternative formulations of the ×160/147 rational tail.

The production tail (`phase.stage_apply_phase_matmul`) runs a dense
(p_out=160, p_in*W=294) einsum at Precision.HIGHEST — but the
coefficient tensor is only 6% dense: each output phase uses ~18 taps at
*consecutive* stream offsets (a banded matrix, bandwidth 18, diagonal
slope 147/160). HIGHEST's 6 bf16 passes re-stream the 94%-zeros operand
six times, so the stage is HBM-bound on structural waste. Candidates:

  matmul   : production baseline (dense einsum, HIGHEST)
  jloop    : VPU — for j in 0..17: y += G[:,j,None] * rows(idx[:,j]);
             19 static gathers of 160 rows, tree-summed, all f32
  gather   : VPU — one static gather to (C,160,18,K), mult+reduce
  block<B> : MXU — ρ blocked into B consecutive phases; each block's
             band spans ~ceil(B*147/160)+18 consecutive rows, so the
             per-block einsum contracts ~48 instead of 294 (6x fewer
             MACs, operands are plain slices)

All variants are pure f32 slicing/FMA or HIGHEST matmuls — same
accumulation class as the baseline, verified to ~1 ulp against it here
and gated by the usual dither-floor tests if promoted.

    python tools/tailbanded.py [--cell DSD256:192000] [--tile-mib 16]
    python tools/tailbanded.py --check   (CPU equivalence only)
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def bench(fn, args, n=20):
    """Per-call seconds by a two-point iteration slope with a digest
    sync: `block_until_ready` returns EARLY through the axon tunnel
    (tools/timing.py), so each arm folds every output into a scalar
    digest and fetches that via np.asarray; the (4n - n)/3n slope
    cancels the fetch's ~28 ms round-trip intercept."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    digest = jax.jit(lambda rs: sum(jnp.sum(r) for r in rs))

    def pass_t(k: int) -> float:
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(k)]
        np.asarray(digest(rs))
        return time.perf_counter() - t0

    pass_t(1)  # warm (digest compile)
    t1 = min(pass_t(n) for _ in range(3))
    t4 = min(pass_t(4 * n) for _ in range(3))
    return max(t4 - t1, 1e-9) / (3 * n)


def plan_banded(plan):
    """Static banded view of a PhasePlan: (idx, G, D).

    idx[rho, j] (int32, (p_out, Tmax)) is the row in the D-lane-shifted
    phase stack (row v = stream offset v - H*p_in at the block's base
    lane); G[rho, j] the tap, zero-padded to Tmax (padded entries reuse
    the last in-band row so indices stay in range).
    """
    p = plan.p_in
    H = plan.hist_lanes
    idx_rows, coefs = [], []
    tmax = 0
    for terms in plan.terms:
        by_off = sorted(
            ((t.base * p + t.r_in, t.coef) for t in terms))
        offs = [o for o, _ in by_off]
        assert all(b - a == 1 for a, b in zip(offs, offs[1:])), \
            "plan is not banded (non-consecutive stream offsets)"
        idx_rows.append([o + H * p for o in offs])
        coefs.append([c for _, c in by_off])
        tmax = max(tmax, len(offs))
    p_out = len(idx_rows)
    idx = np.zeros((p_out, tmax), dtype=np.int32)
    G = np.zeros((p_out, tmax), dtype=np.float32)
    for r, (ii, cc) in enumerate(zip(idx_rows, coefs)):
        idx[r, :len(ii)] = ii
        idx[r, len(ii):] = ii[-1]
        G[r, :len(cc)] = cc
    assert idx.min() >= 0, "history does not cover the band"
    D = int(idx.max()) // p + 1
    return idx, G, D


def make_stack(plan, D):
    """xs2[c, v, kappa] = sample at stream offset (kappa - H)*p_in + v
    relative to the tile start — D lane-shifted copies stacked on the
    phase axis."""
    import jax.numpy as jnp

    def stack(xin, k_out):
        return jnp.concatenate(
            [xin[:, :, d:d + k_out] for d in range(D)], axis=1)

    return stack


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()  # reuse XLA compiles across tool runs
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", default="DSD256:192000")
    ap.add_argument("--tile-mib", type=int, default=16)
    ap.add_argument("--check", action="store_true",
                    help="CPU equivalence check only (small shapes)")
    ap.add_argument("--blocks", default="16,32",
                    help="block sizes for the block-banded MXU variant")
    ap.add_argument("--ab", default=None,
                    help="interleaved A/B of exactly two named variants "
                         "(e.g. --ab natural,natblock32): alternating "
                         "runs, median per-pair ratio — the only "
                         "trustworthy protocol for promoting a variant")
    ap.add_argument("--pairs", type=int, default=7)
    args = ap.parse_args()
    rate_name, out_hz = args.cell.split(":")
    out_hz = int(out_hz)

    if args.check:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from dsd2dxd_tpu.filters.design import get_chain
    from dsd2dxd_tpu.formats.dsd_types import DsdRate, FilterType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.ops import phase as P
    from dsd2dxd_tpu.pipeline.engine import _tile_bytes_for
    from dsd2dxd_tpu.pipeline.transfer import chunked_device_put

    rate = DsdRate[rate_name]
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    n_head = fused.fused_rational_plan(chain)
    assert n_head is not None, "cell is not rational"
    rstage = chain[-1]
    plan = P.build_plan(rstage, p_in=1)
    coefs, _ = P.build_chain_coefs((plan,), jnp.float32)
    idx_np, G_np, D = plan_banded(plan)
    idx = jnp.asarray(idx_np)
    G = jnp.asarray(G_np)
    stack = make_stack(plan, D)
    p_in, p_out, H = plan.p_in, plan.p_out, plan.hist_lanes
    tmax = idx_np.shape[1]
    print(f"{rate_name}->{out_hz}: p_in={p_in} p_out={p_out} H={H} "
          f"Tmax={tmax} D={D} rows={idx_np.max() + 1}")

    if args.check:
        n_base = p_in * 64
    else:
        tile = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024, rate.hz)
        total_div = 1
        for s in chain[:n_head]:
            total_div *= s.M
        n_base = tile * 8 // total_div
    k_out = n_base // p_in
    rng = np.random.default_rng(0)
    y_np = rng.standard_normal((2, n_base), dtype=np.float32) * 0.5
    hist_np = rng.standard_normal((2, p_in, H), dtype=np.float32) * 0.5

    def prep(yy, hh):
        xx = P.rephase(yy[:, None, :], plan.rephase)
        return jnp.concatenate([hh, xx], axis=2) if H else xx

    def f_matmul(yy, hh):
        return P.stage_apply_phase_matmul(
            yy[:, None, :], hh, plan, coefs[0])[0]

    def f_jloop(yy, hh):
        xin = prep(yy, hh)
        xs = stack(xin, k_out)
        contribs = [G[None, :, j, None] * jnp.take(xs, idx[:, j], axis=1)
                    for j in range(tmax)]
        return P.tree_sum(contribs)

    def f_gather(yy, hh):
        xin = prep(yy, hh)
        xs = stack(xin, k_out)
        xg = jnp.take(xs, idx.reshape(-1), axis=1).reshape(
            2, p_out, tmax, k_out)
        return jnp.einsum("cpjk,pj->cpk", xg, G)

    def make_block(B):
        # static per-block row windows + dense per-block panels
        blocks = []
        for b0 in range(0, p_out, B):
            rows = idx_np[b0:b0 + B]
            lo, hi = int(rows.min()), int(rows.max())
            gb = np.zeros((rows.shape[0], hi - lo + 1), dtype=np.float32)
            for r in range(rows.shape[0]):
                for j in range(tmax):
                    gb[r, rows[r, j] - lo] += G_np[b0 + r, j]
            blocks.append((lo, hi + 1, jnp.asarray(gb)))

        def f_block(yy, hh):
            xin = prep(yy, hh)
            xs = stack(xin, k_out)
            outs = [jnp.einsum("crk,pr->cpk", xs[:, lo:hi, :], gb,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                    for lo, hi, gb in blocks]
            return jnp.concatenate(outs, axis=1)

        return f_block

    # Natural-layout banded matmul: output block 160k..160k+159 reads
    # the 164 *consecutive* input samples 147k+omin..147k+omin+163, so
    # a free reshape (C,n)->(C,K,147), two minor-axis slices + concat
    # -> (C,K,164) windows, ONE einsum with the dense (160,164) band,
    # and a free reshape back to natural order — no rephase transpose
    # in, no interleave transpose out.
    omin = int(min(t.base * p_in + t.r_in for terms in plan.terms
                   for t in terms))
    omax = int(max(t.base * p_in + t.r_in for terms in plan.terms
                   for t in terms))
    U = omax - omin + 1
    nhist = -omin
    B_np = np.zeros((p_out, U), dtype=np.float32)
    for rho, terms in enumerate(plan.terms):
        for t in terms:
            B_np[rho, t.base * p_in + t.r_in - omin] += t.coef
    Bm = jnp.asarray(B_np)

    def make_natural(prec):
        def f_natural(yy, hh):
            # hh: same phase-major (C, p_in, H) history the other
            # variants take; its natural suffix is what the band needs
            hflat = P.interleave_phases(hh)[:, -nhist:]
            c, n = yy.shape
            k = n // p_in
            yr = yy.reshape(c, k, p_in)
            prev = jnp.concatenate(
                [hflat[:, None, :], yr[:, :-1, p_in - nhist:]], axis=1)
            w = jnp.concatenate([prev, yr], axis=2)
            if U > p_in + nhist:
                nxt = jnp.concatenate(
                    [yr[:, 1:, :U - p_in - nhist],
                     jnp.zeros((c, 1, U - p_in - nhist), yy.dtype)],
                    axis=1)
                w = jnp.concatenate([w, nxt], axis=2)
            z = jnp.einsum("cku,pu->ckp", w, Bm,
                           preferred_element_type=jnp.float32,
                           precision=prec)
            return z.reshape(c, k * p_out)  # natural order, free

        return f_natural

    # natsplit: the history term and the in-block term as SEPARATE
    # einsums — the in-block operand is the plain (C,K,147) reshape of y
    # (no 164-wide concat materialized; the only gathered operand is the
    # tiny (C,K,17) previous-block tail), probing whether the natural
    # form's cost is the window concat rather than the einsum.
    def make_natsplit(prec):
        assert U == p_in + nhist
        Bh = Bm[:, :nhist]
        Bmain = Bm[:, nhist:]

        def f_natsplit(yy, hh):
            hflat = P.interleave_phases(hh)[:, -nhist:]
            c, n = yy.shape
            k = n // p_in
            yr = yy.reshape(c, k, p_in)
            prev = jnp.concatenate(
                [hflat[:, None, :], yr[:, :-1, p_in - nhist:]], axis=1)
            z = (jnp.einsum("ckv,pv->ckp", yr, Bmain,
                            preferred_element_type=jnp.float32,
                            precision=prec)
                 + jnp.einsum("cku,pu->ckp", prev, Bh,
                              preferred_element_type=jnp.float32,
                              precision=prec))
            return z.reshape(c, k * p_out)

        return f_natsplit

    # natmain: DIAGNOSTIC ONLY (drops the history term — output is
    # wrong, ignore its err columns): the in-block einsum by itself,
    # isolating the irreducible matmul+reshape cost of the natural form.
    def f_natmain(yy, hh):
        c, n = yy.shape
        k = n // p_in
        yr = yy.reshape(c, k, p_in)
        z = jnp.einsum("ckv,pv->ckp", yr, Bm[:, nhist:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return z.reshape(c, k * p_out)

    # every variant measured to NATURAL order (the production contract:
    # finish_tile consumes interleaved samples) — the phase-major
    # variants pay their interleave_phases transpose, natural doesn't.
    def to_nat(fn):
        return lambda yy, hh: P.interleave_phases(fn(yy, hh))

    variants = [("matmul", to_nat(f_matmul)), ("jloop", to_nat(f_jloop)),
                ("gather", to_nat(f_gather)),
                ("natural", make_natural(jax.lax.Precision.HIGHEST)),
                # HIGH = 3 bf16 passes vs HIGHEST's 6: halves the MXU
                # work IF accuracy holds — judge by the LSB24 column
                # below (vs the host f64 oracle), not the err column
                # (which only measures distance from the f32 baseline).
                ("nat-high", make_natural(jax.lax.Precision.HIGH)),
                ("nat-bf16", make_natural(jax.lax.Precision.DEFAULT))]
    if U == p_in + nhist:
        variants.append(("natsplit", make_natsplit(
            jax.lax.Precision.HIGHEST)))
        variants.append(("natmain", f_natmain))
    for B in (int(b) for b in args.blocks.split(",")):
        variants.append((f"block{B}", to_nat(make_block(B))))

    # production-path variants: plan_banded_natural(_blocks) +
    # stage_apply_rational_natural — what make_fused_rational_step
    # actually dispatches (tail_block=None / =B)
    banded_nat = P.plan_banded_natural(plan)
    if banded_nat is not None:
        band_nat = jnp.asarray(banded_nat[0])
        nhist_nat = banded_nat[1]

        def f_prodnat(yy, hh):
            return P.stage_apply_rational_natural(
                yy, hh, plan, band_nat, nhist_nat)[0]

        variants.append(("prodnat", f_prodnat))
        for B in (int(b) for b in args.blocks.split(",")):
            blocks_nb = [(lo, jnp.asarray(pan)) for lo, pan in
                         P.plan_banded_natural_blocks(banded_nat[0], B)]

            def f_natblock(yy, hh, blocks_nb=blocks_nb):
                return P.stage_apply_rational_natural(
                    yy, hh, plan, band_nat, nhist_nat,
                    blocks=blocks_nb)[0]

            variants.append((f"natblock{B}", f_natblock))

    if args.ab:
        want = args.ab.split(",")
        assert len(want) == 2, "--ab takes exactly two variant names"
        byname = dict(variants)
        variants = [(n, byname[n]) for n in want]

    if args.check:
        ref = np.asarray(jax.jit(variants[0][1])(y_np, hist_np))
        scale = np.abs(ref).max()
        ok = True
        for name, fn in variants[1:]:
            got = np.asarray(jax.jit(fn)(y_np, hist_np))
            err = np.abs(got - ref).max() / scale
            diag = name == "natmain"  # history term dropped by design
            print(f"  {name:<8}: max rel err vs matmul = {err:.3e}"
                  + ("  (diagnostic, not gated)" if diag else ""))
            ok &= diag or err < 1e-6
        print("EQUIVALENCE", "OK" if ok else "FAIL")
        return 0 if ok else 1

    if jax.default_backend() != "tpu":
        print("ERROR: needs the real TPU (or --check)", file=sys.stderr)
        return 2
    y = chunked_device_put(y_np)
    hist = jnp.asarray(hist_np)
    secs = n_base / (out_hz * 147 / 160)
    print(f"  n_base={n_base} ({secs:.2f}s audio at the base rate)")
    # host f64 oracle on a prefix (full tile would be slow in numpy):
    # the banded form itself, double precision — accuracy ground truth
    # for the precision variants (max error in 24-bit LSBs).
    assert U == p_in + nhist, "oracle assumes the in-block band shape"
    n_orc = min(n_base, p_in * 512)
    k_orc = n_orc // p_in
    yr64 = y_np[:, :n_orc].astype(np.float64).reshape(2, k_orc, p_in)
    prev64 = np.concatenate(
        [hist_np.astype(np.float64)[:, None, :, 0][:, :, p_in - nhist:],
         yr64[:, :-1, p_in - nhist:]], axis=1)
    w64 = np.concatenate([prev64, yr64], axis=2)
    z64 = np.einsum("cku,pu->ckp", w64,
                    B_np.astype(np.float64)).reshape(2, k_orc * p_out)
    lsb24 = 2.0 ** -23
    ref = None
    for name, fn in variants:
        f = jax.jit(fn)
        try:
            z = jax.block_until_ready(f(y, hist))
        except Exception as e:
            print(f"  {name:<8}: failed: {str(e).splitlines()[0][:100]}")
            continue
        zn = np.asarray(z)
        if ref is None:
            ref = zn
            scale = np.abs(ref).max()
            err = 0.0
        else:
            err = float(np.abs(zn - ref).max() / scale)
        e64 = np.abs(zn[:, :k_orc * p_out].astype(np.float64) - z64)
        t = bench(f, (y, hist))
        print(f"  {name:<8}: {t*1e3:7.2f} ms  ({secs/t:6.0f}x RT)  "
              f"err={err:.1e}  max={e64.max()/lsb24:7.2f} LSB24 "
              f"rms={np.sqrt((e64**2).mean())/lsb24:.3f}")

    if args.ab:
        import timing

        (a_name, fa), (b_name, fb) = variants
        ja, jb = jax.jit(fa), jax.jit(fb)

        # per-arm iteration slope (bench's digest protocol, n=6): raw
        # single-fetch arms share the tunnel intercept and compress the
        # ratio toward 1; block_until_ready alone returns early
        def run(f):
            return bench(f, (y, hist), n=6)

        run(ja); run(jb)  # warm (accuracy loop used fresh jits)
        ta, tb, med = timing.interleaved_pairs(
            lambda: run(ja), lambda: run(jb), args.pairs)
        print(f"A/B {a_name} vs {b_name}: median t_a/t_b = {med:.3f}  "
              f"best a={min(ta)*1e3:.2f} ms b={min(tb)*1e3:.2f} ms  "
              f"(pairs: {' '.join(f'{x/z:.3f}' for x, z in zip(ta, tb))})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
