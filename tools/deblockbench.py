"""A/B alternative de-block formulations for the fused float path.

Sublane block-batching (ops/fused.py `sublane_batch`) makes the kernel
emit (batch*C, n_blocks*k_sub) with `batch` time sub-blocks stacked on
the sublane axis. Int paths emit byte planes and the HOST deplaner
absorbs the reorder; the FLOAT path (rational 48k heads, f32 output)
must de-block ON DEVICE — today a single XLA transpose:

    o.reshape(batch, c, nb, k_sub)[..., ::r_tail-ish].transpose(1,2,0,3)

tools/ratprof.py pinned this epilogue class at ~30% of the whole 48k
step (head f32 786x vs the same chain's int-planes cell 1037x on
DSD256→192k), which is ~100x off a bandwidth-roofline copy — sublane-
axis transposes are a known soft spot. Candidates, all REQUIRED to be
bitwise-identical to the transpose (checked here, on chip):

  transpose : production expression (reshape + 4D transpose)
  stack     : per-b slices stacked on a new minor-block axis
  mxu_bi    : one-hot einsum contracting (b, i) -> J = i*batch + b at
              Precision.HIGHEST — for a 0/1 matrix the 3-way bf16
              operand split is exact (8+8+8 >= 24 mantissa bits), so
              the MXU pass is bit-exact f32; full J^2 one-hot
  mxu_b     : identity einsum over b only (contraction size = batch),
              J-position recovered by reshape

    python tools/deblockbench.py [--cell DSD256:192000] [--tile-mib 16]
    python tools/deblockbench.py --check     (CPU, bitwise equivalence)
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import numpy as np


def main() -> int:
    from dsd2dxd_tpu.utils.device import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", default="DSD256:192000")
    ap.add_argument("--tile-mib", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--ab", default=None,
                    help="interleaved A/B of two named variants")
    ap.add_argument("--pairs", type=int, default=7)
    args = ap.parse_args()
    rate_name, out_hz = args.cell.split(":")
    out_hz = int(out_hz)

    if args.check:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import timing

    from dsd2dxd_tpu.filters.design import get_chain
    from dsd2dxd_tpu.formats.dsd_types import DsdRate, FilterType
    from dsd2dxd_tpu.ops import fused
    from dsd2dxd_tpu.pipeline.engine import _tile_bytes_for

    rate = DsdRate[rate_name]
    chain = get_chain(FilterType.EQUIRIPPLE, rate, out_hz)
    n_head = fused.fused_rational_plan(chain)
    head = tuple(chain[:n_head]) if n_head is not None else tuple(chain)
    plan = fused.fused_plan(head)
    assert plan is not None, "cell has no fused plan"
    _n, g, r_tail = plan
    bb = fused.pick_block_bytes(chain, rate.hz)
    c = 2
    # mirror make_fused_step's grid math (ops/fused.py): word lanes per
    # grid step, sublane batch factor, per-sub-block lanes
    block_lanes = bb // g
    batch = fused.sublane_batch(c, block_lanes, r_tail)
    assert batch > 1, "cell is not sublane-batched; nothing to de-block"
    k_sub = block_lanes // batch
    k2 = k_sub // r_tail
    if args.check:
        nb = 3
    else:
        tile = _tile_bytes_for(chain, args.tile_mib * 1024 * 1024, rate.hz)
        nb = (tile // g) // block_lanes
    J = nb * batch
    n = J * k2
    secs = n * 8 * g * r_tail / rate.hz  # base samples -> audio seconds
    print(f"{rate_name}->{out_hz}: g={g} r_tail={r_tail} batch={batch} "
          f"k_sub={k_sub} nb={nb} J={J} n={n} f32 ({4 * c * n / 1e6:.1f} MB"
          f" out, {secs:.2f}s audio)" if not args.check else
          f"{rate_name}->{out_hz}: check shapes batch={batch} "
          f"k_sub={k_sub} nb={nb}")

    # kernel output as the float step sees it pre-de-block: the r_tail
    # phase slice is part of the production expression, so keep it
    def pre(o):
        o = o.reshape(batch, c, nb, k_sub)
        if r_tail > 1:
            o = o.reshape(batch, c, nb, k2, r_tail)[..., 0]
        return o  # (batch, c, nb, k2)

    def f_transpose(o):
        return pre(o).transpose(1, 2, 0, 3).reshape(c, n)

    def f_stack(o):
        o = pre(o)
        return jnp.stack([o[b] for b in range(batch)],
                         axis=2).reshape(c, n)

    E = np.zeros((batch, nb, J), dtype=np.float32)
    for b in range(batch):
        for i in range(nb):
            E[b, i, i * batch + b] = 1.0
    Ej = jnp.asarray(E)

    def f_mxu_bi(o):
        z = jnp.einsum("bcik,biJ->cJk", pre(o), Ej,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return z.reshape(c, n)

    I4 = jnp.eye(batch, dtype=jnp.float32)

    def f_mxu_b(o):
        z = jnp.einsum("bcik,bB->ciBk", pre(o), I4,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return z.reshape(c, n)

    # noop: same input read, r_tail slice and digest but NO reorder —
    # the dispatch/read/digest floor every other variant also pays, so
    # variant − noop isolates the reorder itself (a single dispatch
    # through the axon tunnel costs ~1-2 ms, swamping absolute numbers).
    # raw skips even the r_tail slice: noop − raw = the strided
    # phase-extraction cost, the other hidden constant in the float path.
    def f_noop(o):
        return pre(o).reshape(c, n)

    def f_raw(o):
        return o

    variants = [("raw", f_raw), ("noop", f_noop),
                ("transpose", f_transpose), ("stack", f_stack),
                ("mxu_bi", f_mxu_bi), ("mxu_b", f_mxu_b)]

    # --- r_tail phase-0 EXTRACTION variants (the real cost: noop−raw
    # measured ~7.9 ms per 38.5 MB f32 tile, ~4.9 GB/s — pathological
    # for a relayout). All flat (rows, L) -> (rows, L/r_tail), bitwise-
    # checked vs the strided slice. Lane phase is global (k_sub % r_tail
    # == 0), so extraction commutes with the de-block reshapes.
    rows_f = batch * c
    L = nb * k_sub

    def x3(o):
        return o.reshape(rows_f, L // r_tail, r_tail)

    def f_exslice(o):
        return x3(o)[..., 0]

    e0 = jnp.zeros((r_tail,), jnp.float32).at[0].set(1.0)

    def f_exein(o):
        # one-hot contraction over the minor phase axis: 1.0*x + 0.0*y
        # is exact for finite y (kernel outputs are bounded), and the
        # access pattern is a plain reduction, not a strided gather
        return jnp.einsum("klt,t->kl", x3(o), e0,
                          preferred_element_type=jnp.float32)

    def f_exmask(o):
        return (x3(o) * e0).sum(axis=-1)

    if r_tail > 1:
        variants += [("exslice", f_exslice), ("exein", f_exein),
                     ("exmask", f_exmask)]

    # planes-path u8 extraction helpers (shared by --check and the chip
    # section): bitcast byte pairs/quads to u16/u32 and mask the low
    # byte — LE lane order makes element [..., 0] the low byte, so
    # `v & 0xFF` IS phase 0, with no strided access (chained for 8+).
    rows_p = 3 * batch * c

    def u8slice(p):
        return p.reshape(rows_p, L // r_tail, r_tail)[..., 0]

    def u8cast(p):
        v = p
        left = r_tail
        while left > 1:
            s = 4 if left % 4 == 0 else 2
            v = jax.lax.bitcast_convert_type(
                v.reshape(rows_p, -1, s),
                jnp.uint32 if s == 4 else jnp.uint16)
            v = (v & 0xFF).astype(jnp.uint8)
            left //= s
        return v
    if args.ab:
        want = args.ab.split(",")
        byname = dict(variants)
        variants = [(w, byname[w]) for w in want]

    rng = np.random.default_rng(11)
    o_np = rng.standard_normal((batch * c, nb * k_sub),
                               dtype=np.float32)

    if args.check:
        ref = np.asarray(jax.jit(f_transpose)(o_np))
        exref = (np.asarray(jax.jit(f_exslice)(o_np)) if r_tail > 1
                 else None)
        ok = True
        for name, fn in variants[2:]:
            got = np.asarray(jax.jit(fn)(o_np))
            if name == "exslice":
                continue
            same = np.array_equal(
                got, exref if name.startswith("ex") else ref)
            print(f"  {name:<9}: bitwise {'OK' if same else 'MISMATCH'}")
            ok &= same
        if r_tail > 1:
            p_np = rng.integers(0, 256, (rows_p, L), dtype=np.uint8)
            same = np.array_equal(np.asarray(jax.jit(u8cast)(p_np)),
                                  np.asarray(jax.jit(u8slice)(p_np)))
            print(f"  u8cast   : bitwise {'OK' if same else 'MISMATCH'}")
            ok &= same
        print("EQUIVALENCE", "OK" if ok else "FAIL")
        return 0 if ok else 1

    if jax.default_backend() != "tpu":
        print("ERROR: needs the real TPU (or --check)", file=sys.stderr)
        return 2
    from dsd2dxd_tpu.pipeline.transfer import chunked_device_put

    reps = 6  # distinct inputs folded into ONE dispatch per timed run
    os_dev = [chunked_device_put(
        rng.standard_normal((batch * c, nb * k_sub), dtype=np.float32))
        for _ in range(reps)]
    jax.block_until_ready(os_dev)

    def digest(z):
        return jnp.stack([jnp.sum(z), jnp.max(z)])

    ref = None
    jits = {}
    times = {}
    for name, fn in variants:
        z = jax.block_until_ready(jax.jit(fn)(os_dev[0]))
        if name == "transpose":
            ref = np.asarray(z)
            bit = "reference"
        elif name == "noop":
            bit = "baseline, no reorder"
        elif name == "raw":
            bit = "baseline, no slice"
        elif name == "exslice":
            exref = np.asarray(z)
            bit = "extraction reference"
        elif name.startswith("ex"):
            bit = ("bit-exact" if np.array_equal(np.asarray(z), exref)
                   else "DIFFERS")
        else:
            bit = ("bit-exact" if np.array_equal(np.asarray(z), ref)
                   else "DIFFERS")
        del z
        # all `reps` inputs inside one jit: one tunnel dispatch per run
        f = jax.jit(lambda os, fn=fn: sum(digest(fn(o)) for o in os))
        jits[name] = f
        np.asarray(f(os_dev))  # warm

        def run(f=f):
            t0 = time.perf_counter()
            np.asarray(f(os_dev))
            return (time.perf_counter() - t0) / reps

        t = timing.min_of(run, n=args.runs)
        times[name] = t
        extra = ""
        if name.startswith("ex") and "raw" in times:
            extra = f"  extract={1e3 * (t - times['raw']):+.3f} ms"
        elif name not in ("noop", "raw") and "noop" in times:
            extra = f"  reorder={1e3 * (t - times['noop']):+.3f} ms"
        print(f"  {name:<9}: {t * 1e3:7.3f} ms  ({bit}){extra}")

    # --- planes-path u8 extraction: the int cells pay the same strided
    # [..., 0] on their (3R, L) u8 planes. Candidate: bitcast byte
    # PAIRS/QUADS to u16/u32 and mask the low byte — LE lane order makes
    # element [..., 0] the low byte, so `v & 0xFF` IS phase 0, with no
    # strided access (chained for r_tail 8+).
    if r_tail > 1:
        def u8raw(p):
            return p

        ps = [chunked_device_put(rng.integers(
            0, 256, (rows_p, L), dtype=np.uint8)) for _ in range(reps)]
        jax.block_until_ready(ps)

        def udigest(z):
            return jnp.stack([jnp.sum(z, dtype=jnp.float32),
                              jnp.max(z).astype(jnp.float32)])

        print(f"  -- planes u8 extraction ({rows_p}x{L}, "
              f"{rows_p * L / 1e6:.1f} MB) --")
        uref = None
        utimes = {}
        for name, fn in (("u8raw", u8raw), ("u8slice", u8slice),
                         ("u8cast", u8cast)):
            z = jax.block_until_ready(jax.jit(fn)(ps[0]))
            if name == "u8slice":
                uref = np.asarray(z)
                bit = "extraction reference"
            elif name == "u8raw":
                bit = "baseline, no slice"
            else:
                bit = ("bit-exact"
                       if np.array_equal(np.asarray(z), uref)
                       else "DIFFERS")
            del z
            f = jax.jit(lambda os, fn=fn: sum(udigest(fn(o)) for o in os))
            np.asarray(f(ps))

            def run(f=f):
                t0 = time.perf_counter()
                np.asarray(f(ps))
                return (time.perf_counter() - t0) / reps

            t = timing.min_of(run, n=args.runs)
            utimes[name] = t
            extra = ""
            if name != "u8raw":
                extra = (f"  extract="
                         f"{1e3 * (t - utimes['u8raw']):+.3f} ms")
            print(f"  {name:<9}: {t * 1e3:7.3f} ms  ({bit}){extra}")

    if args.ab:
        (an, _), (bn, _) = variants[:2]

        def mk(f):
            def run():
                t0 = time.perf_counter()
                np.asarray(f(os_dev))
                return time.perf_counter() - t0
            return run

        ra, rb = mk(jits[an]), mk(jits[bn])
        ra(); rb()
        ta, tb, med = timing.interleaved_pairs(ra, rb, args.pairs)
        print(f"A/B {an} vs {bn}: median t_a/t_b = {med:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
