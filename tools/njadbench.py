"""Interleaved A/B of the NJAD digit-pair variants (host-side).

digit_pair via integer DIVIDE (the round-3 form; one 64-bit div per
sample, a ~25-40-cycle dependency chain) vs the threshold LADDER
(eight independent compare-adds) — see native/src/njad.cc. Both are
compiled into the library and selected per quantize call by
DSDKIT_NJAD_DIGIT, so one process can alternate them in (A,B) pairs
with a median-of-pairs ratio — the only timing protocol this box's
±40% clock wander permits (CLAUDE.md).

    python tools/njadbench.py [--seconds 4] [--pairs 7]
"""

from __future__ import annotations

import argparse
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--pairs", type=int, default=7)
    args = ap.parse_args()

    from dsd2dxd_tpu.native import lib as native

    rng = np.random.default_rng(0)
    n = int(args.seconds * 88200)
    # pink-ish stereo at 20 bits — the config-3 shape, no silence memo
    w = rng.standard_normal(n + 1024)
    k = np.exp(-np.arange(256) / 48.0)
    x = np.convolve(w, k / k.sum(), mode="same")[:n]
    x = (0.3 * x / np.abs(x).max()).astype(np.float32)
    x = np.stack([x, np.roll(x, 7)], axis=1)

    def run(variant):
        if variant == "ladder":
            os.environ["DSDKIT_NJAD_DIGIT"] = "ladder"
        else:
            os.environ.pop("DSDKIT_NJAD_DIGIT", None)
        st = native.njad_new(2)
        t0 = time.perf_counter()
        out = native.njad_quantize(st, x, 20)
        dt = time.perf_counter() - t0
        native.njad_free(st)
        return dt, out

    # warm + bit-identity gate before timing anything
    _, a = run("div")
    _, b = run("ladder")
    assert np.array_equal(a, b), "digit variants disagree — DO NOT TRUST TIMES"

    tdiv, tthr = [], []
    for _ in range(args.pairs):
        tdiv.append(run("div")[0])
        tthr.append(run("ladder")[0])
    ratios = [d / t for d, t in zip(tdiv, tthr)]
    xd = args.seconds / statistics.median(tdiv)
    xt = args.seconds / statistics.median(tthr)
    print(f"div    : {xd:8.1f}x RT  (median of {args.pairs})")
    print(f"ladder : {xt:8.1f}x RT")
    print(f"ladder speedup (median of per-pair ratios): "
          f"{statistics.median(ratios):.3f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
