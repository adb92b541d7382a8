"""CI floor for the host-stage budget (VERDICT r4 item 7).

HOSTBUDGET.json records each host stage's per-core xRT measured by
tools/hostbudget.py; the e2e host-core claims in HOSTBUDGET.md are
derived from it. This gate runs the SAME stage runners (shared via
hostbudget.stage_runners, so table and gate cannot drift) on ~1 s of
audio and asserts each stage still reaches half its recorded xRT — a
cheap tripwire that catches host-stage regressions (a FLAC or NJAD
change that halves throughput) before they surface as e2e mysteries.
The 2x slack absorbs this box's ±40% clock wander (CLAUDE.md) plus the
short-run penalty; best-of-3 keeps flake low.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np
import pytest

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT / "tools"))

_TABLE = _ROOT / "HOSTBUDGET.json"


@pytest.mark.skipif(not _TABLE.exists(), reason="no recorded budget")
def test_host_stages_within_2x_of_recorded_budget():
    import hostbudget

    recorded = json.loads(_TABLE.read_text())["stages"]
    secs = 1.0
    runners = hostbudget.stage_runners(secs, np.random.default_rng(0))
    assert set(runners) == set(recorded), (
        "stage set drifted: refresh with tools/hostbudget.py --write")
    slow = []
    for name, (fn, env) in runners.items():
        # pin threads to 1 like the recorded table (hostbudget measures
        # xrt_per_core via with_threads(1)): on a multi-core box the
        # default pool parallelism would mask exactly the single-core
        # regression this tripwire exists to catch
        import os

        if env:
            os.environ[env] = "1"
        try:
            fn()  # warm (first call builds native lib / faults inputs)
            best = min(_timed(fn) for _ in range(3))
        finally:
            if env:
                os.environ.pop(env, None)
        xrt = secs / best
        floor = recorded[name]["xrt_per_core"] / 2.0
        if xrt < floor:
            slow.append(f"{name}: {xrt:.0f}x < floor {floor:.0f}x "
                        f"(recorded {recorded[name]['xrt_per_core']}x)")
    assert not slow, "; ".join(slow)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
