"""Per-query bench drift guard.

Round 2 shipped a 2x flood regression because only the TOTAL bench time
was watched; this guard compares each headline query against the
committed baseline (bench_baseline.json, refreshed each round) and
fails when one drifts past the noise envelope.

Opt-in via SPARK_GRAFT_BENCH_GUARD=1 — the full sf0.1 bench takes
minutes and local boxes vary, so this is run explicitly before each
round's final commit (see NOTES), not on every pytest invocation.

Baseline protocol (frozen round 7): bench_baseline.json carries the
DRIVER's warm per-query numbers from its own BENCH_r{N}.json,
verbatim — driver-run compared against driver-run. The earlier
builder-quiet-box-min protocol was retired after round 6 showed a
+21.5% cold swing on byte-identical code (pure box noise), proving
those minima unreproducible as a comparison floor.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "bench_baseline.json")


def _allowed(base: float) -> float:
    # 1.5x relative or +2s absolute, whichever is looser: sub-second
    # queries jitter by whole multiples on a busy box; multi-second
    # queries are stable enough that 1.5x catches a real regression
    # (the round-2 flood slip was 2.1x / +3.3s — both nets catch it).
    return max(1.5 * base, base + 2.0)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_BENCH_GUARD"),
    reason="bench guard is explicit: SPARK_GRAFT_BENCH_GUARD=1",
)
def test_no_headline_query_regressed():
    with open(BASELINE) as f:
        baseline = json.load(f)["queries"]

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        timeout=600,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    current = json.loads(line)["queries"]

    drifted = {
        name: (base, current.get(name))
        for name, base in baseline.items()
        if name in current and current[name] > _allowed(base)
    }
    assert not drifted, f"queries past the drift envelope: {drifted}"
