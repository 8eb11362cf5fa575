"""Randomized PQL composition fuzz (tools/pql_fuzz.py) as a standing
test: a smaller tree count than the standalone harness, fresh seed per
code change is unnecessary — the generator is seeded, so this is a
deterministic regression net over AND/OR/NOT composition against the
set-algebra oracle."""

import subprocess
import sys
from pathlib import Path


def test_fuzzed_compositions_match_oracle():
    script = Path(__file__).resolve().parent.parent / "tools" / "pql_fuzz.py"
    out = subprocess.run(
        [sys.executable, str(script), "--trees", "40", "--items", "160",
         "--seed", "3"],
        capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert '"failures": []' in out.stdout, out.stdout
