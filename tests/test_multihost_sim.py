"""True multi-process (DCN-simulated) serving test: 2 processes × 4 CPU
devices join via jax.distributed + gloo collectives, form the
replica×shard serving mesh, and run the REAL sharded index search; both
processes assert equality against a local exact oracle
(tools/multihost_sim.py — the 2-host upgrade of the single-controller
virtual-mesh dryrun)."""

import subprocess
import sys
from pathlib import Path


def test_two_process_serving_matches_oracle():
    script = Path(__file__).resolve().parent.parent / "tools" / "multihost_sim.py"
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=560,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "MULTIHOST SIM OK" in out.stdout, out.stdout
