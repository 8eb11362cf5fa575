"""Desktop-mode supervisor lifecycle (panoptikon_tpu/desktop.py).

Reference anchor: /root/reference/panoptikon-desktop/src-tauri/src/
supervisor.rs (restart-with-backoff), lifecycle.rs (terminate → grace →
kill). Tests drive the injectable lifecycle with fake children — plus one
real end-to-end: supervising an actual child process through crash,
restart, and clean stop."""

import subprocess
import sys
import threading
import time

from panoptikon_tpu.desktop import (
    BACKOFF_MAX_S,
    DesktopSupervisor,
    backoff_schedule,
    run_desktop,
)


class FakeChild:
    def __init__(self):
        self.rc = None
        self.terminated = False

    def poll(self):
        return self.rc

    def terminate(self):
        self.terminated = True
        self.rc = -15

    def kill(self):
        self.rc = -9

    def wait(self, timeout=None):
        return self.rc


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def sleep(self, dt):
        self.t += dt


class TestBackoff:
    def test_doubles_to_cap(self):
        g = backoff_schedule(1.0, 8.0)
        assert [next(g) for _ in range(6)] == [1, 2, 4, 8, 8, 8]


class TestLifecycle:
    def test_opens_ui_once_after_first_health(self):
        clock = Clock()
        children = []
        opened = []

        def spawn():
            c = FakeChild()
            children.append(c)
            if len(children) == 2:
                c.rc = 1  # second child dies instantly → third spawn
            return c

        probes = iter([False, True])  # first child: healthy on 2nd poll
        sup = DesktopSupervisor(
            spawn=spawn,
            probe=lambda: next(probes, True),
            open_ui=lambda: opened.append(1),
            log=lambda m: None,
            clock=clock, sleep=clock.sleep,
            max_restarts=2,
        )

        # Crash the healthy child after a few polls, then stop on child 3.
        def driver():
            while len(children) < 1 or children[0].rc is None:
                if children and clock.t > 5:
                    children[0].rc = 1
                time.sleep(0.001)
            while len(children) < 3:
                time.sleep(0.001)
            sup.request_stop()

        t = threading.Thread(target=driver)
        t.start()
        rc = sup.run()
        t.join()
        assert rc == 0
        assert opened == [1]  # once, not per restart
        assert sup.restarts == 2

    def test_health_timeout_counts_as_restart(self):
        clock = Clock()
        sup = DesktopSupervisor(
            spawn=lambda: FakeChild(),
            probe=lambda: False,
            log=lambda m: None,
            clock=clock, sleep=clock.sleep,
            health_timeout_s=3.0,
            max_restarts=1,
        )
        assert sup.run() == 1
        assert sup.restarts == 2  # budget 1 exceeded on the 2nd failure

    def test_stop_terminates_live_child(self):
        clock = Clock()
        child = FakeChild()
        sup = DesktopSupervisor(
            spawn=lambda: child,
            probe=lambda: True,
            log=lambda m: None,
            clock=clock, sleep=clock.sleep,
        )
        t = threading.Thread(target=sup.run)
        t.start()
        time.sleep(0.05)
        sup.request_stop()
        t.join(timeout=5)
        assert not t.is_alive()
        assert child.terminated

    def test_backoff_resets_after_stable_run(self):
        """Deterministic, single-threaded: children with scripted fake-clock
        lifetimes [0, 0, 70, 0, 0]. The 70 s child outlives STABLE_RESET_S,
        so the ladder restarts at 1 s after it dies."""
        clock = Clock()
        delays = []
        real_sleep = clock.sleep

        def sleep(dt):
            if dt >= 1.0:  # backoff sleeps only (polls are 0.5)
                delays.append(dt)
            real_sleep(dt)

        class TimedChild:
            def __init__(self, lifetime):
                self.deadline = clock.t + lifetime
                self.terminated = False

            def poll(self):
                return 1 if clock.t >= self.deadline else None

            def terminate(self):
                self.terminated = True
                self.deadline = clock.t

            kill = terminate

            def wait(self, timeout=None):
                return 1

        lifetimes = iter([0.0, 0.0, 70.0, 0.0, 0.0])
        sup = DesktopSupervisor(
            spawn=lambda: TimedChild(next(lifetimes)),
            probe=lambda: True, log=lambda m: None,
            clock=clock, sleep=sleep, max_restarts=4,
        )
        assert sup.run() == 1  # budget exhausted on the 5th crash
        assert delays[:4] == [1.0, 2.0, 1.0, 2.0], delays


class TestRealChild:
    def test_supervise_real_process_end_to_end(self, tmp_path):
        """One real cycle: child crashes once, restarts, goes healthy (a
        sentinel file stands in for /api/health), then clean stop."""
        flag = tmp_path / "up"
        marker = tmp_path / "first"
        # First run exits 1 immediately; later runs touch the flag and idle.
        prog = (
            "import pathlib,sys,time\n"
            f"m=pathlib.Path({str(marker)!r})\n"
            f"u=pathlib.Path({str(flag)!r})\n"
            "if not m.exists():\n"
            "    m.touch(); sys.exit(1)\n"
            "u.touch()\n"
            "time.sleep(60)\n"
        )
        sup = DesktopSupervisor(
            spawn=lambda: subprocess.Popen([sys.executable, "-c", prog]),
            probe=flag.exists,
            log=lambda m: None,
            health_timeout_s=30.0,
            poll_interval_s=0.05,
            max_restarts=5,
        )

        def stop_when_healthy():
            deadline = time.monotonic() + 30
            while time.monotonic() < deadline and not flag.exists():
                time.sleep(0.05)
            time.sleep(0.2)
            sup.request_stop()

        t = threading.Thread(target=stop_when_healthy)
        t.start()
        rc = sup.run()
        t.join()
        assert rc == 0
        assert sup.restarts == 1  # exactly the initial crash
        assert flag.exists()
        # Child is gone after stop.
        assert sup._child.poll() is not None


class TestCliWiring:
    def test_parser_has_desktop(self):
        from panoptikon_tpu.cli import build_parser

        args = build_parser().parse_args(
            ["desktop", "--no-browser", "--port", "7001", "--max-restarts", "0"]
        )
        assert args.command == "desktop"
        assert args.no_browser and args.port == 7001

    def test_run_desktop_no_browser_gives_noop_ui(self, monkeypatch):
        import types

        import panoptikon_tpu.desktop as d

        captured = {}

        class Sup:
            def __init__(self, **kw):
                captured.update(kw)

            def run(self):
                return 0

        monkeypatch.setattr(d, "DesktopSupervisor", Sup)
        monkeypatch.setattr(d.signal, "signal", lambda *a: None)
        args = types.SimpleNamespace(
            host=None, port=7002, config=None, data_root=None,
            registry_dir=None, no_browser=True, manifest=None,
            max_restarts=3,
        )
        assert run_desktop(args) == 0
        captured["open_ui"]()  # must be a no-op, not a browser launch
        assert captured["max_restarts"] == 3
        # The probe must hit a path the real server actually registers
        # (caught live: probing /api/health 404'd forever and the
        # supervisor restart-looped a healthy server).
        probed = []
        monkeypatch.setattr(d, "_http_ok", lambda url, **kw: probed.append(url))
        captured["probe"]()
        from panoptikon_tpu.api.server import build_app

        paths = {
            r.resource.canonical
            for r in build_app(object()).router.routes()
            if r.resource is not None
        }
        from urllib.parse import urlparse

        assert urlparse(probed[0]).path in paths, (probed, sorted(paths)[:5])
