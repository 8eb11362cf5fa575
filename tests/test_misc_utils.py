"""Lossless TOML editor, policy tokens, PhaseTimer."""

import time

import pytest

from panoptikon_tpu.utils.logging import PhaseTimer
from panoptikon_tpu.utils.toml_edit import TomlDocument

SAMPLE = """# Server config — hand-written comments must survive edits.
data_root = "./data"   # the data directory

[search]
# span cache budget
cache_bytes = 1024
other = "keep"

[jobs]
loader_concurrency = 4
"""


class TestTomlEdit:
    def test_set_preserves_comments_and_order(self):
        doc = TomlDocument(SAMPLE)
        doc.set("search.cache_bytes", 2048)
        text = doc.text()
        assert "cache_bytes = 2048" in text
        assert "# span cache budget" in text
        assert "# the data directory" in text
        assert text.index("data_root") < text.index("[search]") < text.index("[jobs]")
        # Inline comment on the edited line survives after the value.
        doc2 = TomlDocument(SAMPLE)
        doc2.set("data_root", "/elsewhere")
        assert 'data_root = "/elsewhere" # the data directory' in doc2.text().replace("   #", " #")

    def test_parseable_after_edit(self):
        import tomllib

        doc = TomlDocument(SAMPLE)
        doc.set("search.cache_bytes", 2048)
        doc.set("jobs.scan_thumbnails", False)
        doc.set("logging.level", "debug")  # new section appended
        parsed = tomllib.loads(doc.text())
        assert parsed["search"]["cache_bytes"] == 2048
        assert parsed["jobs"]["scan_thumbnails"] is False
        assert parsed["logging"]["level"] == "debug"
        assert parsed["search"]["other"] == "keep"

    def test_get_raw(self):
        doc = TomlDocument(SAMPLE)
        assert doc.get_raw("search.cache_bytes") == "1024"
        assert doc.get_raw("search.missing") is None

    def test_atomic_commit(self, tmp_path):
        path = tmp_path / "cfg.toml"
        path.write_text(SAMPLE)
        doc = TomlDocument.load(path)
        doc.set("search.cache_bytes", 4096)
        doc.commit(path)
        assert "cache_bytes = 4096" in path.read_text()


class TestPhaseTimer:
    def test_work_and_parallelism(self):
        timer = PhaseTimer()
        with timer.span("load"):
            time.sleep(0.02)
        report = timer.report()
        assert report["load"]["work"] >= 0.02
        assert report["load"]["parallelism"] == pytest.approx(1.0, abs=0.2)

    def test_overlapping_spans_raise_parallelism(self):
        import threading

        timer = PhaseTimer()

        def worker():
            with timer.span("inference"):
                time.sleep(0.05)

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        report = timer.report()
        # 4 overlapping spans: work ≈ 4×busy.
        assert report["inference"]["parallelism"] > 2.0


class TestRootLock:
    def test_reacquire_same_process_ok(self, tmp_path):
        from panoptikon_tpu.utils import rootlock

        rootlock.acquire(tmp_path)
        rootlock.acquire(tmp_path)  # idempotent
        rootlock.release(tmp_path)

    def test_second_process_fails_fast(self, tmp_path):
        import subprocess
        import sys
        import textwrap

        from panoptikon_tpu.utils import rootlock

        rootlock.acquire(tmp_path)
        try:
            code = textwrap.dedent(f"""
                from panoptikon_tpu.utils import rootlock
                try:
                    rootlock.acquire({str(tmp_path)!r})
                except rootlock.RootLockError as e:
                    print("LOCKED", e)
                else:
                    print("ACQUIRED")
            """)
            out = subprocess.run(
                [sys.executable, "-c", code], capture_output=True, text=True,
                cwd="/root/repo",
            )
            assert "LOCKED" in out.stdout, out.stdout + out.stderr
        finally:
            rootlock.release(tmp_path)
