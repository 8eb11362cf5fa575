"""Jobs layer tests: scan → extraction → reconcile end-to-end with
in-process fixture/real models (the reference's real-process/fake-model
pattern, in-process)."""

import time

import numpy as np
import pytest

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter
from panoptikon_tpu.index.vector_index import VectorIndex
from panoptikon_tpu.jobs import cron, extraction, index_sync, reconcile, scan
from panoptikon_tpu.jobs.queue import ChangeSummary, JobQueue, JobType
from panoptikon_tpu.models.impls import IMPL_INDEX
from panoptikon_tpu.models.manager import ModelManager
from panoptikon_tpu.models.registry import Registry

REG_TOML = """
[group.clip]
config.impl_class = "clip"
config.model_arch = "test-tiny"
[group.clip.metadata]
output_type = "clip"
input_mime_types = ["image/"]
[group.clip.inference_ids.tiny]

[group.textembed]
config.impl_class = "sentence_transformers"
config.model_arch = "test-tiny"
[group.textembed.inference_ids.tiny-te]

[group.tags]
config.impl_class = "wd_tagger"
config.model_arch = "test-tiny"
[group.tags.inference_ids.tiny-tagger]

[group.fixtures.inference_ids.slots]
config.impl_class = "errorslot_impl"

[group.whisper]
config.impl_class = "whisper"
config.model_arch = "test-tiny"
config.max_tokens = 8
[group.whisper.metadata]
output_type = "text"
input_mime_types = ["audio/"]
[group.whisper.inference_ids.tiny-stt]

[group.oomfix]
config.impl_class = "oom_impl"
config.oom_above = 0
[group.oomfix.metadata]
output_type = "clip"
input_mime_types = ["image/"]
[group.oomfix.inference_ids.dead]
"""


def make_png(path, color, size=(40, 40)):
    from PIL import Image

    Image.new("RGB", size, color).save(path)


@pytest.fixture
def media_root(tmp_path):
    media = tmp_path / "media"
    (media / "sub").mkdir(parents=True)
    make_png(media / "red.png", (255, 0, 0))
    make_png(media / "green.png", (0, 255, 0))
    make_png(media / "sub" / "blue.png", (0, 0, 255))
    (media / "notes.txt").write_text("not an image")
    (media / ".hidden.png").write_text("skip me")
    return media


@pytest.fixture
def env(tmp_path, media_root):
    db = Database(tmp_path / "data", "jobs")
    writer = IndexWriter(db)
    index = VectorIndex(chunk_rows=64)
    reg_dir = tmp_path / "registry"
    reg_dir.mkdir()
    (reg_dir / "00.toml").write_text(REG_TOML)
    manager = ModelManager(Registry(reg_dir), IMPL_INDEX)
    yield {
        "db": db, "writer": writer, "index": index, "manager": manager,
        "media": media_root,
    }
    manager.shutdown()
    writer.close()


class TestScan:
    def test_scan_registers_items_files_thumbnails(self, env):
        db, writer = env["db"], env["writer"]
        writer.call(lambda c: store.add_folder(c, str(env["media"])))
        counters = scan.rescan_folders(db, writer)
        assert counters.new_files == 4  # 3 images + 1 txt; hidden skipped
        conn = db.reader()
        assert conn.execute("SELECT COUNT(*) FROM items").fetchone()[0] == 4
        types = {r[0] for r in conn.execute("SELECT type FROM items").fetchall()}
        assert "image/png" in types and "text/plain" in types
        thumbs = conn.execute("SELECT COUNT(*) FROM storage.thumbnails").fetchone()[0]
        assert thumbs == 3
        # Dimensions extracted.
        w = conn.execute(
            "SELECT width FROM items WHERE type='image/png' LIMIT 1"
        ).fetchone()[0]
        assert w == 40

    def test_rescan_skips_unchanged(self, env):
        db, writer = env["db"], env["writer"]
        writer.call(lambda c: store.add_folder(c, str(env["media"])))
        scan.rescan_folders(db, writer)
        second = scan.rescan_folders(db, writer)
        assert second.unchanged_files == 4
        assert second.new_files == 0

    def test_vanished_files_marked_unavailable(self, env):
        db, writer = env["db"], env["writer"]
        writer.call(lambda c: store.add_folder(c, str(env["media"])))
        scan.rescan_folders(db, writer)
        (env["media"] / "red.png").unlink()
        counters = scan.rescan_folders(db, writer)
        assert counters.marked_unavailable == 1
        conn = db.reader()
        assert conn.execute(
            "SELECT COUNT(*) FROM files WHERE available = 0"
        ).fetchone()[0] == 1

    def test_mime_sniffing(self):
        assert scan.sniff_mime("x.bin", b"\x89PNG\r\n\x1a\n____") == "image/png"
        assert scan.sniff_mime("x.bin", b"\xff\xd8\xff\xe0") == "image/jpeg"
        assert scan.sniff_mime("x.bin", b"%PDF-1.7") == "application/pdf"
        assert scan.sniff_mime("x.bin", b"RIFF____WEBP") == "image/webp"
        assert scan.sniff_mime("x.mp4", b"\x00\x00\x00\x20ftypisom") == "video/mp4"
        assert scan.sniff_mime("doc.txt", b"hello") == "text/plain"


class TestExtraction:
    def _scan(self, env):
        env["writer"].call(lambda c: store.add_folder(c, str(env["media"])))
        scan.rescan_folders(env["db"], env["writer"])

    def test_clip_extraction_end_to_end(self, env):
        self._scan(env)
        report = extraction.run_extraction_job(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="clip/tiny",
            setter_name="tiny", output_type="clip", batch_size=2,
        )
        assert report.processed == 3
        assert report.input_errors == 0
        conn = env["db"].reader()
        assert conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0] == 3
        # Device index got the vectors and quant arm is ready (reconcile ran
        # as the finishing phase).
        snap = env["index"].snapshot("tiny")
        assert snap.size == 3 and snap.quant_ready
        # Coverage row flipped to ready with a frozen artifact.
        status = reconcile.coverage_status(env["db"])
        assert status and status[0]["state"] == "ready"

    def test_rerun_finds_nothing(self, env):
        self._scan(env)
        kwargs = dict(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="clip/tiny",
            setter_name="tiny", output_type="clip",
        )
        extraction.run_extraction_job(**kwargs)
        second = extraction.run_extraction_job(**kwargs)
        assert second.processed == 0

    def test_tagger_extraction(self, env):
        self._scan(env)
        report = extraction.run_extraction_job(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="tags/tiny-tagger",
            setter_name="tiny-tagger", output_type="tags",
        )
        assert report.processed == 3
        assert report.summary.tags_dirty
        conn = env["db"].reader()
        n_tags = conn.execute("SELECT COUNT(*) FROM tags_items").fetchone()[0]
        assert n_tags >= 0  # random head may tag 0..n; rows or placeholders exist
        done = conn.execute(
            """SELECT COUNT(DISTINCT d.item_id) FROM item_data d
               JOIN setters s ON s.id = d.setter_id WHERE s.name='tiny-tagger'"""
        ).fetchone()[0]
        assert done == 3

    def test_text_embedding_chain(self, env):
        """items → (manual ocr text) → text-embedding over derived text."""
        self._scan(env)

        def add_text(conn):
            sid = store.upsert_setter(conn, "ocr")
            pad = store.upsert_setter(conn, "pad")
            rows = conn.execute("SELECT id FROM items WHERE type='image/png'").fetchall()
            # Force item_data ids to DIVERGE from item ids (regression:
            # the text-entity output loop once used the data-id cursor as
            # the item id, which only fresh fixtures where the two
            # coincide would miss).
            for k in range(7):
                store.insert_item_data(conn, rows[0][0], pad, "clip", idx=k)
            for item_id, in rows:
                did = store.insert_item_data(conn, item_id, sid, "text")
                store.insert_extracted_text(
                    conn, did, "words " * 30, confidence=0.8, language_confidence=0.9
                )
            return [r[0] for r in rows]

        item_ids = env["writer"].call(add_text)
        report = extraction.run_extraction_job(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="textembed/tiny-te",
            setter_name="tiny-te", output_type="text-embedding",
            target_entity="text", source_setters=("ocr",),
        )
        assert report.processed == 3
        snap = env["index"].snapshot("tiny-te")
        assert snap.size >= 3
        # Embeddings are attributed to the OWNING ITEMS, not data ids.
        conn = env["db"].reader()
        owners = {
            r[0] for r in conn.execute(
                """SELECT DISTINCT d.item_id FROM item_data d
                   JOIN setters s ON s.id=d.setter_id
                   WHERE s.name='tiny-te'"""
            ).fetchall()
        }
        assert owners == set(item_ids)
        # Weights carry source-text confidence product.
        assert np.allclose(
            snap.weights[: snap.size], 0.8 * 0.9, atol=1e-6
        )

    def test_whisper_audio_extraction(self, env):
        """audio file → STT text row through the full pipeline."""
        import io
        import wave

        t = np.linspace(0, 1, 16000)
        pcm = (np.sin(2 * np.pi * 440 * t) * 16000).astype("<i2")
        wav_path = env["media"] / "tone.wav"
        with wave.open(str(wav_path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        self._scan(env)
        report = extraction.run_extraction_job(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="whisper/tiny-stt",
            output_type="text", mime_prefixes=("audio/",),
        )
        assert report.processed == 1 and report.input_errors == 0
        conn = env["db"].reader()
        rows = conn.execute(
            """SELECT t.text, t.confidence FROM extracted_text t
               JOIN item_data d ON d.id = t.id
               JOIN setters s ON s.id = d.setter_id
               WHERE s.name = 'whisper/tiny-stt'"""
        ).fetchall()
        assert len(rows) == 1
        assert 0.0 <= rows[0][1] <= 1.0

    def test_error_slots_ledger(self, env):
        self._scan(env)
        # errorslot_impl: fail one input with 'input', one 'transient'.
        conn = env["db"].reader()
        items = [r[0] for r in conn.execute("SELECT id FROM items ORDER BY id").fetchall()]

        calls = {"n": 0}
        real_predict = env["manager"].predict

        def flaky_predict(inference_id, inputs, **kw):
            out = []
            for inp in inputs:
                calls["n"] += 1
                if calls["n"] == 1:
                    out.append({"__error__": {"class": "input", "message": "bad media"}})
                elif calls["n"] == 2:
                    out.append({"__error__": {"class": "transient", "message": "oom"}})
                else:
                    out.append({"namespace": "t", "tags": [("general", {"x": 0.9})],
                                "mcut": 0.5, "rating_severity": [], "metadata": {},
                                "metadata_score": 0.0})
            return out

        env["manager"].predict = flaky_predict
        try:
            report = extraction.run_extraction_job(
                db=env["db"], writer=env["writer"], index=env["index"],
                manager=env["manager"], inference_id="tags/tiny-tagger",
                setter_name="flaky", output_type="tags", batch_size=4,
            )
        finally:
            env["manager"].predict = real_predict
        assert report.input_errors == 1
        assert report.transient_errors == 1
        assert report.processed == 1
        # The input-failed item is excluded from the next work query; the
        # transient one is retried.
        remaining = store.count_unprocessed(conn, "flaky", ["image/"])
        assert remaining == 1

    def test_decoded_image_handler_matches_in_predict_decode(self, env):
        """The `decoded_image` loader-thread handler (build-path pipeline
        overlap, tools/build_bench.py) must produce byte-identical
        embeddings to the decode-in-predict path, across multiple chunks so
        the prefetch lookahead is exercised."""
        media = env["media"]
        for i in range(9):  # + 3 fixture images = 12 items, 6 chunks of 2
            make_png(media / f"extra_{i}.png", (i * 20 % 255, 40, 90))
        self._scan(env)
        kwargs = dict(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="clip/tiny",
            output_type="clip", batch_size=2, loader_concurrency=4,
        )
        extraction.run_extraction_job(
            setter_name="decoded", input_handler="decoded_image",
            input_handler_opts={"size": 32}, **kwargs,
        )
        extraction.run_extraction_job(setter_name="plain", **kwargs)
        conn = env["db"].reader()
        rows = conn.execute(
            """SELECT s.name, d.item_id, e.embedding FROM embeddings e
               JOIN item_data d ON d.id = e.id
               JOIN setters s ON s.id = d.setter_id
               ORDER BY d.item_id, s.name"""
        ).fetchall()
        by_setter = {}
        for setter, item_id, blob in rows:
            by_setter.setdefault(setter, {})[item_id] = blob
        assert len(by_setter["decoded"]) == 12
        assert by_setter["decoded"].keys() == by_setter["plain"].keys()
        for item_id, blob in by_setter["decoded"].items():
            assert blob == by_setter["plain"][item_id], item_id

    def test_decoded_image_handler_bad_payload_is_input_error(self, env):
        media = env["media"]
        (media / "broken.png").write_bytes(b"\x89PNG\r\n\x1a\n garbage")
        self._scan(env)
        report = extraction.run_extraction_job(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="clip/tiny",
            setter_name="decerr", output_type="clip",
            input_handler="decoded_image", input_handler_opts={"size": 32},
            loader_concurrency=2,
        )
        assert report.processed == 3
        assert report.input_errors == 1


class TestQueue:
    def test_cancel_pending_job(self):
        import threading

        gate = threading.Event()

        def runner(handle):
            gate.wait(timeout=10)
            return None

        q = JobQueue({JobType.FOLDER_RESCAN: runner})
        running = q.enqueue("dbx", JobType.FOLDER_RESCAN, {"n": 0})
        pending = q.enqueue("dbx", JobType.FOLDER_RESCAN, {"n": 1})
        assert q.cancel("dbx", pending.job_id)
        gate.set()
        assert q.wait_idle("dbx", timeout=10)
        states = {h["job_id"]: h["state"] for h in q.status("dbx")["history"]}
        assert states[running.job_id] == "completed"
        assert states[pending.job_id] == "cancelled"
        q.shutdown()

    def test_cancel_running_job_cooperatively(self):
        import threading

        started = threading.Event()
        progress = []

        def runner(handle):
            started.set()
            for i in range(200):
                if handle.cancelled:
                    break
                progress.append(i)
                time.sleep(0.01)
            return None

        q = JobQueue({JobType.FOLDER_RESCAN: runner})
        h = q.enqueue("dbx", JobType.FOLDER_RESCAN)
        assert started.wait(timeout=10)
        q.cancel("dbx", h.job_id)
        assert q.wait_idle("dbx", timeout=10)
        # Cooperative cancel stopped well short of the full run.
        assert 0 < len(progress) < 200
        q.shutdown()

    def test_serialized_execution_and_history(self):
        order = []

        def runner(handle):
            order.append(handle.params["n"])
            time.sleep(0.01)
            return None

        q = JobQueue({JobType.FOLDER_RESCAN: runner})
        for n in range(4):
            q.enqueue("dbx", JobType.FOLDER_RESCAN, {"n": n})
        assert q.wait_idle("dbx", timeout=10)
        assert order == [0, 1, 2, 3]
        status = q.status("dbx")
        assert len(status["history"]) == 4
        q.shutdown()

    def test_dedupe_pending(self):
        started = []

        def slow_runner(handle):
            started.append(handle.job_id)
            time.sleep(0.05)

        q = JobQueue({JobType.FOLDER_RESCAN: slow_runner})
        a = q.enqueue("dbx", JobType.FOLDER_RESCAN, {"p": 1})
        time.sleep(0.02)  # a starts running
        b = q.enqueue("dbx", JobType.FOLDER_RESCAN, {"p": 1})
        c = q.enqueue("dbx", JobType.FOLDER_RESCAN, {"p": 1})
        assert b.job_id == c.job_id  # deduped while pending
        q.wait_idle("dbx", timeout=10)
        q.shutdown()

    def test_failure_recorded(self):
        def bad(handle):
            raise RuntimeError("kaboom")

        q = JobQueue({JobType.FOLDER_RESCAN: bad})
        q.enqueue("dbx", JobType.FOLDER_RESCAN)
        q.wait_idle("dbx", timeout=10)
        hist = q.status("dbx")["history"]
        assert hist[0]["state"] == "failed" and "kaboom" in hist[0]["error"]
        q.shutdown()

    def test_boundary_maintenance_synthesized(self):
        ran = []

        def data_job(handle):
            ran.append("data")
            time.sleep(0.05)  # keep the queue nonempty until both enqueue
            return ChangeSummary(wrote_data=True, needs_analyze=True)

        def maintenance(handle):
            ran.append("maintenance")
            return None

        q = JobQueue({
            JobType.DATA_EXTRACTION: data_job,
            JobType.DB_MAINTENANCE: maintenance,
        })
        q.enqueue("dbx", JobType.DATA_EXTRACTION, {"a": 1})
        q.enqueue("dbx", JobType.DATA_EXTRACTION, {"a": 2})
        q.wait_idle("dbx", timeout=10)
        # One maintenance pass at the back for the whole burst.
        assert ran == ["data", "data", "maintenance"]
        q.shutdown()


class TestCron:
    def test_field_matching(self):
        t = time.struct_time((2026, 8, 16, 14, 30, 0, 5, 228, 0))
        assert cron.cron_matches("30 14 * * *", t)
        assert cron.cron_matches("*/10 * * * *", t)
        assert cron.cron_matches("* * 16 8 *", t)
        assert not cron.cron_matches("31 14 * * *", t)
        assert not cron.cron_matches("30 15 * * *", t)
        assert cron.cron_matches("25-35 * * * *", t)

    def test_tick_enqueues_and_no_catchup(self, env):
        db, writer = env["db"], env["writer"]
        writer.call(
            lambda c: store.set_config(
                c, "cron_jobs",
                [{"schedule": "* * * * *", "job": "folder_rescan", "params": {}}],
            )
        )
        ran = []
        q = JobQueue({JobType.FOLDER_RESCAN: lambda h: ran.append(1)})
        sched = cron.CronScheduler(lambda: [db], q)
        fired = sched.tick(now=1_000_000.0)
        assert fired == [(db.name, "folder_rescan")]
        # Same minute → no double fire (and no catch-up of missed minutes).
        assert sched.tick(now=1_000_001.0) == []
        q.wait_idle(db.name, 5)
        q.shutdown()


class TestSync:
    def test_sync_all_rebuilds_index_from_db(self, env):
        self._seed(env)
        fresh = VectorIndex(chunk_rows=64)
        added = index_sync.sync_all(env["db"], fresh)
        assert added.get("clipper") == 2
        snap = fresh.snapshot("clipper")
        assert snap.size == 2

    def test_sync_is_incremental(self, env):
        self._seed(env)
        idx = VectorIndex(chunk_rows=64)
        assert index_sync.sync_space(env["db"], idx, "clipper") == 2
        assert index_sync.sync_space(env["db"], idx, "clipper") == 0

    @staticmethod
    def _seed(env):
        def unit(conn):
            sid = store.upsert_setter(conn, "clipper")
            for i in range(2):
                item = store.upsert_item(conn, f"{i}{i}" * 32, "m" * 32, "image/png")
                store.upsert_file(conn, item, f"{i}{i}" * 32, f"/x/{i}.png", "2026-01-01")
                did = store.insert_item_data(conn, item, sid, "clip")
                store.insert_embedding(
                    conn, did, np.full(8, i + 1, dtype=np.float32)
                )

        env["writer"].call(unit)


class TestHashHandlers:
    def test_md5_lookup_extraction(self, env, tmp_path):
        import json as _json

        self_scan = TestExtraction._scan
        self_scan(self, env)
        conn = env["db"].reader()
        md5s = [r[0] for r in conn.execute("SELECT md5 FROM items").fetchall()]
        dump = {md5s[0]: [["general", "scenery", 0.8]]}
        dump_path = tmp_path / "dump.json"
        dump_path.write_text(_json.dumps(dump))
        # Register a lookup model pointing at the dump.
        reg_dir = tmp_path / "reg2"
        reg_dir.mkdir()
        (reg_dir / "00.toml").write_text(
            "[group.tagmatch]\n"
            "config.impl_class = 'md5_lookup'\n"
            f"config.dump_path = '{dump_path}'\n"
            "[group.tagmatch.inference_ids.dump]\n"
        )
        from panoptikon_tpu.models.manager import ModelManager
        from panoptikon_tpu.models.registry import Registry
        from panoptikon_tpu.models.impls import IMPL_INDEX as IDX

        mgr = ModelManager(Registry(reg_dir), IDX)
        try:
            report = extraction.run_extraction_job(
                db=env["db"], writer=env["writer"], index=env["index"],
                manager=mgr, inference_id="tagmatch/dump",
                output_type="tags", mime_prefixes=("image/", "text/"),
                input_handler="md5",
            )
        finally:
            mgr.shutdown()
        assert report.processed == 4
        tagged = conn.execute(
            """SELECT tg.name FROM tags_items ti JOIN tags tg ON tg.id=ti.tag_id"""
        ).fetchall()
        assert ("scenery",) in tagged

    def test_md5_lookup_sqlite_backend(self, tmp_path):
        """sqlite dumps are the at-scale default: a danbooru-size JSON
        would be GBs of resident dict (VERDICT r3 weak #4)."""
        import sqlite3

        from panoptikon_tpu.models.base import PredictionInput
        from panoptikon_tpu.models.impls import Md5LookupImpl

        db_path = tmp_path / "dump.sqlite"
        conn = sqlite3.connect(db_path)
        conn.executescript(
            "CREATE TABLE tags (md5 TEXT, namespace TEXT, name TEXT,"
            " confidence REAL);"
            "CREATE INDEX tags_md5 ON tags(md5);"
        )
        conn.execute(
            "INSERT INTO tags VALUES (?, 'general', 'scenery', 0.9)",
            ("f" * 32,),
        )
        conn.commit()
        conn.close()
        impl = Md5LookupImpl(dump_path=str(db_path))
        out = impl.predict([
            PredictionInput(data={"md5": "f" * 32}),
            PredictionInput(data={"md5": "0" * 32}),
        ])
        assert out[0]["tags"][0][1] == {"scenery": 0.9}
        assert out[1]["tags"][0][1] == {}
        impl.unload()


class TestResumeAfterCancel:
    def test_extraction_resumes_from_work_query(self, env, tmp_path):
        """Cancellation loses only in-flight items; the re-run's work query
        (NOT processed_by) finds the remainder — 'the data is the
        checkpoint' (extraction.rs:483-501, SURVEY §5.4)."""
        # Widen the corpus so cancellation bites mid-run.
        for i in range(9):
            make_png(env["media"] / f"extra{i}.png", (i * 20 % 255, 50, 90))
        env["writer"].call(lambda c: store.add_folder(c, str(env["media"])))
        scan.rescan_folders(env["db"], env["writer"])

        calls = {"n": 0}

        def cancel_after_two():
            calls["n"] += 1
            return calls["n"] > 2

        first = extraction.run_extraction_job(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="clip/tiny",
            setter_name="tiny", output_type="clip", batch_size=2,
            cancelled=cancel_after_two,
        )
        conn = env["db"].reader()
        partial = conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
        assert 0 < partial < 12  # stopped mid-run, partial progress durable

        second = extraction.run_extraction_job(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="clip/tiny",
            setter_name="tiny", output_type="clip", batch_size=4,
        )
        total = conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
        assert total == 12  # 3 originals + 9 extras, no duplicates
        assert first.processed + second.processed == 12
        # Device index converged too.
        assert env["index"].snapshot("tiny").size == 12


class TestIncompleteJobCleanup:
    """remove_incomplete_jobs (extraction_write.rs:61): a killed process's
    phantom in-progress rows get marked incomplete; partial outputs stay
    (the keyset re-run finds the remainder)."""

    def test_marks_phantom_rows(self, env):
        db, writer = env["db"], env["writer"]
        job_id = writer.call(store.create_data_job)
        log_id = writer.call(
            lambda c: store.add_data_log(
                c, job_id, log_type="clip", setter="s", batch_size=4
            )
        )
        writer.call(
            lambda c: c.execute(
                "INSERT INTO file_scans (start_time, path) VALUES (?, ?)",
                (store.now_iso(), "/x"),
            )
        )
        marked = writer.call(store.remove_incomplete_jobs)
        assert marked == 1
        conn = db.reader()
        assert conn.execute(
            "SELECT completed FROM data_jobs WHERE id=?", (job_id,)
        ).fetchone()[0] == -1
        assert conn.execute(
            "SELECT completed FROM data_log WHERE id=?", (log_id,)
        ).fetchone()[0] == -1
        assert conn.execute(
            "SELECT COUNT(*) FROM file_scans WHERE end_time IS NULL"
        ).fetchone()[0] == 0

    def test_completed_jobs_untouched(self, env):
        db, writer = env["db"], env["writer"]
        job_id = writer.call(store.create_data_job)
        writer.call(lambda c: store.complete_data_job(c, job_id))
        assert writer.call(store.remove_incomplete_jobs) == 0
        assert db.reader().execute(
            "SELECT completed FROM data_jobs WHERE id=?", (job_id,)
        ).fetchone()[0] == 1


class TestFailureClassification:
    """extraction.rs:218 classify_extraction_job_failure: all-systemic runs
    fail the job loudly; input-only runs complete with the errors counted."""

    def _scan(self, env):
        scan.rescan_folders(env["db"], env["writer"], folders=[str(env["media"])])

    def test_all_systemic_fails_loudly(self, env):
        self._scan(env)
        with pytest.raises(extraction.SystemicExtractionFailure, match="outage"):
            extraction.run_extraction_job(
                db=env["db"], writer=env["writer"], index=env["index"],
                manager=env["manager"], inference_id="oomfix/dead",
                output_type="clip", mime_prefixes=("image/",), batch_size=4,
            )
        # The drop-guard path marks the phantom job row incomplete.
        env["writer"].call(store.remove_incomplete_jobs)
        row = env["db"].reader().execute(
            "SELECT MAX(completed) FROM data_jobs"
        ).fetchone()
        assert row[0] <= 0

    def test_input_only_completes(self, env, tmp_path):
        # A PNG-magic file with a corrupt body: sniffs as image/png, decode
        # fails with an input-class slot.
        bad = env["media"] / "corrupt.png"
        bad.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
        self._scan(env)
        report = extraction.run_extraction_job(
            db=env["db"], writer=env["writer"], index=env["index"],
            manager=env["manager"], inference_id="clip/tiny",
            output_type="clip", mime_prefixes=("image/",), batch_size=4,
        )
        assert report.processed > 0 and report.input_errors >= 1


class TestDurableOwedMaintenance:
    """Owed maintenance survives a process kill (the reference's
    maintenance_state durable marker): persisted when owed accrues, cleared
    when the maintenance job repays it, re-seeded at the next open."""

    def test_persist_merge_and_clear(self, env):
        saved = []
        done = {"n": 0}

        def runner(handle):
            return ChangeSummary(needs_analyze=True)

        def maint(handle):
            done["n"] += 1
            return None

        q = JobQueue(
            runners={JobType.FOLDER_RESCAN: runner,
                     JobType.DB_MAINTENANCE: maint},
            persist_owed=lambda db, snap: saved.append((db, snap)),
        )
        q.enqueue("d", JobType.FOLDER_RESCAN)
        deadline = time.time() + 10
        while time.time() < deadline and done["n"] == 0:
            time.sleep(0.02)
        q.shutdown()
        assert done["n"] == 1
        # First an accrual snapshot, then the post-maintenance clear.
        assert saved[0][1]["needs_analyze"] is True
        assert saved[-1] == ("d", None)

    def test_seed_owed_triggers_maintenance(self):
        done = {"n": 0}
        q = JobQueue(
            runners={JobType.DB_MAINTENANCE: lambda h: done.__setitem__("n", done["n"] + 1)},
        )
        q.seed_owed("d", ChangeSummary(tags_dirty=True))
        deadline = time.time() + 10
        while time.time() < deadline and done["n"] == 0:
            time.sleep(0.02)
        q.shutdown()
        assert done["n"] == 1


class TestCronSemantics:
    def test_day_of_week_is_cron_sunday_zero(self):
        import time as _t

        from panoptikon_tpu.jobs.cron import cron_matches

        # 2026-08-16 is a Sunday, 2026-08-21 a Friday.
        sunday = _t.strptime("2026-08-16 03:00", "%Y-%m-%d %H:%M")
        friday = _t.strptime("2026-08-21 03:00", "%Y-%m-%d %H:%M")
        assert cron_matches("0 3 * * 0", sunday)
        assert cron_matches("0 3 * * 7", sunday)  # both Sunday spellings
        assert not cron_matches("0 3 * * 0", friday)
        assert cron_matches("0 3 * * 5", friday)
        assert not cron_matches("0 3 * * 6", friday)


class TestScanBoundaries:
    def test_sibling_folder_not_claimed_by_prefix(self, tmp_path):
        from panoptikon_tpu.jobs.scan import _under, iter_files

        assert _under("/data/x/a.png", "/data/x")
        assert not _under("/data/x2/a.png", "/data/x")
        inc = tmp_path / "pics2"
        exc = tmp_path / "pics"
        inc.mkdir(); exc.mkdir()
        (inc / "keep.png").write_bytes(b"x")
        (exc / "drop.png").write_bytes(b"x")
        got = sorted(iter_files([str(tmp_path)], [str(exc)]))
        assert str(inc / "keep.png") in got
        assert str(exc / "drop.png") not in got

    def test_size_change_with_same_mtime_rehashes(self, tmp_path):
        from panoptikon_tpu.jobs.scan import process_path

        p = tmp_path / "a.bin"
        p.write_bytes(b"abc")
        import os as _os

        st = _os.stat(p)
        import time as _t

        mtime = _t.strftime("%Y-%m-%dT%H:%M:%S", _t.gmtime(st.st_mtime))
        unchanged = process_path(
            str(p), (mtime, "sha", st.st_size), make_thumbnails=False
        )
        assert unchanged.status == "unchanged"
        rehashed = process_path(
            str(p), (mtime, "sha", st.st_size + 10), make_thumbnails=False
        )
        assert rehashed.status != "unchanged"


class TestOwedMaintenanceRetry:
    def test_failed_maintenance_re_merges_owed(self):
        import time as _t

        from panoptikon_tpu.jobs.queue import (
            ChangeSummary, JobQueue, JobType,
        )

        calls = {"n": 0}

        def maint(handle):
            calls["n"] += 1
            raise RuntimeError("disk full")

        def writer(handle):
            return ChangeSummary(needs_analyze=True)

        q = JobQueue({JobType.DB_MAINTENANCE: maint,
                      JobType.FOLDER_RESCAN: writer})
        q.enqueue("d", JobType.FOLDER_RESCAN)
        deadline = _t.time() + 20
        while _t.time() < deadline and calls["n"] == 0:
            _t.sleep(0.05)
        assert calls["n"] == 1  # maintenance synthesized and failed
        # The owed debt survived the failure (retry is backed off).
        with q._lock:
            assert q._owed.get("d") is not None and q._owed["d"].any
            assert q._maint_retry_at.get("d", 0) > _t.time()
        q.shutdown()


class TestScanTypeFilter:
    def test_disabled_class_skips_before_hashing(self, tmp_path, monkeypatch):
        """A disabled media class must be skipped from a cheap head sniff,
        never paying the full-file hash (regression: 500 GB of disabled
        video re-hashed on every rescan)."""
        from panoptikon_tpu.jobs import scan as scan_mod

        mp4 = tmp_path / "big.mp4"
        mp4.write_bytes(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 4096)

        def boom(path):
            raise AssertionError("hash_file must not run for skipped types")

        monkeypatch.setattr(scan_mod, "hash_file", boom)
        row = scan_mod.process_path(
            str(mp4), None, make_thumbnails=False,
            disabled_types=frozenset({"video"}),
        )
        assert row.status == "skipped_type"

    def test_enabled_classes_still_hash(self, tmp_path):
        from panoptikon_tpu.jobs import scan as scan_mod

        png = tmp_path / "a.png"
        from PIL import Image

        Image.new("RGB", (8, 8), (1, 2, 3)).save(png)
        row = scan_mod.process_path(
            str(png), None, make_thumbnails=False,
            disabled_types=frozenset({"video"}),
        )
        assert row.status == "new" and row.sha256
