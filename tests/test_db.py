"""Host storage layer tests: migrations, single-writer, epochs, typed
queries, work-query ledger semantics."""

import threading

import numpy as np
import pytest

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database, DatabaseRegistry
from panoptikon_tpu.db.epochs import EPOCHS
from panoptikon_tpu.db.writer import IndexWriter


@pytest.fixture
def db(tmp_path):
    return Database(tmp_path, "testdb")


@pytest.fixture
def writer(db):
    w = IndexWriter(db)
    yield w
    w.close()


def seed_item(conn, sha="a" * 64, path="/data/x.png", mime="image/png"):
    item_id = store.upsert_item(conn, sha, "b" * 32, mime, size=123)
    file_id = store.upsert_file(conn, item_id, sha, path, "2026-01-01T00:00:00")
    return item_id, file_id


class TestMigrations:
    def test_all_tables_exist(self, db):
        conn = db.read_connection()
        tables = {
            r[0]
            for r in conn.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
        for t in ["items", "files", "folders", "setters", "item_data",
                  "extracted_text", "embeddings", "tags", "tags_items",
                  "data_jobs", "data_log", "file_scans", "extraction_errors",
                  "scan_errors", "vector_quant_profiles",
                  "vector_quant_coverage", "system_config"]:
            assert t in tables, t
        # storage + user_data attached
        assert conn.execute("SELECT COUNT(*) FROM storage.thumbnails").fetchone()[0] == 0
        assert conn.execute("SELECT COUNT(*) FROM user_data.bookmarks").fetchone()[0] == 0

    def test_migrate_idempotent(self, db):
        db.migrate()
        db.migrate()

    def test_pk_mix_registered(self, db):
        conn = db.read_connection()
        v1 = conn.execute("SELECT pk_mix(42, 7)").fetchone()[0]
        from panoptikon_tpu.utils.splitmix import pk_mix

        assert v1 == pk_mix(42, 7)

    def test_registry(self, tmp_path):
        reg = DatabaseRegistry(tmp_path)
        reg.get("one")
        reg.get("two")
        assert set(reg.names()) >= {"one", "two"}


class TestWriter:
    def test_call_returns_result_and_bumps_epoch(self, db, writer):
        before = EPOCHS.index_epoch(db.name)
        item_id = writer.call(lambda c: seed_item(c)[0])
        assert item_id >= 1
        assert EPOCHS.index_epoch(db.name) > before

    def test_failed_unit_rolls_back_without_epoch_bump(self, db, writer):
        writer.call(lambda c: seed_item(c))
        epoch = EPOCHS.index_epoch(db.name)

        def bad(conn):
            conn.execute("UPDATE items SET md5 = 'poison'")
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            writer.call(bad)
        assert EPOCHS.index_epoch(db.name) == epoch
        row = db.read_connection().execute("SELECT md5 FROM items").fetchone()
        assert row[0] != "poison"

    def test_concurrent_writes_serialize(self, db, writer):
        def unit(conn):
            item_id = store.upsert_item(
                conn, f"{threading.get_ident()}{np.random.rand()}".ljust(64, "0")[:64],
                "m" * 32, "text/plain",
            )
            return item_id

        threads = [threading.Thread(target=lambda: writer.call(unit)) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        count = db.read_connection().execute("SELECT COUNT(*) FROM items").fetchone()[0]
        assert count == 8


class TestStore:
    def test_item_file_upsert_idempotent(self, db, writer):
        id1 = writer.call(lambda c: seed_item(c)[0])
        id2 = writer.call(lambda c: seed_item(c)[0])
        assert id1 == id2
        conn = db.read_connection()
        assert conn.execute("SELECT COUNT(*) FROM files").fetchone()[0] == 1

    def test_extraction_outputs_and_fts(self, db, writer):
        def unit(conn):
            item_id, _ = seed_item(conn)
            sid = store.upsert_setter(conn, "ocr-model")
            job = store.create_data_job(conn)
            did = store.insert_item_data(
                conn, item_id, sid, "text", job_id=job
            )
            store.insert_extracted_text(
                conn, did, "hello panoptikon world", confidence=0.9
            )
            return item_id

        writer.call(unit)
        conn = db.read_connection()
        hits = conn.execute(
            """SELECT t.text FROM extracted_text_fts f
               JOIN extracted_text t ON t.id = f.rowid
               WHERE extracted_text_fts MATCH ?""",
            ("panoptikon",),
        ).fetchall()
        assert len(hits) == 1

    def test_path_fts(self, db, writer):
        writer.call(lambda c: seed_item(c, path="/photos/vacation/beach.png"))
        conn = db.read_connection()
        hits = conn.execute(
            "SELECT rowid FROM files_path_fts WHERE files_path_fts MATCH ?",
            ("vacation",),
        ).fetchall()
        assert len(hits) == 1

    def test_embedding_roundtrip(self, db, writer):
        vec = np.random.default_rng(0).normal(size=16).astype(np.float32)

        def unit(conn):
            item_id, _ = seed_item(conn)
            sid = store.upsert_setter(conn, "clip")
            did = store.insert_item_data(conn, item_id, sid, "clip")
            store.insert_embedding(conn, did, vec)

        writer.call(unit)
        data_ids, item_ids, vectors, weights = store.load_embedding_space(
            db.read_connection(), "clip"
        )
        assert vectors.shape == (1, 16)
        np.testing.assert_array_equal(vectors[0], vec)
        np.testing.assert_array_equal(weights, [1.0])

    def test_work_query_excludes_processed_and_ledgered(self, db, writer):
        def unit(conn):
            a, _ = seed_item(conn, sha="a" * 64, path="/a.png")
            b, _ = seed_item(conn, sha="b" * 64, path="/b.png")
            c, _ = seed_item(conn, sha="c" * 64, path="/c.png")
            d, _ = seed_item(conn, sha="d" * 64, path="/d.txt", mime="text/plain")
            sid = store.upsert_setter(conn, "tagger")
            store.insert_item_data(conn, a, sid, "tags")  # processed
            store.record_extraction_error(
                conn, b, "tagger", stage="decode", error_class="input"
            )  # settled failure → excluded
            store.record_extraction_error(
                conn, c, "tagger", stage="inference", error_class="transient"
            )  # transient → retried
            return a, b, c, d

        a, b, c, d = writer.call(unit)
        conn = db.read_connection()
        work = store.unprocessed_items(conn, "tagger", mime_prefixes=["image/"])
        ids = [w[0] for w in work]
        assert c in ids and a not in ids and b not in ids and d not in ids
        assert store.count_unprocessed(conn, "tagger", ["image/"]) == 1

    def test_blocked_errors_heal(self, db, writer):
        def unit(conn):
            a, _ = seed_item(conn)
            store.record_extraction_error(
                conn, a, "pdf", stage="render", error_class="input", blocker="pdfium"
            )
            return store.heal_blocked_errors(conn, "pdfium")

        healed = writer.call(unit)
        assert healed == 1

    def test_config_roundtrip(self, db, writer):
        writer.call(lambda c: store.set_config(c, "cron_jobs", {"every": "5m"}))
        assert store.get_config(db.read_connection(), "cron_jobs") == {"every": "5m"}
        assert store.get_config(db.read_connection(), "missing", 42) == 42

    def test_tags_and_recount(self, db, writer):
        def unit(conn):
            item_id, _ = seed_item(conn)
            sid = store.upsert_setter(conn, "wd-tagger")
            did = store.insert_item_data(conn, item_id, sid, "tags")
            tid = store.upsert_tag(conn, "general", "cat")
            store.tag_item(conn, did, item_id, tid, 0.97)
            store.recount_tags(conn)

        writer.call(unit)
        conn = db.read_connection()
        row = conn.execute(
            "SELECT item_count FROM tags WHERE namespace='general' AND name='cat'"
        ).fetchone()
        assert row[0] == 1

    def test_delete_setter_data_cascades(self, db, writer):
        def unit(conn):
            item_id, _ = seed_item(conn)
            sid = store.upsert_setter(conn, "clip")
            did = store.insert_item_data(conn, item_id, sid, "clip")
            store.insert_embedding(conn, did, np.zeros(4, np.float32))
            return store.delete_setter_data(conn, "clip")

        deleted = writer.call(unit)
        assert deleted == 1
        conn = db.read_connection()
        assert conn.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0] == 0
