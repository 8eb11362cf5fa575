"""Bulk-ingest session (db/bulk.py): derived structures suspended for slab
inserts, rebuilt on exit, transactionally safe, snapshot-sound.

Reference anchor: the initial scan's batched-transaction insert path
(/root/reference/panoptikon/src/jobs/extraction.rs:462-478) — same cost
shape, here taken further by suspending FTS/index/change-log maintenance
for the duration of the slab."""

import types

import numpy as np
import pytest

from panoptikon_tpu.db.bulk import bulk_ingest
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.epochs import EPOCHS
from panoptikon_tpu.db.writer import IndexWriter


@pytest.fixture
def db(tmp_path):
    return Database(tmp_path, "bulkdb")


@pytest.fixture
def writer(db):
    w = IndexWriter(db)
    yield w
    w.close()


def _seed(conn, n, start=1):
    conn.executemany(
        "INSERT INTO items (id, sha256, md5, type, size, time_added)"
        " VALUES (?,?,?,?,?,?)",
        ((i, f"{i:08x}" + "0" * 56, f"{i:032x}"[:32], "image/png", 100,
          "2026-01-01T00:00:00") for i in range(start, start + n)),
    )
    conn.executemany(
        "INSERT INTO files (id, sha256, item_id, path, filename,"
        " last_modified) VALUES (?,?,?,?,?,?)",
        ((i, f"{i:08x}" + "0" * 56, i, f"/corpus/word{i % 7}/{i:05d}.png",
          f"{i:05d}.png", "2026-01-01T00:00:00")
         for i in range(start, start + n)),
    )
    conn.execute("INSERT OR IGNORE INTO setters (name) VALUES ('ocr/bulk')")
    sid = conn.execute(
        "SELECT id FROM setters WHERE name='ocr/bulk'").fetchone()[0]
    conn.executemany(
        "INSERT INTO item_data (id, item_id, setter_id, data_type, idx,"
        " is_origin) VALUES (?,?,?,?,0,1)",
        ((i, i, sid, "text") for i in range(start, start + n)),
    )
    conn.executemany(
        "INSERT INTO extracted_text (id, text, language, language_confidence,"
        " confidence, text_length) VALUES (?,?,?,?,?,?)",
        ((i, f"token{i % 5:02d} filler", "en", 0.9, 0.8, 10)
         for i in range(start, start + n)),
    )


def _schema_counts(conn):
    trig = conn.execute(
        "SELECT COUNT(*) FROM sqlite_master WHERE type='trigger'"
    ).fetchone()[0]
    idx = conn.execute(
        "SELECT COUNT(*) FROM sqlite_master WHERE type='index'"
        " AND sql IS NOT NULL"
    ).fetchone()[0]
    return trig, idx


class TestBulkIngest:
    def test_fts_and_schema_restored(self, db, writer):
        before = writer.call(_schema_counts)

        def unit(conn):
            with bulk_ingest(conn):
                _seed(conn, 200)

        writer.call(unit)
        conn = db.read_connection()
        assert _schema_counts(conn) == before
        # FTS rebuilt from content: MATCH finds the bulk rows.
        hits = conn.execute(
            "SELECT COUNT(*) FROM extracted_text_fts"
            " WHERE extracted_text_fts MATCH '\"token03\"'"
        ).fetchone()[0]
        assert hits == 40
        path_hits = conn.execute(
            "SELECT COUNT(*) FROM files_path_fts"
            " WHERE files_path_fts MATCH '\"word3\"'"
        ).fetchone()[0]
        assert path_hits > 0

    def test_triggers_live_again_after_session(self, db, writer):
        def unit(conn):
            with bulk_ingest(conn):
                _seed(conn, 10)

        writer.call(unit)

        # A post-session insert must hit FTS through the re-created trigger.
        def post(conn):
            conn.execute(
                "INSERT INTO items (id, sha256, md5, type, size, time_added)"
                " VALUES (9001, ?, ?, 'image/png', 1, '2026-01-01T00:00:00')",
                ("c" * 64, "d" * 32),
            )
            conn.execute(
                "INSERT INTO files (id, sha256, item_id, path, filename,"
                " last_modified) VALUES (9001, ?, 9001,"
                " '/corpus/zebra/x.png', 'x.png', '2026-01-01T00:00:00')",
                ("c" * 64,),
            )

        writer.call(post)
        conn = db.read_connection()
        assert conn.execute(
            "SELECT COUNT(*) FROM files_path_fts"
            " WHERE files_path_fts MATCH 'zebra'"
        ).fetchone()[0] == 1

    def test_exception_rolls_back_schema_and_rows(self, db, writer):
        before = writer.call(_schema_counts)

        def unit(conn):
            with bulk_ingest(conn):
                _seed(conn, 5)
                raise RuntimeError("boom")

        with pytest.raises(RuntimeError):
            writer.call(unit)
        conn = db.read_connection()
        assert _schema_counts(conn) == before
        assert conn.execute("SELECT COUNT(*) FROM items").fetchone()[0] == 0

    def test_snapshot_invalidation_marker(self, db, writer):
        """A cached executor base snapshot must see bulk rows: the session
        appends the NULL global-change row that forces a full rebuild."""
        from panoptikon_tpu.pql import model as pql
        from panoptikon_tpu.pql.executor import Executor

        class _Idx:
            def snapshot(self, space):
                raise KeyError(space)

        writer.call(lambda c: _seed(c, 3))
        ex = Executor(db, _Idx(), manager=None)
        r = ex.execute(pql.PqlQuery.from_json({"page_size": 10}))
        assert r.count == 3

        def unit(conn):
            with bulk_ingest(conn):
                _seed(conn, 50, start=100)

        writer.call(unit)
        r = ex.execute(pql.PqlQuery.from_json({"page_size": 10}))
        assert r.count == 53
        # And the marker is the NULL global row, not per-item spam.
        conn = db.read_connection()
        tail = conn.execute(
            "SELECT item_id FROM base_change_log ORDER BY seq DESC LIMIT 1"
        ).fetchone()
        assert tail[0] is None

    def test_bulk_insert_speedup_shape(self, db, writer):
        """Session drops every trigger/named index on the bulk tables and
        none on others (bookmarks etc. stay live)."""
        def unit(conn):
            with bulk_ingest(conn):
                rows = conn.execute(
                    "SELECT COUNT(*) FROM sqlite_master WHERE type='trigger'"
                    " AND tbl_name IN ('items','files','item_data',"
                    "'extracted_text','tags_items')"
                ).fetchone()[0]
                assert rows == 0
                # Non-bulk tables keep their indexes.
                assert conn.execute(
                    "SELECT COUNT(*) FROM sqlite_master WHERE type='index'"
                    " AND tbl_name='data_log' AND sql IS NOT NULL"
                ).fetchone()[0] > 0
                _seed(conn, 20)

        writer.call(unit)
