"""FTS candidate cache: (fts-query, index-epoch)-keyed LRU over MATCH
results (executor._leaf_match_text). Host FTS5 over a 1M-chunk corpus costs
20-33 ms per request; repeats of hot terms must be free, and any committed
write must invalidate — the span-cache epoch discipline
(/root/reference/panoptikon/src/api/search_cache.rs:148 applied to
match_text.rs:18-70's per-query rank fetch)."""

import numpy as np
import pytest

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter
from panoptikon_tpu.pql import model as pql
from panoptikon_tpu.pql.executor import Executor


class _Idx:
    def snapshot(self, space):
        raise KeyError(space)


@pytest.fixture
def env(tmp_path):
    db = Database(tmp_path, "ftscache")
    writer = IndexWriter(db)

    def unit(conn):
        sid = store.upsert_setter(conn, "ocr")
        for i in range(8):
            sha = f"{i:02d}" * 32
            item_id = store.upsert_item(
                conn, sha, f"md5{i}".ljust(32, "0"), "image/png", size=100)
            store.upsert_file(
                conn, item_id, sha, f"/m/f{i:02d}.png", "2026-01-01T00:00:00")
            did = store.insert_item_data(conn, item_id, sid, "text")
            store.insert_extracted_text(
                conn, did, f"alpha term{i % 2} body", language="en",
                confidence=0.9, language_confidence=0.9)

    writer.call(unit)
    ex = Executor(db, _Idx(), manager=None)
    yield {"db": db, "ex": ex, "writer": writer}
    writer.close()


def q(term):
    return pql.PqlQuery.from_json(
        {"query": {"match_text": {"match": term}}, "page_size": 100}
    )


class TestFtsCandidateCache:
    def test_repeat_hits_cache(self, env):
        ex = env["ex"]
        assert ex.execute(q("term1")).count == 4
        s0 = ex.fts_cache_stats()
        assert s0["entries"] == 1 and s0["misses"] == 1
        assert ex.execute(q("term1")).count == 4
        s1 = ex.fts_cache_stats()
        assert s1["hits"] == 1 and s1["misses"] == 1

    def test_distinct_terms_distinct_entries(self, env):
        ex = env["ex"]
        ex.execute(q("term0"))
        ex.execute(q("term1"))
        assert ex.fts_cache_stats()["entries"] == 2

    def test_epoch_invalidation_sees_new_rows(self, env):
        ex = env["ex"]
        assert ex.execute(q("term1")).count == 4

        def add(conn):
            sid = store.upsert_setter(conn, "ocr")
            sha = "ff" * 32
            item_id = store.upsert_item(
                conn, sha, "md5new".ljust(32, "0"), "image/png", size=100)
            store.upsert_file(
                conn, item_id, sha, "/m/new.png", "2026-01-02T00:00:00")
            did = store.insert_item_data(conn, item_id, sid, "text")
            store.insert_extracted_text(
                conn, did, "alpha term1 fresh", language="en",
                confidence=0.9, language_confidence=0.9)

        env["writer"].call(add)
        res = ex.execute(q("term1"))
        assert res.count == 5  # stale entry must NOT serve
        stats = ex.fts_cache_stats()
        assert stats["misses"] >= 2

    def test_row_budget_evicts_lru(self, env):
        ex = env["ex"]
        ex.FTS_CACHE_ROW_BUDGET = 6  # each term matches 4 rows
        ex.execute(q("term0"))
        ex.execute(q("term1"))  # 8 rows total > 6: term0 evicted
        s = ex.fts_cache_stats()
        assert s["entries"] == 1 and s["rows"] == 4

    def test_snippet_rides_the_cache(self, env):
        ex = env["ex"]
        payload = {
            "query": {"match_text": {
                "match": "term1", "select_snippet_as": "snip"}},
            "page_size": 100,
        }
        a = ex.execute(pql.PqlQuery.from_json(payload))
        b = ex.execute(pql.PqlQuery.from_json(payload))
        snips_a = sorted(r["extra"]["snip"] for r in a.results)
        snips_b = sorted(r["extra"]["snip"] for r in b.results)
        assert snips_a == snips_b and "<b>term1</b>" in snips_a[0]
        assert ex.fts_cache_stats()["hits"] >= 1
