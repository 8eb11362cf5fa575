"""Span cache unit tests (reference api/search_cache.rs semantics)."""

from panoptikon_tpu.api.search_cache import (
    SPAN_ROWS,
    EpochSnapshot,
    SpanCache,
    query_cache_key,
)

E1 = EpochSnapshot(index=1, user_data=1)
E2 = EpochSnapshot(index=2, user_data=1)


def rows(n, start=0):
    return [{"file_id": i} for i in range(start, start + n)]


class TestQueryKey:
    def test_pagination_free(self):
        a = query_cache_key({"query": {"x": 1}, "page": 1, "page_size": 10})
        b = query_cache_key({"query": {"x": 1}, "page": 7, "page_size": 50})
        assert a == b

    def test_query_sensitive(self):
        a = query_cache_key({"query": {"x": 1}})
        b = query_cache_key({"query": {"x": 2}})
        assert a != b


class TestSpans:
    def test_roundtrip_within_spans(self):
        c = SpanCache()
        c.insert_rows("k", 0, rows(SPAN_ROWS * 2), E1, terminal=False)
        got = c.lookup_rows("k", 10, 20, E1)
        assert [r["file_id"] for r in got] == list(range(10, 30))
        # Window crossing a span boundary.
        got = c.lookup_rows("k", SPAN_ROWS - 5, 10, E1)
        assert [r["file_id"] for r in got] == list(
            range(SPAN_ROWS - 5, SPAN_ROWS + 5)
        )

    def test_miss_beyond_cached(self):
        c = SpanCache()
        c.insert_rows("k", 0, rows(SPAN_ROWS), E1, terminal=False)
        assert c.lookup_rows("k", SPAN_ROWS, 10, E1) is None

    def test_epoch_mismatch_invalidates(self):
        c = SpanCache()
        c.insert_rows("k", 0, rows(SPAN_ROWS), E1, terminal=False)
        assert c.lookup_rows("k", 0, 10, E2) is None

    def test_partial_span_only_kept_when_terminal(self):
        c = SpanCache()
        c.insert_rows("k", 0, rows(100), E1, terminal=False)
        assert c.lookup_rows("k", 0, 10, E1) is None
        c.insert_rows("k2", 0, rows(100), E1, terminal=True)
        got = c.lookup_rows("k2", 0, 10, E1)
        assert len(got) == 10
        # Short window at the true end of the result set.
        got = c.lookup_rows("k2", 95, 10, E1)
        assert [r["file_id"] for r in got] == list(range(95, 100))

    def test_unaligned_insert_ignored(self):
        c = SpanCache()
        c.insert_rows("k", 10, rows(SPAN_ROWS), E1, terminal=True)
        assert c.lookup_rows("k", 10, 5, E1) is None

    def test_byte_budget_evicts_lru(self):
        c = SpanCache(byte_budget=1)  # everything evicts immediately
        c.insert_rows("k", 0, rows(SPAN_ROWS), E1, terminal=False)
        assert c.lookup_rows("k", 0, 10, E1) is None

    def test_counts(self):
        c = SpanCache()
        c.insert_count("k", 42, E1)
        assert c.lookup_count("k", E1) == 42
        assert c.lookup_count("k", E2) is None

    def test_stats_and_clear(self):
        c = SpanCache()
        c.insert_rows("k", 0, rows(SPAN_ROWS), E1, terminal=False)
        s = c.stats()
        assert s["spans"] == 1 and s["bytes"] > 0
        c.clear()
        assert c.stats()["spans"] == 0
