"""Executor host-composition performance and exact-aggregation tests.

VERDICT r1 flagged the round-1 executor's per-row Python loops (rank joins,
partition_by, dict-based item score merge) as a scaling wall: at 1M base
rows they would dominate end-to-end latency by orders of magnitude over the
device scan. The composition layer is now vectorized sort/searchsorted
NumPy; the perf bar here is the reference's composed-query fix datum
(docs/or-composition-penalty.md:41-57 — 2.5 s on 690k rows) beaten 10×+ at
1M rows, device scoring excluded (it is measured by bench.py on real
hardware).
"""

import time
import types

import numpy as np
import pytest

from panoptikon_tpu.db.epochs import EPOCHS
from panoptikon_tpu.pql import model as pql
from panoptikon_tpu.pql.executor import BaseSnapshot, Executor, _join_i64
from panoptikon_tpu.utils import npy


class SlotIndex:
    """Index stub: group slot s is item id s+1 (matching the synthetic base
    snapshot's 1-based item ids); perf tests bypass real scoring."""

    def snapshot(self, space):
        raise KeyError(space)

    def item_id_of_groups(self, space, slots):
        return np.asarray(slots, dtype=np.int64) + 1


def b64(vec):
    import base64

    return base64.standard_b64encode(npy.serialize_npy(vec)).decode()


def make_executor(n: int) -> Executor:
    db = types.SimpleNamespace(name="perf")
    ex = Executor(db, SlotIndex(), manager=None)
    rng = np.random.default_rng(0)
    columns = {
        "file_id": np.arange(1, n + 1, dtype=np.int64),
        "item_id": np.arange(1, n + 1, dtype=np.int64),
        "sha256": np.full(n, "00" * 32, dtype=object),
        "path": np.full(n, "/media/x.png", dtype=object),
        "filename": np.full(n, "x.png", dtype=object),
        "last_modified": np.full(n, "2026-01-01T00:00:00", dtype=object),
        "md5": np.full(n, "0" * 32, dtype=object),
        "type": np.where(
            rng.random(n) < 0.5, "image/png", "video/mp4"
        ).astype(object),
        "size": rng.integers(100, 10_000, n).astype(np.float64),
        "width": np.full(n, 640.0),
        "height": np.full(n, 480.0),
        "duration": np.full(n, np.nan),
        "audio_tracks": np.zeros(n),
        "video_tracks": np.zeros(n),
        "subtitle_tracks": np.zeros(n),
        "blurhash": np.full(n, "", dtype=object),
        "time_added": np.full(n, "2026-01-01T00:00:00", dtype=object),
    }
    snap = BaseSnapshot(
        entity="file",
        epoch=EPOCHS.index_epoch("perf"),
        columns=columns,
        n=n,
    )
    ex._base_cache["file"] = snap
    return ex


def fake_space_scores(n: int, seed: int):
    """A _space_scores stand-in: every item scored, random distances."""
    rng = np.random.default_rng(seed)
    dist = rng.random(n).astype(np.float32)
    valid = np.ones(n, dtype=bool)
    counts = np.ones(n, dtype=np.float32)

    def fn(self, space, queries, **kw):
        return dist.copy(), valid.copy(), counts.copy()

    return fn, dist


class TestAggregationExactness:
    def test_three_space_avg_is_count_weighted_mean(self):
        """AVG over 3 spaces must be the mean over all contributing rows —
        the round-1 pairwise running mean weighted the last space 50%
        (reference: single AVG over the unioned rows, exact.rs:64-80)."""
        ex = make_executor(4)
        base = ex._base_cache["file"]
        # Item 1 appears in three spaces with per-space (mean, row count).
        spaces = [
            ("a", np.array([0.2], np.float32), np.array([True]), np.array([1.0], np.float32)),
            ("b", np.array([0.4], np.float32), np.array([True]), np.array([3.0], np.float32)),
            ("c", np.array([0.9], np.float32), np.array([True]), np.array([2.0], np.float32)),
        ]
        # SlotIndex maps slot 0 → item 0; shift to item 1 via a custom stub.
        captured = {}

        class El:
            sort = pql.SortableOptions(order_by=True, select_as="d")

        def capture_sortable(sort, mask, values, b, state):
            captured["mask"] = mask
            captured["values"] = values
            return mask

        ex._sortable = capture_sortable
        ctx = np.ones(base.n, dtype=bool)
        ex._apply_item_scores(El(), spaces, "avg", ctx, base, None)
        expected = (0.2 * 1 + 0.4 * 3 + 0.9 * 2) / 6.0
        got = captured["values"][0]  # base row 0 has item_id 1
        assert captured["mask"][0]
        np.testing.assert_allclose(got, expected, rtol=1e-6)
        # Rows for items with no scores stay unmatched.
        assert not captured["mask"][3]

    def test_min_max_across_spaces(self):
        ex = make_executor(2)
        base = ex._base_cache["file"]
        spaces = [
            ("a", np.array([0.7], np.float32), np.array([True]), np.array([1.0], np.float32)),
            ("b", np.array([0.3], np.float32), np.array([True]), np.array([5.0], np.float32)),
        ]
        captured = {}

        class El:
            sort = pql.SortableOptions(order_by=True)

        ex._sortable = lambda s, m, v, b, st: captured.update(values=v) or m
        ctx = np.ones(base.n, dtype=bool)
        ex._apply_item_scores(El(), spaces, "min", ctx, base, None)
        np.testing.assert_allclose(captured["values"][0], 0.3, rtol=1e-6)
        ex._apply_item_scores(El(), spaces, "max", ctx, base, None)
        np.testing.assert_allclose(captured["values"][0], 0.7, rtol=1e-6)


class TestJoin:
    def test_join_i64_hits_and_misses(self):
        ids = np.array([5, 1, 9, 3], dtype=np.int64)
        keys = np.array([3, 9], dtype=np.int64)
        vals = np.array([0.25, 0.75])
        values, hit = _join_i64(ids, keys, vals)
        np.testing.assert_array_equal(hit, [False, False, True, True])
        assert values[2] == 0.75 and values[3] == 0.25
        assert np.isnan(values[0]) and np.isnan(values[1])

    def test_join_i64_empty(self):
        values, hit = _join_i64(
            np.array([1, 2], np.int64), np.array([], np.int64), np.array([])
        )
        assert not hit.any() and np.isnan(values).all()


class TestPartialSortParity:
    def test_page_matches_full_sort(self):
        """The argpartition fast path must return the same page as a full
        lexsort, including ties resolved by file_id."""
        n = 50_000
        ex = make_executor(n)
        fn, dist = fake_space_scores(n, seed=7)
        # Quantize distances to force ties at the page boundary.
        dist_q = np.round(dist * 50) / 50
        ex._space_scores = types.MethodType(
            lambda self, space, queries, **kw: (
                dist_q.copy(), np.ones(n, bool), np.ones(n, np.float32)
            ),
            ex,
        )
        payload = {
            "query": {"text_embeddings": {
                "query": b64(np.zeros(8, np.float32)), "model": "m",
                "embed": None, "index": "exact",
            }},
            "page_size": 10,
            "page": 3,
        }
        res = ex.execute(pql.PqlQuery.from_json(payload))
        got = [r["file_id"] for r in res.results]
        order = np.lexsort((np.arange(1, n + 1), dist_q))
        expected = (order[20:30] + 1).tolist()
        assert got == expected


class TestHostCompositionPerf:
    def test_composed_rrf_1m_rows_beats_reference_10x(self):
        """VERDICT r1 #4 bar: composed 2-vector-filter RRF over a 1M-row
        base snapshot, device scoring stubbed. The reference's composed
        query runs 2.5 s at 690k rows (or-composition-penalty.md:41-57);
        10× better at equal corpus is 250 ms at 690k ≈ 362 ms at 1M. The
        bound here (350 ms at 1M ≈ 241 ms corpus-normalized, >10×) leaves
        headroom for the 1-core CI host's timer noise under a full-suite
        run; typical measured best standalone is ~200 ms."""
        n = 1_000_000
        ex = make_executor(n)
        fn_a, _ = fake_space_scores(n, seed=1)
        fn_b, _ = fake_space_scores(n, seed=2)
        calls = {"i": 0}

        def alternating(self, space, queries, **kw):
            calls["i"] += 1
            return (fn_a if calls["i"] % 2 else fn_b)(self, space, queries, **kw)

        ex._space_scores = types.MethodType(alternating, ex)
        payload = {
            "query": {"and_": [
                {"text_embeddings": {
                    "query": b64(np.zeros(8, np.float32)), "model": "m",
                    "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "rrf": {"k": 60, "weight": 1.0}},
                {"text_embeddings": {
                    "query": b64(np.ones(8, np.float32)), "model": "m",
                    "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "rrf": {"k": 60, "weight": 1.0}},
            ]},
            "page_size": 10,
        }
        query = pql.PqlQuery.from_json(payload)
        # Warm one run (allocator, caches), then measure.
        ex.execute(query)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = ex.execute(pql.PqlQuery.from_json(payload))
            times.append(time.perf_counter() - t0)
        best = min(times)
        assert res.count == n
        assert len(res.results) == 10
        assert best < 0.350, f"host composition too slow: {times}"


class FakeSnap:
    """Minimal SpaceSnapshot stand-in: 1M one-row-per-item space."""

    def __init__(self, n):
        self.generation = 1
        self.dim = 8
        self.size = n
        self.capacity = n
        self.num_groups = n
        self.group_ids = np.arange(n, dtype=np.int32)
        self.row_valid = np.ones(n, dtype=bool)
        self.scale = None
        self.quant_ready = False


class FakeSnapIndex(SlotIndex):
    def __init__(self, n):
        self._snap = FakeSnap(n)

    def snapshot(self, space):
        return self._snap


class TestFusedServingPerf:
    def test_fused_rrf_1m_host_time_under_15ms(self):
        """VERDICT r3 ask #1's bar: composed 2-space RRF at 1M base rows
        through the FUSED path must cost ≤ ~15 ms of host time per query
        (vs 200–350 ms for the full-readback composition above). The
        device rank join is stubbed — this measures the host side: static
        masks, eligibility checks, candidate assembly, final page sort."""
        n = 1_000_000
        ex = make_executor(n)
        ex.index = FakeSnapIndex(n)
        # On the multi-device test mesh the eligibility check consults the
        # sharded layout's packed slot order; a flat stand-in keeps this a
        # host-only measurement.
        ex._sharded_space = lambda *a, **k: types.SimpleNamespace(
            item_ids=np.arange(n, dtype=np.int64)
        )

        def fake_join(group, kk, n_items):
            items = np.arange(1, kk + 1, dtype=np.int64)
            ranks = np.stack(
                [np.arange(1, kk + 1, dtype=np.float64)] * len(group), axis=1
            )
            t32 = np.asarray(
                sum((e.rrf.weight if e.rrf else 1.0) / (60.0 + ranks[:, 0])
                    for e in group),
                dtype=np.float32,
            )
            return items, ranks, t32

        ex._rrf_join_candidates = fake_join
        payload = {
            "query": {"and_": [
                {"text_embeddings": {
                    "query": b64(np.zeros(8, np.float32)), "model": "m",
                    "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "rrf": {"k": 60, "weight": 1.0}},
                {"text_embeddings": {
                    "query": b64(np.ones(8, np.float32)), "model": "m",
                    "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "rrf": {"k": 60, "weight": 1.0}},
            ]},
            "page_size": 10,
        }
        query = pql.PqlQuery.from_json(payload)
        res = ex.execute(query)  # warm static caches (hit masks, item index)
        assert res.count == n
        assert len(res.results) == 10
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = ex.execute(pql.PqlQuery.from_json(payload))
            times.append(time.perf_counter() - t0)
        best = min(times)
        assert res.count == n and len(res.results) == 10
        assert best < 0.015, f"fused host composition too slow: {times}"

    def test_fused_single_space_1m_host_time_under_10ms(self):
        n = 1_000_000
        ex = make_executor(n)
        ex.index = FakeSnapIndex(n)

        def fake_candidates(d, *, kk, largest, group_mask=None):
            vals = np.linspace(0.0, 0.5, kk, dtype=np.float32)
            slots = np.arange(kk, dtype=np.int64)
            return vals, slots, False

        ex._deferred_candidates = fake_candidates
        payload = {
            "query": {"text_embeddings": {
                "query": b64(np.zeros(8, np.float32)), "model": "m",
                "embed": None, "index": "exact"}},
            "page_size": 10,
        }
        res = ex.execute(pql.PqlQuery.from_json(payload))
        assert res.count == n and len(res.results) == 10
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = ex.execute(pql.PqlQuery.from_json(payload))
            times.append(time.perf_counter() - t0)
        assert min(times) < 0.010, f"fused single-space too slow: {times}"


class TestDeviceCacheBudget:
    def test_lru_eviction_over_budget(self):
        ex = make_executor(4)
        ex.device_cache_budget = 100  # bytes — force eviction
        a = {"corpus": np.zeros(60, np.int8)}
        b = {"corpus": np.zeros(60, np.int8)}
        with ex._cache_lock:
            ex._device_cache[("a", 1, False)] = a
            ex._device_cache_bytes[("a", 1, False)] = 60
            ex._device_cache[("b", 1, False)] = b
            ex._device_cache_bytes[("b", 1, False)] = 60
            ex._evict_over_budget(keep=("b", 1, False))
        assert ("a", 1, False) not in ex._device_cache
        assert ("b", 1, False) in ex._device_cache
