"""Concurrent-query scan coalescing: batched rows ≡ solo runs, bit-for-bit.

The executor merges concurrent int8-arm scans that share one compiled
program into a single (B, d) dispatch (`_ScanCoalescer`). The int8 dot is
int32-exact and the epilogue elementwise, so a coalesced query MUST return
exactly what it returns alone — membership, order, counts, extras. These
tests drive real thread concurrency through Executor.execute and compare
against sequential (coalescing-off) baselines.
"""

import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from panoptikon_tpu.pql import model as pql
from panoptikon_tpu.pql.executor import _ScanCoalescer

from tests.test_fused_path import b64, build_executor, q_of


def _payload(rng, model="m", page_size=10, index="quant", dim=16):
    return {
        "query": {"text_embeddings": {
            "query": b64(q_of(rng, dim)), "model": model, "embed": None,
            "index": index}},
        "page_size": page_size,
    }


def _result_tuple(r):
    return (
        r.count,
        tuple(row["file_id"] for row in r.results),
        tuple(
            tuple(sorted(row.get("extra", {}).items()))
            for row in r.results
        ),
    )


class TestCoalescerUnit:
    def test_batches_and_preserves_order(self):
        co = _ScanCoalescer()
        barrier = threading.Barrier(6)
        sizes = []

        def runner(payloads):
            sizes.append(len(payloads))
            return [p * 10 for p in payloads]

        def worker(i):
            barrier.wait()
            return co.run("k", i, runner)

        with ThreadPoolExecutor(max_workers=6) as pool:
            out = list(pool.map(worker, range(6)))
        assert out == [i * 10 for i in range(6)]
        # All six served, in 1..6 batches covering every request.
        assert sum(sizes) == 6 and max(sizes) >= 1

    def test_exception_propagates_to_all_waiters(self):
        co = _ScanCoalescer()
        barrier = threading.Barrier(4)

        def runner(payloads):
            raise RuntimeError("scan failed")

        def worker(i):
            barrier.wait()
            try:
                co.run("k", i, runner)
            except RuntimeError as exc:
                return str(exc)
            return None

        with ThreadPoolExecutor(max_workers=4) as pool:
            out = list(pool.map(worker, range(4)))
        assert out == ["scan failed"] * 4
        # The key must not be left busy: a later request still runs.
        assert co.run("k", 7, lambda ps: [p + 1 for p in ps]) == 8

    def test_keys_do_not_mix(self):
        co = _ScanCoalescer()
        barrier = threading.Barrier(8)

        def runner_a(payloads):
            return [("a", p) for p in payloads]

        def runner_b(payloads):
            return [("b", p) for p in payloads]

        def worker(i):
            barrier.wait()
            if i % 2:
                return co.run("a", i, runner_a)
            return co.run("b", i, runner_b)

        with ThreadPoolExecutor(max_workers=8) as pool:
            out = list(pool.map(worker, range(8)))
        for i, r in enumerate(out):
            assert r == (("a" if i % 2 else "b"), i)


class TestTwoPhasePipelining:
    """(dispatch, collect) runners: the drain loop enqueues batch N+1's
    dispatch BEFORE collecting batch N (device compute overlaps the
    readback), batches cap at SCAN_COALESCE_MAX, and failures in either
    phase wake exactly that batch's waiters."""

    def test_two_phase_results_and_overlap(self):
        from panoptikon_tpu.pql.executor import SCAN_COALESCE_MAX

        co = _ScanCoalescer()
        nthreads = SCAN_COALESCE_MAX + 4  # forces ≥2 batches
        barrier = threading.Barrier(nthreads)
        events = []
        ev_lock = threading.Lock()

        def dispatch(payloads):
            with ev_lock:
                events.append(("dispatch", tuple(payloads)))
            return [p * 10 for p in payloads]

        def collect(token):
            with ev_lock:
                events.append(("collect", tuple(token)))
            return token

        def worker(i):
            barrier.wait()
            return co.run("k", i, (dispatch, collect))

        with ThreadPoolExecutor(max_workers=nthreads) as pool:
            out = list(pool.map(worker, range(nthreads)))
        assert out == [i * 10 for i in range(nthreads)]
        dispatches = [e for e in events if e[0] == "dispatch"]
        assert all(len(e[1]) <= SCAN_COALESCE_MAX for e in dispatches)
        assert sum(len(e[1]) for e in dispatches) == nthreads

    def test_second_dispatch_precedes_first_collect(self):
        """Deterministic overlap check: with batches already queued, the
        drain loop enqueues every dispatch (up to PIPELINE_DEPTH) BEFORE
        blocking on the first collect — device compute overlaps the
        readback (see _ScanCoalescer._drain)."""
        from concurrent.futures import Future

        from panoptikon_tpu.pql.executor import SCAN_COALESCE_MAX

        co = _ScanCoalescer()
        events = []

        def dispatch(payloads):
            events.append(("d", len(payloads)))
            return payloads

        def collect(token):
            events.append(("c", len(token)))
            return list(token)

        runner = (dispatch, collect)
        n = 2 * SCAN_COALESCE_MAX + 3  # three batches: MAX, MAX, 3
        futs = [Future() for _ in range(n)]
        with co._lock:
            co._pending["k"] = [(i, futs[i], runner) for i in range(n)]
            co._busy.add("k")
        co._drain("k")
        assert [f.result(timeout=5) for f in futs] == list(range(n))
        assert events == [
            ("d", SCAN_COALESCE_MAX),  # full batch 1
            ("d", SCAN_COALESCE_MAX),  # full batch 2 overlaps 1's readback
            ("c", SCAN_COALESCE_MAX),  # partial queue: collect-first
            ("d", 3),                  # remainder dispatches after
            ("c", SCAN_COALESCE_MAX),
            ("c", 3),
        ]

    def test_dispatch_exception_wakes_batch_and_frees_key(self):
        co = _ScanCoalescer()

        def dispatch(payloads):
            raise RuntimeError("enqueue failed")

        def collect(token):  # pragma: no cover — dispatch always raises
            return token

        try:
            co.run("k", 1, (dispatch, collect))
            raise AssertionError("expected RuntimeError")
        except RuntimeError as exc:
            assert "enqueue failed" in str(exc)
        # Key released: a later one-phase run still works.
        assert co.run("k", 7, lambda ps: [p + 1 for p in ps]) == 8

    def test_collect_exception_wakes_batch_and_frees_key(self):
        co = _ScanCoalescer()

        def dispatch(payloads):
            return payloads

        def collect(token):
            raise RuntimeError("readback failed")

        try:
            co.run("k", 1, (dispatch, collect))
            raise AssertionError("expected RuntimeError")
        except RuntimeError as exc:
            assert "readback failed" in str(exc)
        assert co.run("k", 7, lambda ps: [p + 1 for p in ps]) == 8

    def test_inflight_collected_before_leader_handoff(self):
        """A two-phase batch dispatched by the leader must be collected by
        the SAME frame even when the round budget expires — an uncollected
        token handed to the daemon would strand its waiters."""
        co = _ScanCoalescer()
        co_events = []

        def dispatch(payloads):
            co_events.append("d")
            return payloads

        def collect(token):
            co_events.append("c")
            return list(token)

        # Sequential runs: every run's future must resolve (no strand).
        for i in range(5):
            assert co.run("k", i, (dispatch, collect)) == i
        assert co_events.count("d") == co_events.count("c") == 5

    def test_closed_loop_clients_merge_into_full_batches(self):
        """16 closed-loop clients (each re-issuing the moment its result
        lands, like concurrent HTTP searchers) must converge to wide
        batches: each collect readback is the accumulation window during
        which the previously-freed cohort re-arrives. The old
        dispatch-eager loop fragmented this workload into mean batches of
        ~2-5; the work-conserving policy settles at the half-cohort
        ping-pong (~8) or better."""
        import threading as _t

        from panoptikon_tpu.pql.executor import SCAN_COALESCE_MAX

        co = _ScanCoalescer()

        def dispatch(payloads):
            return payloads

        def collect(token):
            time.sleep(0.005)  # modeled tunnel readback
            return list(token)

        runner = (dispatch, collect)
        stop = _t.Event()
        errors: list = []

        def client(cid):
            i = 0
            while not stop.is_set():
                try:
                    assert co.run("k", (cid, i), runner) == (cid, i)
                except Exception as exc:  # noqa: BLE001
                    errors.append(exc)
                    return
                i += 1

        threads = [_t.Thread(target=client, args=(c,)) for c in range(16)]
        for t in threads:
            t.start()
        time.sleep(1.0)
        stop.set()
        for t in threads:
            t.join(10)
        assert not errors, errors[:1]
        stats = co.stats()
        assert stats["queries"] > 200, stats
        assert stats["mean_batch"] >= 6.0, stats
        assert stats["max_batch"] <= SCAN_COALESCE_MAX


class TestExecutorCoalescing:
    def test_concurrent_quant_queries_match_solo(self):
        ex, rng = build_executor(n_items=600, dim=16, seed=3)
        payloads = [_payload(rng, page_size=12) for _ in range(12)]

        # Baselines: coalescing OFF, strictly sequential.
        ex.enable_coalesce = False
        base = [
            _result_tuple(ex.execute(pql.PqlQuery.from_json(p)))
            for p in payloads
        ]

        # Concurrent, coalescing ON, with a barrier forcing co-arrival.
        ex.enable_coalesce = True
        barrier = threading.Barrier(len(payloads))

        def worker(p):
            barrier.wait()
            return _result_tuple(ex.execute(pql.PqlQuery.from_json(p)))

        with ThreadPoolExecutor(max_workers=len(payloads)) as pool:
            got = list(pool.map(worker, payloads))
        assert got == base

    def test_concurrent_mixed_spaces_and_exact_arm(self):
        ex, rng = build_executor(n_items=400, dim=16, seed=5)
        payloads = (
            [_payload(rng, model="m", page_size=8) for _ in range(4)]
            + [_payload(rng, model="m2", page_size=8) for _ in range(4)]
            + [_payload(rng, model="m", page_size=8, index="exact")
               for _ in range(2)]
        )
        ex.enable_coalesce = False
        base = [
            _result_tuple(ex.execute(pql.PqlQuery.from_json(p)))
            for p in payloads
        ]
        ex.enable_coalesce = True
        barrier = threading.Barrier(len(payloads))

        def worker(p):
            barrier.wait()
            return _result_tuple(ex.execute(pql.PqlQuery.from_json(p)))

        with ThreadPoolExecutor(max_workers=len(payloads)) as pool:
            got = list(pool.map(worker, payloads))
        assert got == base


class TestComposedCoalescing:
    """Concurrent COMPOSED (multi-space RRF) queries through the batched
    device rank join (`_rrf_join_candidates_coalesced`): every query must
    return exactly its solo result — same pages, same ranks, same extras —
    while the drained batch runs as one program."""

    def _rrf_payload(self, rng, weights=(1.0, 0.5), ks=(60, 30), page=1):
        return {
            "query": {"and_": [
                {"text_embeddings": {
                    "query": b64(q_of(rng, 16)), "model": mdl,
                    "embed": None, "index": "quant"},
                 "row_n": True, "priority": 5,
                 "select_as": f"r{si}",
                 "rrf": {"k": k, "weight": w}}
                for si, (mdl, w, k) in enumerate(
                    zip(("m", "m2"), weights, ks))
            ]},
            "page_size": 10, "page": page,
        }

    def test_concurrent_rrf_queries_match_solo(self):
        ex, rng = build_executor(
            n_items=500, dim=16, seed=7,
            multi_file_every=10**9, multi_row_every=10**9,
        )
        # Vary per-query RRF params and pages: the batched join carries
        # (B, S) weights/ks, so they must stay per-row.
        payloads = [
            self._rrf_payload(
                rng,
                weights=(1.0, 0.4 + 0.1 * (i % 3)),
                ks=(60, 20 + 10 * (i % 2)),
                page=1 + (i % 2),
            )
            for i in range(10)
        ]

        joins = {"solo": 0, "batched": 0}
        orig_solo = ex._rrf_join_candidates
        orig_co = ex._coalesced_rrf_join

        def counting_solo(*a, **kw):
            joins["solo"] += 1
            return orig_solo(*a, **kw)

        def counting_co(*a, **kw):
            joins["batched"] += 1
            return orig_co(*a, **kw)

        ex._rrf_join_candidates = counting_solo
        ex._coalesced_rrf_join = counting_co

        ex.enable_coalesce = False
        base = [
            _result_tuple(ex.execute(pql.PqlQuery.from_json(p)))
            for p in payloads
        ]
        assert joins["solo"] == len(payloads) and joins["batched"] == 0

        ex.enable_coalesce = True
        barrier = threading.Barrier(len(payloads))

        def worker(p):
            barrier.wait()
            return _result_tuple(ex.execute(pql.PqlQuery.from_json(p)))

        with ThreadPoolExecutor(max_workers=len(payloads)) as pool:
            got = list(pool.map(worker, payloads))
        assert got == base
        assert joins["batched"] >= 1  # the coalesced runner engaged

    def test_batched_join_kernel_rows_equal_solo(self):
        """ops/fusion.rank_join_topk_batch row b ≡ rank_join_topk solo."""
        import jax.numpy as jnp

        from panoptikon_tpu.ops import fusion

        rng = np.random.default_rng(2)
        n_items, b = 64, 5
        ms = (48, 32)
        surfs = tuple(
            jnp.asarray(rng.normal(size=(b, m)).astype(np.float32))
            for m in ms
        )
        valids = tuple(
            jnp.asarray(rng.random((b, m)) < 0.9) for m in ms
        )
        idxs = tuple(
            jnp.asarray(
                rng.permutation(n_items)[:m].astype(np.int32)
            )
            for m in ms
        )
        ws = rng.random((b, 2)).astype(np.float32) + 0.1
        ks = (rng.integers(10, 90, (b, 2))).astype(np.float32)
        cand_b, ranks_b, t_b = fusion.rank_join_topk_batch(
            surfs, valids, idxs, jnp.asarray(ws), jnp.asarray(ks),
            kk=8, n_items=n_items,
        )
        for i in range(b):
            cand, ranks, t = fusion.rank_join_topk(
                tuple(s[i] for s in surfs), tuple(v[i] for v in valids),
                idxs, jnp.asarray(ws[i]), jnp.asarray(ks[i]),
                kk=8, n_items=n_items,
            )
            np.testing.assert_array_equal(np.asarray(cand_b)[i], cand)
            np.testing.assert_array_equal(np.asarray(ranks_b)[i], ranks)
            np.testing.assert_array_equal(np.asarray(t_b)[i], t)

    def test_batched_join_contig_path_rows_equal_solo(self):
        import jax.numpy as jnp

        from panoptikon_tpu.ops import fusion

        rng = np.random.default_rng(4)
        n_items, b = 64, 3
        ms, offs = (40, 30), (2, 10)
        surfs = tuple(
            jnp.asarray(rng.normal(size=(b, m)).astype(np.float32))
            for m in ms
        )
        valids = tuple(
            jnp.asarray(rng.random((b, m)) < 0.85) for m in ms
        )
        idxs = tuple(
            jnp.asarray(
                np.arange(off, off + m, dtype=np.int32)
            )
            for m, off in zip(ms, offs)
        )
        ws = np.ones((b, 2), np.float32)
        ks = np.full((b, 2), 60.0, np.float32)
        cand_b, ranks_b, t_b = fusion.rank_join_topk_batch(
            surfs, valids, idxs, jnp.asarray(ws), jnp.asarray(ks),
            kk=8, n_items=n_items, contig_offsets=offs,
        )
        for i in range(b):
            cand, ranks, t = fusion.rank_join_topk(
                tuple(s[i] for s in surfs), tuple(v[i] for v in valids),
                idxs, jnp.asarray(ws[i]), jnp.asarray(ks[i]),
                kk=8, n_items=n_items, contig_offsets=offs,
            )
            np.testing.assert_array_equal(np.asarray(cand_b)[i], cand)
            np.testing.assert_array_equal(np.asarray(ranks_b)[i], ranks)
            np.testing.assert_array_equal(np.asarray(t_b)[i], t)


class TestLeadershipHandoff:
    def test_leader_rounds_bounded_under_sustained_load(self):
        """Under sustained arrivals the first-arriving (leader) thread must
        return after at most MAX_LEADER_ROUNDS batches — the drain hands
        off to a daemon — while every queued request still completes."""
        co = _ScanCoalescer()
        key = ("space", 1)
        in_leader = threading.Event()
        release = threading.Event()
        rounds_before_leader_return = []
        results = []
        lock = threading.Lock()

        def runner(payloads):
            in_leader.set()
            release.wait(10)
            with lock:
                rounds_before_leader_return.append(len(payloads))
            return [p for p in payloads]

        def call(p):
            results.append(co.run(key, p, runner))

        leader = threading.Thread(target=call, args=(0,))
        leader.start()
        assert in_leader.wait(10)
        # Queue a steady stream: strictly more batches of work than the
        # leader's round budget.
        extra = [
            threading.Thread(target=call, args=(i,)) for i in range(1, 9)
        ]
        for t in extra:
            t.start()
        # Give the extras time to enqueue behind the in-flight batch, then
        # release the device.
        import time as _time

        _time.sleep(0.1)
        release.set()
        leader.join(10)
        assert not leader.is_alive()
        for t in extra:
            t.join(10)
        # Everyone completed exactly once, values preserved.
        assert sorted(results) == list(range(9))
        st = co.stats()
        assert st["queries"] == 9
        # The leader returned while (or before) the daemon drained the
        # tail: its own future resolved in batch 1, and it ran at most
        # MAX_LEADER_ROUNDS batches before handing off.
        assert st["dispatches"] >= 2

    def test_handoff_daemon_drains_without_new_arrivals(self):
        """Work queued past the leader's budget completes even if NO new
        request ever arrives (the daemon, not a future caller, drains it)."""
        co = _ScanCoalescer()
        key = "k"
        slow = threading.Event()
        done = []

        def runner(payloads):
            slow.wait(0.05)
            return [p + 100 for p in payloads]

        threads = [
            threading.Thread(target=lambda i=i: done.append(
                co.run(key, i, runner)))
            for i in range(12)
        ]
        for t in threads:
            t.start()
        slow.set()
        for t in threads:
            t.join(15)
        assert sorted(done) == [i + 100 for i in range(12)]
        assert not co._busy  # fully drained, key released


class TestWriteWhileServing:
    def test_concurrent_writes_never_tear_serving(self):
        """Index mutations (add + build_quant, generation bumps) racing
        live queries: every query must land on SOME committed generation —
        correct self-match for rows visible to it, never an exception or a
        torn result. This pins the snapshot/generation discipline the
        epoch-cached serving path depends on."""
        import time as _time

        from tests.test_fused_path import build_executor

        ex, rng = build_executor(n_items=64, dim=16, seed=11)
        index = ex.index
        dim = 16
        base_rows = index.snapshot("m").size

        stop = threading.Event()
        errors: list[BaseException] = []
        counts_seen: set[int] = set()

        def reader():
            r = np.random.default_rng(threading.get_ident() % 2**32)
            while not stop.is_set():
                try:
                    vec = r.standard_normal(dim).astype(np.float32)
                    res = ex.execute(pql.PqlQuery.from_json({
                        "query": {"text_embeddings": {
                            "query": b64(vec), "model": "m",
                            "embed": None, "index": "quant"}},
                        "page_size": 3,
                    }))
                    counts_seen.add(res.count)
                except BaseException as exc:  # noqa: BLE001
                    errors.append(exc)
                    return

        readers = [threading.Thread(target=reader) for _ in range(4)]
        for t in readers:
            t.start()
        # Writer: 6 rounds of append + requant. Each new row reuses an
        # EXISTING item id so the base snapshot stays valid (the item-level
        # join is what serving aggregates over).
        next_row = 100_000
        for round_i in range(6):
            ids = np.arange(1, 9, dtype=np.int64)  # existing items 1..8
            rows = next_row + np.arange(8)
            next_row += 8
            vecs = np.random.default_rng(round_i).standard_normal(
                (8, dim)).astype(np.float32)
            index.add("m", ids, rows, vecs)
            index.build_quant("m")
            _time.sleep(0.15)  # let readers overlap this generation
        stop.set()
        for t in readers:
            t.join(30)
        assert not errors, errors[:1]
        # Every observed count corresponds to a committed state: the item
        # count never changes (rows append to existing items), so count is
        # constant across generations.
        assert counts_seen, "readers never completed a query"
        snap = index.snapshot("m")
        assert snap.size == base_rows + 48
        # After the dust settles, a query vector equal to a late row must
        # self-match (the final generation serves).
        last_vec = np.random.default_rng(5).standard_normal(
            (8, dim)).astype(np.float32)[0]
        res = ex.execute(pql.PqlQuery.from_json({
            "query": {"text_embeddings": {
                "query": b64(last_vec), "model": "m",
                "embed": None, "index": "quant"}},
            "page_size": 1,
        }))
        assert res.results and res.results[0]["item_id"] == 1
