"""Concurrent-query scan coalescing: batched rows ≡ solo runs, bit-for-bit.

The executor merges concurrent int8-arm scans that share one compiled
program into a single (B, d) dispatch (`_ScanCoalescer`). The int8 dot is
int32-exact and the epilogue elementwise, so a coalesced query MUST return
exactly what it returns alone — membership, order, counts, extras. These
tests drive real thread concurrency through Executor.execute and compare
against sequential (coalescing-off) baselines.
"""

import threading
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
