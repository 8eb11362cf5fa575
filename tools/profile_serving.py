#!/usr/bin/env python
"""Host-cost profile of the served search path (executor.execute).

The e2e QPS at 16-way concurrency is capped by per-query host work (1-core
host: everything between device dispatches serializes under the GIL). This
rig seeds the same corpus as tools/e2e_server_bench.py, then:

1. cProfiles N sequential `Executor.execute` calls of a payload shape and
   prints the top host functions by cumulative time (device waits show up
   in jax internals — ignore those rows; the actionable ones are numpy/
   python frames);
2. runs a T-thread concurrent block (no profiler) and reports QPS + the
   coalescer amortization, as the ground truth the profile must explain.

Usage: python tools/profile_serving.py [--n 1000000] [--shape single|rrf|hybrid]
"""

from __future__ import annotations

import argparse
import base64
import cProfile
import io
import pstats
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--n2", type=int, default=250_000)
    ap.add_argument("--shape", default="single",
                    choices=["single", "rrf", "hybrid"])
    ap.add_argument("--seq", type=int, default=48)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--total", type=int, default=160)
    ap.add_argument("--top", type=int, default=35)
    args = ap.parse_args()

    import jax  # noqa: F401

    from panoptikon_tpu.api.server import AppState
    from panoptikon_tpu.pql import model as pql
    from panoptikon_tpu.utils import npy
    from tools.e2e_server_bench import _make_space, _seed_db

    with tempfile.TemporaryDirectory() as tmp:
        reg = Path(tmp) / "registry"
        reg.mkdir()
        state = AppState.create(Path(tmp) / "data", reg)
        t = _seed_db(state, "default", args.n)
        print(f"[prof] seeded {args.n} in {t:.1f}s", file=sys.stderr)
        index = state.index("default")
        t0 = time.perf_counter()
        _make_space(index, "clip/e2e", args.n, 512, seed=1)
        if args.shape != "single":
            _make_space(index, "st/e2e", args.n2, 768, seed=2)
        print(f"[prof] index built in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        ex = state.executor("default")

        rng = np.random.default_rng(7)

        def b64(d):
            v = rng.standard_normal(d).astype(np.float32)
            v /= np.linalg.norm(v)
            return base64.standard_b64encode(
                npy.serialize_npy(v)).decode()

        def payload(i):
            if args.shape == "single":
                return {"query": {"image_embeddings": {
                    "query": b64(512), "model": "clip/e2e",
                    "embed": None, "index": "quant"}},
                    "page_size": 256}
            if args.shape == "rrf":
                return {"query": {"and_": [
                    {"image_embeddings": {
                        "query": b64(512), "model": "clip/e2e",
                        "embed": None, "index": "quant"},
                     "row_n": True, "priority": 5,
                     "rrf": {"k": 60, "weight": 1.0}},
                    {"text_embeddings": {
                        "query": b64(768), "model": "st/e2e",
                        "embed": None, "index": "quant"},
                     "row_n": True, "priority": 5,
                     "rrf": {"k": 60, "weight": 0.5}},
                ]}, "page_size": 256}
            tok = f"tok{(7 + 13 * (i % 997)) % 5000:04d}"
            return {"query": {"and_": [
                {"match_text": {"match": f'"{tok}"'}, "order_by": True,
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 1.0}},
                {"text_embeddings": {
                    "query": b64(768), "model": "st/e2e",
                    "embed": None, "index": "quant"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 0.5}},
            ]}, "page_size": 256}

        def run_one(i):
            return ex.execute(pql.PqlQuery.from_json(payload(i)))

        for i in range(4):  # warm: compiles + device cache
            run_one(-1 - i)

        # Sequential latency + phase attribution (executor debug timers).
        ex.debug_timing = True
        acc: dict[str, float] = {}
        t0 = time.perf_counter()
        for i in range(args.seq):
            r = run_one(i)
            for k, v in (r.metrics.phases or {}).items():
                acc[k] = acc.get(k, 0.0) + v
        seq_ms = (time.perf_counter() - t0) / args.seq * 1e3
        ex.debug_timing = False
        print(f"[prof] sequential: {seq_ms:.1f} ms/query", file=sys.stderr)
        print(
            "[prof] phases (ms/query): "
            + ", ".join(
                f"{k}={v / args.seq * 1e3:.2f}" for k, v in acc.items()
            ),
            file=sys.stderr,
        )

        prof = cProfile.Profile()
        prof.enable()
        for i in range(args.seq):
            run_one(1000 + i)
        prof.disable()
        buf = io.StringIO()
        stats = pstats.Stats(prof, stream=buf)
        stats.sort_stats("cumulative").print_stats(args.top)
        print(buf.getvalue())

        # Concurrent ground truth.
        errs = []

        def drive(chunk):
            try:
                for i in chunk:
                    run_one(10_000 + i)
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        idxs = list(range(args.total))
        parts = [idxs[i::args.threads] for i in range(args.threads)]
        # concurrent warm (coalesced-shape compiles)
        ws = [threading.Thread(target=drive, args=([-(i + 10)],))
              for i in range(args.threads)]
        for w in ws:
            w.start()
        for w in ws:
            w.join()
        s0 = ex._scan_coalescer.stats()
        t0 = time.perf_counter()
        ts = [threading.Thread(target=drive, args=(p,)) for p in parts]
        for th in ts:
            th.start()
        for th in ts:
            th.join()
        dt = time.perf_counter() - t0
        s1 = ex._scan_coalescer.stats()
        if errs:
            raise errs[0]
        dd = s1["dispatches"] - s0["dispatches"]
        dq = s1["queries"] - s0["queries"]
        print(
            f"[prof] concurrent: {args.total / dt:.1f} QPS "
            f"({args.threads} threads), coalescer {dq}/{dd} "
            f"= {dq / max(dd, 1):.2f} mean batch",
            file=sys.stderr,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
