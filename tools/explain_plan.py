"""Offline plan + wall-clock harness (reference pql/explain_plan.rs).

Builds a synthetic indexed database (or points at an existing data root),
runs a suite of representative PQL queries through the executor, and dumps
per-query: the compile-time plan summary (filters, quant arm, spaces), the
phase timings (compile/execute), and medians over repeats — the source of
truth for perf regressions, mirroring the reference's #[ignore]d
explain-plan tests that produced every number in its perf docs.

Usage:
  python tools/explain_plan.py [--items 20000] [--dim 64] [--repeats 5]
  python tools/explain_plan.py --json out.json     # machine-readable dump
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honor an explicit JAX_PLATFORMS via the live config: a PJRT plugin
# sitecustomize freezes the platform choice before this script runs, and
# with a dead accelerator transport the backend init then hangs forever
# (see docs/operations.md "hung accelerator runbook").
import os

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def build_synthetic(root: Path, items: int, dim: int):
    from panoptikon_tpu.db import store
    from panoptikon_tpu.db.connection import Database
    from panoptikon_tpu.db.writer import IndexWriter
    from panoptikon_tpu.index.vector_index import VectorIndex

    db = Database(root, "explain")
    writer = IndexWriter(db)
    index = VectorIndex()
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(items, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    def unit(conn):
        sid = store.upsert_setter(conn, "clip")
        tid = store.upsert_tag(conn, "general", "cat")
        ids = []
        for i in range(items):
            sha = f"{i:08x}" + "0" * 56
            item_id = store.upsert_item(
                conn, sha, f"{i:032x}", "image/png", size=1000 + i,
                width=640, height=480,
            )
            store.upsert_file(
                conn, item_id, sha, f"/media/d{i % 97}/f{i:06}.png",
                "2026-01-01T00:00:00",
            )
            did = store.insert_item_data(conn, item_id, sid, "clip")
            store.insert_embedding(conn, did, vecs[i])
            if i % 5 == 0:
                gdid = store.insert_item_data(conn, item_id, sid, "tags")
                store.tag_item(conn, gdid, item_id, tid, 0.5 + (i % 50) / 100)
            ids.append(item_id)
        return ids

    item_ids = writer.call(unit)
    index.add("clip", np.asarray(item_ids), np.arange(items), vecs)
    index.build_quant("clip")
    return db, writer, index, vecs


def query_suite(vecs) -> list[tuple[str, dict]]:
    import base64

    from panoptikon_tpu.utils import npy

    def b64(v):
        return base64.standard_b64encode(npy.serialize_npy(v)).decode()

    q = vecs[17]
    q2 = vecs[91]
    return [
        ("match-only", {
            "query": {"match": {"gt": {"size": 1500}}}, "page_size": 10,
        }),
        ("semantic-exact", {
            "query": {"image_embeddings": {
                "query": b64(q), "model": "clip", "embed": None,
                "index": "exact"}},
            "page_size": 10,
        }),
        ("semantic-quant", {
            "query": {"image_embeddings": {
                "query": b64(q), "model": "clip", "embed": None,
                "index": "quant"}},
            "page_size": 10,
        }),
        ("composed-rrf", {
            "query": {"and_": [
                {"image_embeddings": {"query": b64(q), "model": "clip",
                                      "embed": None, "index": "quant"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 1.0}},
                {"image_embeddings": {"query": b64(q2), "model": "clip",
                                      "embed": None, "index": "quant"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 1.0}},
            ]},
            "page_size": 10,
        }),
        ("filtered-semantic", {
            "query": {"and_": [
                {"match": {"gt": {"size": 1300}}},
                {"image_embeddings": {"query": b64(q), "model": "clip",
                                      "embed": None, "index": "quant"}},
            ]},
            "page_size": 10,
        }),
        ("random-seeded", {
            "query": {"match": {"gt": {"size": 0}}},
            "order_by": [{"order_by": "random"}], "seed": 1234,
            "page_size": 10,
        }),
    ]


def explain(ex, payload: dict) -> dict:
    """Compile-side plan summary (mirrors /api/search/pql/build)."""
    from panoptikon_tpu.pql import model as pql
    from panoptikon_tpu.pql import preprocess as prep

    query = pql.PqlQuery.from_json(payload)
    prep.preprocess_query(query, manager=None, index=ex.index)
    filters = []
    for leaf in pql.walk_filters(query.query):
        entry = {"filter": type(leaf).__name__}
        for attr in ("image_embeddings", "text_embeddings", "similar_to"):
            args = getattr(leaf, attr, None)
            if args is not None:
                entry["model"] = args.model
                entry["arm"] = "quant" if args._quant else "exact"
        filters.append(entry)
    return {"entity": query.entity, "filters": filters}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--items", type=int, default=20_000)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--repeats", type=int, default=5)
    parser.add_argument("--json", default=None, help="write results here")
    args = parser.parse_args()

    from panoptikon_tpu.pql import model as pql
    from panoptikon_tpu.pql.executor import Executor

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        db, writer, index, vecs = build_synthetic(
            Path(tmp), args.items, args.dim
        )
        print(f"# synthetic corpus: {args.items} items x {args.dim}d "
              f"({time.perf_counter()-t0:.1f}s build)", file=sys.stderr)
        ex = Executor(db, index, manager=None)
        results = []
        for name, payload in query_suite(vecs):
            plan = explain(ex, payload)
            compiles, executes, counts = [], [], None
            for _ in range(args.repeats):
                res = ex.execute(pql.PqlQuery.from_json(payload))
                compiles.append(res.metrics.compile_s)
                executes.append(res.metrics.execute_s)
                counts = res.count
            row = {
                "query": name,
                "plan": plan,
                "count": counts,
                "compile_ms_median": round(statistics.median(compiles) * 1e3, 2),
                "execute_ms_median": round(statistics.median(executes) * 1e3, 2),
                "execute_ms_best": round(min(executes) * 1e3, 2),
            }
            results.append(row)
            print(json.dumps(row))
        if args.json:
            Path(args.json).write_text(json.dumps(results, indent=2))
        writer.close()


if __name__ == "__main__":
    main()
