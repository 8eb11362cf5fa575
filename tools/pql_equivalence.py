#!/usr/bin/env python
"""PQL differential suite: the executor vs an independent oracle.

The reference validates its Rust PQL engine against the legacy Python
implementation over one DB snapshot (tools/pql-equivalence). This suite
plays the same role for the TPU engine: a randomized corpus is seeded into
a real database + device index, a battery of PQL queries (discovery-
parameterized from the corpus itself) runs through the executor, and an
INDEPENDENT brute-force oracle — straight SQL + NumPy, sharing no code
with the executor's filter implementations — recomputes membership and
ordering. Semantic queries use deterministic pseudo-embeddings injected on
both sides, so no inference runs (README:104-117 pattern).

Usage: python tools/pql_equivalence.py [--items 200] [--seed 0]
Exits nonzero on any divergence; prints a JSON summary.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Differential checking is a CPU job; never contend for the TPU claim.
# The 8-device virtual mesh makes the executor take its SHARDED serving
# path (device_count > 1), so the oracle validates the multi-chip scan.
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def seed_db(root, n_items, rng):
    from panoptikon_tpu.db import store
    from panoptikon_tpu.db.connection import Database
    from panoptikon_tpu.db.writer import IndexWriter
    from panoptikon_tpu.index.vector_index import VectorIndex

    db = Database(root, "diff")
    writer = IndexWriter(db)
    index = VectorIndex(chunk_rows=64)
    dim = 32
    vecs = rng.normal(size=(n_items, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    mimes = ["image/png", "image/jpeg", "video/mp4", "application/pdf"]
    langs = ["en", "de", "ja"]
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    tags = ["cat", "dog", "tree", "car", "sky"]

    def unit(conn):
        sid_clip = store.upsert_setter(conn, "clip/test")
        sid_ocr = store.upsert_setter(conn, "ocr/test")
        sid_tag = store.upsert_setter(conn, "tags/test")
        rows = []
        for i in range(n_items):
            sha = f"{i:04x}" * 16
            mime = mimes[rng.integers(len(mimes))]
            item = store.upsert_item(
                conn, sha, f"{i:04x}" * 8, mime,
                size=int(rng.integers(100, 10_000)),
                width=int(rng.integers(10, 4000)),
                height=int(rng.integers(10, 4000)),
            )
            store.upsert_file(
                conn, item, sha, f"/corpus/d{i % 7}/f{i:05d}.bin",
                f"2026-{1 + i % 12:02d}-{1 + i % 28:02d}T00:00:00",
            )
            did = store.insert_item_data(conn, item, sid_clip, "clip")
            store.insert_embedding(conn, did, vecs[i])
            if i % 2 == 0:
                tdid = store.insert_item_data(conn, item, sid_ocr, "text")
                text = " ".join(
                    rng.choice(words, size=rng.integers(3, 8)).tolist()
                ) + f" token{i:04d}"
                store.insert_extracted_text(
                    conn, tdid, text,
                    language=langs[rng.integers(len(langs))],
                    confidence=float(rng.uniform(0.3, 1.0)),
                    language_confidence=float(rng.uniform(0.5, 1.0)),
                )
            if i % 3 == 0:
                gdid = store.insert_item_data(conn, item, sid_tag, "tags")
                for t in rng.choice(tags, size=rng.integers(1, 4), replace=False):
                    tid = store.upsert_tag(conn, "general", str(t))
                    store.tag_item(conn, gdid, item, tid, float(rng.uniform(0.2, 1.0)))
            if i in (5, 9):
                store.record_extraction_error(
                    conn, item, "clip/test", stage="inference",
                    error_class="input", message="synthetic",
                )
            rows.append((item, sha, mime))
        return rows

    rows = writer.call(unit)
    # user_data: bookmark every 4th item for the in_bookmarks shape.
    uconn = db.user_data_write_connection()
    try:
        with uconn:
            for i in range(0, n_items, 4):
                uconn.execute(
                    """INSERT INTO bookmarks
                       (user, namespace, sha256, time_added, metadata)
                       VALUES ('u1', 'favs', ?, ?, NULL)""",
                    (rows[i][1], f"2026-01-01T00:00:{i % 60:02d}"),
                )
    finally:
        uconn.close()
    item_ids = np.array([r[0] for r in rows], dtype=np.int64)
    index.add("clip/test", item_ids, np.arange(n_items), vecs)
    index.build_quant("clip/test")
    return db, writer, index, rows, vecs


def b64(vec):
    from panoptikon_tpu.utils import npy

    return base64.standard_b64encode(npy.serialize_npy(vec)).decode()


def oracle_rows(db, payload, rows, vecs):
    """Independent recomputation for the query shapes this suite emits.
    Returns ordered file_id list or None when the oracle doesn't model the
    query (those cases only check executor self-consistency)."""
    conn = db.reader()
    q = payload.get("query")
    base = conn.execute(
        """SELECT f.id, f.item_id, i.type, i.size, f.path FROM files f
           JOIN items i ON i.id=f.item_id WHERE f.available=1 ORDER BY f.id"""
    ).fetchall()
    by_file = {r[0]: r for r in base}
    members = set(by_file)
    order_key = None

    def restrict(pred):
        nonlocal members
        members = {fid for fid in members if pred(by_file[fid])}

    if q is None:
        pass
    elif "match" in q and "eq" in q["match"]:
        col, val = next(iter(q["match"]["eq"].items()))
        idx = {"type": 2, "size": 3, "path": 4}[col]
        restrict(lambda r: r[idx] == val)
    elif "match" in q and "gt" in q["match"]:
        col, val = next(iter(q["match"]["gt"].items()))
        idx = {"size": 3}[col]
        restrict(lambda r: r[idx] is not None and r[idx] > val)
    elif "match_tags" in q:
        args = q["match_tags"]
        need = set(args["tags"])
        got = {}
        for item_id, name in conn.execute(
            """SELECT ti.item_id, tg.name FROM tags_items ti
               JOIN tags tg ON tg.id=ti.tag_id WHERE ti.confidence >= ?""",
            (args.get("min_confidence", 0.0),),
        ).fetchall():
            got.setdefault(item_id, set()).add(name)
        if args.get("match_any"):
            ok = {i for i, names in got.items() if names & need}
        else:
            ok = {i for i, names in got.items() if need <= names}
        restrict(lambda r: r[1] in ok)
    elif "match_text" in q:
        needle = q["match_text"]["match"]
        ok = {
            r[0]
            for r in conn.execute(
                """SELECT d.item_id FROM extracted_text t
                   JOIN item_data d ON d.id = t.id
                   WHERE t.text LIKE ?""",
                (f"%{needle}%",),
            ).fetchall()
        }
        restrict(lambda r: r[1] in ok)
    elif "image_embeddings" in q:
        raw = base64.standard_b64decode(q["image_embeddings"]["query"])
        from panoptikon_tpu.utils import npy as _npy

        qv = _npy.parse_npy_embedding(raw)
        item_order = np.argsort(1 - vecs @ qv, kind="stable")
        item_rank = {rows[i][0]: r for r, i in enumerate(item_order)}
        order_key = lambda fid: (item_rank[by_file[fid][1]], fid)
    elif "and_" in q and all(
        "image_embeddings" in c for c in q["and_"]
    ) and all(c.get("rrf") for c in q["and_"]):
        # Composed RRF over two semantic filters: per-filter row_n ranks
        # over ascending distance, fused with w/(k+rank), ordered desc.
        from panoptikon_tpu.utils import npy as _npy

        item_ids = [r[0] for r in rows]
        totals = {by_file[fid][1]: 0.0 for fid in members}
        for child in q["and_"]:
            raw = base64.standard_b64decode(child["image_embeddings"]["query"])
            qv = _npy.parse_npy_embedding(raw)
            d = 1 - vecs @ qv
            order = np.argsort(d, kind="stable")
            rrf = child["rrf"]
            for rank0, i in enumerate(order):
                totals[item_ids[i]] += rrf.get("weight", 1.0) / (
                    rrf.get("k", 60) + rank0 + 1
                )
        order_key = lambda fid: (-totals[by_file[fid][1]], fid)
    elif "and_" in q and len(q["and_"]) == 2 and "match" in q["and_"][0] and (
        "image_embeddings" in q["and_"][1]
    ):
        col, val = next(iter(q["and_"][0]["match"]["gt"].items()))
        idx = {"size": 3}[col]
        restrict(lambda r: r[idx] is not None and r[idx] > val)
        from panoptikon_tpu.utils import npy as _npy

        raw = base64.standard_b64decode(q["and_"][1]["image_embeddings"]["query"])
        qv = _npy.parse_npy_embedding(raw)
        item_ids = [r[0] for r in rows]
        dist = {item_ids[i]: float(d) for i, d in enumerate(1 - vecs @ qv)}
        order_key = lambda fid: (dist[by_file[fid][1]], fid)
    elif "not_" in q and "match" in q["not_"]:
        col, val = next(iter(q["not_"]["match"]["eq"].items()))
        idx = {"type": 2, "size": 3, "path": 4}[col]
        restrict(lambda r: r[idx] != val)
    elif "or_" in q:
        keep = set()
        for child in q["or_"]:
            col, val = next(iter(child["match"]["eq"].items()))
            idx = {"type": 2, "size": 3, "path": 4}[col]
            keep |= {fid for fid in members if by_file[fid][idx] == val}
        members = keep
    elif "match" in q and "startswith" in q["match"]:
        col, val = next(iter(q["match"]["startswith"].items()))
        idx = {"type": 2, "size": 3, "path": 4}[col]
        restrict(lambda r: str(r[idx]).startswith(val))
    elif "in_bookmarks" in q:
        args = q["in_bookmarks"]
        ok = {
            r[0]
            for r in conn.execute(
                """SELECT i.id FROM user_data.bookmarks b
                   JOIN items i ON i.sha256 = b.sha256
                   WHERE b.user IN (?, '*') AND b.namespace = ?""",
                (args["user"], args["namespaces"][0]),
            ).fetchall()
        }
        restrict(lambda r: r[1] in ok)
    elif "failed_for" in q:
        ok = {
            r[0]
            for r in conn.execute(
                """SELECT item_id FROM extraction_errors
                   WHERE setter_name=? AND error_class='input'""",
                (q["failed_for"],),
            ).fetchall()
        }
        restrict(lambda r: r[1] in ok)
    elif "processed_by" in q:
        ok = {
            r[0]
            for r in conn.execute(
                """SELECT DISTINCT d.item_id FROM item_data d
                   JOIN setters s ON s.id=d.setter_id WHERE s.name=?""",
                (q["processed_by"],),
            ).fetchall()
        }
        restrict(lambda r: r[1] in ok)
    else:
        return None

    ordered = sorted(members) if order_key is None else sorted(members, key=order_key)
    if payload.get("partition_by") == ["item_id"]:
        seen, kept = set(), []
        for fid in ordered:
            iid = by_file[fid][1]
            if iid not in seen:
                seen.add(iid)
                kept.append(fid)
        ordered = kept
    if payload.get("order_by") == [{"order_by": "size"}]:
        ordered = sorted(members, key=lambda fid: (by_file[fid][3], fid))
    if payload.get("order_by") == [{"order_by": "random"}]:
        from panoptikon_tpu.utils.splitmix import pk_mix

        seed = payload["seed"]
        ordered = sorted(members, key=lambda fid: (pk_mix(fid, seed), fid))
    return ordered


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--items", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from panoptikon_tpu.pql import model as pql
    from panoptikon_tpu.pql.executor import Executor

    rng = np.random.default_rng(args.seed)
    with tempfile.TemporaryDirectory() as tmp:
        db, writer, index, rows, vecs = seed_db(tmp, args.items, rng)
        ex = Executor(db, index, manager=None)

        queries = [
            {"page_size": 10_000},
            {"query": {"match": {"eq": {"type": "image/png"}}}, "page_size": 10_000},
            {"query": {"match": {"gt": {"size": 5000}}}, "page_size": 10_000},
            {"query": {"match_tags": {"tags": ["cat"]}}, "page_size": 10_000},
            {"query": {"match_tags": {"tags": ["cat", "dog"], "match_any": True}},
             "page_size": 10_000},
            {"query": {"match_text": {"match": "token0004"}}, "page_size": 10_000},
            {"query": {"processed_by": "ocr/test"}, "page_size": 10_000},
            {"page_size": 10_000, "order_by": [{"order_by": "size"}]},
            {"query": {"image_embeddings": {
                "query": b64(vecs[3]), "model": "clip/test", "embed": None,
                "index": "exact"}}, "page_size": 10_000},
            {"query": {"image_embeddings": {
                "query": b64(vecs[11]), "model": "clip/test", "embed": None,
                "index": "exact"}}, "page_size": 10_000},
            {"query": {"and_": [
                {"image_embeddings": {"query": b64(vecs[3]), "model": "clip/test",
                                      "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "rrf": {"k": 60, "weight": 1.0}},
                {"image_embeddings": {"query": b64(vecs[11]), "model": "clip/test",
                                      "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "rrf": {"k": 60, "weight": 0.5}},
            ]}, "page_size": 10_000},
            {"query": {"and_": [
                {"match": {"gt": {"size": 5000}}},
                {"image_embeddings": {"query": b64(vecs[7]), "model": "clip/test",
                                      "embed": None, "index": "exact"}},
            ]}, "page_size": 10_000},
            {"page_size": 10_000, "order_by": [{"order_by": "random"}],
             "seed": 424242},
            {"query": {"not_": {"match": {"eq": {"type": "image/png"}}}},
             "page_size": 10_000},
            {"query": {"or_": [
                {"match": {"eq": {"type": "image/png"}}},
                {"match": {"eq": {"type": "video/mp4"}}},
            ]}, "page_size": 10_000},
            {"query": {"match": {"startswith": {"path": "/corpus/d3/"}}},
             "page_size": 10_000},
            {"query": {"failed_for": "clip/test"}, "page_size": 10_000},
            {"page_size": 10_000, "partition_by": ["item_id"]},
            {"query": {"in_bookmarks": {"user": "u1", "namespaces": ["favs"]}},
             "page_size": 10_000},
        ]
        failures, checked = [], 0
        for payload in queries:
            res = ex.execute(pql.PqlQuery.from_json(dict(payload)))
            got = [r["file_id"] for r in res.results]
            want = oracle_rows(db, payload, rows, vecs)
            if want is None:
                continue
            checked += 1
            order_rank_q = (
                "image_embeddings" in str(payload.get("query"))
                or payload.get("order_by") == [{"order_by": "random"}]
            )
            if order_rank_q:
                # Order-sensitive comparison for ranked queries.
                if got[:50] != want[:50]:
                    failures.append({"payload": payload, "got": got[:10], "want": want[:10]})
            else:
                order_sensitive = payload.get("order_by") == [{"order_by": "size"}]
                if (got if order_sensitive else sorted(got)) != (
                    want if order_sensitive else sorted(want)
                ):
                    failures.append(
                        {"payload": payload, "got_n": len(got), "want_n": len(want)}
                    )
            if res.count != len(want):
                failures.append(
                    {"payload": payload, "count": res.count, "want_count": len(want)}
                )
        writer.close()
        print(json.dumps({"checked": checked, "failures": failures}, indent=2, default=str))
        return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
