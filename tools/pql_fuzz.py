"""Randomized PQL composition fuzzer (property-based differential test).

The fixed 66-shape differential suite (tools/pql_equivalence.py) checks
hand-picked compositions; this fuzzer generates RANDOM AND/OR/NOT trees
over the modeled filter primitives and checks engine membership + count
against set-algebra over independently computed primitive oracles:

    oracle(AND(a,b,…)) = ∩ oracle(aᵢ)
    oracle(OR(a,b,…))  = ∪ oracle(aᵢ)
    oracle(NOT(a))     = base − oracle(a)

Primitives: typed-column match ops (eq/neq/gt/lt/in/nin/startswith over
type/size/width/height/path), match_tags (any/all), match_text (FTS
token), processed_by, failed_for, in_bookmarks — each oracle is a direct
SQL/set computation, never the engine. Corpus and seeding are shared
with the differential suite (same seeded DB builder); runs on the same
8-virtual-device mesh so the sharded serving path composes under every
random tree's host mask.

A third phase fuzzes SEMANTIC × META composition: a random vector
filter (space, aggregation, exact/quant arm) ANDed under a random meta
tree, ranked against the shared independent space oracle (the same
NumPy scorer the differential suite uses — never the engine).

A fourth phase fuzzes RRF fusion: two random semantic filters at equal
priority with random per-filter rrf {k, weight}, fused totals checked
against the published reciprocal-rank formula over the oracle's rank
lists.

A second phase fuzzes ORDERING/PAGING self-consistency: for random
(tree, order_by, direction, page_size) combinations, page-N results must
be exact slices of the full ordering, counts must agree, and a seeded
``random`` order must be stable across repeat queries.

A fifth phase fuzzes CONCURRENT-COALESCING equivalence: batches of 8
mixed random shapes (single-space pages, composed RRF with varied
weights/ks, semantic × meta) run under real thread concurrency through
the serving coalescer (batched scans + batched device rank join) and
must return exactly their solo (coalescing-off) results.

A sixth phase fuzzes the TYPED BUILDER (pql/build.py): random operator
trees are rebuilt through the Filter combinators (& | ~, which flatten
adjacent same-operator nodes) and must reach the same membership as the
plain-dict tree — pinning that flattening preserves semantics.

Usage: python tools/pql_fuzz.py [--trees 200] [--order-trees 60]
                                [--items 300] [--seed 0]
Exit nonzero on any divergence. Reference anchor: the reference's
pql-equivalence harness is discovery-parameterized but fixed-shape
(tools/pql-equivalence/README.md); property-based composition coverage
is this rebuild's extension of that strategy.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pql_equivalence as diff  # noqa: E402  (shared corpus seeding)


def build_primitives(db, conn, rng):
    """[(name, payload_fragment, membership_set)] over the seeded corpus."""
    base = conn.execute(
        """SELECT f.id, f.item_id, i.type, i.size, f.path, i.width,
                  i.height, i.sha256
           FROM files f JOIN items i ON i.id=f.item_id
           WHERE f.available=1"""
    ).fetchall()
    by_file = {r[0]: r for r in base}
    all_fids = set(by_file)
    file_of_item: dict[int, list[int]] = {}
    for r in base:
        file_of_item.setdefault(r[1], []).append(r[0])

    def of_items(items):
        out = set()
        for it in items:
            out.update(file_of_item.get(it, ()))
        return out

    sizes = sorted(r[3] for r in base)
    widths = sorted(r[5] for r in base)
    prims = []

    def add(name, frag, members):
        prims.append({"name": name, "frag": frag, "members": set(members)})

    types = sorted({r[2] for r in base})
    for t in types[:3]:
        add(f"eq-type-{t}", {"match": {"eq": {"type": t}}},
            {f for f, r in by_file.items() if r[2] == t})
        add(f"neq-type-{t}", {"match": {"neq": {"type": t}}},
            {f for f, r in by_file.items() if r[2] != t})
    add("in-types", {"match": {"in_": {"type": types[:2]}}},
        {f for f, r in by_file.items() if r[2] in types[:2]})
    for q, col, idx in ((0.25, "size", 3), (0.5, "size", 3),
                        (0.5, "width", 5)):
        vals = sizes if col == "size" else widths
        cut = int(vals[int(q * (len(vals) - 1))])
        add(f"gt-{col}-{q}", {"match": {"gt": {col: cut}}},
            {f for f, r in by_file.items() if r[idx] > cut})
        add(f"lt-{col}-{q}", {"match": {"lt": {col: cut}}},
            {f for f, r in by_file.items() if r[idx] < cut})
    dirs = sorted({r[4].rsplit("/", 1)[0] + "/" for r in base})
    for d in dirs[:3]:
        add(f"startswith-{d}", {"match": {"startswith": {"path": d}}},
            {f for f, r in by_file.items() if r[4].startswith(d)})

    tag_rows = conn.execute(
        """SELECT tg.name, COUNT(*) FROM tags_items ti
           JOIN tags tg ON tg.id=ti.tag_id GROUP BY tg.name"""
    ).fetchall()
    tags = [t for t, _ in sorted(tag_rows, key=lambda r: -r[1])][:3]
    for t in tags:
        add(f"tag-{t}", {"match_tags": {"tags": [t]}},
            of_items({r[0] for r in conn.execute(
                """SELECT DISTINCT ti.item_id FROM tags_items ti
                   JOIN tags tg ON tg.id=ti.tag_id WHERE tg.name=?""",
                (t,)).fetchall()}))
    if len(tags) >= 2:
        add("tags-any2",
            {"match_tags": {"tags": tags[:2], "match_any": True}},
            of_items({r[0] for r in conn.execute(
                """SELECT DISTINCT ti.item_id FROM tags_items ti
                   JOIN tags tg ON tg.id=ti.tag_id WHERE tg.name IN (?,?)""",
                tuple(tags[:2])).fetchall()}))

    token_row = conn.execute(
        "SELECT text FROM extracted_text LIMIT 1 OFFSET 3").fetchone()
    token = next(w for w in token_row[0].split() if w.startswith("token"))
    add(f"text-{token}", {"match_text": {"match": json.dumps(token)}},
        of_items({r[0] for r in conn.execute(
            """SELECT DISTINCT d.item_id FROM extracted_text t
               JOIN item_data d ON d.id=t.id
               WHERE t.text LIKE '%' || ? || '%'""", (token,)).fetchall()}))

    add("processed-ocr", {"processed_by": "ocr/test"},
        of_items({r[0] for r in conn.execute(
            """SELECT DISTINCT d.item_id FROM item_data d
               JOIN setters s ON s.id=d.setter_id WHERE s.name='ocr/test'"""
        ).fetchall()}))
    add("failed-clip", {"failed_for": "clip/test"},
        of_items({r[0] for r in conn.execute(
            """SELECT item_id FROM extraction_errors
               WHERE setter_name='clip/test' AND error_class='input'"""
        ).fetchall()}))
    add("bookmarks-u1", {"in_bookmarks": {"user": "u1",
                                          "namespaces": ["favs"]}},
        {f for f, r in by_file.items() if r[7] in {
            s for (s,) in conn.execute(
                """SELECT sha256 FROM user_data.bookmarks
                   WHERE user IN ('u1','*') AND namespace='favs'"""
            ).fetchall()}})
    return prims, all_fids


def gen_tree(prims, all_fids, rng, depth):
    """Random (payload, membership) tree."""
    if depth <= 0 or rng.random() < 0.35:
        p = prims[int(rng.integers(len(prims)))]
        return dict(p["frag"]), set(p["members"])
    op = ["and_", "or_", "not_"][int(rng.integers(3))]
    if op == "not_":
        child, members = gen_tree(prims, all_fids, rng, depth - 1)
        return {"not_": child}, all_fids - members
    n = int(rng.integers(2, 4))
    children, sets = [], []
    for _ in range(n):
        c, m = gen_tree(prims, all_fids, rng, depth - 1)
        children.append(c)
        sets.append(m)
    if op == "and_":
        members = set.intersection(*sets)
    else:
        members = set.union(*sets)
    return {op: children}, members


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--trees", type=int, default=200)
    parser.add_argument("--order-trees", type=int, default=60)
    parser.add_argument("--sem-trees", type=int, default=40)
    parser.add_argument("--rrf-trees", type=int, default=24)
    parser.add_argument("--conc-rounds", type=int, default=12)
    parser.add_argument("--builder-trees", type=int, default=80)
    parser.add_argument("--items", type=int, default=300)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from panoptikon_tpu.pql import model as pql
    from panoptikon_tpu.pql.executor import Executor

    rng = np.random.default_rng(args.seed)
    with tempfile.TemporaryDirectory() as tmp:
        db, writer, index, rows, spaces, board_id = diff.seed_db(
            tmp, args.items, rng)
        ex = Executor(db, index, manager=None)
        conn = db.reader()
        prims, all_fids = build_primitives(db, conn, rng)

        failures, checked = [], 0
        for i in range(args.trees):
            tree, want = gen_tree(prims, all_fids, rng, depth=3)
            payload = {"query": tree, "page_size": 10_000,
                       "check_path": False}
            res = ex.execute(
                pql.PqlQuery.from_json(json.loads(json.dumps(payload))))
            got = {r["file_id"] for r in res.results}
            checked += 1
            if got != want or res.count != len(want):
                failures.append({
                    "tree_index": i,
                    "tree": tree,
                    "got_n": len(got), "want_n": len(want),
                    "count": res.count,
                    "missing": sorted(want - got)[:5],
                    "extra": sorted(got - want)[:5],
                })
                if len(failures) >= 5:
                    break
        # ---- phase 2: ordering / paging self-consistency ----------------
        orders = [("size", "asc"), ("size", "desc"), ("width", "asc"),
                  ("last_modified", "desc"), ("random", None)]
        order_checked = 0
        for i in range(args.order_trees):
            tree, want = gen_tree(prims, all_fids, rng, depth=2)
            col, direction = orders[int(rng.integers(len(orders)))]
            ob = {"order_by": col}
            if direction:
                ob["order"] = direction
            base_payload = {"query": tree, "order_by": [ob],
                            "check_path": False}
            if col == "random":
                # The seed is a TOP-LEVEL query field (model.rs:304-420) —
                # a stable explicit seed is what makes random paging
                # consistent across page fetches.
                base_payload["seed"] = int(rng.integers(1, 2**40))
            res_full = ex.execute(pql.PqlQuery.from_json(json.loads(
                json.dumps({**base_payload, "page_size": 10_000}))))
            full = [r["file_id"] for r in res_full.results]
            order_checked += 1
            if set(full) != want or res_full.count != len(want):
                failures.append({"phase": "order", "tree_index": i,
                                 "problem": "membership", "tree": tree})
                continue
            psize = int(rng.integers(5, 24))
            for page in (1, 2, 3):
                res_p = ex.execute(pql.PqlQuery.from_json(json.loads(
                    json.dumps({**base_payload, "page": page,
                                "page_size": psize}))))
                got = [r["file_id"] for r in res_p.results]
                lo = (page - 1) * psize
                if got != full[lo:lo + psize] or res_p.count != len(full):
                    failures.append({
                        "phase": "order", "tree_index": i, "page": page,
                        "order": ob, "page_size": psize,
                        "got": got[:8], "want": full[lo:lo + 8],
                    })
                    break
            if col == "random":
                res_again = ex.execute(pql.PqlQuery.from_json(json.loads(
                    json.dumps({**base_payload, "page_size": 10_000}))))
                if [r["file_id"] for r in res_again.results] != full:
                    failures.append({"phase": "order", "tree_index": i,
                                     "problem": "seeded-random unstable"})
            if len(failures) >= 5:
                break

        # ---- phase 3: semantic x meta composition -----------------------
        import base64 as _b64

        from panoptikon_tpu.utils import npy as _npy

        def b64vec(v):
            return _b64.standard_b64encode(
                _npy.serialize_npy(np.asarray(v, np.float32))).decode()

        meta_rows = conn.execute(
            """SELECT f.id, f.item_id, f.last_modified
               FROM files f WHERE f.available=1"""
        ).fetchall()
        lm_of = {r[0]: r[2] for r in meta_rows}
        files_of_item: dict[int, list[int]] = {}
        for fid, item, _ in meta_rows:
            files_of_item.setdefault(item, []).append(fid)

        def tiebreak(f):
            return (diff._desc_str(lm_of[f]), f)

        def ranked(values, members):
            sel = {}
            for item, v in values.items():
                for fid in files_of_item.get(item, ()):
                    if fid in members:
                        sel[fid] = v
            return sorted(sel, key=lambda f: (sel[f],) + tiebreak(f))

        sem_specs = [
            ("clip/test", "image_embeddings", spaces["clip/test"]),
            ("st/test", "text_embeddings", spaces["st/test"]),
        ]
        sem_checked = 0
        for i in range(args.sem_trees):
            meta_tree, meta_members = gen_tree(prims, all_fids, rng, depth=2)
            model_name, field, oracle_space = sem_specs[int(rng.integers(2))]
            agg = ["MIN", "AVG", "MAX"][int(rng.integers(3))]
            arm = ["exact", "quant"][int(rng.integers(2))]
            qv = oracle_space.vecs[int(rng.integers(len(oracle_space.vecs)))]
            payload = {"query": {"and_": [
                meta_tree,
                {field: {"query": b64vec(qv), "model": model_name,
                         "embed": None, "index": arm,
                         "distance_aggregation": agg}},
            ]}, "page_size": 10_000, "check_path": False}
            res = ex.execute(
                pql.PqlQuery.from_json(json.loads(json.dumps(payload))))
            got = [r["file_id"] for r in res.results]
            values = {it: v for it, (v, _) in oracle_space.scores(
                qv, distance="cosine", agg=agg.lower(),
                use_quant=(arm == "quant")).items()}
            want = ranked(values, meta_members)
            sem_checked += 1
            if sorted(got) != sorted(want) or got[:50] != want[:50]:
                failures.append({
                    "phase": "semantic", "tree_index": i,
                    "space": model_name, "agg": agg, "arm": arm,
                    "got_n": len(got), "want_n": len(want),
                    "got_head": got[:6], "want_head": want[:6],
                })
                if len(failures) >= 5:
                    break

        # ---- phase 4: RRF fusion --------------------------------------
        rrf_checked = 0
        for i in range(args.rrf_trees):
            arm = ["exact", "quant"][int(rng.integers(2))]
            picks = []
            pick_meta = []
            for _ in range(2):
                model_name, field, osp = sem_specs[int(rng.integers(2))]
                qidx = int(rng.integers(len(osp.vecs)))
                qv = osp.vecs[qidx]
                w = float(rng.choice([0.3, 0.5, 1.0, 2.0]))
                kf = int(rng.choice([20, 60, 100]))
                picks.append((model_name, field, osp, qv, w, kf))
                pick_meta.append({"model": model_name, "qidx": qidx,
                                  "w": w, "k": kf})
            payload = {"query": {"and_": [
                {f: {"query": b64vec(q), "model": m, "embed": None,
                     "index": arm},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": kf, "weight": w}}
                for m, f, _osp, q, w, kf in picks
            ]}, "page_size": 10_000, "check_path": False}
            res = ex.execute(
                pql.PqlQuery.from_json(json.loads(json.dumps(payload))))
            got = [r["file_id"] for r in res.results]

            # Sequential row_n scoping (reference CTE-chain parity,
            # docs/pql.md): filter i ranks over the running intersection
            # of filters 1..i.
            ordered_lists = []
            for m, f, osp, q, w, kf in picks:
                vals = {it: v for it, (v, _) in osp.scores(
                    q, distance="cosine", agg="min",
                    use_quant=(arm == "quant")).items()}
                ordered_lists.append(ranked(vals, all_fids))
            running = set(all_fids)
            parts = []
            for (m, f, osp, q, w, kf), ordered in zip(picks, ordered_lists):
                running &= set(ordered)
                ranks = {fid: r + 1 for r, fid in enumerate(
                    [fid for fid in ordered if fid in running])}
                parts.append((ranks, w, kf))
            members = running
            totals = {fid: sum(w / (kf + p[fid]) for p, w, kf in parts)
                      for fid in members}
            want = sorted(members,
                          key=lambda fid: (-totals[fid],) + tiebreak(fid))
            rrf_checked += 1
            # Exact rational total TIES happen (e.g. 1/(20+8)+0.5/(20+22)
            # == 1/(20+22)+0.5/(20+1) == 1/21); order within a tied group
            # is float-ulp-determined in the engine, so compare the TOTAL
            # sequence everywhere and the file identity only where the
            # total is unique.
            def tw(fid):
                return totals[fid]

            order_ok = (len(got) == len(want)) and all(
                abs(tw(g) - tw(w)) <= 1e-9 * max(abs(tw(w)), 1e-30)
                for g, w in zip(got, want)
            ) and all(
                g == w
                for j, (g, w) in enumerate(zip(got[:50], want[:50]))
                if (j == 0 or abs(tw(want[j]) - tw(want[j - 1])) > 1e-9)
                and (j + 1 >= len(want)
                     or abs(tw(want[j]) - tw(want[j + 1])) > 1e-9)
            )
            if sorted(got) != sorted(want) or not order_ok:
                failures.append({
                    "phase": "rrf", "tree_index": i, "arm": arm,
                    "picks": pick_meta,
                    "spaces": [p[0] for p in picks],
                    "got_n": len(got), "want_n": len(want),
                    "got_head": got[:6], "want_head": want[:6],
                })
                if len(failures) >= 5:
                    break

        # ---- phase 5: concurrent-coalescing equivalence -----------------
        # The serving coalescer batches co-arriving single-space scans and
        # composed RRF rank joins into one device program; every batched
        # row must be bit-identical to its solo run. Fuzz it with mixed
        # random shapes executed under real thread concurrency.
        import threading as _threading
        from concurrent.futures import ThreadPoolExecutor as _TPE

        def _res_key(res):
            return (res.count, tuple(r["file_id"] for r in res.results))

        conc_checked = 0
        for round_i in range(args.conc_rounds):
            batch = []
            for _ in range(8):
                shape = int(rng.integers(3))
                model_name, field, osp = sem_specs[int(rng.integers(2))]
                qv = osp.vecs[int(rng.integers(len(osp.vecs)))]
                if shape == 0:  # single-space page
                    batch.append({"query": {field: {
                        "query": b64vec(qv), "model": model_name,
                        "embed": None, "index": "quant"}},
                        "page_size": int(rng.integers(5, 30)),
                        "page": int(rng.integers(1, 3)),
                        "check_path": False})
                elif shape == 1:  # composed 2-space RRF, varied params
                    m2, f2, osp2 = sem_specs[int(rng.integers(2))]
                    q2 = osp2.vecs[int(rng.integers(len(osp2.vecs)))]
                    batch.append({"query": {"and_": [
                        {field: {"query": b64vec(qv), "model": model_name,
                                 "embed": None, "index": "quant"},
                         "row_n": True, "priority": 5, "select_as": "a",
                         "rrf": {"k": int(rng.choice([20, 60, 100])),
                                 "weight": float(rng.choice([0.3, 1.0, 2.0]))}},
                        {f2: {"query": b64vec(q2), "model": m2,
                              "embed": None, "index": "quant"},
                         "row_n": True, "priority": 5, "select_as": "b",
                         "rrf": {"k": int(rng.choice([20, 60])),
                                 "weight": float(rng.choice([0.5, 1.0]))}},
                    ]}, "page_size": int(rng.integers(5, 30)),
                        "check_path": False})
                else:  # semantic x meta (coalesce-ineligible scope mix)
                    tree, _ = gen_tree(prims, all_fids, rng, depth=1)
                    batch.append({"query": {"and_": [
                        tree,
                        {field: {"query": b64vec(qv), "model": model_name,
                                 "embed": None, "index": "quant"}},
                    ]}, "page_size": 20, "check_path": False})
            qs = [pql.PqlQuery.from_json(json.loads(json.dumps(p)))
                  for p in batch]
            ex.enable_coalesce = False
            solo = [_res_key(ex.execute(q)) for q in qs]
            ex.enable_coalesce = True
            barrier = _threading.Barrier(len(qs))

            def _worker(q):
                barrier.wait()
                return _res_key(ex.execute(q))

            with _TPE(max_workers=len(qs)) as pool:
                conc = list(pool.map(_worker, qs))
            conc_checked += 1
            if conc != solo:
                bad = [j for j, (a, b) in enumerate(zip(conc, solo))
                       if a != b]
                failures.append({
                    "phase": "concurrent", "round": round_i,
                    "mismatched_queries": bad,
                    "payloads": [batch[j] for j in bad[:2]],
                })
                if len(failures) >= 5:
                    break

        # ---- phase 6: typed-builder equivalence -------------------------
        # Rebuild random operator trees through pql.build's combinators
        # (& | ~ flatten adjacent same-operator nodes) and assert the
        # rebuilt query reaches the SAME result set as the plain dict —
        # pins the builder's claim that flattening preserves semantics.
        from panoptikon_tpu.pql import build as Qb

        def q_rebuild(tree):
            if "and_" in tree:
                subs = [q_rebuild(t) for t in tree["and_"]]
                out = subs[0]
                for s in subs[1:]:
                    out = out & s
                return out
            if "or_" in tree:
                subs = [q_rebuild(t) for t in tree["or_"]]
                out = subs[0]
                for s in subs[1:]:
                    out = out | s
                return out
            if "not_" in tree:
                return ~q_rebuild(tree["not_"])
            return Qb.Filter(tree)

        builder_checked = 0
        for i in range(args.builder_trees):
            tree, want = gen_tree(prims, all_fids, rng, depth=3)
            built = q_rebuild(tree)
            res = ex.execute(pql.PqlQuery.from_json(json.loads(json.dumps(
                {"query": built, "page_size": 10_000,
                 "check_path": False}))))
            got = {r["file_id"] for r in res.results}
            builder_checked += 1
            if got != want or res.count != len(want):
                failures.append({
                    "phase": "builder", "tree_index": i, "tree": tree,
                    "built": built, "got_n": len(got),
                    "want_n": len(want),
                })
                if len(failures) >= 5:
                    break

        print(json.dumps({
            "trees_checked": checked,
            "builder_trees_checked": builder_checked,
            "conc_rounds_checked": conc_checked,
            "rrf_trees_checked": rrf_checked,
            "sem_trees_checked": sem_checked,
            "order_trees_checked": order_checked,
            "primitives": len(prims),
            "device_count": __import__("jax").device_count(),
            "failures": failures,
        }, indent=1))
        return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
