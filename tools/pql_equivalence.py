#!/usr/bin/env python
"""PQL differential suite: the executor vs an independent oracle.

The reference validates its Rust PQL engine against the legacy Python
implementation over one DB snapshot (tools/pql-equivalence/README.md:1-60):
shapes are discovery-parameterized from the corpus, and both engines must
agree on membership and order. This suite plays the same role for the TPU
engine: a randomized corpus is seeded into a real database + device index,
a battery of PQL shapes runs through the executor, and an INDEPENDENT
brute-force oracle — straight SQL + NumPy, sharing no code with the
executor's filter implementations — recomputes membership and ordering.
Semantic queries use deterministic pseudo-embeddings injected on both
sides, so no inference runs.

The quant arm is differentially validated, not just overlap-measured
(reference invariant: docs/vector-int8-quant.md:53-70 — identical
membership and deterministic order on the code axis): every semantic shape
runs in ``index: "exact"`` AND ``index: "quant"`` variants, and the oracle
recomputes int8-code distances with the frozen scale via an inline
quantizer (cross-checking ops/codec on the way). Membership equality
between the engine's exact and quant arms is asserted per shape.

Usage: python tools/pql_equivalence.py [--items 300] [--seed 0]
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

F32 = np.float32


# ---------------------------------------------------------------------------
# Independent quant + distance oracle (inline reimplementation — validates
# ops/codec and ops/scoring from the outside).
# ---------------------------------------------------------------------------


def oracle_quantize(vecs: np.ndarray, scale: float) -> np.ndarray:
    """clamp(rint(x/s), -128, 127), NaN→0 — written here independently of
    ops.codec (vector_quants.rs:1489 contract)."""
    c = np.rint(np.asarray(vecs, F32) / F32(scale))
    c = np.where(np.isnan(c), 0.0, np.clip(c, -128.0, 127.0))
    return c.astype(np.int64)


def oracle_epilogue(dots, xx, qq, distance: str, scale: float) -> np.ndarray:
    """Distance epilogue mirrored in strict f32 step order (scoring.py
    `_distance_epilogue`) so quant-arm values are bit-comparable."""
    dots = np.asarray(dots, F32)
    xx = np.asarray(xx, F32)[None, :]
    qq = np.asarray(qq, F32)[:, None]
    if distance == "cosine":
        denom = np.sqrt(np.maximum(xx * qq, F32(1e-30)))
        return (F32(1.0) - dots / denom).astype(F32)
    sq = np.maximum(qq - F32(2.0) * dots + xx, F32(0.0))
    return (F32(scale) * np.sqrt(sq)).astype(F32)


class SpaceOracle:
    """One embedding space's rows as the oracle sees them."""

    def __init__(self, item_ids, data_ids, vecs, scale, src_text_meta):
        self.item_ids = np.asarray(item_ids, np.int64)
        self.data_ids = np.asarray(data_ids, np.int64)
        self.vecs = np.asarray(vecs, F32)
        self.scale = scale  # None = no quant arm
        # data_id → (source setter, language, confidence, lang_conf) of the
        # SOURCE text row; absent for origin rows.
        self.src = src_text_meta

    def row_allowed(self, src_args) -> np.ndarray:
        if not src_args:
            return np.ones(len(self.vecs), bool)
        setters = src_args.get("setters") or []
        langs = src_args.get("languages")
        minc = src_args.get("min_confidence")
        minlc = src_args.get("min_language_confidence")
        if not (setters or langs or minc is not None or minlc is not None):
            return np.ones(len(self.vecs), bool)
        out = np.zeros(len(self.vecs), bool)
        for j, did in enumerate(self.data_ids.tolist()):
            meta = self.src.get(did)
            if meta is None:
                continue
            setter, lang, conf, lconf = meta
            if setters and setter not in setters:
                continue
            if langs and lang not in langs:
                continue
            if minc is not None and (conf is None or conf < minc):
                continue
            if minlc is not None and (lconf is None or lconf < minlc):
                continue
            out[j] = True
        return out

    def row_weights(self, src_args) -> np.ndarray:
        w = np.ones(len(self.vecs))
        if not src_args:
            return w
        cw = float(src_args.get("confidence_weight") or 0.0)
        lcw = float(src_args.get("language_confidence_weight") or 0.0)
        if cw == 0.0 and lcw == 0.0:
            return w
        for j, did in enumerate(self.data_ids.tolist()):
            meta = self.src.get(did)
            if meta is None:
                continue
            _, _, conf, lconf = meta
            v = 1.0
            if cw and conf is not None:
                v *= max(conf, 1e-6) ** cw
            if lcw and lconf is not None:
                v *= max(lconf, 1e-6) ** lcw
            w[j] = v
        return w

    def scores(self, queries, *, distance, agg, use_quant, src_args=None):
        """Per-item (value, count) after per-anchor aggregation and
        cross-anchor combination — mirrors executor._space_scores."""
        queries = np.atleast_2d(np.asarray(queries, F32))
        if use_quant:
            assert self.scale is not None
            qc = oracle_quantize(queries, self.scale)
            cc = oracle_quantize(self.vecs, self.scale)
            dots = qc @ cc.T
            xx = (cc * cc).sum(1)
            qq = (qc * qc).sum(1)
            dist = oracle_epilogue(dots, xx, qq, distance, self.scale)
        else:
            qf = queries.astype(F32)
            cf = self.vecs.astype(F32)
            dots = qf @ cf.T
            xx = (cf * cf).sum(1, dtype=F32)
            qq = (qf * qf).sum(1, dtype=F32)
            dist = oracle_epilogue(dots, xx, qq, distance, 1.0)
        allowed = self.row_allowed(src_args)
        weighted = bool(
            src_args
            and (src_args.get("confidence_weight") or src_args.get("language_confidence_weight"))
        )
        weights = self.row_weights(src_args)
        nq = dist.shape[0]
        per_item: dict[int, list] = {}
        for item in np.unique(self.item_ids[allowed]).tolist():
            rows = np.flatnonzero((self.item_ids == item) & allowed)
            vals, cnts = [], []
            for qi in range(nq):
                d = dist[qi, rows].astype(F32)
                if weighted:
                    wv = weights[rows]
                    vals.append(float((d.astype(np.float64) * wv).sum() / wv.sum()))
                    cnts.append(float(wv.sum()))
                elif agg == "min":
                    vals.append(float(d.min()))
                    cnts.append(float(len(rows)))
                elif agg == "max":
                    vals.append(float(d.max()))
                    cnts.append(float(len(rows)))
                else:  # avg
                    vals.append(float(np.sum(d, dtype=F32) / F32(len(rows))))
                    cnts.append(float(len(rows)))
            # Cross-anchor combine (executor._space_scores multi-query).
            if nq == 1:
                per_item[item] = (vals[0], cnts[0])
            else:
                total = sum(cnts)
                if weighted or agg == "avg":
                    per_item[item] = (
                        sum(v * c for v, c in zip(vals, cnts)) / max(total, 1e-30),
                        total,
                    )
                elif agg == "max":
                    per_item[item] = (max(vals), total)
                else:
                    per_item[item] = (min(vals), total)
        return per_item


def combine_spaces(space_parts: list[dict], agg: str) -> dict[int, float]:
    """Mirror executor._apply_item_scores cross-space aggregation."""
    out: dict[int, list] = {}
    for part in space_parts:
        for item, (v, c) in part.items():
            out.setdefault(item, []).append((v, c))
    combined = {}
    for item, parts in out.items():
        if len(parts) == 1:
            combined[item] = parts[0][0]
        elif agg == "max":
            combined[item] = max(v for v, _ in parts)
        elif agg == "min":
            combined[item] = min(v for v, _ in parts)
        else:
            total = sum(c for _, c in parts)
            combined[item] = sum(v * c for v, c in parts) / max(total, 1e-30)
    return combined


# ---------------------------------------------------------------------------
# Corpus seeding (discovery-parameterized: shapes below pull their filter
# values out of what was actually seeded).
# ---------------------------------------------------------------------------


def seed_db(root, n_items, rng):
    from panoptikon_tpu.db import store
    from panoptikon_tpu.db.connection import Database
    from panoptikon_tpu.db.writer import IndexWriter
    from panoptikon_tpu.index.vector_index import VectorIndex

    db = Database(root, "diff")
    writer = IndexWriter(db)
    index = VectorIndex(chunk_rows=64)
    dim = 32
    clip_vecs = rng.normal(size=(n_items, dim)).astype(np.float32)
    clip_vecs /= np.linalg.norm(clip_vecs, axis=1, keepdims=True)
    mimes = ["image/png", "image/jpeg", "video/mp4", "application/pdf"]
    langs = ["en", "de", "ja"]
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    tags = ["cat", "dog", "tree", "car", "sky"]

    corpus = {
        "clip": {"items": [], "dids": [], "vecs": []},
        "tclip": {"items": [], "dids": [], "vecs": [], "src": {}},
        "st": {"items": [], "dids": [], "vecs": [], "src": {}},
    }

    def unit(conn):
        sid_clip = store.upsert_setter(conn, "clip/test")
        sid_ocr = store.upsert_setter(conn, "ocr/test")
        sid_tag = store.upsert_setter(conn, "tags/test")
        sid_st = store.upsert_setter(conn, "st/test")
        sid_tclip = store.upsert_setter(conn, "tclip/test")
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
            store.insert_embedding(conn, did, clip_vecs[i])
            corpus["clip"]["items"].append(item)
            corpus["clip"]["dids"].append(did)
            corpus["clip"]["vecs"].append(clip_vecs[i])
            text_rows = []
            if i % 2 == 0:
                # 1-2 text chunks per item (multi-row aggregation surface).
                n_chunks = 1 + (i % 4 == 0)
                for ci in range(n_chunks):
                    tdid = store.insert_item_data(
                        conn, item, sid_ocr, "text", idx=ci
                    )
                    text = " ".join(
                        rng.choice(words, size=rng.integers(3, 8)).tolist()
                    ) + f" token{i:04d}c{ci}"
                    lang = langs[rng.integers(len(langs))]
                    conf = float(rng.uniform(0.3, 1.0))
                    lconf = float(rng.uniform(0.5, 1.0))
                    store.insert_extracted_text(
                        conn, tdid, text, language=lang,
                        confidence=conf, language_confidence=lconf,
                    )
                    text_rows.append((tdid, lang, conf, lconf))
            if i % 4 == 0 and text_rows:
                # Text-derived embeddings: st (sentence-transformer-like)
                # and tclip (xmodal sibling of clip/test) — one row per
                # chunk, source_id = the text row.
                for ci, (tdid, lang, conf, lconf) in enumerate(text_rows):
                    v = rng.normal(size=dim).astype(np.float32)
                    v /= np.linalg.norm(v)
                    sdid = store.insert_item_data(
                        conn, item, sid_st, "text-embedding",
                        idx=ci, source_id=tdid,
                    )
                    store.insert_embedding(conn, sdid, v)
                    corpus["st"]["items"].append(item)
                    corpus["st"]["dids"].append(sdid)
                    corpus["st"]["vecs"].append(v)
                    corpus["st"]["src"][sdid] = ("ocr/test", lang, conf, lconf)
                    tv = 0.7 * clip_vecs[i] + 0.3 * v
                    tv /= np.linalg.norm(tv)
                    xdid = store.insert_item_data(
                        conn, item, sid_tclip, "clip",
                        idx=ci, source_id=tdid,
                    )
                    store.insert_embedding(conn, xdid, tv)
                    corpus["tclip"]["items"].append(item)
                    corpus["tclip"]["dids"].append(xdid)
                    corpus["tclip"]["vecs"].append(tv)
                    corpus["tclip"]["src"][xdid] = ("ocr/test", lang, conf, lconf)
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
    # user_data: bookmarks (two namespaces) + one pinboard.
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
            for i in range(0, n_items, 9):
                uconn.execute(
                    """INSERT INTO bookmarks
                       (user, namespace, sha256, time_added, metadata)
                       VALUES ('*', 'favs.sub', ?, ?, NULL)""",
                    (rows[i][1], f"2026-01-02T00:00:{i % 60:02d}"),
                )
            cur = uconn.execute(
                """INSERT INTO pinboards (user, name, time_added, time_updated)
                   VALUES ('u1', 'board', '2026-01-01', '2026-01-01')
                   RETURNING id"""
            )
            board_id = int(cur.fetchone()[0])
            cur = uconn.execute(
                """INSERT INTO pinboard_versions (pinboard_id, layout, time_added)
                   VALUES (?, '{}', '2026-01-01') RETURNING id""",
                (board_id,),
            )
            ver_id = int(cur.fetchone()[0])
            for i in range(0, n_items, 11):
                uconn.execute(
                    "INSERT INTO pinboard_version_items (version_id, sha256) VALUES (?,?)",
                    (ver_id, rows[i][1]),
                )
            uconn.execute(
                "UPDATE pinboards SET head_version_id=? WHERE id=?",
                (ver_id, board_id),
            )
    finally:
        uconn.close()

    spaces = {}
    for space, key in (("clip/test", "clip"), ("st/test", "st"), ("tclip/test", "tclip")):
        c = corpus[key]
        if not c["items"]:
            continue
        vecs = np.stack(c["vecs"])
        index.add(space, np.array(c["items"]), np.array(c["dids"]), vecs)
        scale = index.build_quant(space)
        spaces[space] = SpaceOracle(
            c["items"], c["dids"], vecs, scale, c.get("src", {})
        )
    return db, writer, index, rows, spaces, board_id


def b64(vec):
    from panoptikon_tpu.utils import npy

    return base64.standard_b64encode(npy.serialize_npy(np.asarray(vec, np.float32))).decode()


# ---------------------------------------------------------------------------
# Shape battery
# ---------------------------------------------------------------------------


def build_shapes(db, rows, spaces, board_id, rng):
    """Returns a list of dicts:
    {name, payload, oracle() -> ordered file_id list (or (file,data) pairs)
     or set for membership-only, mode: 'order'|'member', extra_check}.
    Values are discovered from the corpus (reference README pattern)."""
    conn = db.reader()
    base = conn.execute(
        """SELECT f.id, f.item_id, i.type, i.size, f.path, i.width, i.height,
                  f.last_modified, f.filename, i.sha256
           FROM files f JOIN items i ON i.id=f.item_id
           WHERE f.available=1 ORDER BY f.id"""
    ).fetchall()
    by_file = {r[0]: r for r in base}
    file_of_item: dict[int, list[int]] = {}
    for r in base:
        file_of_item.setdefault(r[1], []).append(r[0])
    all_fids = set(by_file)

    # Discovery: values pulled from the seeded corpus.
    sizes = sorted(r[3] for r in base)
    median_size = sizes[len(sizes) // 2]
    some_dir = by_file[base[len(base) // 3][0]][4].rsplit("/", 1)[0] + "/"
    token_row = conn.execute(
        "SELECT text FROM extracted_text LIMIT 1 OFFSET 5"
    ).fetchone()
    some_token = [w for w in token_row[0].split() if w.startswith("token")][0]
    tag_row = conn.execute(
        """SELECT tg.name, COUNT(*) c FROM tags_items ti
           JOIN tags tg ON tg.id=ti.tag_id GROUP BY tg.name
           ORDER BY c DESC LIMIT 2"""
    ).fetchall()
    tag_a, tag_b = tag_row[0][0], tag_row[1][0]
    clip = spaces["clip/test"]
    st = spaces["st/test"]
    anchor_item = int(st.item_ids[0])  # item with clip + st + tclip rows
    anchor_sha = by_file[file_of_item[anchor_item][0]][9]
    qv = clip.vecs[7]
    qv2 = clip.vecs[19]
    qst = st.vecs[3]

    def members_of_items(items):
        out = set()
        for it in items:
            out.update(file_of_item.get(it, ()))
        return out

    def tiebreak(f):
        # The engine always appends the top-level order args (default:
        # last_modified DESC) after filter ranks, then file_id ASC
        # (builder.rs:1097-1145 combine_order_lists + final tiebreak).
        return (_desc_str(by_file[f][7]), f)

    def ranked(values: dict[int, float], members=None, desc=False, gt=None, lt=None):
        """items → per-file ordered list by (value, last_modified desc, fid)."""
        sel = {}
        for item, v in values.items():
            for fid in file_of_item.get(item, ()):
                if members is not None and fid not in members:
                    continue
                if gt is not None and not (v > gt):
                    continue
                if lt is not None and not (v < lt):
                    continue
                sel[fid] = v
        return sorted(sel, key=lambda f: ((-sel[f] if desc else sel[f]),) + tiebreak(f))

    shapes = []

    def add(name, payload, oracle, mode="member", extra_check=None,
            count_override=None, skip_arm_pair=False):
        shapes.append(
            {"name": name, "payload": payload, "oracle": oracle,
             "mode": mode, "extra_check": extra_check,
             "count_override": count_override, "skip_arm_pair": skip_arm_pair}
        )

    # -- metadata shapes ----------------------------------------------------
    add("all", {"page_size": 10_000}, lambda: all_fids)
    add("eq-type", {"query": {"match": {"eq": {"type": "image/png"}}},
                    "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][2] == "image/png"})
    add("gt-size", {"query": {"match": {"gt": {"size": median_size}}},
                    "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][3] > median_size})
    add("neq", {"query": {"match": {"neq": {"type": "video/mp4"}}},
                "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][2] != "video/mp4"})
    add("in", {"query": {"match": {"in_": {"type": ["image/png", "image/jpeg"]}}},
               "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][2] in ("image/png", "image/jpeg")})
    add("nin", {"query": {"match": {"nin": {"type": ["image/png"]}}},
                "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][2] != "image/png"})
    add("startswith", {"query": {"match": {"startswith": {"path": some_dir}}},
                       "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][4].startswith(some_dir)})
    add("not-eq", {"query": {"not_": {"match": {"eq": {"type": "image/png"}}}},
                   "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][2] != "image/png"})
    add("or-eq", {"query": {"or_": [
            {"match": {"eq": {"type": "image/png"}}},
            {"match": {"eq": {"type": "video/mp4"}}}]},
        "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][2] in ("image/png", "video/mp4")})
    add("and-range", {"query": {"and_": [
            {"match": {"gt": {"size": median_size}}},
            {"match": {"lt": {"width": 2000}}}]},
        "page_size": 10_000},
        lambda: {f for f in all_fids
                 if by_file[f][3] > median_size and by_file[f][5] < 2000})

    # -- order_by shapes ------------------------------------------------------
    add("order-size", {"page_size": 10_000, "order_by": [{"order_by": "size"}]},
        lambda: sorted(all_fids, key=lambda f: (by_file[f][3], f)), mode="order")
    add("order-width-desc",
        {"page_size": 10_000, "order_by": [{"order_by": "width", "order": "desc"}]},
        lambda: sorted(all_fids, key=lambda f: (-by_file[f][5], f)), mode="order")
    add("order-last-modified-default-desc",
        {"page_size": 10_000, "order_by": [{"order_by": "last_modified"}]},
        lambda: sorted(all_fids, key=lambda f: (_desc_str(by_file[f][7]), f)),
        mode="order")
    add("order-random", {"page_size": 10_000,
                         "order_by": [{"order_by": "random"}], "seed": 424242},
        lambda: _random_order(all_fids, 424242), mode="order")
    add("paging-page3",
        {"page_size": 7, "page": 3, "order_by": [{"order_by": "size"}]},
        lambda: sorted(all_fids, key=lambda f: (by_file[f][3], f))[14:21],
        mode="order", count_override=len(all_fids))
    add("partition-by-item",
        {"page_size": 10_000, "partition_by": ["item_id"],
         "order_by": [{"order_by": "size"}]},
        lambda: _partition_first(
            sorted(all_fids, key=lambda f: (by_file[f][3], f)),
            lambda f: by_file[f][1]),
        mode="order")

    # -- FTS shapes -----------------------------------------------------------
    add("match-path", {"query": {"match_path": {"match": f'"{some_dir}"'}},
                       "page_size": 10_000},
        lambda: {f for f in all_fids if some_dir in by_file[f][4]})
    add("match-path-filename",
        {"query": {"match_path": {"match": '"f0001"', "filename_only": True}},
         "page_size": 10_000},
        lambda: {f for f in all_fids if "f0001" in by_file[f][8]})
    add("match-text", {"query": {"match_text": {"match": f'"{some_token}"'}},
                       "page_size": 10_000},
        lambda: members_of_items(_text_items(conn, some_token)))
    add("match-text-lang",
        {"query": {"match_text": {"match": '"token"', "languages": ["en"],
                                  "min_confidence": 0.5}},
         "page_size": 10_000},
        lambda: members_of_items({
            r[0] for r in conn.execute(
                """SELECT d.item_id FROM extracted_text t
                   JOIN item_data d ON d.id=t.id
                   WHERE t.text LIKE '%token%' AND t.language='en'
                     AND t.confidence >= 0.5""").fetchall()}))
    add("match-text-snippet",
        {"query": {"match_text": {"match": f'"{some_token}"',
                                  "select_snippet_as": "snip"}},
         "page_size": 10_000},
        lambda: members_of_items(_text_items(conn, some_token)),
        extra_check=lambda res: all(
            "<b>" in (r.get("extra", {}).get("snip") or "")
            for r in res.results
        ) or "missing snippet markup")

    # -- tags / ledgers / provenance -------------------------------------------
    add("tags-one", {"query": {"match_tags": {"tags": [tag_a]}},
                     "page_size": 10_000},
        lambda: members_of_items(_tag_items(conn, [tag_a], any_=False)))
    add("tags-any", {"query": {"match_tags": {"tags": [tag_a, tag_b],
                                              "match_any": True}},
                     "page_size": 10_000},
        lambda: members_of_items(_tag_items(conn, [tag_a, tag_b], any_=True)))
    add("tags-all", {"query": {"match_tags": {"tags": [tag_a, tag_b]}},
                     "page_size": 10_000},
        lambda: members_of_items(_tag_items(conn, [tag_a, tag_b], any_=False)))
    add("processed-by", {"query": {"processed_by": "ocr/test"}, "page_size": 10_000},
        lambda: members_of_items({r[0] for r in conn.execute(
            """SELECT DISTINCT d.item_id FROM item_data d
               JOIN setters s ON s.id=d.setter_id WHERE s.name='ocr/test'"""
        ).fetchall()}))
    add("failed-for", {"query": {"failed_for": "clip/test"}, "page_size": 10_000},
        lambda: members_of_items({r[0] for r in conn.execute(
            """SELECT item_id FROM extraction_errors
               WHERE setter_name='clip/test' AND error_class='input'"""
        ).fetchall()}))
    add("has-unprocessed",
        {"query": {"has_data_unprocessed": {"setter_name": "st/test",
                                            "data_types": ["text"]}},
         "page_size": 10_000},
        lambda: members_of_items({r[0] for r in conn.execute(
            """SELECT DISTINCT src.item_id FROM item_data src
               WHERE src.data_type='text'
                 AND (src.is_placeholder IS NULL OR src.is_placeholder=0)
                 AND NOT EXISTS (
                   SELECT 1 FROM item_data d JOIN setters s ON s.id=d.setter_id
                   WHERE d.source_id=src.id AND s.name='st/test')"""
        ).fetchall()}))

    # -- user_data shapes -------------------------------------------------------
    def bookmark_members(users, namespaces, sub_ns):
        uc = db.user_data_connection() if hasattr(db, "user_data_connection") else None
        q = "SELECT sha256 FROM user_data.bookmarks WHERE user IN (%s)" % (
            ",".join("?" * len(users))
        )
        params = list(users)
        if namespaces:
            conds = []
            for ns in namespaces:
                if sub_ns:
                    conds.append("(namespace = ? OR namespace LIKE ?)")
                    params.extend([ns, ns + ".%"])
                else:
                    conds.append("namespace = ?")
                    params.append(ns)
            q += " AND (" + " OR ".join(conds) + ")"
        shas = {r[0] for r in conn.execute(q, params).fetchall()}
        return {f for f in all_fids if by_file[f][9] in shas}

    add("bookmarks", {"query": {"in_bookmarks": {"user": "u1",
                                                 "namespaces": ["favs"]}},
                      "page_size": 10_000},
        lambda: bookmark_members(["u1", "*"], ["favs"], False))
    add("bookmarks-subns",
        {"query": {"in_bookmarks": {"user": "u1", "namespaces": ["favs"],
                                    "sub_ns": True}},
         "page_size": 10_000},
        lambda: bookmark_members(["u1", "*"], ["favs"], True))
    add("pinboard", {"query": {"in_pinboard": {"user": "u1",
                                               "pinboard_ids": [board_id]}},
                     "page_size": 10_000},
        lambda: {f for f in all_fids if by_file[f][9] in {
            r[0] for r in conn.execute(
                """SELECT pvi.sha256 FROM user_data.pinboards p
                   JOIN user_data.pinboard_version_items pvi
                     ON pvi.version_id = p.head_version_id
                   WHERE p.user='u1' AND p.id=?""", (board_id,)).fetchall()}})

    # -- semantic shapes: every arm in exact AND quant variants -----------------
    def semantic(name, space_key, filter_key, q, *, agg="MIN", distance="cosine",
                 src=None, gt=None, lt=None, members_fn=None, extra=None):
        sp = spaces[space_key + "/test"]
        for arm in ("exact", "quant"):
            payload_filter = {
                "query": b64(q), "model": space_key + "/test",
                "embed": None, "index": arm,
                "distance_aggregation": agg,
            }
            if src:
                payload_filter["src_text"] = src
            node = {filter_key: payload_filter}
            if gt is not None:
                node["gt"] = gt
            if lt is not None:
                node["lt"] = lt
            payload = {"query": node, "page_size": 10_000}

            def oracle(sp=sp, arm=arm, q=q, agg=agg, src=src, gt=gt, lt=lt,
                       members_fn=members_fn):
                per_item = sp.scores(
                    q, distance=distance, agg=agg.lower(),
                    use_quant=(arm == "quant"), src_args=src,
                )
                values = {i: v for i, (v, _) in per_item.items()}
                members = members_fn() if members_fn else None
                return ranked(values, members=members, gt=gt, lt=lt)

            # gt/lt bounds bite on the arm's own distance axis, so exact
            # and quant arms legitimately admit different borderline rows —
            # exclude those shapes from the cross-arm membership invariant.
            add(f"{name}-{arm}", payload, oracle, mode="order",
                extra_check=extra, skip_arm_pair=(gt is not None or lt is not None))

    semantic("img-sem", "clip", "image_embeddings", qv)
    semantic("img-sem-b", "clip", "image_embeddings", qv2)
    semantic("txt-sem", "st", "text_embeddings", qst)
    semantic("txt-sem-avg", "st", "text_embeddings", qst, agg="AVG")
    semantic("txt-sem-max", "st", "text_embeddings", qst, agg="MAX")
    semantic("txt-sem-src-filter", "st", "text_embeddings", qst,
             src={"setters": ["ocr/test"], "languages": ["en"],
                  "min_confidence": 0.5})
    semantic("txt-sem-src-weighted", "st", "text_embeddings", qst, agg="AVG",
             src={"confidence_weight": 1.0, "language_confidence_weight": 0.5})
    # gt/lt cursor bounds over the distance axis (model.rs:188-199).
    semantic("img-sem-gt", "clip", "image_embeddings", qv, gt=0.8)
    semantic("img-sem-lt", "clip", "image_embeddings", qv, lt=1.1)

    # select_as exposure on a vector filter.
    def sel_as_check(res):
        ok = all(
            isinstance(r.get("extra", {}).get("dist"), float) for r in res.results
        )
        return ok or "missing select_as column"

    for arm in ("exact", "quant"):
        add(f"img-sem-select-as-{arm}",
            {"query": {"image_embeddings": {
                "query": b64(qv), "model": "clip/test", "embed": None,
                "index": arm}, "select_as": "dist"},
             "page_size": 10_000},
            (lambda arm=arm: ranked({i: v for i, (v, _) in clip.scores(
                qv, distance="cosine", agg="min", use_quant=(arm == "quant")
            ).items()})),
            mode="order", extra_check=sel_as_check)

    # -- composition shapes ------------------------------------------------------
    def rrf_oracle(arm):
        parts = []
        for q in (qv, qv2):
            per_item = clip.scores(q, distance="cosine", agg="min",
                                   use_quant=(arm == "quant"))
            vals = {i: v for i, (v, _) in per_item.items()}
            ordered = ranked(vals)
            rank = {f: r + 1 for r, f in enumerate(ordered)}
            parts.append(rank)
        members = set(parts[0]) & set(parts[1])
        weights = [1.0, 0.5]
        totals = {
            f: sum(w / (60 + p.get(f, np.inf)) for w, p in zip(weights, parts))
            for f in members
        }
        return sorted(members, key=lambda f: (-totals[f],) + tiebreak(f))

    for arm in ("exact", "quant"):
        add(f"rrf-2space-{arm}",
            {"query": {"and_": [
                {"image_embeddings": {"query": b64(qv), "model": "clip/test",
                                      "embed": None, "index": arm},
                 "row_n": True, "priority": 5, "rrf": {"k": 60, "weight": 1.0}},
                {"image_embeddings": {"query": b64(qv2), "model": "clip/test",
                                      "embed": None, "index": arm},
                 "row_n": True, "priority": 5, "rrf": {"k": 60, "weight": 0.5}},
            ]}, "page_size": 10_000},
            lambda arm=arm: rrf_oracle(arm), mode="order")

    def hybrid_oracle(arm):
        """Hybrid FTS × embedding RRF (BASELINE config #4; reference
        match_text.rs:18-70): FTS rank list fused with semantic ranks.
        Rank scoping is sequential (AND order): FTS ranks over its own
        matches; semantic ranks over FTS-matched ∧ embedded rows."""
        # Mirror the engine's aggregate exactly: MAX(-rank), not -MAX(rank).
        fts = {
            r[0]: r[1]
            for r in conn.execute(
                """SELECT d.item_id, MAX(-fts.rank)
                   FROM extracted_text t
                   JOIN item_data d ON d.id = t.id
                   JOIN (SELECT rowid, rank FROM extracted_text_fts
                         WHERE extracted_text_fts MATCH ? LIMIT -1) fts
                     ON fts.rowid = t.id
                   GROUP BY d.item_id""",
                ('"token"',),
            ).fetchall()
        }
        fts_files = sorted(
            (f for it, v in fts.items() for f in file_of_item.get(it, ())),
        )
        # row_n over (value desc, row asc) — MatchText row_n defaults desc.
        r1_order = sorted(fts_files, key=lambda f: (-fts[by_file[f][1]], f))
        r1 = {f: i + 1 for i, f in enumerate(r1_order)}
        sem = {i: v for i, (v, _) in st.scores(
            qst, distance="cosine", agg="min",
            use_quant=(arm == "quant")).items()}
        scope2 = [f for f in fts_files if by_file[f][1] in sem]
        r2_order = sorted(scope2, key=lambda f: (sem[by_file[f][1]], f))
        r2 = {f: i + 1 for i, f in enumerate(r2_order)}
        members = scope2
        totals = {
            f: 1.0 / (60.0 + r1[f]) + 0.5 / (60.0 + r2[f]) for f in members
        }
        return sorted(members, key=lambda f: (-totals[f],) + tiebreak(f))

    for arm in ("exact", "quant"):
        add(f"hybrid-fts-rrf-{arm}",
            {"query": {"and_": [
                {"match_text": {"match": '"token"'},
                 "order_by": True, "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 1.0}},
                {"text_embeddings": {"query": b64(qst), "model": "st/test",
                                     "embed": None, "index": arm},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 0.5}},
            ]}, "page_size": 10_000},
            lambda arm=arm: hybrid_oracle(arm), mode="order")

    def coalesce_oracle(arm, desc):
        a = {i: v for i, (v, _) in clip.scores(
            qv, distance="cosine", agg="min", use_quant=(arm == "quant")).items()}
        b = {i: v for i, (v, _) in st.scores(
            qst, distance="cosine", agg="min", use_quant=(arm == "quant")).items()}
        fa = {f: a[by_file[f][1]] for f in all_fids if by_file[f][1] in a}
        fb = {f: b[by_file[f][1]] for f in all_fids if by_file[f][1] in b}
        members = set(fa) | set(fb)
        fallback = -np.inf if desc else np.inf
        agg = max if desc else min
        key = {f: agg(fa.get(f, fallback), fb.get(f, fallback)) for f in members}
        return sorted(
            members, key=lambda f: ((-key[f] if desc else key[f]),) + tiebreak(f)
        )

    for arm in ("exact", "quant"):
        # Equal-priority min-coalesce across an OR of two spaces
        # (build_coalesced_expr, builder.rs:1043-1320).
        add(f"coalesce-min-{arm}",
            {"query": {"or_": [
                {"image_embeddings": {"query": b64(qv), "model": "clip/test",
                                      "embed": None, "index": arm}, "priority": 5},
                {"text_embeddings": {"query": b64(qst), "model": "st/test",
                                     "embed": None, "index": arm}, "priority": 5},
            ]}, "page_size": 10_000},
            lambda arm=arm: coalesce_oracle(arm, desc=False), mode="order")

    add("and-meta-sem",
        {"query": {"and_": [
            {"match": {"gt": {"size": median_size}}},
            {"image_embeddings": {"query": b64(qv), "model": "clip/test",
                                  "embed": None, "index": "exact"}},
        ]}, "page_size": 10_000},
        lambda: ranked(
            {i: v for i, (v, _) in clip.scores(
                qv, distance="cosine", agg="min", use_quant=False).items()},
            members={f for f in all_fids if by_file[f][3] > median_size}),
        mode="order")

    # -- similar_to --------------------------------------------------------------
    def similar_oracle(arm, space_keys, distance, agg, src=None, pairs=None):
        # anchors per source space; scored against target spaces (executor
        # _leaf_similar_to pair loop).
        parts = []
        for src_space in space_keys:
            sp_s = spaces[src_space + "/test"]
            rows_a = np.flatnonzero(sp_s.item_ids == anchor_item)
            if len(rows_a) == 0:
                continue
            anchors = sp_s.vecs[rows_a]
            for tgt_space in (pairs.get(src_space, space_keys) if pairs else space_keys):
                sp_t = spaces[tgt_space + "/test"]
                per_item = sp_t.scores(
                    anchors, distance=distance, agg=agg,
                    use_quant=(arm == "quant"),
                    src_args=src if tgt_space.startswith("t") else None,
                )
                parts.append(per_item)
        combined = combine_spaces(parts, agg)
        return ranked(combined)

    for arm in ("exact", "quant"):
        add(f"similar-i2i-{arm}",
            {"query": {"similar_to": {
                "target": anchor_sha, "model": "clip/test",
                "distance_function": "COSINE", "distance_aggregation": "AVG",
                "index": arm}},
             "page_size": 10_000},
            lambda arm=arm: similar_oracle(arm, ["clip"], "cosine", "avg"),
            mode="order")
        add(f"similar-l2-{arm}",
            {"query": {"similar_to": {
                "target": anchor_sha, "model": "clip/test",
                "distance_function": "L2", "distance_aggregation": "MIN",
                "index": arm}},
             "page_size": 10_000},
            lambda arm=arm: similar_oracle(arm, ["clip"], "l2", "min"),
            mode="order")
        add(f"similar-t2t-{arm}",
            {"query": {"similar_to": {
                "target": anchor_sha, "model": "st/test",
                "distance_function": "COSINE", "distance_aggregation": "AVG",
                "index": arm,
                "src_text": {"confidence_weight": 1.0}}},
             "page_size": 10_000},
            # st/test does not start with the xmodal prefix → src weighting
            # is NOT applied by the engine (only t-sibling spaces weight).
            lambda arm=arm: similar_oracle(arm, ["st"], "cosine", "avg"),
            mode="order")
        add(f"similar-xmodal-{arm}",
            {"query": {"similar_to": {
                "target": anchor_sha, "model": "clip/test",
                "distance_function": "COSINE", "distance_aggregation": "AVG",
                "clip_xmodal": True, "index": arm}},
             "page_size": 10_000},
            lambda arm=arm: similar_oracle(arm, ["clip", "tclip"], "cosine", "avg"),
            mode="order")

    # -- text entity ---------------------------------------------------------
    text_base = conn.execute(
        """SELECT f.id, d.id FROM files f
           JOIN items i ON i.id = f.item_id
           JOIN item_data d ON d.item_id = i.id
           JOIN extracted_text t ON t.id = d.id
           WHERE f.available=1"""
    ).fetchall()
    add("text-entity-all", {"entity": "text", "page_size": 10_000},
        lambda: {(r[0], r[1]) for r in text_base}, mode="member-text")
    add("text-entity-match",
        {"entity": "text", "query": {"match_text": {"match": f'"{some_token}"'}},
         "page_size": 10_000},
        lambda: {
            (r[0], r[1]) for r in conn.execute(
                """SELECT f.id, d.id FROM files f
                   JOIN item_data d ON d.item_id = f.item_id
                   JOIN extracted_text t ON t.id = d.id
                   WHERE f.available=1 AND t.text LIKE ?""",
                (f"%{some_token}%",)).fetchall()},
        mode="member-text")
    add("text-entity-lang",
        {"entity": "text", "query": {"match": {"eq": {"language": "en"}}},
         "page_size": 10_000},
        lambda: {
            (r[0], r[1]) for r in conn.execute(
                """SELECT f.id, d.id FROM files f
                   JOIN item_data d ON d.item_id = f.item_id
                   JOIN extracted_text t ON t.id = d.id
                   WHERE f.available=1 AND t.language='en'"""
            ).fetchall()},
        mode="member-text")

    return shapes


def _desc_str(s: str):
    # Descending string order key: invert per-character ordinals (strings
    # here are fixed-format timestamps, equal length).
    return tuple(-ord(c) for c in s)


def _random_order(fids, seed):
    from panoptikon_tpu.utils.splitmix import pk_mix

    return sorted(fids, key=lambda f: (pk_mix(f, seed), f))


def _partition_first(ordered, keyfn):
    seen, out = set(), []
    for f in ordered:
        k = keyfn(f)
        if k not in seen:
            seen.add(k)
            out.append(f)
    return out


def _text_items(conn, token):
    return {
        r[0] for r in conn.execute(
            """SELECT d.item_id FROM extracted_text t
               JOIN item_data d ON d.id = t.id WHERE t.text LIKE ?""",
            (f"%{token}%",),
        ).fetchall()
    }


def _tag_items(conn, tags, any_):
    got = {}
    for item_id, name in conn.execute(
        """SELECT ti.item_id, tg.name FROM tags_items ti
           JOIN tags tg ON tg.id=ti.tag_id""",
    ).fetchall():
        got.setdefault(item_id, set()).add(name)
    need = set(tags)
    if any_:
        return {i for i, names in got.items() if names & need}
    return {i for i, names in got.items() if need <= names}


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--items", type=int, default=300)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from panoptikon_tpu.pql import model as pql
    from panoptikon_tpu.pql.executor import Executor

    rng = np.random.default_rng(args.seed)
    with tempfile.TemporaryDirectory() as tmp:
        db, writer, index, rows, spaces, board_id = seed_db(tmp, args.items, rng)
        ex = Executor(db, index, manager=None)
        shapes = build_shapes(db, rows, spaces, board_id, rng)

        failures, checked = [], 0
        arm_membership: dict[str, dict[str, list]] = {}
        for shape in shapes:
            name, payload = shape["name"], shape["payload"]
            res = ex.execute(pql.PqlQuery.from_json(json.loads(json.dumps(payload))))
            want = shape["oracle"]()
            checked += 1
            if shape["mode"] == "member-text":
                got = {(r["file_id"], r["data_id"]) for r in res.results}
                if got != want:
                    failures.append({"shape": name, "got_n": len(got),
                                     "want_n": len(want),
                                     "missing": sorted(want - got)[:5],
                                     "extra": sorted(got - want)[:5]})
            elif shape["mode"] == "order":
                got = [r["file_id"] for r in res.results]
                want_l = list(want)
                if got[:50] != want_l[:50] or sorted(got) != sorted(want_l):
                    failures.append({"shape": name,
                                     "got": got[:10], "want": want_l[:10],
                                     "got_n": len(got), "want_n": len(want_l)})
            else:
                got = [r["file_id"] for r in res.results]
                if set(got) != set(want):
                    failures.append({"shape": name, "got_n": len(got),
                                     "want_n": len(want)})
            want_count = shape["count_override"]
            if want_count is None:
                want_count = len(want)
            if res.count is not None and res.count != want_count:
                failures.append({"shape": name, "count": res.count,
                                 "want_count": want_count})
            if shape["extra_check"] and res.results:
                ok = shape["extra_check"](res)
                if ok is not True:
                    failures.append({"shape": name, "extra_check": ok})
            # Track exact-vs-quant engine membership per arm-paired shape.
            root = name.rsplit("-", 1)
            if (
                len(root) == 2
                and root[1] in ("exact", "quant")
                and not shape["skip_arm_pair"]
            ):
                arm_membership.setdefault(root[0], {})[root[1]] = sorted(
                    r["file_id"] for r in res.results
                )

        # Reference invariant: identical MEMBERSHIP across exact/quant arms
        # (order may differ on the approximate axis but membership must not —
        # vector-int8-quant.md:53-70).
        arm_pairs = 0
        for root, arms in arm_membership.items():
            if "exact" in arms and "quant" in arms:
                arm_pairs += 1
                if arms["exact"] != arms["quant"]:
                    failures.append({"shape": root,
                                     "exact_quant_membership_mismatch": True,
                                     "exact_n": len(arms["exact"]),
                                     "quant_n": len(arms["quant"])})

        writer.close()
        print(json.dumps({
            "checked": checked,
            "arm_pairs_membership_checked": arm_pairs,
            "failures": failures,
        }, indent=2, default=str))
        return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
