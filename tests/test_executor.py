"""PQL executor tests: end-to-end over a seeded database + device index.

The fixture builds a small corpus (items/files/text/tags/bookmarks +
CLIP-like embeddings) and drives PQL queries through the executor,
asserting membership, ordering, fusion, and pagination semantics against
straightforward NumPy oracles.
"""

import numpy as np
import pytest

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter
from panoptikon_tpu.index.vector_index import VectorIndex
from panoptikon_tpu.pql import model as pql
from panoptikon_tpu.pql.executor import Executor
from panoptikon_tpu.utils import npy
from panoptikon_tpu.utils.splitmix import pk_mix

DIM = 16
N_ITEMS = 24


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("pqlenv")
    db = Database(root, "pql")
    writer = IndexWriter(db)
    index = VectorIndex(chunk_rows=64)
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(N_ITEMS, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    def unit(conn):
        sid_clip = store.upsert_setter(conn, "clip")
        sid_ocr = store.upsert_setter(conn, "ocr")
        sid_tag = store.upsert_setter(conn, "tagger")
        info = []
        for i in range(N_ITEMS):
            sha = f"{i:02d}" * 32
            mime = "image/png" if i % 3 else "video/mp4"
            item_id = store.upsert_item(
                conn, sha, f"md5{i}".ljust(32, "0"), mime, size=1000 + i,
                width=100 + i,
            )
            store.upsert_file(
                conn, item_id, sha, f"/media/folder{i % 2}/file{i:02d}.png",
                f"2026-01-{i + 1:02d}T00:00:00",
            )
            did = store.insert_item_data(conn, item_id, sid_clip, "clip")
            store.insert_embedding(conn, did, vecs[i])
            if i % 2 == 0:
                tdid = store.insert_item_data(conn, item_id, sid_ocr, "text")
                store.insert_extracted_text(
                    conn, tdid, f"hello document number{i:02d} content",
                    language="en", confidence=0.5 + i / 100, language_confidence=0.9,
                )
            if i % 4 == 0:
                gdid = store.insert_item_data(conn, item_id, sid_tag, "tags")
                tid = store.upsert_tag(conn, "general", "cat")
                store.tag_item(conn, gdid, item_id, tid, 0.5 + i / 100)
            if i == 5:
                gdid = store.insert_item_data(conn, item_id, sid_tag, "tags")
                for name in ("cat", "dog"):
                    tid = store.upsert_tag(conn, "general", name)
                    store.tag_item(conn, gdid, item_id, tid, 0.9)
            info.append((item_id, sha))
        return info

    info = writer.call(unit)

    # Bookmarks for items 1 and 2.
    uconn = db.user_data_write_connection()
    with uconn:
        for i in (1, 2):
            uconn.execute(
                "INSERT INTO bookmarks (user, namespace, sha256, time_added)"
                " VALUES ('user', 'favorites', ?, ?)",
                (info[i][1], f"2026-02-0{i}T00:00:00"),
            )
    uconn.close()

    # Device index mirrors the embeddings.
    item_ids = np.array([i[0] for i in info], dtype=np.int64)
    index.add("clip", item_ids, np.arange(N_ITEMS), vecs)
    index.build_quant("clip")
    # xmodal text sibling space ("t" + model): text-derived vectors for the
    # even items only, deliberately orthogonal-ish to the image vectors.
    t_vecs = np.roll(vecs[::2], 1, axis=1)
    index.add("tclip", item_ids[::2], 10_000 + np.arange(N_ITEMS // 2), t_vecs)

    ex = Executor(db, index, manager=None)
    yield {"db": db, "ex": ex, "vecs": vecs, "info": info, "index": index}
    writer.close()


def run(ex, payload):
    return ex.execute(pql.PqlQuery.from_json(payload))


def b64_query(vec):
    import base64

    return base64.standard_b64encode(npy.serialize_npy(vec)).decode()


class TestBasics:
    def test_empty_query_returns_everything(self, env):
        res = run(env["ex"], {"page_size": 100})
        assert res.count == N_ITEMS
        # Default order: last_modified desc.
        lm = [r["last_modified"] for r in res.results]
        assert lm == sorted(lm, reverse=True)

    def test_pagination_partitions(self, env):
        q = {"page_size": 10, "order_by": [{"order_by": "file_id"}]}
        p1 = run(env["ex"], {**q, "page": 1})
        p2 = run(env["ex"], {**q, "page": 2})
        p3 = run(env["ex"], {**q, "page": 3})
        ids = [r["file_id"] for p in (p1, p2, p3) for r in p.results]
        assert ids == sorted(set(ids)) and len(ids) == N_ITEMS

    def test_match_filter(self, env):
        res = run(env["ex"], {
            "query": {"match": {"eq": {"type": "video/mp4"}}},
            "page_size": 100,
        })
        assert res.count == N_ITEMS // 3
        assert all(r["type"] == "video/mp4" for r in res.results)

    def test_match_gt_and_nested(self, env):
        res = run(env["ex"], {
            "query": {"match": {"and_": [
                {"gt": {"size": 1010}},
                {"not_": {"eq": {"type": "video/mp4"}}},
            ]}},
            "page_size": 100,
        })
        for r in res.results:
            assert r["type"] != "video/mp4"

    def test_seeded_random_is_stable_and_pageable(self, env):
        q = {"order_by": [{"order_by": "random"}], "seed": 99, "page_size": 100}
        a = run(env["ex"], q)
        b = run(env["ex"], q)
        assert [r["file_id"] for r in a.results] == [r["file_id"] for r in b.results]
        # Permutation matches pk_mix ordering.
        ids = [r["file_id"] for r in a.results]
        expected = sorted(ids, key=lambda fid: (pk_mix(fid, 99), fid))
        assert ids == expected
        # Pages partition under the same seed.
        p1 = run(env["ex"], {**q, "page_size": 10, "page": 1})
        assert [r["file_id"] for r in p1.results] == ids[:10]

    def test_minted_seed_returned(self, env):
        res = run(env["ex"], {"order_by": [{"order_by": "random"}]})
        assert res.seed is not None


class TestTextAndTags:
    def test_match_text_fts(self, env):
        res = run(env["ex"], {
            "query": {"match_text": {"match": "number04"}},
            "page_size": 100,
        })
        assert res.count == 1

    def test_match_text_min_confidence(self, env):
        res = run(env["ex"], {
            "query": {"match_text": {"match": "", "filter_only": True,
                                     "min_confidence": 0.65}},
            "page_size": 100,
        })
        # items 16..22 even have confidence 0.66+
        for r in res.results:
            assert int(r["file_id"]) >= 1

    def test_match_tags_all_vs_any(self, env):
        both = run(env["ex"], {
            "query": {"match_tags": {"tags": ["cat", "dog"]}},
            "page_size": 100,
        })
        assert both.count == 1  # only item 5 has both
        any_ = run(env["ex"], {
            "query": {"match_tags": {"tags": ["cat", "dog"], "match_any": True}},
            "page_size": 100,
        })
        assert any_.count == len([i for i in range(N_ITEMS) if i % 4 == 0]) + 1

    def test_in_bookmarks(self, env):
        res = run(env["ex"], {
            "query": {"in_bookmarks": {"namespaces": ["favorites"]}},
            "page_size": 100,
        })
        assert res.count == 2

    def test_processed_by(self, env):
        res = run(env["ex"], {"query": {"processed_by": "ocr"}, "page_size": 100})
        assert res.count == N_ITEMS // 2


class TestVector:
    def test_semantic_search_exact_order(self, env):
        vecs = env["vecs"]
        qv = vecs[7]  # query with item 7's own vector
        res = run(env["ex"], {
            "query": {"image_embeddings": {
                "query": b64_query(qv), "model": "clip", "embed": None,
                "index": "exact",
            }},
            "page_size": 5,
        })
        # Best match is item 7 itself; order matches numpy cosine.
        dists = 1 - vecs @ qv
        expected = np.argsort(dists, kind="stable")[:5]
        got_items = [r["item_id"] for r in res.results]
        expected_items = [env["info"][i][0] for i in expected]
        assert got_items == expected_items
        assert res.count == N_ITEMS

    def test_semantic_search_quant_close_to_exact(self, env):
        vecs = env["vecs"]
        qv = vecs[3]
        res = run(env["ex"], {
            "query": {"image_embeddings": {
                "query": b64_query(qv), "model": "clip", "embed": None,
                "index": "quant",
            }},
            "page_size": 5,
        })
        assert res.results[0]["item_id"] == env["info"][3][0]

    def test_select_as_rank_in_extra(self, env):
        vecs = env["vecs"]
        res = run(env["ex"], {
            "query": {"image_embeddings": {
                "query": b64_query(vecs[0]), "model": "clip", "embed": None,
                "index": "exact",
            }, "select_as": "dist"},
            "page_size": 3,
        })
        assert "extra" in res.results[0]
        assert res.results[0]["extra"]["dist"] == pytest.approx(0.0, abs=1e-4)

    def test_and_composition_restricts_membership(self, env):
        vecs = env["vecs"]
        res = run(env["ex"], {
            "query": {"and_": [
                {"match": {"eq": {"type": "video/mp4"}}},
                {"image_embeddings": {
                    "query": b64_query(vecs[0]), "model": "clip",
                    "embed": None, "index": "exact",
                }},
            ]},
            "page_size": 100,
        })
        assert res.count == N_ITEMS // 3
        assert all(r["type"] == "video/mp4" for r in res.results)

    def test_rrf_fusion_two_spaces(self, env):
        vecs = env["vecs"]
        res = run(env["ex"], {
            "query": {"and_": [
                {"image_embeddings": {
                    "query": b64_query(vecs[2]), "model": "clip",
                    "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "rrf": {"k": 0, "weight": 1.0}},
                {"image_embeddings": {
                    "query": b64_query(vecs[9]), "model": "clip",
                    "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "rrf": {"k": 0, "weight": 1.0}},
            ]},
            "page_size": 4,
        })
        top2 = {r["item_id"] for r in res.results[:2]}
        assert top2 == {env["info"][2][0], env["info"][9][0]}

    def test_similar_to(self, env):
        vecs = env["vecs"]
        target_sha = env["info"][11][1]
        res = run(env["ex"], {
            "query": {"similar_to": {
                "target": target_sha, "model": "clip", "index": "exact",
                "distance_function": "COSINE",
            }},
            "page_size": 3,
        })
        assert res.results[0]["item_id"] == env["info"][11][0]
        dists = 1 - vecs @ vecs[11]
        runner_up = int(np.argsort(dists)[1])
        assert res.results[1]["item_id"] == env["info"][runner_up][0]

    def test_quant_strict_errors_when_not_ready(self, env):
        with pytest.raises(pql.PqlError, match="not ready"):
            run(env["ex"], {
                "query": {"image_embeddings": {
                    "query": b64_query(env["vecs"][0]), "model": "nonexistent",
                    "embed": None, "index": "quant",
                }},
            })


class TestSelectAsOnly:
    def test_select_as_without_order_by_exposes_column_only(self, env):
        vecs = env["vecs"]
        res = run(env["ex"], {
            "query": {"and_": [
                {"image_embeddings": {
                    "query": b64_query(vecs[5]), "model": "clip",
                    "embed": None, "index": "exact"},
                 "order_by": False, "select_as": "d5"},
            ]},
            "order_by": [{"order_by": "file_id"}],
            "page_size": 5,
        })
        # Ordering follows file_id (the filter contributes no key)...
        ids = [r["file_id"] for r in res.results]
        assert ids == sorted(ids)
        # ...but the distance column still rides in extra.
        assert all("d5" in r.get("extra", {}) for r in res.results)


class TestXmodal:
    def test_clip_xmodal_unions_sibling_space(self, env):
        vecs = env["vecs"]
        # Query matching item 4's TEXT vector exactly (rolled), far from
        # its image vector.
        qv = np.roll(vecs[4], 1)
        res = run(env["ex"], {
            "query": {"image_embeddings": {
                "query": b64_query(qv), "model": "clip", "embed": None,
                "index": "exact", "clip_xmodal": True,
            }},
            "page_size": 3,
        })
        assert res.results[0]["item_id"] == env["info"][4][0]

    def test_without_xmodal_text_space_ignored(self, env):
        vecs = env["vecs"]
        qv = np.roll(vecs[4], 1)
        res = run(env["ex"], {
            "query": {"image_embeddings": {
                "query": b64_query(qv), "model": "clip", "embed": None,
                "index": "exact", "clip_xmodal": False,
            }},
            "page_size": 1,
        })
        d = 1 - vecs @ qv
        best = int(np.argmin(d))
        assert res.results[0]["item_id"] == env["info"][best][0]


class TestTextEntity:
    def test_text_entity_grain_and_columns(self, env):
        res = run(env["ex"], {
            "entity": "text",
            "select": ["path", "text", "confidence", "setter_name"],
            "page_size": 100,
        })
        # One row per text-file pair: only even items have OCR text.
        assert res.count == N_ITEMS // 2
        assert all("text" in r and r["data_id"] > 0 for r in res.results)
        assert all(r["setter_name"] == "ocr" for r in res.results)

    def test_text_entity_match_text_ranks_rows(self, env):
        res = run(env["ex"], {
            "entity": "text",
            "select": ["text"],
            "query": {"match_text": {"match": "number06"}},
            "page_size": 10,
        })
        assert res.count == 1
        assert "number06" in res.results[0]["text"]

    def test_text_columns_rejected_for_file_entity(self, env):
        with pytest.raises(pql.PqlError):
            run(env["ex"], {"select": ["text"]})


class TestWorkFilters:
    def test_has_data_unprocessed(self, env):
        # Every item has clip data with no derived rows → the filter sees
        # all items as having unprocessed 'clip' data for a downstream
        # setter that has produced nothing yet.
        res = run(env["ex"], {
            "query": {"has_data_unprocessed": {
                "setter_name": "quantizer", "data_types": ["clip"]}},
            "page_size": 100,
        })
        assert res.count == N_ITEMS

    def test_failed_for_empty_ledger(self, env):
        res = run(env["ex"], {
            "query": {"failed_for": "clip"},
            "page_size": 100,
        })
        assert res.count == 0

    def test_not_processed_by_composition(self, env):
        # NOT ProcessedBy(ocr) = the odd items (the extraction work-query
        # shape built as PQL — extraction.rs:35-39).
        res = run(env["ex"], {
            "query": {"not_": {"processed_by": "ocr"}},
            "page_size": 100,
        })
        assert res.count == N_ITEMS - N_ITEMS // 2


class TestSimilarToWeighted:
    def test_similar_to_quant_arm(self, env):
        target_sha = env["info"][6][1]
        res = run(env["ex"], {
            "query": {"similar_to": {
                "target": target_sha, "model": "clip", "index": "quant",
                "distance_function": "COSINE",
            }},
            "page_size": 3,
        })
        assert res.results[0]["item_id"] == env["info"][6][0]


class TestPartition:
    def test_partition_by_item(self, env):
        res = run(env["ex"], {
            "partition_by": ["item_id"],
            "page_size": 100,
        })
        items = [r["item_id"] for r in res.results]
        assert len(items) == len(set(items)) == N_ITEMS


class TestSrcTextFiltering:
    """src_text constraints on the xmodal sibling space exercise the
    sharded path's per-query row-validity permutation (row_perm): the
    packed layout must mask exactly the rows whose SOURCE text fails the
    constraint, on the 8-device mesh."""

    @pytest.fixture
    def src_env(self, tmp_path):
        db = Database(tmp_path / "data", "srctext")
        writer = IndexWriter(db)
        index = VectorIndex(chunk_rows=64)
        rng = np.random.default_rng(11)
        n = 12
        vecs = rng.normal(size=(n, DIM)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        t_vecs = np.roll(vecs, 1, axis=1)

        def unit(conn):
            sid_clip = store.upsert_setter(conn, "clip")
            sid_ocr = store.upsert_setter(conn, "ocr")
            sid_tclip = store.upsert_setter(conn, "tclip")
            rows = []
            for i in range(n):
                sha = f"{i:02d}" * 32
                item_id = store.upsert_item(
                    conn, sha, f"m{i}".ljust(32, "0"), "image/png", size=10 + i
                )
                store.upsert_file(
                    conn, item_id, sha, f"/m/f{i}.png", "2026-01-01T00:00:00"
                )
                did = store.insert_item_data(conn, item_id, sid_clip, "clip")
                store.insert_embedding(conn, did, vecs[i])
                # Source text with confidence i/10; the text-derived
                # embedding row points at it via source_id.
                tdid = store.insert_item_data(conn, item_id, sid_ocr, "text")
                store.insert_extracted_text(
                    conn, tdid, f"text {i}", language="en",
                    confidence=i / 10.0, language_confidence=0.9,
                )
                edid = store.insert_item_data(
                    conn, item_id, sid_tclip, "clip", source_id=tdid
                )
                store.insert_embedding(conn, edid, t_vecs[i])
                rows.append((item_id, edid))
            return rows

        rows = writer.call(unit)
        item_ids = np.array([r[0] for r in rows], dtype=np.int64)
        data_ids = np.array([r[1] for r in rows], dtype=np.int64)
        index.add("clip", item_ids, np.arange(n), vecs)
        index.add("tclip", item_ids, data_ids, t_vecs)
        ex = Executor(db, index, manager=None)
        yield {
            "ex": ex, "vecs": vecs, "t_vecs": t_vecs, "items": item_ids,
        }
        writer.close()

    def test_min_confidence_masks_rows(self, src_env):
        vecs, items = src_env["vecs"], src_env["items"]
        # Query = item 3's TEXT vector; its source confidence is 0.3.
        qv = np.roll(vecs[3], 1)
        payload = {
            "query": {"image_embeddings": {
                "query": b64_query(qv), "model": "clip", "embed": None,
                "index": "exact", "clip_xmodal": True,
                "src_text": {"min_confidence": 0.5},
            }},
            "page_size": 12,
        }
        res = run(src_env["ex"], payload)
        # Item 3's text row is masked (0.3 < 0.5); the winner must be an
        # item whose text row survives, ranked by the text-space distance.
        t_d = 1 - src_env["t_vecs"] @ qv
        allowed = np.arange(len(items)) >= 5  # confidence i/10 >= 0.5
        # Compose the oracle over BOTH spaces (image arm unfiltered).
        i_d = 1 - vecs @ qv
        fused = np.where(allowed, np.minimum(t_d, i_d), i_d)
        best = int(np.argmin(fused))
        assert res.results[0]["item_id"] == items[best]
        assert items[3] != items[best]

    def test_no_filter_includes_all_rows(self, src_env):
        vecs, items = src_env["vecs"], src_env["items"]
        qv = np.roll(vecs[3], 1)
        payload = {
            "query": {"image_embeddings": {
                "query": b64_query(qv), "model": "clip", "embed": None,
                "index": "exact", "clip_xmodal": True,
            }},
            "page_size": 1,
        }
        res = run(src_env["ex"], payload)
        assert res.results[0]["item_id"] == items[3]


class TestSnippets:
    def test_match_text_snippet_in_extra(self, env):
        res = run(env["ex"], {
            "query": {"match_text": {
                "match": "number04", "select_snippet_as": "snip",
            }, "order_by": True},
            "page_size": 5,
        })
        assert res.count == 1
        snip = res.results[0]["extra"]["snip"]
        # Trigram tokenizer: the highlight covers the first matched trigram
        # and the window is counted in trigram tokens.
        assert "<b>" in snip and "</b>" in snip
        assert "document" in snip

    def test_filter_only_match_has_no_snippet(self, env):
        res = run(env["ex"], {
            "query": {"match_text": {
                "match": "", "filter_only": True,
                "min_confidence": 0.5, "select_snippet_as": "snip",
            }},
            "page_size": 5,
        })
        assert all("snip" not in (r.get("extra") or {}) for r in res.results)


class TestConfidenceWeighting:
    def test_weighted_avg_uses_query_exponents(self, tmp_path):
        """SUM(d·w)/SUM(w) with w = confidence^cw from THIS query's
        SourceArgs (item_similarity.rs:18-70) — verified against a NumPy
        oracle across the image + xmodal text spaces."""
        db = Database(tmp_path / "data", "wtest")
        writer = IndexWriter(db)
        index = VectorIndex(chunk_rows=64)
        rng = np.random.default_rng(5)
        n = 8
        vecs = rng.normal(size=(n, DIM)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        t_vecs = np.roll(vecs, 2, axis=1)
        confs = (np.arange(n) + 1) / 10.0

        def unit(conn):
            sid_clip = store.upsert_setter(conn, "clip")
            sid_ocr = store.upsert_setter(conn, "ocr")
            sid_tclip = store.upsert_setter(conn, "tclip")
            out = []
            for i in range(n):
                sha = f"{i:02d}" * 32
                item_id = store.upsert_item(
                    conn, sha, f"w{i}".ljust(32, "0"), "image/png", size=1 + i
                )
                store.upsert_file(conn, item_id, sha, f"/w/{i}.png", "2026")
                did = store.insert_item_data(conn, item_id, sid_clip, "clip")
                store.insert_embedding(conn, did, vecs[i])
                tdid = store.insert_item_data(conn, item_id, sid_ocr, "text")
                store.insert_extracted_text(
                    conn, tdid, f"w{i}", language="en",
                    confidence=float(confs[i]), language_confidence=0.9,
                )
                edid = store.insert_item_data(
                    conn, item_id, sid_tclip, "clip", source_id=tdid
                )
                store.insert_embedding(conn, edid, t_vecs[i])
                out.append((item_id, edid))
            return out

        rows = writer.call(unit)
        items = np.array([r[0] for r in rows], np.int64)
        data_ids = np.array([r[1] for r in rows], np.int64)
        index.add("clip", items, np.arange(n), vecs)
        index.add("tclip", items, data_ids, t_vecs)
        ex = Executor(db, index, manager=None)

        qv = rng.normal(size=DIM).astype(np.float32)
        qv /= np.linalg.norm(qv)
        cw = 2.0
        res = ex.execute(pql.PqlQuery.from_json({
            "query": {"image_embeddings": {
                "query": b64_query(qv), "model": "clip", "embed": None,
                "index": "exact", "clip_xmodal": True,
                "distance_aggregation": "AVG",
                "src_text": {"confidence_weight": cw},
            }, "order_by": True, "select_as": "d"},
            "page_size": n,
        }))
        # Oracle: image arm weight 1 (unweighted space, count=1); text arm
        # weighted mean == its single row's distance with weight conf^cw,
        # and the cross-space AVG weights each arm by its weight sum.
        d_img = 1 - vecs @ qv
        d_txt = 1 - t_vecs @ qv
        w_txt = confs ** cw
        fused = (d_img * 1.0 + d_txt * w_txt) / (1.0 + w_txt)
        order = np.argsort(fused, kind="stable")
        got = [r["item_id"] for r in res.results]
        assert got == [int(items[i]) for i in order]
        np.testing.assert_allclose(
            [r["extra"]["d"] for r in res.results],
            np.sort(fused), rtol=1e-4,
        )
        writer.close()


class TestOrComposition:
    def test_or_unions_membership(self, env):
        res = run(env["ex"], {
            "query": {"or_": [
                {"match": {"eq": {"type": "video/mp4"}}},
                {"match_tags": {"tags": ["dog"]}},
            ]},
            "page_size": 100,
        })
        # videos (i % 3 == 0) ∪ item 5 (dog).
        expected = {i for i in range(N_ITEMS) if i % 3 == 0} | {5}
        got = {r["item_id"] for r in res.results}
        assert got == {env["info"][i][0] for i in expected}
        assert res.count == len(expected)

    def test_or_within_and_refines(self, env):
        res = run(env["ex"], {
            "query": {"and_": [
                {"match": {"gt": {"size": 1005}}},
                {"or_": [
                    {"match": {"eq": {"type": "video/mp4"}}},
                    {"match_tags": {"tags": ["cat"]}},
                ]},
            ]},
            "page_size": 100,
        })
        vids_or_cats = (
            {i for i in range(N_ITEMS) if i % 3 == 0}
            | {i for i in range(N_ITEMS) if i % 4 == 0}
            | {5}
        )
        expected = {i for i in vids_or_cats if 1000 + i > 1005}
        got = {r["item_id"] for r in res.results}
        assert got == {env["info"][i][0] for i in expected}

    def test_or_of_semantic_filters_ranks_union(self, env):
        vecs = env["vecs"]
        res = run(env["ex"], {
            "query": {"or_": [
                {"image_embeddings": {"query": b64_query(vecs[2]),
                                      "model": "clip", "embed": None,
                                      "index": "exact"}},
                {"image_embeddings": {"query": b64_query(vecs[9]),
                                      "model": "clip", "embed": None,
                                      "index": "exact"}},
            ]},
            "page_size": 2,
        })
        # Both branches rank; the coalesced (min) order puts the two
        # self-matches first.
        top2 = {r["item_id"] for r in res.results}
        assert top2 == {env["info"][2][0], env["info"][9][0]}


class TestHybridEscalationFallback:
    def test_eager_entry_survives_kk_escalation(self, env, monkeypatch):
        """Regression: a hybrid RRF group (eager FTS rank + deferred
        semantic scan) whose candidate attempts all report insufficiency
        must fall back to the full path — the kk-escalation bound is set
        by the device-scanned entries only (eager entries have no
        deferred scan to bound by; dereferencing one crashed the query)."""
        import panoptikon_tpu.pql.fused as fused

        payload = {
            "query": {"and_": [
                {"match_text": {"match": "number"}, "order_by": True,
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 1.0}},
                {"image_embeddings": {
                    "query": b64_query(env["vecs"][3]), "model": "clip",
                    "embed": None, "index": "quant"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 0.5}},
            ]},
            "page_size": 5,
        }
        want = run(env["ex"], payload)
        assert want.results  # the hybrid matches the even (text) items

        calls = {"n": 0}

        def insufficient(*a, **k):
            calls["n"] += 1
            return fused._INSUFFICIENT

        monkeypatch.setattr(fused, "_attempt", insufficient)
        got = run(env["ex"], payload)
        assert calls["n"] >= 1  # the fused loop actually ran (and gave up)
        assert [r["file_id"] for r in got.results] == [
            r["file_id"] for r in want.results
        ]
        assert got.count == want.count


class TestNullMatchSemantics:
    def test_negated_ops_exclude_null_cells(self, env):
        """SQL NULL semantics (the reference compiles match ops to SQLite
        predicates): NULL != x is NULL → row EXCLUDED, also from nin and
        the negated string ops. NULLs code as NaN (numeric) / "" (string)
        in the base snapshot."""
        from panoptikon_tpu.pql.executor import _eval_op

        num = np.array([1.0, 5.0, np.nan, 2.0])
        assert _eval_op("neq", num, 5).tolist() == [True, False, False, True]
        assert _eval_op("nin", num, [1, 2]).tolist() == [
            False, True, False, False]
        assert _eval_op("eq", num, 5).tolist() == [False, True, False, False]

        s = np.array(["a/x", "", "b/y"], dtype=object)
        assert _eval_op("neq", s, "a/x").tolist() == [False, False, True]
        assert _eval_op("not_startswith", s, ["a/"]).tolist() == [
            False, False, True]
        assert _eval_op("lt", s, "zzz").tolist() == [True, False, True]

    def test_neq_on_nullable_column_end_to_end(self, env):
        # Every fixture file has NULL duration → neq must match NOTHING.
        res = run(env["ex"], {
            "query": {"match": {"neq": {"duration": 5}}},
            "page_size": 100,
        })
        assert res.count == 0
