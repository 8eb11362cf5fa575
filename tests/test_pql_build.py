"""Typed PQL builder (pql/build.py): built dicts must be exactly the JSON
shapes the parser accepts, and executing a built query must equal the
hand-written payload."""

import numpy as np
import pytest

from panoptikon_tpu.pql import build as Q
from panoptikon_tpu.pql import model as pql


def parses(body):
    return pql.PqlQuery.from_json(body)


class TestShapes:
    def test_match_single_and_multi(self):
        assert Q.match(type__startswith="image/") == {
            "match": {"startswith": {"type": "image/"}}}
        assert Q.match(size__gte=10, width__lt=100) == {
            "match": {"and_": [
                {"gte": {"size": 10}}, {"lt": {"width": 100}}]}}
        assert Q.match(type__in=["image/png", "image/jpeg"]) == {
            "match": {"in_": {"type": ["image/png", "image/jpeg"]}}}
        with pytest.raises(ValueError):
            Q.match(size=10)  # missing __op
        with pytest.raises(ValueError):
            Q.match()

    def test_combinators_flatten(self):
        a, b, c = (Q.match(size__gte=1), Q.match(size__gte=2),
                   Q.match(size__gte=3))
        assert (a & b & c) == {"and_": [dict(a), dict(b), dict(c)]}
        assert (a | b | c) == {"or_": [dict(a), dict(b), dict(c)]}
        assert ~a == {"not_": dict(a)}
        assert ~~a == dict(a)  # double negation unwraps
        mixed = (a | b) & c
        assert mixed == {"and_": [{"or_": [dict(a), dict(b)]}, dict(c)]}
        parses({"query": mixed})

    def test_semantic_and_raw_vector(self):
        f = Q.image("a red bike", model="clip/tiny")
        assert f == {"image_embeddings": {
            "query": "a red bike", "model": "clip/tiny"}}
        raw = Q.text_embed("QkFTRTY0", model="st/x", embed=None,
                           index="quant")
        assert raw == {"text_embeddings": {
            "query": "QkFTRTY0", "model": "st/x", "embed": None,
            "index": "quant"}}
        parses({"query": raw})

    def test_fts_quoting_convention(self):
        assert Q.path("/media/a b")["match_path"]["match"] == '"/media/a b"'
        assert Q.text("tok", raw_fts5=True)["match_text"]["match"] == "tok"
        esc = Q.text("a+b", raw_fts5=False)["match_text"]
        assert esc["match"] == "a+b" and esc["raw_fts5_match"] is False
        parses({"query": Q.text("hello", setters=["ocr"],
                                min_confidence=0.5)})

    def test_every_leaf_parses(self):
        leaves = [
            Q.image("x", model="m"),
            Q.text_embed("x", model="m"),
            Q.similar("0" * 64, model="m"),
            Q.match(size__gte=1),
            Q.path("p"),
            Q.text("t"),
            Q.tags("cat", "dog", match_any=False, min_confidence=0.4),
            Q.in_bookmarks(user="alice", namespaces=["favs"]),
            Q.in_pinboard(3, 4, user="alice"),
            Q.processed_by("clip"),
            Q.has_unprocessed("clip"),
            Q.failed_for("clip"),
        ]
        for leaf in leaves:
            parses({"query": leaf})

    def test_bare_string_filters(self):
        assert Q.processed_by("clip") == {"processed_by": "clip"}
        assert Q.failed_for("clip") == {"failed_for": "clip"}
        assert Q.has_unprocessed("clip") == {
            "has_data_unprocessed": {"setter_name": "clip"}}

    def test_ranked_and_rrf(self):
        r = Q.image("x", model="m").ranked(priority=5, row_n=True,
                                           rrf={"k": 60, "weight": 1.0})
        assert r["order_by"] is True and r["priority"] == 5
        assert r["rrf"] == {"k": 60, "weight": 1.0}
        fused = Q.rrf(Q.image("x", model="a"), Q.text_embed("x", model="b"),
                      k=61, weights=(1.0, 0.5))
        assert [e["rrf"]["weight"] for e in fused["and_"]] == [1.0, 0.5]
        assert all(e["rrf"]["k"] == 61 for e in fused["and_"])
        parses({"query": fused})
        with pytest.raises(ValueError):
            Q.rrf(Q.image("x", model="a"))  # needs ≥2
        with pytest.raises(ValueError):
            (Q.image("x", model="a") & Q.image("y", model="b")).ranked()

    def test_body(self):
        b = Q.body(Q.match(size__gte=1), page=2, page_size=40,
                   order_by=[Q.order("random")], seed=9,
                   select=["sha256", "path"])
        q = parses(b)
        assert q.page == 2 and q.page_size == 40 and q.seed == 9
        assert q.order_by[0].order_by == "random"
        assert q.select == ["sha256", "path"]


class TestExecutionEquivalence:
    def test_built_equals_handwritten(self):
        """An RRF fusion built with Q executes identically to the same
        payload written by hand (the shape the UI/e2e bench send)."""
        from test_fused_path import b64, build_executor

        ex, _ = build_executor(n_items=300, dim=16, seed=5)
        rng = np.random.default_rng(1)
        v1 = rng.standard_normal(16).astype(np.float32)
        v2 = rng.standard_normal(16).astype(np.float32)

        built = Q.body(
            Q.rrf(
                Q.image(b64(v1), model="m", embed=None, index="quant"),
                Q.image(b64(v2), model="m2", embed=None, index="quant"),
                k=60,
            ) & Q.match(type__startswith="image/"),
            page_size=10,
        )
        entries = [
            {"image_embeddings": {"query": b64(v1), "model": "m",
                                  "embed": None, "index": "quant"},
             "order_by": True, "row_n": True, "priority": 5,
             "rrf": {"k": 60, "weight": 1.0}},
            {"image_embeddings": {"query": b64(v2), "model": "m2",
                                  "embed": None, "index": "quant"},
             "order_by": True, "row_n": True, "priority": 5,
             "rrf": {"k": 60, "weight": 1.0}},
        ]
        # `&` flattens adjacent and_ nodes (AND is associative and the
        # entry SEQUENCE — which sets rank scoping — is preserved).
        hand = {
            "query": {"and_": entries + [
                {"match": {"startswith": {"type": "image/"}}}]},
            "page": 1, "page_size": 10, "entity": "file", "count": True,
            "results": True, "check_path": False, "cache": True,
        }
        assert built == hand
        nested = dict(hand)
        nested["query"] = {"and_": [
            {"and_": entries},
            {"match": {"startswith": {"type": "image/"}}}]}
        a = ex.execute(pql.PqlQuery.from_json(built))
        b = ex.execute(pql.PqlQuery.from_json(nested))
        assert a.count == b.count and a.count > 0
        assert [r["file_id"] for r in a.results] == [
            r["file_id"] for r in b.results]


class TestWireFieldRegressions:
    def test_distance_aggregation_reaches_parser(self):
        q = parses({"query": Q.image(
            "x", model="m", distance_aggregation="MAX")})
        assert q.query.image_embeddings.distance_aggregation == "MAX"
        q = parses({"query": Q.text_embed(
            "x", model="m", distance_aggregation="AVG")})
        assert q.query.text_embeddings.distance_aggregation == "AVG"
        q = parses({"query": Q.similar(
            "0" * 64, model="m", distance_function="COSINE",
            distance_aggregation="MIN")})
        assert q.query.similar_to.distance_function == "COSINE"
        assert q.query.similar_to.distance_aggregation == "MIN"

    def test_order_direction_reaches_parser(self):
        q = parses(Q.body(order_by=[Q.order("size", direction="desc")]))
        assert q.order_by[0].order_by == "size"
        assert q.order_by[0].order == "desc"

    def test_reflected_combinators_on_plain_dicts(self):
        plain = {"processed_by": "clip"}
        f = Q.match(size__gte=1)
        assert (plain | f) == {"or_": [plain, dict(f)]}
        assert (plain & f) == {"and_": [plain, dict(f)]}
        # PEP-584 dict merge must NOT silently fuse two filters.
        assert "match" not in (plain | f)
