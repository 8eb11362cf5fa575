"""PQL AST parse tests — wire-format parity with pql/model.rs."""

import pytest

from panoptikon_tpu.pql import model as pql


class TestTopLevel:
    def test_defaults(self):
        q = pql.PqlQuery.from_json({})
        assert q.page == 1 and q.page_size == 10
        assert q.entity == "file" and q.count and q.results and q.cache
        assert q.select == ["sha256", "path", "last_modified", "type"]
        assert q.order_by[0].order_by == "last_modified"

    def test_text_columns_require_text_entity(self):
        with pytest.raises(pql.PqlError, match="entity 'text'"):
            pql.PqlQuery.from_json({"select": ["text"]})
        q = pql.PqlQuery.from_json({"select": ["text"], "entity": "text"})
        assert q.select == ["text"]

    def test_seed_minting(self):
        q = pql.PqlQuery.from_json({"order_by": [{"order_by": "random"}]})
        seed, synthesized = q.resolve_seed()
        assert synthesized and 0 <= seed < pql.MAX_SYNTHESIZED_SEED
        # Caller-supplied seed is left alone.
        q2 = pql.PqlQuery.from_json(
            {"order_by": [{"order_by": "random"}], "seed": 42}
        )
        assert q2.resolve_seed() == (42, False)
        # Non-random queries never mint.
        q3 = pql.PqlQuery.from_json({})
        assert q3.resolve_seed() == (None, False)

    def test_unknown_order_field_rejected(self):
        with pytest.raises(pql.PqlError):
            pql.PqlQuery.from_json({"order_by": [{"order_by": "bogus"}]})


class TestOperators:
    def test_and_or_not_with_aliases(self):
        q = pql.PqlQuery.from_json(
            {
                "query": {
                    "and": [
                        {"or_": [{"processed_by": "clip"}, {"failed_for": "ocr"}]},
                        {"not": {"in_bookmarks": {"filter": True}}},
                    ]
                }
            }
        )
        assert isinstance(q.query, pql.AndOperator)
        assert isinstance(q.query.and_[0], pql.OrOperator)
        assert isinstance(q.query.and_[1], pql.NotOperator)

    def test_filter_count(self):
        q = pql.PqlQuery.from_json(
            {"query": {"and_": [{"processed_by": "a"}, {"processed_by": "b"}]}}
        )
        assert len(list(pql.walk_filters(q.query))) == 2


class TestMatchFilter:
    def test_ops(self):
        el = pql.parse_query_element(
            {"match": {"eq": {"type": "image/png"}, "gt": {"size": 1000}}}
        )
        assert isinstance(el, pql.MatchFilter)
        assert el.match_.ops["eq"] == {"type": "image/png"}
        assert el.match_.ops["gt"] == {"size": 1000}

    def test_list_ops_coerce(self):
        el = pql.parse_query_element({"match": {"in_": {"type": ["a", "b"]}}})
        assert el.match_.ops["in_"] == {"type": ["a", "b"]}
        el = pql.parse_query_element({"match": {"startswith": {"path": "/x"}}})
        assert el.match_.ops["startswith"] == {"path": ["/x"]}

    def test_nested_tree(self):
        el = pql.parse_query_element(
            {
                "match": {
                    "and_": [
                        {"eq": {"type": "video/mp4"}},
                        {"not_": {"lt": {"size": 100}}},
                    ]
                }
            }
        )
        assert isinstance(el.match_, pql.MatchAnd)
        assert isinstance(el.match_.and_[1], pql.MatchNot)

    def test_unknown_column_rejected(self):
        with pytest.raises(pql.PqlError, match="unknown match column"):
            pql.parse_query_element({"match": {"eq": {"nope": 1}}})

    def test_match_rejects_extra_keys(self):
        # The bare-match filter must not swallow operator trees.
        with pytest.raises(pql.PqlError):
            pql.parse_query_element({"match": {"eq": {"size": 1}}, "rogue": 1})


class TestVectorFilters:
    def test_semantic_image_defaults(self):
        el = pql.parse_query_element(
            {"image_embeddings": {"query": "a cat", "model": "clip-b32"}}
        )
        assert isinstance(el, pql.SemanticImageSearch)
        # Vector filters order by distance ascending by default.
        assert el.sort.order_by and el.sort.direction == "asc"
        assert el.image_embeddings.distance_aggregation == "MIN"
        assert el.image_embeddings.index == "auto"
        assert el.image_embeddings.embed is not None  # embed-by-default

    def test_embed_null_disables(self):
        el = pql.parse_query_element(
            {"image_embeddings": {"query": "QmFzZTY0", "model": "m", "embed": None}}
        )
        assert el.image_embeddings.embed is None

    def test_similar_to_defaults(self):
        el = pql.parse_query_element(
            {"similar_to": {"target": "ab" * 32, "model": "clip"}}
        )
        assert el.similar_to.distance_aggregation == "AVG"
        assert el.similar_to.distance_function == "L2"
        assert el.similar_to.xmodal_t2t and el.similar_to.xmodal_i2i

    def test_sort_overrides(self):
        el = pql.parse_query_element(
            {
                "text_embeddings": {"query": "x", "model": "m"},
                "order_by": False,
                "priority": 3,
                "rrf": {"k": 60, "weight": 2.0},
            }
        )
        assert not el.sort.order_by and el.sort.priority == 3
        assert el.sort.rrf.k == 60 and el.sort.rrf.weight == 2.0


class TestTextAndTags:
    def test_match_text_default_sort_desc(self):
        el = pql.parse_query_element({"match_text": {"match": "hello world"}})
        assert el.sort.direction == "desc"
        assert el.match_text.raw_fts5_match

    def test_match_tags(self):
        el = pql.parse_query_element(
            {"match_tags": {"tags": ["cat", "dog"], "match_any": True,
                            "min_confidence": 0.5}}
        )
        assert el.match_tags.match_any and el.match_tags.min_confidence == 0.5


class TestPruning:
    def test_empty_filters_pruned(self):
        q = pql.PqlQuery.from_json(
            {
                "query": {
                    "and_": [
                        {"match": {}},
                        {"match_tags": {"tags": []}},
                        {"processed_by": "keep"},
                    ]
                }
            }
        )
        pruned = pql.prune_empty(q.query)
        assert isinstance(pruned, pql.ProcessedBy)

    def test_all_empty_yields_none(self):
        q = pql.PqlQuery.from_json({"query": {"or_": [{"match": {}}]}})
        assert pql.prune_empty(q.query) is None

    def test_match_text_empty_skipped_unless_filter_only(self):
        assert pql.prune_empty(
            pql.parse_query_element({"match_text": {"match": ""}})
        ) is None
        kept = pql.prune_empty(
            pql.parse_query_element(
                {"match_text": {"match": "", "filter_only": True,
                                "min_confidence": 0.9}}
            )
        )
        assert kept is not None
