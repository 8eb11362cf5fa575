"""Exact fp32 scorer tests: parity with a NumPy brute force, padding
hygiene, tiebreaks, aggregation semantics (reference: filters/exact.rs)."""

import numpy as np
import pytest

from panoptikon_tpu.ops import exact


def np_cosine(corpus, q):
    dots = corpus @ q
    return 1.0 - dots / (np.linalg.norm(corpus, axis=1) * np.linalg.norm(q) + 1e-30)


def np_l2(corpus, q):
    return np.linalg.norm(corpus - q[None, :], axis=1)


@pytest.fixture
def small_index():
    rng = np.random.default_rng(0)
    n, d = 200, 32
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    group_ids = np.arange(n, dtype=np.int32)  # one row per item
    return corpus, group_ids


class TestDistances:
    @pytest.mark.parametrize("distance,ref", [("cosine", np_cosine), ("l2", np_l2)])
    def test_matches_numpy(self, small_index, distance, ref):
        corpus, _ = small_index
        q = np.random.default_rng(1).normal(size=32).astype(np.float32)
        got = np.asarray(exact.pairwise_distance(corpus, q[None, :], distance))[0]
        np.testing.assert_allclose(got, ref(corpus, q), atol=1e-4)


class TestAggregation:
    def test_min_max_avg(self):
        dists = np.array([3.0, 1.0, 2.0, 5.0], dtype=np.float32)
        gids = np.array([0, 0, 1, 1], dtype=np.int32)
        for agg, expected in [("min", [1.0, 2.0]), ("max", [3.0, 5.0]), ("avg", [2.0, 3.5])]:
            out, valid = exact.aggregate_rows(dists, gids, 2, agg)
            np.testing.assert_allclose(np.asarray(out), expected)
            assert np.asarray(valid).all()

    def test_confidence_weighted_overrides_aggregation(self):
        # SUM(d·w)/SUM(w); the plain aggregation choice is ignored.
        dists = np.array([1.0, 3.0], dtype=np.float32)
        gids = np.array([0, 0], dtype=np.int32)
        w = np.array([3.0, 1.0], dtype=np.float32)
        out, _ = exact.aggregate_rows(dists, gids, 1, "max", weights=w)
        np.testing.assert_allclose(np.asarray(out), [(1 * 3 + 3 * 1) / 4.0])

    def test_empty_group_invalid(self):
        dists = np.array([1.0], dtype=np.float32)
        out, valid = exact.aggregate_rows(
            dists, np.array([0], dtype=np.int32), 3, "min"
        )
        assert np.asarray(valid).tolist() == [True, False, False]
        assert np.isinf(np.asarray(out)[1:]).all()

    def test_invalid_rows_never_contribute(self):
        dists = np.array([9.0, 1.0], dtype=np.float32)
        row_valid = np.array([True, False])
        out, valid = exact.aggregate_rows(
            dists, np.array([0, 0], dtype=np.int32), 1, "min", row_valid=row_valid
        )
        assert np.asarray(out)[0] == 9.0


class TestTopK:
    def test_ascending_with_ties_prefers_lower_index(self):
        vals = np.array([2.0, 1.0, 1.0, 3.0], dtype=np.float32)
        valid = np.ones(4, dtype=bool)
        _, idx, _ = exact.topk_ascending(vals, valid, 3)
        assert np.asarray(idx).tolist() == [1, 2, 0]

    def test_underfull_marks_invalid_tail(self):
        vals = np.array([1.0, 2.0], dtype=np.float32)
        valid = np.array([True, False])
        top, idx, tvalid = exact.topk_ascending(vals, valid, 2)
        assert np.asarray(tvalid).tolist() == [True, False]
        assert np.asarray(idx)[0] == 0


class TestExactSearch:
    def test_end_to_end_matches_numpy(self, small_index):
        corpus, gids = small_index
        n = corpus.shape[0]
        rng = np.random.default_rng(3)
        queries = rng.normal(size=(4, 32)).astype(np.float32)
        dist, idx, valid = exact.exact_search(
            corpus,
            np.ones(n, dtype=bool),
            gids,
            queries,
            num_groups=n,
            k=10,
            distance="cosine",
        )
        for qi in range(4):
            ref = np_cosine(corpus, queries[qi])
            order = np.argsort(ref, kind="stable")[:10]
            np.testing.assert_array_equal(np.asarray(idx)[qi], order)
            np.testing.assert_allclose(np.asarray(dist)[qi], ref[order], atol=1e-4)
            assert np.asarray(valid)[qi].all()

    def test_padding_never_leaks(self, small_index):
        corpus, gids = small_index
        n = corpus.shape[0]
        # Pad corpus with rows whose distance would win if unmasked.
        q = np.random.default_rng(4).normal(size=32).astype(np.float32)
        pad = np.tile(q, (8, 1)).astype(np.float32)  # distance 0 to query
        corpus_p = np.concatenate([corpus, pad])
        gids_p = np.concatenate([gids, np.full(8, n - 1, dtype=np.int32)])
        row_valid = np.concatenate([np.ones(n, bool), np.zeros(8, bool)])
        dist, idx, valid = exact.exact_search(
            corpus_p,
            row_valid,
            gids_p,
            q[None, :],
            num_groups=n,
            k=5,
            distance="cosine",
        )
        ref = np_cosine(corpus, q)
        order = np.argsort(ref, kind="stable")[:5]
        np.testing.assert_array_equal(np.asarray(idx)[0], order)

    def test_multi_row_items_aggregate(self):
        # Two items, each with several rows (e.g. text chunks).
        rng = np.random.default_rng(5)
        corpus = rng.normal(size=(6, 8)).astype(np.float32)
        gids = np.array([0, 0, 0, 1, 1, 1], dtype=np.int32)
        q = rng.normal(size=8).astype(np.float32)
        dist, idx, valid = exact.exact_search(
            corpus,
            np.ones(6, bool),
            gids,
            q[None, :],
            num_groups=2,
            k=2,
            distance="l2",
            aggregation="min",
        )
        ref = np_l2(corpus, q)
        expected = [min(ref[:3]), min(ref[3:])]
        order = np.argsort(expected, kind="stable")
        np.testing.assert_array_equal(np.asarray(idx)[0], order)
        np.testing.assert_allclose(
            np.asarray(dist)[0], np.array(expected)[order], atol=1e-4
        )
