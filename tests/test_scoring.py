"""Streaming fused scorer tests: parity with the exact scorer, padding
hygiene, int8 path, grouped aggregation."""

import numpy as np
import pytest

from panoptikon_tpu.ops import codec, exact, scoring

CHUNK = 128


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    c = rng.normal(size=(512, 64)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return c


@pytest.fixture(scope="module")
def queries():
    rng = np.random.default_rng(8)
    q = rng.normal(size=(3, 64)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


class TestStreamingTopk:
    @pytest.mark.parametrize("distance", ["cosine", "l2"])
    def test_f32_matches_exact(self, corpus, queries, distance):
        n = corpus.shape[0]
        dist, idx, valid = scoring.streaming_topk(
            corpus,
            np.asarray(scoring.row_sumsq(corpus)),
            np.ones(n, bool),
            queries,
            k=10,
            distance=distance,
            chunk_rows=CHUNK,
        )
        e_dist, e_idx, _ = exact.exact_search(
            corpus,
            np.ones(n, bool),
            np.arange(n, dtype=np.int32),
            queries,
            num_groups=n,
            k=10,
            distance=distance,
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(e_idx))
        np.testing.assert_allclose(np.asarray(dist), np.asarray(e_dist), atol=1e-5)

    def test_int8_recall(self, corpus, queries):
        scale = codec.scale_from_absmax(codec.corpus_absmax(corpus))
        codes = codec.quantize_int8(corpus, scale)
        q_codes = codec.compute_query_quant(queries, scale)
        n = corpus.shape[0]
        dist, idx, _ = scoring.streaming_topk(
            codes,
            np.asarray(scoring.row_sumsq(codes)),
            np.ones(n, bool),
            q_codes,
            k=10,
            distance="cosine",
            chunk_rows=CHUNK,
        )
        _, e_idx, _ = exact.exact_search(
            corpus,
            np.ones(n, bool),
            np.arange(n, dtype=np.int32),
            queries,
            num_groups=n,
            k=10,
            distance="cosine",
        )
        for qi in range(queries.shape[0]):
            overlap = len(set(np.asarray(idx)[qi]) & set(np.asarray(e_idx)[qi]))
            assert overlap >= 9  # ≥90% overlap@10 on a 512-vector corpus

    def test_int8_l2_true_axis(self, corpus, queries):
        # L2 over codes is rescaled to the true distance axis.
        scale = codec.scale_from_absmax(codec.corpus_absmax(corpus))
        codes = codec.quantize_int8(corpus, scale)
        q_codes = codec.compute_query_quant(queries, scale)
        n = corpus.shape[0]
        dist, idx, _ = scoring.streaming_topk(
            codes,
            np.asarray(scoring.row_sumsq(codes)),
            np.ones(n, bool),
            q_codes,
            k=5,
            distance="l2",
            scale=scale,
            chunk_rows=CHUNK,
        )
        top = np.asarray(idx)[0]
        true_d = np.linalg.norm(corpus[top] - queries[0][None, :], axis=1)
        np.testing.assert_allclose(np.asarray(dist)[0], true_d, atol=0.05)

    def test_padding_never_wins(self, corpus, queries):
        n = corpus.shape[0]
        padded = np.concatenate([corpus, np.tile(queries[0], (CHUNK, 1))])
        valid = np.concatenate([np.ones(n, bool), np.zeros(CHUNK, bool)])
        _, idx, _ = scoring.streaming_topk(
            padded,
            np.asarray(scoring.row_sumsq(padded)),
            valid,
            queries[:1],
            k=5,
            distance="cosine",
            chunk_rows=CHUNK,
        )
        assert (np.asarray(idx)[0] < n).all()

    def test_tiebreak_lowest_row_across_chunks(self):
        # Identical vectors in different chunks: lower row index wins.
        v = np.ones((256, 8), dtype=np.float32)
        q = np.ones((1, 8), dtype=np.float32)
        _, idx, _ = scoring.streaming_topk(
            v,
            np.asarray(scoring.row_sumsq(v)),
            np.ones(256, bool),
            q,
            k=4,
            distance="cosine",
            chunk_rows=64,
        )
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3])


class TestRescoredPath:
    def test_rescored_matches_exact_membership(self, corpus, queries):
        scale = codec.scale_from_absmax(codec.corpus_absmax(corpus))
        codes = codec.quantize_int8(corpus, scale)
        q_codes = codec.compute_query_quant(queries, scale)
        n = corpus.shape[0]
        dist, idx, valid = scoring.int8_topk_rescored(
            codes,
            np.asarray(scoring.row_sumsq(codes)),
            np.ones(n, bool),
            corpus,
            q_codes,
            queries,
            k=10,
            oversample=8,
            distance="cosine",
            scale=scale,
        )
        _, e_idx, _ = exact.exact_search(
            corpus, np.ones(n, bool), np.arange(n, dtype=np.int32), queries,
            num_groups=n, k=10, distance="cosine",
        )
        # Rescoring re-ranks candidates at full precision: near-perfect
        # agreement with exact on a 512-vector corpus.
        for qi in range(queries.shape[0]):
            overlap = len(set(np.asarray(idx)[qi]) & set(np.asarray(e_idx)[qi]))
            assert overlap == 10
        # Values are true f32 distances (rescored), not code-space.
        ref = 1.0 - corpus @ queries[0] / (
            np.linalg.norm(corpus, axis=1) * np.linalg.norm(queries[0])
        )
        np.testing.assert_allclose(
            np.asarray(dist)[0], np.sort(ref)[:10], atol=1e-4
        )

    def test_rescored_padding_masked(self, corpus, queries):
        n = corpus.shape[0]
        scale = codec.scale_from_absmax(codec.corpus_absmax(corpus))
        codes = codec.quantize_int8(corpus, scale)
        valid = np.ones(n, bool)
        valid[100:] = False
        _, idx, _ = scoring.int8_topk_rescored(
            codes,
            np.asarray(scoring.row_sumsq(codes)),
            valid,
            corpus,
            codec.compute_query_quant(queries[:1], scale),
            queries[:1],
            k=10,
            distance="cosine",
            scale=scale,
        )
        assert (np.asarray(idx)[0] < 100).all()


class TestStreamingGrouped:
    @pytest.mark.parametrize("agg", ["min", "max", "avg"])
    def test_matches_exact_aggregation(self, corpus, queries, agg):
        n = corpus.shape[0]
        gids = (np.arange(n) // 4).astype(np.int32)  # 4 rows per item
        m = n // 4
        dist, idx, valid = scoring.streaming_grouped_topk(
            corpus,
            np.asarray(scoring.row_sumsq(corpus)),
            np.ones(n, bool),
            gids,
            queries,
            num_groups=m,
            k=8,
            distance="cosine",
            aggregation=agg,
            chunk_rows=CHUNK,
        )
        e_dist, e_idx, _ = exact.exact_search(
            corpus,
            np.ones(n, bool),
            gids,
            queries,
            num_groups=m,
            k=8,
            distance="cosine",
            aggregation=agg,
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(e_idx))
        np.testing.assert_allclose(np.asarray(dist), np.asarray(e_dist), atol=1e-5)

    def test_weighted_matches_exact(self, corpus, queries):
        n = corpus.shape[0]
        gids = (np.arange(n) // 8).astype(np.int32)
        m = n // 8
        w = np.random.default_rng(9).uniform(0.1, 1.0, size=n).astype(np.float32)
        dist, idx, _ = scoring.streaming_grouped_topk(
            corpus,
            np.asarray(scoring.row_sumsq(corpus)),
            np.ones(n, bool),
            gids,
            queries,
            num_groups=m,
            k=6,
            distance="cosine",
            aggregation="min",
            chunk_rows=CHUNK,
            weighted=True,
            weights=w,
        )
        e_dist, e_idx, _ = exact.exact_search(
            corpus,
            np.ones(n, bool),
            gids,
            queries,
            num_groups=m,
            k=6,
            distance="cosine",
            weights=w,
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(e_idx))
        np.testing.assert_allclose(np.asarray(dist), np.asarray(e_dist), atol=1e-4)

    def test_groups_spanning_chunks(self):
        # A group whose rows land in different chunks must still aggregate.
        rng = np.random.default_rng(10)
        corpus = rng.normal(size=(256, 16)).astype(np.float32)
        gids = np.zeros(256, dtype=np.int32)
        gids[1:] = np.arange(1, 256) // 2  # group 0 has rows 0,1; etc.
        # Put one row of group 5 in chunk 0 and force another at row 200.
        gids[200] = 5
        q = rng.normal(size=(1, 16)).astype(np.float32)
        dist, idx, _ = scoring.streaming_grouped_topk(
            corpus,
            np.asarray(scoring.row_sumsq(corpus)),
            np.ones(256, bool),
            gids,
            q,
            num_groups=128,
            k=128,
            distance="l2",
            aggregation="avg",
            chunk_rows=64,
        )
        e_dist, e_idx, _ = exact.exact_search(
            corpus,
            np.ones(256, bool),
            gids,
            q,
            num_groups=128,
            k=128,
            distance="l2",
            aggregation="avg",
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(e_idx))
        np.testing.assert_allclose(np.asarray(dist), np.asarray(e_dist), atol=1e-4)
