"""Pallas fused scan kernel: interpreter-mode parity with the streaming
scorer (the kernel runs compiled on TPU; CPU CI uses interpret=True)."""

import numpy as np
import pytest

from panoptikon_tpu.ops import codec, scoring
from panoptikon_tpu.ops.pallas_scan import pallas_int8_topk


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, d = 1024, 64
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    scale = codec.scale_from_absmax(codec.corpus_absmax(corpus))
    codes = codec.quantize_int8(corpus, scale)
    queries = rng.normal(size=(8, d)).astype(np.float32)
    q_codes = codec.compute_query_quant(queries, scale)
    sumsq = np.asarray(scoring.row_sumsq(codes))
    return codes, sumsq, q_codes


def test_matches_streaming_scorer(setup):
    codes, sumsq, q_codes = setup
    n = codes.shape[0]
    valid = np.ones(n, bool)
    pv, pi, pvalid = pallas_int8_topk(
        codes, sumsq, valid, q_codes, k=10, tile_n=256, interpret=True
    )
    sv, si, _ = scoring.streaming_topk(
        codes, sumsq, valid, q_codes, k=10, distance="cosine", chunk_rows=256
    )
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(si))
    np.testing.assert_allclose(np.asarray(pv), np.asarray(sv), atol=1e-5)
    assert np.asarray(pvalid).all()


def test_masked_rows_never_win(setup):
    codes, sumsq, q_codes = setup
    n = codes.shape[0]
    valid = np.ones(n, bool)
    valid[256:] = False
    _, pi, _ = pallas_int8_topk(
        codes, sumsq, valid, q_codes, k=10, tile_n=256, interpret=True
    )
    assert (np.asarray(pi) < 256).all()


def test_cross_tile_tiebreak(setup):
    # Identical rows in different tiles: lowest global row index wins.
    d = 64
    row = np.full((1, d), 64, dtype=np.int8)
    codes = np.tile(row, (512, 1))
    sumsq = np.asarray(scoring.row_sumsq(codes))
    q = row.copy()
    _, pi, _ = pallas_int8_topk(
        codes, sumsq, np.ones(512, bool), q, k=4, tile_n=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(pi)[0], [0, 1, 2, 3])


class TestV2:
    def test_candidates_cover_exact_topk(self, setup):
        """v2's lane-bucket approximation (the approx_min_k contract): two
        top rows sharing a (tile, lane) keep only the better one. The
        exact TOP-1 always survives — it wins its own lane — and overall
        coverage must be near-total even at this adversarially tiny tile
        size (2 rows per lane bucket vs 16 in production)."""
        from panoptikon_tpu.ops.pallas_scan import pallas_int8_topk_v2

        codes, sumsq, q_codes = setup
        n = codes.shape[0]
        valid = np.ones(n, bool)
        cv, ci, cvalid = pallas_int8_topk_v2(
            codes, sumsq, valid, q_codes, k=64, k_tile=8, tile_n=256,
            q_block=8, interpret=True,
        )
        sv, si, _ = scoring.streaming_topk(
            codes, sumsq, valid, q_codes, k=10, distance="cosine",
            chunk_rows=256,
        )
        ci, si = np.asarray(ci), np.asarray(si)
        covered = 0
        for qi in range(si.shape[0]):
            assert si[qi][0] in set(ci[qi]), f"query {qi} lost its top-1"
            covered += len(set(si[qi]) & set(ci[qi]))
        assert covered >= 0.95 * si.size, f"coverage {covered}/{si.size}"

    def test_masked_rows_never_win(self, setup):
        from panoptikon_tpu.ops.pallas_scan import pallas_int8_topk_v2

        codes, sumsq, q_codes = setup
        n = codes.shape[0]
        valid = np.ones(n, bool)
        valid[256:] = False
        _, ci, cval = pallas_int8_topk_v2(
            codes, sumsq, valid, q_codes, k=64, k_tile=8, tile_n=256,
            q_block=8, interpret=True,
        )
        ci = np.asarray(ci)[np.asarray(cval)]
        assert (ci < 256).all()

    def test_q_blocking_matches_single_block(self, setup):
        from panoptikon_tpu.ops.pallas_scan import pallas_int8_topk_v2

        codes, sumsq, q_codes = setup
        n = codes.shape[0]
        valid = np.ones(n, bool)
        a = pallas_int8_topk_v2(
            codes, sumsq, valid, q_codes, k=16, k_tile=4, tile_n=256,
            q_block=8, interpret=True,
        )
        b = pallas_int8_topk_v2(
            codes, sumsq, valid, q_codes, k=16, k_tile=4, tile_n=256,
            q_block=4, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-6)
