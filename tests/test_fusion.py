"""Device-side RRF fusion ops: candidate join vs full-surface oracle,
exactness bound, multi-space weighting."""

import numpy as np

import jax.numpy as jnp

from panoptikon_tpu.ops import fusion


def np_rrf_oracle(dists, valids, weights, rrf_k=60.0):
    """NumPy full-rank RRF totals over a shared id domain."""
    s, q, m = dists.shape
    totals = np.zeros((q, m))
    for si in range(s):
        for qi in range(q):
            masked = np.where(valids[si, qi], dists[si, qi], np.inf)
            order = np.argsort(masked, kind="stable")
            rank = np.empty(m)
            rank[order] = np.arange(m)
            contrib = weights[si] / (rrf_k + rank + 1.0)
            totals[qi] += np.where(valids[si, qi], contrib, 0.0)
    return totals


class TestFullSurface:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        s, q, m, k = 3, 4, 64, 8
        dists = rng.random((s, q, m)).astype(np.float32)
        valids = rng.random((s, q, m)) < 0.8
        weights = np.array([1.0, 0.5, 2.0], np.float32)
        tv, ti = fusion.rrf_fuse_full(
            jnp.asarray(dists), jnp.asarray(valids), jnp.asarray(weights), k=k
        )
        oracle = np_rrf_oracle(dists, valids, weights)
        oracle = np.where(valids.any(axis=0), oracle, -np.inf)
        exp_ids = np.argsort(-oracle, axis=1, kind="stable")[:, :k]
        ti = np.asarray(ti)
        for qi in range(q):
            np.testing.assert_allclose(
                np.asarray(tv)[qi], np.sort(oracle[qi])[::-1][:k], rtol=1e-5
            )
            # Ids may permute within exact ties; compare totals per id.
            got = {int(i): oracle[qi, i] for i in ti[qi]}
            want = {int(i): oracle[qi, i] for i in exp_ids[qi]}
            np.testing.assert_allclose(
                sorted(got.values()), sorted(want.values()), rtol=1e-5
            )


class TestCandidates:
    def test_candidate_fusion_matches_full_when_kk_covers(self):
        rng = np.random.default_rng(1)
        s, q, m, kk, k = 2, 3, 48, 48, 6
        dists = rng.random((s, q, m)).astype(np.float32)
        valids = np.ones((s, q, m), bool)
        weights = np.array([1.0, 1.0], np.float32)
        # Candidates = full rank lists (kk == m) → fusion must equal full.
        cand = np.argsort(dists, axis=2)[:, :, :kk].astype(np.int32)
        cv, ci = fusion.rrf_fuse_candidates(
            jnp.asarray(cand), jnp.asarray(weights), k=k
        )
        fv, fi = fusion.rrf_fuse_full(
            jnp.asarray(dists), jnp.asarray(valids), jnp.asarray(weights), k=k
        )
        np.testing.assert_allclose(np.asarray(cv), np.asarray(fv), rtol=1e-5)
        np.testing.assert_array_equal(
            np.sort(np.asarray(ci), axis=1), np.sort(np.asarray(fi), axis=1)
        )

    def test_exactness_bound_certifies_page(self):
        rng = np.random.default_rng(2)
        s, q, m, kk, k = 2, 2, 256, 32, 5
        dists = rng.random((s, q, m)).astype(np.float32)
        weights = np.array([1.0, 1.0], np.float32)
        cand = np.argsort(dists, axis=2)[:, :, :kk].astype(np.int32)
        cv, ci = fusion.rrf_fuse_candidates(
            jnp.asarray(cand), jnp.asarray(weights), k=k
        )
        bound = fusion.candidate_exactness_bound(weights, 60.0, kk)
        cv = np.asarray(cv)
        valids = np.ones((s, q, m), bool)
        oracle = np_rrf_oracle(dists, valids, weights)
        for qi in range(q):
            if cv[qi, -1] >= bound:
                # Certified: page ids == full-rank page ids.
                exp = set(np.argsort(-oracle[qi], kind="stable")[:k].tolist())
                assert set(np.asarray(ci)[qi].tolist()) == exp

    def test_invalid_slots_contribute_nothing(self):
        cand = np.full((1, 1, 8), 2**30, np.int32)
        cand[0, 0, 0] = 7
        cv, ci = fusion.rrf_fuse_candidates(
            jnp.asarray(cand), jnp.asarray(np.array([1.0], np.float32)), k=3
        )
        cv, ci = np.asarray(cv), np.asarray(ci)
        assert ci[0, 0] == 7 and np.isfinite(cv[0, 0])
        assert not np.isfinite(cv[0, 1:]).any()
