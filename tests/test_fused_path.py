"""Fused candidate page path vs the full-readback path: exact equivalence.

The fused path (pql/fused.py) must reproduce the full executor's results
bit-for-bit — same page rows in the same order, same counts, same
select_as extras — including under quant-arm value ties and with candidate
lists much smaller than the corpus (the boundary/uncertainty proof logic).
Every test runs the SAME query with enable_fused on and off and asserts
identical output.
"""

import types

import numpy as np
import pytest

import panoptikon_tpu.pql.fused as fused
from panoptikon_tpu.db.epochs import EPOCHS
from panoptikon_tpu.index.vector_index import VectorIndex
from panoptikon_tpu.pql import model as pql
from panoptikon_tpu.pql.executor import BaseSnapshot, Executor
from panoptikon_tpu.utils import npy


def b64(vec):
    import base64

    return base64.standard_b64encode(
        npy.serialize_npy(np.asarray(vec, np.float32))
    ).decode()


def build_executor(n_items=4000, dim=32, seed=0, multi_file_every=7,
                   multi_row_every=11, quant=True):
    """Executor over a real VectorIndex + synthetic base snapshot.

    Some items own two files (membership expansion), some items own two
    embedding rows (grouped aggregation).
    """
    rng = np.random.default_rng(seed)
    # Base rows: item i gets 1 file, every `multi_file_every`-th gets 2.
    item_of_row = []
    for i in range(1, n_items + 1):
        item_of_row.append(i)
        if i % multi_file_every == 0:
            item_of_row.append(i)
    n = len(item_of_row)
    item_col = np.asarray(item_of_row, dtype=np.int64)
    file_col = np.arange(1, n + 1, dtype=np.int64)
    columns = {
        "file_id": file_col,
        "item_id": item_col,
        "sha256": np.array([f"{i:064x}" for i in range(n)], dtype=object),
        "path": np.array([f"/m/{i % 13}/f{i}.png" for i in range(n)], dtype=object),
        "filename": np.array([f"f{i}.png" for i in range(n)], dtype=object),
        "last_modified": np.array(
            [f"2026-01-{1 + (i % 28):02d}T00:00:00" for i in range(n)],
            dtype=object,
        ),
        "md5": np.full(n, "0" * 32, dtype=object),
        "type": np.where(
            rng.random(n) < 0.5, "image/png", "video/mp4"
        ).astype(object),
        "size": rng.integers(100, 10_000, n).astype(np.float64),
        "width": rng.integers(100, 4000, n).astype(np.float64),
        "height": np.full(n, 480.0),
        "duration": np.full(n, np.nan),
        "audio_tracks": np.zeros(n),
        "video_tracks": np.zeros(n),
        "subtitle_tracks": np.zeros(n),
        "blurhash": np.full(n, "", dtype=object),
        "time_added": np.full(n, "2026-01-01T00:00:00", dtype=object),
    }
    index = VectorIndex(chunk_rows=1024)
    # Space "m": every item embedded; every multi_row_every-th item gets a
    # second row (multi-row aggregation). Space "m2": half the items.
    for space, keep in (("m", None), ("m2", 2)):
        items, rows, vecs = [], [], []
        rid = 1
        for i in range(1, n_items + 1):
            if keep and i % keep == 0:
                continue
            v = rng.normal(size=dim).astype(np.float32)
            v /= np.linalg.norm(v)
            items.append(i)
            rows.append(rid)
            rid += 1
            vecs.append(v)
            if i % multi_row_every == 0:
                v2 = rng.normal(size=dim).astype(np.float32)
                v2 /= np.linalg.norm(v2)
                items.append(i)
                rows.append(rid)
                rid += 1
                vecs.append(v2)
        index.add(space, np.array(items), np.array(rows), np.stack(vecs))
        if quant:
            index.build_quant(space)
    db = types.SimpleNamespace(name="fusedtest")
    ex = Executor(db, index, manager=None)
    snap = BaseSnapshot(
        entity="file", epoch=EPOCHS.index_epoch("fusedtest"),
        columns=columns, n=n,
    )
    ex._base_cache["file"] = snap
    return ex, rng


def run_both(ex, payload, expect_fused=True, allow_materialize=False):
    """Execute with fused on/off; assert the fused path engaged (or not)
    and that results are identical."""
    calls = {"n": 0, "mat": 0}
    orig = ex._deferred_surface
    orig_batched = ex._scan_surface_batched
    orig_mat = ex._materialize_deferred

    def counting(d, **kw):
        calls["n"] += 1
        return orig(d, **kw)

    def counting_batched(d, qs):
        # The coalesced int8 path runs the same program without touching
        # _deferred_surface; it counts as the fused path engaging.
        calls["n"] += 1
        return orig_batched(d, qs)

    def counting_mat(*a, **kw):
        calls["mat"] += 1
        return orig_mat(*a, **kw)

    ex._deferred_surface = counting
    ex._scan_surface_batched = counting_batched
    ex._materialize_deferred = counting_mat
    ex.enable_fused = True
    r_fused = ex.execute(pql.PqlQuery.from_json(payload))
    ex._deferred_surface = orig
    ex._scan_surface_batched = orig_batched
    ex._materialize_deferred = orig_mat
    ex.enable_fused = False
    r_full = ex.execute(pql.PqlQuery.from_json(payload))
    ex.enable_fused = True
    if expect_fused:
        assert calls["n"] > 0, "fused path did not engage"
        if not allow_materialize:
            assert calls["mat"] == 0, (
                "fused page fell back to full materialization"
            )
    assert r_fused.count == r_full.count
    assert [r["file_id"] for r in r_fused.results] == [
        r["file_id"] for r in r_full.results
    ]
    # extras (select_as ranks/distances) must agree where present
    for a, b in zip(r_fused.results, r_full.results):
        ea, eb = a.get("extra", {}), b.get("extra", {})
        assert set(ea) == set(eb)
        for k in ea:
            if isinstance(ea[k], float):
                np.testing.assert_allclose(ea[k], eb[k], rtol=0, atol=0)
            else:
                assert ea[k] == eb[k]
    return r_fused, r_full


def q_of(rng, dim=32):
    v = rng.normal(size=dim).astype(np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def small_kk():
    """Candidate lists far smaller than the corpus: the boundary /
    uncertainty proof logic must carry every page."""
    old = fused.KK_BUCKETS
    fused.KK_BUCKETS = (64, 512)
    yield
    fused.KK_BUCKETS = old


@pytest.fixture(scope="module")
def ex_rng():
    return build_executor()


class TestSingleSpace:
    def test_exact_page(self, ex_rng, small_kk):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}},
            "page_size": 10,
        }
        r_fused, _ = run_both(ex, payload)
        assert len(r_fused.results) == 10

    def test_quant_arm_ties(self, ex_rng, small_kk):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "quant"}},
            "page_size": 25,
            "page": 3,
        }
        run_both(ex, payload)

    def test_deep_page(self, ex_rng, small_kk):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}},
            "page_size": 100,
            "page": 4,
        }
        run_both(ex, payload)

    def test_desc_direction(self, ex_rng, small_kk):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}, "direction": "desc"},
            "page_size": 10,
        }
        run_both(ex, payload)

    def test_select_as(self, ex_rng, small_kk):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}, "select_as": "dist"},
            "page_size": 10,
        }
        r_fused, _ = run_both(ex, payload)
        assert all(
            isinstance(r["extra"]["dist"], float) for r in r_fused.results
        )

    def test_count_only_no_device(self, ex_rng):
        ex, rng = ex_rng
        calls = {"n": 0}
        orig_c = ex._deferred_candidates
        orig_s = ex._space_scores
        ex._deferred_candidates = lambda *a, **k: calls.update(
            n=calls["n"] + 1) or orig_c(*a, **k)
        ex._space_scores = lambda *a, **k: calls.update(
            n=calls["n"] + 1) or orig_s(*a, **k)
        try:
            payload = {
                "query": {"text_embeddings": {
                    "query": b64(q_of(rng)), "model": "m", "embed": None,
                    "index": "exact"}},
                "results": False, "page_size": 10,
            }
            r = ex.execute(pql.PqlQuery.from_json(payload))
        finally:
            ex._deferred_candidates = orig_c
            ex._space_scores = orig_s
        assert calls["n"] == 0, "count-only query touched the device"
        ex.enable_fused = False
        r_full = ex.execute(pql.PqlQuery.from_json(payload))
        ex.enable_fused = True
        assert r.count == r_full.count


def rrf_payload(rng, models=("m", "m2"), index="exact", page=1,
                weights=(1.0, 0.5)):
    return {
        "query": {"and_": [
            {"text_embeddings": {"query": b64(q_of(rng)), "model": mdl,
                                 "embed": None, "index": index},
             "row_n": True, "priority": 5,
             "rrf": {"k": 60, "weight": w}}
            for mdl, w in zip(models, weights)
        ]},
        "page_size": 10, "page": page,
    }


class TestComposition:
    def test_rrf_multi_file_base_falls_back_exactly(self, ex_rng, small_kk):
        # Multi-file items shift row-grain ranks with ctx multiplicity —
        # the device rank join declines and the page comes from the full
        # materialized path, identically.
        ex, rng = ex_rng
        run_both(ex, rrf_payload(rng), allow_materialize=True)

    def test_rrf_quant_multi_file(self, ex_rng, small_kk):
        ex, rng = ex_rng
        run_both(
            ex, rrf_payload(rng, models=("m", "m"), index="quant", page=2),
            allow_materialize=True,
        )

    def test_coalesce_min_or(self, ex_rng, small_kk):
        ex, rng = ex_rng
        payload = {
            "query": {"or_": [
                {"text_embeddings": {"query": b64(q_of(rng)), "model": "m",
                                     "embed": None, "index": "exact"},
                 "priority": 5},
                {"text_embeddings": {"query": b64(q_of(rng)), "model": "m2",
                                     "embed": None, "index": "exact"},
                 "priority": 5},
            ]},
            "page_size": 12,
        }
        run_both(ex, payload)

    def test_meta_and_semantic(self, ex_rng, small_kk):
        ex, rng = ex_rng
        payload = {
            "query": {"and_": [
                {"match": {"eq": {"type": "image/png"}}},
                {"text_embeddings": {"query": b64(q_of(rng)), "model": "m",
                                     "embed": None, "index": "exact"}},
            ]},
            "page_size": 10,
        }
        run_both(ex, payload)

    def test_semantic_then_meta(self, ex_rng, small_kk):
        ex, rng = ex_rng
        payload = {
            "query": {"and_": [
                {"text_embeddings": {"query": b64(q_of(rng)), "model": "m",
                                     "embed": None, "index": "exact"}},
                {"match": {"gt": {"width": 1000}}},
            ]},
            "page_size": 10,
        }
        run_both(ex, payload)

    def test_membership_only_random_order(self, ex_rng):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}, "order_by": False},
            "order_by": [{"order_by": "random"}],
            "seed": 77,
            "page_size": 10,
        }
        # order_by False → membership is static; no candidates needed.
        run_both(ex, payload, expect_fused=False)


@pytest.fixture(scope="module")
def ex_mono():
    """One file per item, one embedding row per item — the serving-shaped
    corpus where the exact device rank join must carry RRF pages."""
    return build_executor(
        n_items=3000, multi_file_every=10**9, multi_row_every=10**9, seed=3
    )


class TestRrfDeviceJoin:
    def test_exact_independent_spaces(self, ex_mono, small_kk):
        ex, rng = ex_mono
        run_both(ex, rrf_payload(rng))

    def test_quant_arm_ties(self, ex_mono, small_kk):
        ex, rng = ex_mono
        run_both(ex, rrf_payload(rng, models=("m", "m2"), index="quant"))

    def test_deep_page(self, ex_mono, small_kk):
        ex, rng = ex_mono
        run_both(ex, rrf_payload(rng, page=5))

    def test_same_space_two_queries(self, ex_mono, small_kk):
        ex, rng = ex_mono
        run_both(ex, rrf_payload(rng, models=("m", "m")))

    def test_or_composition(self, ex_mono, small_kk):
        ex, rng = ex_mono
        payload = {
            "query": {"or_": [
                {"text_embeddings": {"query": b64(q_of(rng)), "model": "m",
                                     "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 1.0}},
                {"text_embeddings": {"query": b64(q_of(rng)), "model": "m2",
                                     "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 30, "weight": 0.7}},
            ]},
            "page_size": 10,
        }
        run_both(ex, payload)

    def test_meta_scoped_rrf_falls_back_exactly(self, ex_mono, small_kk):
        # A metadata filter before the RRF group changes the rank scope —
        # the join declines (ranks would count excluded rows); results
        # still exact via materialization.
        ex, rng = ex_mono
        payload = {
            "query": {"and_": [
                {"match": {"eq": {"type": "image/png"}}},
                {"text_embeddings": {"query": b64(q_of(rng)), "model": "m",
                                     "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 1.0}},
                {"text_embeddings": {"query": b64(q_of(rng)), "model": "m2",
                                     "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 0.5}},
            ]},
            "page_size": 10,
        }
        run_both(ex, payload, allow_materialize=True)

    def test_rrf_rank_select_as(self, ex_mono, small_kk):
        ex, rng = ex_mono
        payload = rrf_payload(rng)
        payload["query"]["and_"][0]["select_as"] = "r1"
        run_both(ex, payload)


class TestFallbacks:
    def test_gt_bound_falls_back(self, ex_rng):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}, "lt": 1.2},
            "page_size": 10,
        }
        run_both(ex, payload, expect_fused=False)

    def test_partition_by_falls_back(self, ex_rng):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}},
            "partition_by": ["item_id"],
            "page_size": 10,
        }
        r_f, r_full = run_both(ex, payload, expect_fused=False)
        assert r_f.count == r_full.count

    def test_meta_primary_order_falls_back(self, ex_rng):
        ex, rng = ex_rng
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}, "priority": 0},
            "order_by": [{"order_by": "size", "priority": 10}],
            "page_size": 10,
        }
        run_both(ex, payload, expect_fused=False)

    def test_not_wrapped_falls_back(self, ex_rng):
        ex, rng = ex_rng
        payload = {
            "query": {"and_": [
                {"match": {"eq": {"type": "image/png"}}},
                {"not_": {"text_embeddings": {
                    "query": b64(q_of(rng)), "model": "m2", "embed": None,
                    "index": "exact"}}},
            ]},
            "page_size": 10,
        }
        run_both(ex, payload, expect_fused=False)


class TestMetricsPath:
    """SearchMetrics.path must report which engine path served the page —
    the per-query audit that the benched device path is the served path."""

    def test_fused_full_and_meta_reported(self, ex_rng):
        ex, rng = ex_rng
        fused_payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "quant"}},
            "page_size": 10,
        }
        r = ex.execute(pql.PqlQuery.from_json(fused_payload))
        assert r.metrics.path == "fused"

        full_payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "exact"}},
            "partition_by": ["item_id"],
            "page_size": 10,
        }
        r2 = ex.execute(pql.PqlQuery.from_json(full_payload))
        assert r2.metrics.path == "full"

        r3 = ex.execute(pql.PqlQuery.from_json({"page_size": 5}))
        assert r3.metrics.path == "meta"

    def test_eager_semantic_reports_full(self, ex_rng):
        """A leaf that fails fused eligibility at eval time (gt cursor
        bound) scores EAGERLY — a full per-item device readback with no
        deferred entry. It must report "full", not "meta" (regression:
        the observability field undercounted full-readback traffic)."""
        ex, rng = ex_rng
        payload = {
            "query": {
                "text_embeddings": {
                    "query": b64(q_of(rng)), "model": "m", "embed": None,
                    "index": "exact"},
                "gt": -100.0,  # sortable cursor bound — outer element field
            },
            "page_size": 10,
        }
        r = ex.execute(pql.PqlQuery.from_json(payload))
        assert r.metrics.path == "full"
        assert len(r.results)  # gt=-100 excludes nothing


class TestShallowKkBucket:
    """Shallow pages (need <= SHALLOW_NEED) must try the SHALLOW_KK
    candidate fetch FIRST (an ~8x readback cut on the serving tunnel) and
    escalate through KK_BUCKETS when the boundary proof fails — never a
    correctness trade (run_both asserts fused == full either way)."""

    def test_shallow_page_attempts_small_bucket_first(
        self, ex_rng, monkeypatch,
    ):
        ex, rng = ex_rng
        seen = []
        real = fused._attempt

        def spy(ex_, query, base, state, ctx, group, specs, gtype,
                desc_key, need, total, kk, rest_keys, entry_cache=None):
            seen.append(kk)
            return real(ex_, query, base, state, ctx, group, specs, gtype,
                        desc_key, need, total, kk, rest_keys,
                        entry_cache=entry_cache)

        monkeypatch.setattr(fused, "_attempt", spy)
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "quant"}},
            "page_size": 10,
        }
        run_both(ex, payload)
        assert seen and seen[0] == fused.SHALLOW_KK

    def test_deep_page_skips_small_bucket(self, ex_rng, monkeypatch):
        ex, rng = ex_rng
        seen = []
        real = fused._attempt

        def spy(*a, **k):
            seen.append(a[11])  # kk positional
            return real(*a, **k)

        monkeypatch.setattr(fused, "_attempt", spy)
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "quant"}},
            "page_size": 100,  # need > SHALLOW_NEED
        }
        run_both(ex, payload)
        assert seen and seen[0] == fused.KK_BUCKETS[0]

    def test_escalation_from_shallow_is_exact(self, ex_rng, monkeypatch):
        """Force the shallow attempt to report INSUFFICIENT: the loop must
        escalate and the escalated page must still equal the full path."""
        ex, rng = ex_rng
        real = fused._attempt
        seen = []

        def flaky(ex_, query, base, state, ctx, group, specs, gtype,
                  desc_key, need, total, kk, rest_keys, entry_cache=None):
            seen.append(kk)
            if kk == fused.SHALLOW_KK:
                return fused._INSUFFICIENT
            return real(ex_, query, base, state, ctx, group, specs, gtype,
                        desc_key, need, total, kk, rest_keys,
                        entry_cache=entry_cache)

        monkeypatch.setattr(fused, "_attempt", flaky)
        payload = {
            "query": {"text_embeddings": {
                "query": b64(q_of(rng)), "model": "m", "embed": None,
                "index": "quant"}},
            "page_size": 10,
        }
        r_fused, _ = run_both(ex, payload)
        assert seen[:2] == [fused.SHALLOW_KK, fused.KK_BUCKETS[0]]
        assert len(r_fused.results) == 10


class TestSelectAsParity:
    def test_alias_omitted_for_items_absent_from_space(self, ex_mono,
                                                       small_kk):
        """A page row absent from an aliased space must OMIT the alias
        exactly like the full path (the device join marks absent items
        with RANK_MISSING=inf — that must never leak into extras)."""
        ex, rng = ex_mono
        # Query = an m-only item's own vector (m covers all items, m2 only
        # the even ones) so the top of the fused page is absent from m2.
        snap = ex.index.snapshot("m")
        snap2 = ex.index.snapshot("m2")
        slot_items = ex._slot_item_ids("m", snap)
        m2_items = set(ex._slot_item_ids("m2", snap2).tolist())
        rows = np.flatnonzero(snap.row_valid)
        only_m = [
            r for r in rows
            if int(slot_items[snap.group_ids[r]]) not in m2_items
        ]
        assert only_m, "fixture should have m-only items"
        qvec = np.ascontiguousarray(snap.vectors[only_m[0]])
        # OR membership: rows in EITHER space page together, so the
        # m-only self-match can reach the page with no m2 rank at all.
        payload = {
            "query": {"or_": [
                {"text_embeddings": {"query": b64(qvec), "model": "m",
                                     "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5,
                 "rrf": {"k": 60, "weight": 1.0}},
                {"text_embeddings": {"query": b64(qvec), "model": "m2",
                                     "embed": None, "index": "exact"},
                 "row_n": True, "priority": 5, "select_as": "r2",
                 # tiny weight: the m self-match (rank 1) must stay on top
                 # of every both-spaces item despite its missing m2 rank
                 "rrf": {"k": 60, "weight": 0.001}},
            ]},
            "page_size": 10,
        }
        r_fused, r_full = run_both(ex, payload)
        fused_aliases = [r.get("extra", {}).get("r2") for r in r_fused.results]
        full_aliases = [r.get("extra", {}).get("r2") for r in r_full.results]
        assert fused_aliases == full_aliases
        # The self-match (absent from m2) must carry NO r2 value, and no
        # alias anywhere may be non-finite.
        assert fused_aliases[0] is None
        assert all(v is None or np.isfinite(v) for v in fused_aliases)


class TestStaticCacheSupersession:
    """_static_get eviction is versioning, not sibling-wipe: parameterized
    keys of the SAME generation coexist (regression: alternating queries
    with different srcweights (cw, lcw) arms re-ran corpus-sized builds
    on every query)."""

    def test_same_generation_siblings_coexist(self, ex_rng):
        ex, _ = ex_rng
        built = []
        k1 = ("srcweights", "spX", 1, 0.5, 0.0)
        k2 = ("srcweights", "spX", 1, 1.0, 0.0)
        assert ex._static_get(k1, lambda: built.append(1) or "a") == "a"
        assert ex._static_get(k2, lambda: built.append(2) or "b") == "b"
        # k1 must still be cached — its builder must NOT re-run.
        assert ex._static_get(k1, lambda: built.append(3) or "a2") == "a"
        assert built == [1, 2]

    def test_generation_bump_evicts_all_siblings(self, ex_rng):
        ex, _ = ex_rng
        ex._static_get(("srcweights", "spY", 1, 0.5, 0.0), lambda: "a")
        ex._static_get(("srcweights", "spY", 1, 1.0, 0.0), lambda: "b")
        ex._static_get(("srcweights", "spY", 2, 0.5, 0.0), lambda: "c")
        with ex._cache_lock:
            gens = {k[2] for k in ex._static_cache if k[:2] == ("srcweights", "spY")}
        assert gens == {2}

    def test_hitrows_epoch_supersedes_within_generation(self, ex_rng):
        ex, _ = ex_rng
        h_old = ("hitrows", "spZ", 1, "file", 10, 100)
        h_new = ("hitrows", "spZ", 1, "file", 11, 101)
        h_text = ("hitrows", "spZ", 1, "text", 11, 50)
        ex._static_get(h_old, lambda: "old")
        ex._static_get(h_new, lambda: "new")
        ex._static_get(h_text, lambda: "text")
        with ex._cache_lock:
            keys = {k for k in ex._static_cache if k[0] == "hitrows" and k[1] == "spZ"}
        # The stale epoch of the SAME entity is gone; the other entity stays.
        assert h_old not in keys and h_new in keys and h_text in keys

    def test_sibling_cap_bounds_parameterized_kinds(self, ex_rng):
        """Unbounded (cw, lcw) arms would pin corpus-sized arrays per
        distinct user float — same-(kind, space, generation) siblings are
        capped at the most recent few."""
        ex, _ = ex_rng
        for i in range(10):
            ex._static_get(
                ("srcweights", "spCap", 1, float(i), 0.0), lambda: i
            )
        with ex._cache_lock:
            live = [k for k in ex._static_cache if k[:3] == ("srcweights", "spCap", 1)]
        assert len(live) <= 4
        # The most recent key survived.
        assert ("srcweights", "spCap", 1, 9.0, 0.0) in live
