"""VectorIndex (host state machine) and sharded query-path tests."""

import numpy as np
import pytest

from panoptikon_tpu.index import sharded
from panoptikon_tpu.index.vector_index import VectorIndex
from panoptikon_tpu.ops import exact
from panoptikon_tpu.parallel import mesh as meshlib

CHUNK = 64


def make_index(n=300, dim=32, rows_per_item=1, seed=0):
    rng = np.random.default_rng(seed)
    idx = VectorIndex(chunk_rows=CHUNK)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    items = np.arange(n) // rows_per_item + 1000  # item ids offset
    idx.add("clip", items, np.arange(n), vecs)
    return idx, vecs, items


class TestVectorIndex:
    def test_add_and_snapshot(self):
        idx, vecs, _ = make_index()
        snap = idx.snapshot("clip")
        assert snap.size == 300
        assert snap.capacity % CHUNK == 0
        np.testing.assert_array_equal(snap.vectors[:300], vecs)
        assert snap.row_valid[:300].all() and not snap.row_valid[300:].any()

    def test_incremental_add_grows(self):
        idx, _, _ = make_index(n=100)
        rng = np.random.default_rng(1)
        for batch in range(3):
            more = rng.normal(size=(2000, 32)).astype(np.float32)
            idx.add("clip", np.arange(2000) + 10_000 * (batch + 1),
                    np.arange(2000) + 100 + 2000 * batch, more)
        snap = idx.snapshot("clip")
        assert snap.size == 6100
        assert snap.capacity >= 6100 and snap.capacity % CHUNK == 0

    def test_dim_mismatch_rejected(self):
        idx, _, _ = make_index()
        with pytest.raises(ValueError, match="32-d"):
            idx.add("clip", [1], [999], np.zeros((1, 16), np.float32))

    def test_remove_and_compact(self):
        idx, vecs, items = make_index(n=100)
        removed = idx.remove_items("clip", [1000, 1001, 1002])
        assert removed == 3
        snap = idx.snapshot("clip")
        assert snap.row_valid[:100].sum() == 97
        idx.compact("clip")
        snap2 = idx.snapshot("clip")
        assert snap2.size == 97
        assert snap2.row_valid[:97].all()

    def test_quant_lifecycle(self):
        idx, vecs, _ = make_index()
        snap = idx.snapshot("clip")
        assert not snap.quant_ready
        scale = idx.build_quant("clip")
        snap = idx.snapshot("clip")
        assert snap.quant_ready and snap.scale == scale
        # New rows after the freeze are not silently covered...
        idx.add("clip", [99999], [99999], np.ones((1, 32), np.float32))
        # ...until the next reconcile rebuild.
        idx.build_quant("clip")
        snap = idx.snapshot("clip")
        assert snap.codes[snap.size - 1].any()
        idx.drop_quant("clip")
        assert not idx.snapshot("clip").quant_ready

    def test_generation_bumps(self):
        idx, _, _ = make_index(n=10)
        g0 = idx.snapshot("clip").generation
        idx.add("clip", [7], [777], np.ones((1, 32), np.float32))
        assert idx.snapshot("clip").generation > g0

    def test_group_slot_item_roundtrip(self):
        idx, _, items = make_index(n=20, rows_per_item=4)
        snap = idx.snapshot("clip")
        got = idx.item_id_of_groups("clip", snap.group_ids[:20])
        np.testing.assert_array_equal(got, items)


class TestSharded:
    @pytest.mark.parametrize("rows_per_item", [1, 3])
    def test_matches_single_chip(self, rows_per_item):
        idx, vecs, items = make_index(n=240, rows_per_item=rows_per_item, seed=3)
        snap = idx.snapshot("clip")
        m = meshlib.index_mesh()
        space = sharded.build_sharded(snap, m, chunk_rows=CHUNK)
        rng = np.random.default_rng(4)
        q = rng.normal(size=(2, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        dist, slots, valid, grouped = sharded.sharded_search(
            space, q, k=10, distance="cosine"
        )
        # Reference: single-chip exact over the snapshot.
        e_dist, e_gidx, _ = exact.exact_search(
            snap.vectors[: snap.capacity],
            snap.row_valid,
            snap.group_ids,
            q,
            num_groups=snap.num_groups,
            k=10,
            distance="cosine",
        )
        e_items = idx.item_id_of_groups("clip", np.asarray(e_gidx))
        got_slots = space.item_ids[np.asarray(slots)]
        got_items = idx.item_id_of_groups("clip", got_slots)
        np.testing.assert_allclose(np.asarray(dist), np.asarray(e_dist), atol=1e-5)
        np.testing.assert_array_equal(got_items, e_items)

    def test_quant_arm(self):
        idx, vecs, _ = make_index(n=240, seed=5)
        idx.build_quant("clip")
        snap = idx.snapshot("clip")
        m = meshlib.index_mesh()
        space = sharded.build_sharded(snap, m, use_quant=True, chunk_rows=CHUNK)
        from panoptikon_tpu.ops import codec

        q = np.random.default_rng(6).normal(size=(1, 32)).astype(np.float32)
        q /= np.linalg.norm(q)
        q_codes = codec.compute_query_quant(q, snap.scale)
        dist, slots, valid, _ = sharded.sharded_search(
            space, q_codes, k=10, distance="cosine"
        )
        e_dist, e_gidx, _ = exact.exact_search(
            snap.vectors[: snap.capacity],
            snap.row_valid,
            snap.group_ids,
            q,
            num_groups=snap.num_groups,
            k=10,
            distance="cosine",
        )
        got_items = space.item_ids[np.asarray(slots)][0]
        overlap = len(set(got_items) & set(np.asarray(e_gidx)[0]))
        assert overlap >= 9

    def test_uneven_corpus_smaller_than_mesh_chunks(self):
        # 10 rows over an 8-device mesh: most shards nearly empty.
        idx, vecs, _ = make_index(n=10, seed=7)
        snap = idx.snapshot("clip")
        m = meshlib.index_mesh()
        space = sharded.build_sharded(snap, m, chunk_rows=CHUNK)
        q = vecs[:1]
        dist, slots, valid, _ = sharded.sharded_search(space, q, k=10)
        assert np.asarray(valid)[0].sum() == 10
        got = idx.item_id_of_groups("clip", space.item_ids[np.asarray(slots)[0]])
        assert got[0] == 1000  # the query vector itself ranks first


class TestServingMesh:
    """2-D replica × shard serving mesh: the corpus shards over `shard`
    and replicates over `replica`; the query batch splits over `replica`
    (QPS scale-out). Results must equal the 1-D mesh bit-for-bit."""

    def test_topk_matches_1d_mesh(self):
        idx, vecs, items = make_index(n=240, rows_per_item=1, seed=21)
        snap = idx.snapshot("clip")
        m1 = meshlib.index_mesh()
        m2 = meshlib.serving_mesh(replicas=2)
        assert m2.shape == {"replica": 2, "shard": 4}
        rng = np.random.default_rng(22)
        q = rng.normal(size=(6, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        s1 = sharded.build_sharded(snap, m1, chunk_rows=CHUNK)
        s2 = sharded.build_sharded(snap, m2, chunk_rows=CHUNK)
        d1, i1, v1, _ = sharded.sharded_search(s1, q, k=10)
        d2, i2, v2, _ = sharded.sharded_search(s2, q, k=10)
        got1 = idx.item_id_of_groups("clip", s1.item_ids[np.asarray(i1)])
        got2 = idx.item_id_of_groups("clip", s2.item_ids[np.asarray(i2)])
        np.testing.assert_array_equal(got1, got2)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    def test_query_count_not_divisible_by_replicas(self):
        idx, vecs, _ = make_index(n=64, seed=23)
        snap = idx.snapshot("clip")
        m2 = meshlib.serving_mesh(replicas=2)
        s2 = sharded.build_sharded(snap, m2, chunk_rows=CHUNK)
        q = vecs[:3]  # odd count → padded internally, sliced back
        d, i, v, _ = sharded.sharded_search(s2, q, k=5)
        assert np.asarray(d).shape == (3, 5)
        got = idx.item_id_of_groups("clip", s2.item_ids[np.asarray(i)[:, 0]])
        np.testing.assert_array_equal(
            got, idx.item_id_of_groups("clip", np.arange(3))
        )

    def test_grouped_scores_match_1d(self):
        idx, vecs, _ = make_index(n=120, rows_per_item=3, seed=24)
        snap = idx.snapshot("clip")
        m1 = meshlib.index_mesh()
        m2 = meshlib.serving_mesh(replicas=4)
        s1 = sharded.build_sharded(snap, m1, chunk_rows=CHUNK)
        s2 = sharded.build_sharded(snap, m2, chunk_rows=CHUNK)
        rng = np.random.default_rng(25)
        q = rng.normal(size=(5, 32)).astype(np.float32)
        d1, v1, c1 = sharded.sharded_grouped_scores(s1, q, aggregation="avg")
        d2, v2, c2 = sharded.sharded_grouped_scores(s2, q, aggregation="avg")
        # Map packed slots → snapshot group slots for comparison.
        def unpack(space, d, v):
            m = snap.num_groups
            out_d = np.full((d.shape[0], m), np.inf, np.float32)
            out_v = np.zeros((d.shape[0], m), bool)
            sel = space.item_ids >= 0
            out_d[:, space.item_ids[sel]] = np.asarray(d)[:, sel]
            out_v[:, space.item_ids[sel]] = np.asarray(v)[:, sel]
            return out_d, out_v
        ud1, uv1 = unpack(s1, d1, v1)
        ud2, uv2 = unpack(s2, d2, v2)
        np.testing.assert_array_equal(uv1, uv2)
        np.testing.assert_allclose(ud1, ud2, atol=1e-5)


class TestMultihost:
    def test_initialize_noop_without_coordinator(self, monkeypatch):
        from panoptikon_tpu.parallel import multihost

        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert multihost.initialize() is False

    def test_host_meshes_single_process(self):
        """Single-process: hosts_replica_mesh degenerates to 1 replica over
        all local devices; hosts_shard_mesh is the 1-D index mesh."""
        from panoptikon_tpu.parallel import multihost

        m = multihost.hosts_replica_mesh()
        assert m.shape["replica"] == 1 and m.shape["shard"] == 8
        m1 = multihost.hosts_shard_mesh()
        assert m1.shape["shard"] == 8
        # And it serves: corpus sharded over the one-replica mesh works.
        idx, vecs, _ = make_index(n=64, seed=31)
        snap = idx.snapshot("clip")
        space = sharded.build_sharded(snap, m, chunk_rows=CHUNK)
        d, i, v, _ = sharded.sharded_search(space, vecs[:2], k=5)
        got = idx.item_id_of_groups("clip", space.item_ids[np.asarray(i)[:, 0]])
        np.testing.assert_array_equal(got, [1000, 1001])


class TestBulkAppendFastPath:
    """Chunked ascending appends of strictly-new items must take the
    vectorized slot path and produce state identical to one bulk add —
    including an item whose rows straddle a chunk boundary (that chunk
    falls back to the per-row path)."""

    def test_chunked_appends_match_single_bulk(self):
        from panoptikon_tpu.index.vector_index import VectorIndex

        rng = np.random.default_rng(3)
        n = 5001
        items = np.repeat(np.arange(1, n // 2 + 2, dtype=np.int64), 2)[:n]
        vecs = rng.standard_normal((n, 16)).astype(np.float32)
        rows = np.arange(1, n + 1, dtype=np.int64)
        bulk = VectorIndex(chunk_rows=256)
        chunked = VectorIndex(chunk_rows=256)
        bulk.add("s", items, rows, vecs)
        chunked.reserve("s", n, 16)
        for lo in range(0, n, 701):  # odd step → straddled item boundary
            hi = min(lo + 701, n)
            chunked.add("s", items[lo:hi], rows[lo:hi], vecs[lo:hi])
        a, b = bulk._spaces["s"], chunked._spaces["s"]
        assert a.item_of_group == b.item_of_group
        assert a.group_of_item == b.group_of_item
        np.testing.assert_array_equal(
            a.group_ids[: a.size], b.group_ids[: b.size]
        )
        bulk.build_quant("s")
        chunked.build_quant("s")
        assert a.scale == b.scale
        np.testing.assert_array_equal(a.codes[: a.size], b.codes[: b.size])

    def test_reserve_idempotent_and_typed(self):
        from panoptikon_tpu.index.vector_index import VectorIndex

        idx = VectorIndex(chunk_rows=256)
        idx.reserve("s", 1000, 8)
        cap = idx._spaces["s"].capacity
        idx.reserve("s", 500, 8)  # never shrinks
        assert idx._spaces["s"].capacity == cap
        with pytest.raises(ValueError):
            idx.reserve("s", 10, 16)

    def test_interleaved_old_item_falls_back_correctly(self):
        from panoptikon_tpu.index.vector_index import VectorIndex

        idx = VectorIndex(chunk_rows=256)
        v = np.ones((3, 4), np.float32)
        idx.add("s", np.array([5, 7, 9]), np.array([1, 2, 3]), v)
        # Second append revisits item 7 (≤ max_item) → per-row path; the
        # existing slot must be reused, not duplicated.
        idx.add("s", np.array([7, 12]), np.array([4, 5]), np.ones((2, 4), np.float32))
        st = idx._spaces["s"]
        assert st.item_of_group == [5, 7, 9, 12]
        np.testing.assert_array_equal(st.group_ids[: st.size], [0, 1, 2, 1, 3])


class TestQuantCoverageGate:
    def test_appended_rows_demote_quant_until_backfill(self):
        """Rows added after build_quant hold no codes — the snapshot must
        serve the EXACT arm (quant_ready False) until the backfill
        restores coverage, not rank zero-vectors."""
        idx = VectorIndex(chunk_rows=16)
        rng = np.random.default_rng(0)
        v = rng.standard_normal((8, 4)).astype(np.float32)
        idx.add("s", np.arange(1, 9), np.arange(1, 9), v)
        scale = idx.build_quant("s")
        assert idx.snapshot("s").quant_ready
        idx.add("s", np.array([9]), np.array([9]),
                rng.standard_normal((1, 4)).astype(np.float32))
        snap = idx.snapshot("s")
        assert not snap.quant_ready  # uncovered suffix
        assert not idx.stats()["s"]["quant_ready"]
        idx.backfill_quant("s", scale)
        snap2 = idx.snapshot("s")
        assert snap2.quant_ready and snap2.size == 9

    def test_empty_reserve_is_usable(self):
        idx = VectorIndex(chunk_rows=16)
        idx.reserve("s", 0, 4)
        snap = idx.snapshot("s")  # must not crash
        assert snap.size == 0
        idx.build_quant("s")  # must not crash (scale 1.0, empty)

    def test_compact_fully_tombstoned_space_survives(self):
        idx = VectorIndex(chunk_rows=16)
        rng = np.random.default_rng(1)
        idx.add("s", np.arange(1, 5), np.arange(1, 5),
                rng.standard_normal((4, 4)).astype(np.float32))
        scale = idx.build_quant("s")
        idx.remove_items("s", np.arange(1, 5))
        idx.compact("s")  # must not crash or lose the space
        assert "s" in idx.space_names()
        snap = idx.snapshot("s")
        assert snap.size == 0
        assert idx.stats()["s"]["scale"] == scale  # frozen scale survives
