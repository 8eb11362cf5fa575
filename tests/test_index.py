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
