"""Artifact-freeze semantics (VERDICT r2 weak #2 / next-round #3).

The reference freezes the int8 scale artifact at a revision once the space
holds >= ARTIFACT_MIN_VECTORS rows (vector_quants.rs:585,1024): incremental
backfills quantize new rows under the frozen scale, existing codes stay
byte-identical across reconciles, and only an explicit rebuild/rescale
bumps the revision. Round 2 re-derived the scale from the live corpus
absmax on every reconcile — any add could churn all codes and invalidate
golden quant_ab dumps.
"""

import numpy as np
import pytest

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter
from panoptikon_tpu.index.vector_index import VectorIndex
from panoptikon_tpu.jobs import reconcile
from panoptikon_tpu.ops import codec

DIM = 8


def _seed(writer, n, start=0, amp=1.0, setter="clipper"):
    def unit(conn):
        sid = store.upsert_setter(conn, setter)
        rng = np.random.default_rng(start + 1)
        for i in range(start, start + n):
            sha = f"{i:04x}" * 16
            item = store.upsert_item(conn, sha, f"{i:032x}", "image/png")
            store.upsert_file(conn, item, sha, f"/x/{i}.png", "2026-01-01")
            did = store.insert_item_data(conn, item, sid, "clip")
            vec = rng.normal(size=DIM).astype(np.float32) * amp
            store.insert_embedding(conn, did, vec)

    writer.call(unit)


def _coverage(db, setter="clipper"):
    rows = [r for r in reconcile.coverage_status(db) if r["setter"] == setter]
    assert rows, "no coverage row"
    return rows[0]


@pytest.fixture()
def env(tmp_path):
    db = Database(tmp_path, "freeze")
    writer = IndexWriter(db)
    index = VectorIndex(chunk_rows=64)
    return db, writer, index


class TestArtifactFreeze:
    def test_frozen_scale_survives_adds(self, env):
        db, writer, index = env
        n0 = codec.ARTIFACT_MIN_VECTORS + 16
        _seed(writer, n0, amp=1.0)
        assert reconcile.reconcile_space(db, writer, index, "clipper")
        snap0 = index.snapshot("clipper")
        scale0 = snap0.scale
        rev0 = _coverage(db)["artifact_rev"]
        codes0 = snap0.codes[: snap0.size].copy()

        # New rows with 10x the amplitude: a re-derive would change the
        # scale; the frozen artifact must not.
        _seed(writer, 32, start=n0, amp=10.0)
        assert reconcile.reconcile_space(db, writer, index, "clipper")
        snap1 = index.snapshot("clipper")
        assert snap1.scale == scale0
        assert _coverage(db)["artifact_rev"] == rev0
        # Old rows' codes are byte-identical; new rows are covered.
        np.testing.assert_array_equal(snap1.codes[: snap0.size], codes0)
        assert snap1.size == n0 + 32
        expected_new = codec.quantize_int8(
            snap1.vectors[n0 : n0 + 32], scale0
        )
        np.testing.assert_array_equal(snap1.codes[n0 : n0 + 32], expected_new)

    def test_force_rescale_bumps_revision(self, env):
        db, writer, index = env
        n0 = codec.ARTIFACT_MIN_VECTORS + 16
        _seed(writer, n0, amp=1.0)
        assert reconcile.reconcile_space(db, writer, index, "clipper")
        scale0 = index.snapshot("clipper").scale
        rev0 = _coverage(db)["artifact_rev"]
        _seed(writer, 32, start=n0, amp=10.0)
        assert reconcile.reconcile_space(
            db, writer, index, "clipper", force_rescale=True
        )
        snap = index.snapshot("clipper")
        assert snap.scale != scale0  # re-derived over the wider corpus
        assert _coverage(db)["artifact_rev"] == rev0 + 1
        assert _coverage(db)["n_at_artifact"] == n0 + 32

    def test_below_threshold_recomputes(self, env):
        db, writer, index = env
        _seed(writer, 16, amp=1.0)
        assert reconcile.reconcile_space(db, writer, index, "clipper")
        scale0 = index.snapshot("clipper").scale
        _seed(writer, 8, start=16, amp=10.0)
        assert reconcile.reconcile_space(db, writer, index, "clipper")
        # Below ARTIFACT_MIN_VECTORS the artifact is not frozen yet —
        # every reconcile re-derives (reconcile.py docstring / reference
        # migration comments).
        assert index.snapshot("clipper").scale != scale0

    def test_rederive_identical_artifact_keeps_revision(self, env):
        db, writer, index = env
        _seed(writer, 16, amp=1.0)
        assert reconcile.reconcile_space(db, writer, index, "clipper")
        rev0 = _coverage(db)["artifact_rev"]
        # No new rows: the re-derived artifact is identical → same rev.
        assert reconcile.reconcile_space(db, writer, index, "clipper")
        assert _coverage(db)["artifact_rev"] == rev0

    def test_compact_preserves_frozen_scale(self, env):
        db, writer, index = env
        n0 = codec.ARTIFACT_MIN_VECTORS + 16
        _seed(writer, n0, amp=1.0)
        assert reconcile.reconcile_space(db, writer, index, "clipper")
        snap0 = index.snapshot("clipper")
        scale0 = snap0.scale
        # Tombstone one item, compact: survivors' codes must be
        # byte-identical under the preserved scale.
        item_ids = index.item_id_of_groups(
            "clipper", np.arange(snap0.num_groups)
        )
        index.remove_items("clipper", item_ids[:1])
        index.compact("clipper")
        snap1 = index.snapshot("clipper")
        assert snap1.scale == scale0
        assert snap1.size == n0 - 1
        np.testing.assert_array_equal(
            snap1.codes[: snap1.size],
            codec.quantize_int8(snap1.vectors[: snap1.size], scale0),
        )


class TestBackfillQuant:
    def test_backfill_only_touches_new_rows(self):
        index = VectorIndex(chunk_rows=64)
        rng = np.random.default_rng(0)
        v0 = rng.normal(size=(64, DIM)).astype(np.float32)
        index.add("s", np.arange(64), np.arange(64), v0)
        scale = index.build_quant("s")
        codes0 = index.snapshot("s").codes[:64].copy()
        v1 = rng.normal(size=(8, DIM)).astype(np.float32) * 5
        index.add("s", np.arange(64, 72), np.arange(64, 72), v1)
        done = index.backfill_quant("s", scale)
        assert done == 8
        snap = index.snapshot("s")
        assert snap.scale == scale
        np.testing.assert_array_equal(snap.codes[:64], codes0)
        np.testing.assert_array_equal(
            snap.codes[64:72], codec.quantize_int8(v1, scale)
        )
        # Idempotent: nothing left to backfill.
        assert index.backfill_quant("s", scale) == 0
