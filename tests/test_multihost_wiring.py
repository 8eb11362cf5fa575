"""Multi-host wiring (VERDICT r2 #8: multihost.initialize() had no caller;
the serving mesh never consulted the multi-host layouts).

A true 2-process CPU simulation of the DCN runtime is not possible inside
one pytest process (jax.distributed.initialize forks the backend and the
virtual-device CPU backend is single-process), so — per the VERDICT's
stated alternative — these tests assert the mesh-construction logic under
a monkeypatched process count and prove NUMERIC serving equality of the
replica-over-hosts layout against the 1-D mesh; server startup wiring is
asserted by reading the configured layout through the same entry points
``server.main`` calls.
"""

import numpy as np
import pytest

import jax

from panoptikon_tpu.config import Settings
from panoptikon_tpu.parallel import mesh as meshlib
from panoptikon_tpu.parallel import multihost


@pytest.fixture(autouse=True)
def restore_layout():
    yield
    meshlib.set_multihost_layout("replica")


class TestInitialize:
    def test_noop_without_coordinator(self, monkeypatch):
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert multihost.initialize() is False


class TestLayoutSelection:
    def test_single_process_is_1d(self):
        mesh = meshlib.index_mesh()
        assert mesh.axis_names == (meshlib.SHARD_AXIS,)
        assert mesh.size == len(jax.devices())

    def test_multiprocess_replica_layout(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        meshlib.set_multihost_layout("replica")
        mesh = meshlib.index_mesh()
        assert mesh.axis_names == (meshlib.REPLICA_AXIS, meshlib.SHARD_AXIS)
        assert mesh.shape[meshlib.REPLICA_AXIS] == 2
        assert mesh.shape[meshlib.SHARD_AXIS] == len(jax.devices()) // 2

    def test_multiprocess_shard_layout(self, monkeypatch):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        meshlib.set_multihost_layout("shard")
        mesh = meshlib.index_mesh()
        assert mesh.axis_names == (meshlib.SHARD_AXIS,)
        assert mesh.size == len(jax.devices())

    def test_invalid_layout_rejected(self):
        with pytest.raises(ValueError):
            meshlib.set_multihost_layout("diagonal")


class TestConfig:
    def test_parallel_section_parses(self):
        s = Settings.from_dict(
            {
                "parallel": {
                    "coordinator": "10.0.0.1:1234",
                    "num_processes": 4,
                    "process_id": 1,
                    "multihost_layout": "shard",
                }
            }
        )
        assert s.parallel.coordinator == "10.0.0.1:1234"
        assert s.parallel.num_processes == 4
        assert s.parallel.process_id == 1
        assert s.parallel.multihost_layout == "shard"

    def test_defaults(self):
        s = Settings.from_dict({})
        assert s.parallel.coordinator is None
        assert s.parallel.multihost_layout == "replica"


class TestServingEquality:
    def test_hosts_replica_mesh_equals_single_device(self, monkeypatch):
        """Scores on the simulated 2-host replica×shard mesh (2×4 over the
        8 virtual CPU devices) are bit-equal to the single-device grouped
        scorer — the replica-over-DCN layout changes WHERE the corpus
        lives, never what a query sees."""
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device virtual mesh")
        from panoptikon_tpu.index import sharded as shlib
        from panoptikon_tpu.index.vector_index import VectorIndex
        from panoptikon_tpu.ops import scoring

        monkeypatch.setattr(jax, "process_count", lambda: 2)
        meshlib.set_multihost_layout("replica")
        mesh = meshlib.index_mesh()

        rng = np.random.default_rng(0)
        n, d = 96, 16
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        idx = VectorIndex(chunk_rows=16)
        idx.add("s", np.arange(n) // 2, np.arange(n), vecs)
        snap = idx.snapshot("s")
        q = vecs[:3]

        sp = shlib.build_sharded(snap, mesh, use_quant=False, chunk_rows=16)
        dist, valid, counts = shlib.sharded_grouped_scores(
            sp, q, distance="cosine", aggregation="min"
        )
        ref_dist, ref_valid, ref_counts = scoring.grouped_scores(
            jax.device_put(snap.vectors),
            jax.device_put(np.asarray(scoring.row_sumsq(snap.vectors))),
            snap.row_valid,
            snap.group_ids,
            q,
            num_groups=snap.num_groups,
            distance="cosine",
            aggregation="min",
            chunk_rows=16,
        )
        dist = np.asarray(dist)
        valid = np.asarray(valid)
        # Packed global slots → snapshot group slots.
        sel = sp.item_ids >= 0
        slots = sp.item_ids[sel]
        got = np.full((q.shape[0], snap.num_groups), np.inf, np.float32)
        got_v = np.zeros((q.shape[0], snap.num_groups), bool)
        got[:, slots] = dist[:, sel]
        got_v[:, slots] = valid[:, sel]
        np.testing.assert_array_equal(got_v, np.asarray(ref_valid))
        np.testing.assert_array_equal(
            got[got_v], np.asarray(ref_dist)[np.asarray(ref_valid)]
        )
