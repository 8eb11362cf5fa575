"""Device mesh construction and sharding helpers.

The rebuild's distribution model (SURVEY.md §2c): the corpus axis of every
embedding space is sharded over the chip mesh's ``shard`` axis; queries and
model weights are replicated for serving. Collectives ride ICI via
``shard_map`` — per-shard int8 GEMM + local top-k, then a cross-shard top-k
merge — replacing the reference's single-connection SQL scan.

The same mesh carries the model-parallel axes for training/finetuning
(``data`` × ``model``), so one process serves both the index and the
encoders.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"
REPLICA_AXIS = "replica"
DATA_AXIS = "data"
MODEL_AXIS = "model"


# Multi-host serving layout (panoptikon_tpu.parallel.multihost): "replica"
# lays one full corpus replica per host (shard-merge stays on ICI);
# "shard" spans one global corpus across every chip of every host.
# Selected at server startup from [parallel].multihost_layout.
_MULTIHOST_LAYOUT = "replica"


def set_multihost_layout(layout: str) -> None:
    global _MULTIHOST_LAYOUT
    if layout not in ("replica", "shard"):
        raise ValueError(f"unknown multihost layout {layout!r}")
    _MULTIHOST_LAYOUT = layout


def index_mesh(devices=None) -> Mesh:
    """Serving mesh for corpus sharding: 1-D over all devices in a
    single-process runtime; on a multi-host runtime, the configured
    replica-over-DCN / shard-over-ICI layout (multihost.py)."""
    if devices is None and jax.process_count() > 1:
        from panoptikon_tpu.parallel import multihost

        if _MULTIHOST_LAYOUT == "replica":
            return multihost.hosts_replica_mesh()
        return multihost.hosts_shard_mesh()
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (SHARD_AXIS,))


def serving_mesh(replicas: int, devices=None) -> Mesh:
    """2-D ``replica × shard`` serving mesh: the corpus shards over
    ``shard`` and REPLICATES over ``replica``; a query batch splits over
    ``replica`` so QPS scales with replica count while per-shard HBM stays
    fixed. On multi-host topologies lay ``replica`` over DCN (hosts) and
    ``shard`` over ICI so the top-k merge collective never crosses hosts —
    the scaling-book recipe of matching collective locality to fabric."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n % replicas != 0:
        raise ValueError(f"{replicas} replicas do not divide {n} devices")
    return Mesh(
        np.array(devices).reshape(replicas, n // replicas),
        (REPLICA_AXIS, SHARD_AXIS),
    )


def train_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """2-D ``data × model`` mesh for encoder training/finetuning."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(np.array(devices).reshape(data, model), (DATA_AXIS, MODEL_AXIS))


def corpus_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the mesh; feature axis replicated."""
    return NamedSharding(mesh, P(SHARD_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def num_shards(mesh: Mesh) -> int:
    return mesh.shape[SHARD_AXIS]


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
