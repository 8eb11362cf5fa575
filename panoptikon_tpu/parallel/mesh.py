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


def index_mesh(devices=None) -> Mesh:
    """1-D mesh over all devices for corpus sharding."""
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
