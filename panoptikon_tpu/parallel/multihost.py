"""Multi-host (DCN) runtime: initialization + mesh layout.

The reference's cross-machine story is an HTTP federation pool
(jobs/inference_pool.rs) because its workers are processes. The TPU-native
equivalent is a multi-host JAX runtime: every host runs this same process,
``jax.distributed`` forms the global device view, and the serving mesh
lays ``replica`` over hosts (DCN) and ``shard`` over each host's chips
(ICI) so the per-query top-k merge collective never crosses the slow
fabric — the scaling-book rule of matching collective locality to fabric.

Both tiers compose: HTTP federation (models/pool.py + http_backend.py)
spreads WHOLE queries across independent serving instances; the multi-host
mesh makes ONE instance span hosts when a single corpus outgrows one
host's HBM.

This container exposes one chip, so multi-host paths are exercised the
same way the multi-chip ones are: shardings compile against virtual
device counts; ``initialize()`` is a no-op in single-process mode.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from panoptikon_tpu.parallel.mesh import REPLICA_AXIS, SHARD_AXIS


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-host runtime when configured; no-op otherwise.

    Configuration comes from arguments or the standard env vars
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` — also set by TPU pod runtimes automatically).
    Returns True when a distributed runtime was initialized.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "-1"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or None,
        process_id=None if process_id < 0 else process_id,
    )
    return True


def hosts_replica_mesh() -> Mesh:
    """``replica × shard`` with replica == host count: each host holds one
    full corpus replica sharded over its local chips. The shard-merge
    all_gather stays on ICI; only the (tiny) query scatter and result
    gather ride DCN."""
    devices = jax.devices()
    n_hosts = jax.process_count()
    per_host = len(devices) // n_hosts
    # jax.devices() orders by process; reshape groups each host's chips
    # into one replica row.
    grid = np.array(devices).reshape(n_hosts, per_host)
    return Mesh(grid, (REPLICA_AXIS, SHARD_AXIS))


def hosts_shard_mesh() -> Mesh:
    """1-D global shard mesh across every chip of every host — for a
    corpus too large for one host's HBM. The top-k merge all_gather
    crosses DCN once per query batch; candidates are (k · shards) scalars,
    so the DCN payload is KBs even at pod scale."""
    return Mesh(np.array(jax.devices()), (SHARD_AXIS,))
