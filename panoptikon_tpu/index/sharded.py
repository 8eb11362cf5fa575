"""Multi-chip query path: corpus sharded over the mesh, merged top-k.

This is the rebuild's replacement for the reference's single-connection SQL
vector scan (SURVEY.md §2c): the embedding matrix is sharded row-block-wise
over the ``shard`` mesh axis; each chip scores its block with the streaming
fused scorer; the per-shard top-k candidates are merged with one
``all_gather`` riding ICI. Queries and results are replicated.

Determinism across shards: each shard's candidates carry *global* row
indices (``shard · rows_per_shard + local``). After the all-gather the
candidate sequence is ordered (shard, local rank); ``lax.top_k`` prefers
lower candidate positions on ties, which resolves equal distances to the
lowest global row — the same total order as the single-chip scorer.

Item-locality invariant for grouped (multi-row-per-item) spaces: the layout
builder places every item's rows in ONE shard, so per-item aggregation
never crosses a shard boundary and the merge stays a pure top-k.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from panoptikon_tpu.index.vector_index import SpaceSnapshot
from panoptikon_tpu.ops import scoring
from panoptikon_tpu.parallel.mesh import REPLICA_AXIS, SHARD_AXIS


def _query_specs(mesh: Mesh):
    """Query/result partitioning: on a 2-D serving mesh the query batch
    splits over ``replica`` (QPS scale-out) while the corpus replicates
    over it; on the 1-D mesh queries replicate."""
    if REPLICA_AXIS in mesh.axis_names:
        return P(REPLICA_AXIS, None), P(REPLICA_AXIS)
    return P(), P()


@dataclass
class ShardedSpace:
    """Device-resident sharded layout of one embedding space.

    Arrays are logically (S · rows_per_shard, …) and physically sharded
    row-block-wise; ``groups_per_shard`` is the static per-shard group
    capacity; ``item_ids`` maps global group slot (shard · groups_per_shard
    + local) → DB item id on the host.
    """

    mesh: Mesh
    num_shards: int
    rows_per_shard: int
    groups_per_shard: int
    dim: int
    corpus: jax.Array  # (S·R, D) f32 or int8, sharded
    sumsq: jax.Array  # (S·R,), sharded
    row_valid: jax.Array  # (S·R,) bool, sharded
    group_ids: jax.Array  # (S·R,) int32 local group slot, sharded
    weights: jax.Array  # (S·R,) f32, sharded
    item_ids: np.ndarray  # (S·groups_per_shard,) int64, host
    row_perm: np.ndarray  # (S·R,) int64: packed row → snapshot row, -1 pad
    scale: float
    one_row_per_item: bool
    chunk_rows: int


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def build_sharded(
    snapshot: SpaceSnapshot,
    mesh: Mesh,
    *,
    use_quant: bool = False,
    chunk_rows: int = 8192,
) -> ShardedSpace:
    """Repack a host snapshot into the sharded device layout.

    Items are assigned to shards greedily in ascending row order (keeping
    each item whole), then each shard is padded to a common static
    ``rows_per_shard`` (a multiple of the streaming chunk).
    """
    s = mesh.shape[SHARD_AXIS]
    size = snapshot.size
    valid = snapshot.row_valid[:size]
    if use_quant:
        if not snapshot.quant_ready:
            raise ValueError("quant arm requested but profile not ready")
        source = snapshot.codes[:size]
        scale = float(snapshot.scale)
    else:
        source = snapshot.vectors[:size]
        scale = 1.0
    gids = snapshot.group_ids[:size]

    # Row spans per group, in ascending first-row order (rows of one item
    # are appended in order; a group's rows may be scattered, so collect).
    order = np.argsort(gids, kind="stable")
    sorted_gids = gids[order]
    one_row_per_item = bool(
        size == 0 or not np.any(np.diff(sorted_gids) == 0)
    )

    dim = snapshot.dim
    dtype = source.dtype
    snap_weights = snapshot.weights[:size]

    if one_row_per_item:
        # Vectorized packing: with exactly one row per group the greedy
        # balance degenerates to contiguous equal splits of the valid rows
        # in ascending group order — no per-group Python loop (this path
        # must stay O(#shards) Python work at 1M+ rows).
        rows_all = order[valid[order]]
        total = len(rows_all)
        target = max(1, -(-total // s))
        counts = [max(0, min(target, total - si * target)) for si in range(s)]
        rows_per_shard = _round_up(max(max(counts), 1), chunk_rows)
        groups_per_shard = max(max(counts), 1)
        corpus = np.zeros((s, rows_per_shard, dim), dtype=dtype)
        row_valid = np.zeros((s, rows_per_shard), dtype=bool)
        local_gid = np.zeros((s, rows_per_shard), dtype=np.int32)
        weights = np.ones((s, rows_per_shard), dtype=np.float32)
        item_ids = np.full(s * groups_per_shard, -1, dtype=np.int64)
        row_perm = np.full((s, rows_per_shard), -1, dtype=np.int64)
        for si in range(s):
            seg = rows_all[si * target : si * target + counts[si]]
            n = len(seg)
            if n == 0:
                continue
            corpus[si, :n] = source[seg]
            row_valid[si, :n] = True
            local_gid[si, :n] = np.arange(n, dtype=np.int32)
            weights[si, :n] = snap_weights[seg]
            item_ids[si * groups_per_shard : si * groups_per_shard + n] = gids[seg]
            row_perm[si, :n] = seg
    else:
        boundaries = np.flatnonzero(np.diff(sorted_gids)) + 1
        group_row_lists = np.split(order, boundaries)
        unique_groups = sorted_gids[np.concatenate([[0], boundaries])] if size else []

        # Greedy round-robin by row count: keep shards balanced while
        # keeping each item whole.
        total_rows = int(valid.sum())
        target = max(1, -(-total_rows // s))
        shard_rows: list[list[np.ndarray]] = [[] for _ in range(s)]
        shard_groups: list[list[int]] = [[] for _ in range(s)]
        counts = [0] * s
        cursor = 0
        for g, rows in zip(unique_groups, group_row_lists):
            rows = rows[valid[rows]]
            if len(rows) == 0:
                continue
            while cursor < s - 1 and counts[cursor] >= target:
                cursor += 1
            shard_rows[cursor].append(rows)
            shard_groups[cursor].append(int(g))
            counts[cursor] += len(rows)

        rows_per_shard = _round_up(max(max(counts), 1), chunk_rows)
        groups_per_shard = max(max((len(g) for g in shard_groups), default=1), 1)

        corpus = np.zeros((s, rows_per_shard, dim), dtype=dtype)
        row_valid = np.zeros((s, rows_per_shard), dtype=bool)
        local_gid = np.zeros((s, rows_per_shard), dtype=np.int32)
        weights = np.ones((s, rows_per_shard), dtype=np.float32)
        item_ids = np.full(s * groups_per_shard, -1, dtype=np.int64)
        row_perm = np.full((s, rows_per_shard), -1, dtype=np.int64)

        # ``item_ids`` holds the *snapshot group slot* per packed group; the
        # host remaps slots → DB item ids after top-k (VectorIndex owns that
        # table).
        for si in range(s):
            at = 0
            for li, (g, rows) in enumerate(zip(shard_groups[si], shard_rows[si])):
                n = len(rows)
                corpus[si, at : at + n] = source[rows]
                row_valid[si, at : at + n] = True
                local_gid[si, at : at + n] = li
                weights[si, at : at + n] = snap_weights[rows]
                item_ids[si * groups_per_shard + li] = g
                row_perm[si, at : at + n] = rows
                at += n

    row_perm = row_perm.reshape(-1)
    corpus = corpus.reshape(s * rows_per_shard, dim)
    row_valid = row_valid.reshape(-1)
    local_gid = local_gid.reshape(-1)
    weights = weights.reshape(-1)

    rows_sharding = NamedSharding(mesh, P(SHARD_AXIS, None))
    flat_sharding = NamedSharding(mesh, P(SHARD_AXIS))
    corpus_d = jax.device_put(corpus, rows_sharding)
    sumsq_d = jax.device_put(np.asarray(scoring.row_sumsq(corpus)), flat_sharding)
    return ShardedSpace(
        mesh=mesh,
        num_shards=s,
        rows_per_shard=rows_per_shard,
        groups_per_shard=groups_per_shard,
        dim=dim,
        corpus=corpus_d,
        sumsq=sumsq_d,
        row_valid=jax.device_put(row_valid, flat_sharding),
        group_ids=jax.device_put(local_gid, flat_sharding),
        weights=jax.device_put(weights, flat_sharding),
        item_ids=item_ids,
        row_perm=row_perm,
        scale=scale,
        one_row_per_item=one_row_per_item,
        chunk_rows=chunk_rows,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "k",
        "distance",
        "aggregation",
        "groups_per_shard",
        "chunk_rows",
        "grouped",
        "weighted",
    ),
)
def _sharded_query(
    corpus,
    sumsq,
    row_valid,
    group_ids,
    weights,
    queries,
    *,
    mesh: Mesh,
    k: int,
    distance: str,
    aggregation: str,
    groups_per_shard: int,
    chunk_rows: int,
    grouped: bool,
    weighted: bool,
    scale: float,
):
    rows_spec = P(SHARD_AXIS, None)
    flat_spec = P(SHARD_AXIS)
    q_spec, out_spec = _query_specs(mesh)

    def shard_fn(corpus_s, sumsq_s, valid_s, gids_s, w_s, q):
        shard = jax.lax.axis_index(SHARD_AXIS)
        if grouped:
            top_v, local_idx, _ = scoring.streaming_grouped_topk(
                corpus_s,
                sumsq_s,
                valid_s,
                gids_s,
                q,
                num_groups=groups_per_shard,
                k=k,
                distance=distance,
                aggregation=aggregation,
                scale=scale,
                chunk_rows=chunk_rows,
                weighted=weighted,
                weights=w_s,
            )
            global_idx = local_idx + shard * groups_per_shard
        else:
            top_v, local_idx, _ = scoring.streaming_topk(
                corpus_s,
                sumsq_s,
                valid_s,
                q,
                k=k,
                distance=distance,
                scale=scale,
                chunk_rows=chunk_rows,
            )
            # One row per item ⇒ packed local row index == local group slot,
            # so both paths share the group-slot identity space (and the
            # (value, slot) tie order matches ascending global row).
            global_idx = local_idx + shard * groups_per_shard
        # Merge across shards: one all_gather of (k,)-candidates per query
        # over ICI, then a replicated top-k. Candidate order (shard, rank)
        # + lax.top_k's lowest-position tie preference reproduces the
        # single-chip (value, global row) total order.
        all_v = jax.lax.all_gather(top_v, SHARD_AXIS, axis=0)  # (S, Q, k)
        all_i = jax.lax.all_gather(global_idx, SHARD_AXIS, axis=0)
        q_n = top_v.shape[0]
        cand_v = jnp.transpose(all_v, (1, 0, 2)).reshape(q_n, -1)
        cand_i = jnp.transpose(all_i, (1, 0, 2)).reshape(q_n, -1)
        neg, sel = jax.lax.top_k(-cand_v, k)
        merged_v = -neg
        merged_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return merged_v, merged_i

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rows_spec, flat_spec, flat_spec, flat_spec, flat_spec, q_spec),
        out_specs=(out_spec, out_spec),
        check_vma=False,
    )(corpus, sumsq, row_valid, group_ids, weights, queries)


def _pad_queries(mesh: Mesh, queries):
    """Pad Q to a replica multiple on 2-D serving meshes (each replica
    takes an equal query slice)."""
    if REPLICA_AXIS not in mesh.axis_names:
        return queries, queries.shape[0]
    r = mesh.shape[REPLICA_AXIS]
    q = queries.shape[0]
    padded = _round_up(max(q, 1), r)
    if padded != q:
        queries = jnp.pad(jnp.asarray(queries), ((0, padded - q), (0, 0)))
    return queries, q


def sharded_search(
    space: ShardedSpace,
    queries,
    *,
    k: int,
    distance: str = "cosine",
    aggregation: str = "min",
    weighted: bool = False,
):
    """Query a sharded space: (Q, D) queries → (dist, global_slot, valid).

    For one-row-per-item spaces the returned slots are global row indices;
    otherwise global group slots (shard · groups_per_shard + local), which
    ``space.item_ids`` maps back to snapshot group slots / item ids.
    """
    grouped = not space.one_row_per_item or aggregation != "min" or weighted
    queries, q_real = _pad_queries(space.mesh, queries)
    top_v, top_i = _sharded_query(
        space.corpus,
        space.sumsq,
        space.row_valid,
        space.group_ids,
        space.weights,
        queries,
        mesh=space.mesh,
        k=k,
        distance=distance,
        aggregation=aggregation,
        groups_per_shard=space.groups_per_shard,
        chunk_rows=space.chunk_rows,
        grouped=grouped,
        weighted=weighted,
        scale=space.scale,
    )
    top_v, top_i = top_v[:q_real], top_i[:q_real]
    return top_v, top_i, jnp.isfinite(top_v), grouped


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh",
        "distance",
        "aggregation",
        "groups_per_shard",
        "chunk_rows",
        "weighted",
    ),
)
def _sharded_scores(
    corpus,
    sumsq,
    row_valid,
    group_ids,
    weights,
    queries,
    *,
    mesh: Mesh,
    distance: str,
    aggregation: str,
    groups_per_shard: int,
    chunk_rows: int,
    weighted: bool,
    scale: float,
):
    rows_spec = P(SHARD_AXIS, None)
    flat_spec = P(SHARD_AXIS)
    q_spec, out_spec = _query_specs(mesh)

    def shard_fn(corpus_s, sumsq_s, valid_s, gids_s, w_s, q):
        dist, valid, cnt = scoring.grouped_scores(
            corpus_s,
            sumsq_s,
            valid_s,
            gids_s,
            q,
            num_groups=groups_per_shard,
            distance=distance,
            aggregation=aggregation,
            scale=scale,
            chunk_rows=chunk_rows,
            weighted=weighted,
            weights=w_s,
        )
        # Full score surface: every shard computes its local groups' scores
        # and one all_gather over ICI replicates them — (S, Q, G) → (Q, S·G)
        # in packed global-slot order, which ``ShardedSpace.item_ids`` maps
        # back to snapshot group slots on the host.
        all_d = jax.lax.all_gather(dist, SHARD_AXIS, axis=0)
        all_v = jax.lax.all_gather(valid, SHARD_AXIS, axis=0)
        all_c = jax.lax.all_gather(cnt, SHARD_AXIS, axis=0)
        q_n = dist.shape[0]
        d = jnp.transpose(all_d, (1, 0, 2)).reshape(q_n, -1)
        v = jnp.transpose(all_v, (1, 0, 2)).reshape(q_n, -1)
        c = jnp.transpose(all_c, (1, 0, 2)).reshape(q_n, -1)
        return d, v, c

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rows_spec, flat_spec, flat_spec, flat_spec, flat_spec, q_spec),
        out_specs=(out_spec, out_spec, out_spec),
        check_vma=False,
    )(corpus, sumsq, row_valid, group_ids, weights, queries)


def sharded_grouped_scores(
    space: ShardedSpace,
    queries,
    *,
    distance: str = "cosine",
    aggregation: str = "min",
    weighted: bool = False,
    row_valid=None,
    weights=None,
):
    """Full per-group scores over the mesh: (Q, S·G) dist/valid/count arrays
    keyed by PACKED global group slot (``space.item_ids`` maps slots back to
    snapshot group slots). ``weights``, when given, overrides the built-in
    per-row weights in PACKED order (query-time confidence weighting).

    This is the PQL composition surface on >1 devices — the sharded
    replacement for the reference's single-connection SQL scan where rank
    fusion needs every candidate's score, not a top-k
    (pql/builder/filters/exact.rs). ``row_valid``, when given, overrides the
    built-in validity and must be in packed order (use ``space.row_perm`` to
    permute a snapshot-order mask).
    """
    if row_valid is None:
        rv = space.row_valid
    else:
        rv = jax.device_put(
            np.asarray(row_valid, dtype=bool),
            NamedSharding(space.mesh, P(SHARD_AXIS)),
        )
    if weights is None:
        wts = space.weights
    else:
        wts = jax.device_put(
            np.asarray(weights, dtype=np.float32),
            NamedSharding(space.mesh, P(SHARD_AXIS)),
        )
    queries, q_real = _pad_queries(space.mesh, queries)
    d, v, c = _sharded_scores(
        space.corpus,
        space.sumsq,
        rv,
        space.group_ids,
        wts,
        queries,
        mesh=space.mesh,
        distance=distance,
        aggregation=aggregation,
        groups_per_shard=space.groups_per_shard,
        chunk_rows=space.chunk_rows,
        weighted=weighted,
        scale=space.scale,
    )
    return d[:q_real], v[:q_real], c[:q_real]
