"""Exact fp32 vector scorer — the brute-force ground truth.

This is the TPU analog of the reference's exact arm
(``panoptikon/src/pql/builder/filters/exact.rs``): score every stored vector
against the query at full precision, aggregate per item, order
deterministically. The quant path (``ops.int8_gemm``) is validated against
this scorer exactly the way the reference validates int8 against its fp32
SQL scan (``tools/quant-recall``).

Semantics carried over from the reference:

- distances: ``L2`` (euclidean, sqrt of sum of squares) and ``COSINE``
  (1 − cosine similarity), matching sqlite-vec's ``vec_distance_l2`` /
  ``vec_distance_cosine`` which the SQL arm calls
  (docs/vector-int8-quant.md:53-64).
- per-item aggregation over an item's rows (text chunks, video frames):
  MIN (default) / MAX / AVG, or the confidence-weighted average
  ``SUM(d·w)/SUM(w)`` when confidence weights apply — in which case the
  plain aggregation choice is ignored (exact.rs:64-80 ``rank_aggregate``).
- deterministic total order: ties broken by ascending row position. Rows
  are maintained in ascending id order by the index layer, so this matches
  the reference's id tiebreak.

Shapes are static: the corpus is capacity-padded ``(N_pad, D)`` with a
validity mask; groups (items) are capacity-padded to ``M_pad``. Padding
never leaks: invalid rows score +inf (or −inf for descending), invalid
groups are masked out of top-k and counts.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

Distance = Literal["l2", "cosine"]
Aggregation = Literal["min", "max", "avg"]

# Sentinel for "no result": +inf distance sorts last ascending.
INF = jnp.inf


def pairwise_distance(corpus, queries, distance: Distance = "cosine"):
    """Distances between every corpus row and every query.

    corpus: (N, D) f32; queries: (Q, D) f32 → (Q, N) f32.

    The L2 path expands ``|x−q|² = |x|² − 2x·q + |q|²`` so the O(N·Q·D) work
    is one MXU matmul instead of an elementwise broadcast; the clamp guards
    the tiny negatives cancellation produces.
    """
    corpus = jnp.asarray(corpus, dtype=jnp.float32)
    queries = jnp.asarray(queries, dtype=jnp.float32)
    # HIGHEST: this scorer is the ground truth the quant path is validated
    # against; on TPU the default matmul precision is bf16, which would put
    # ~1e-3 noise into the baseline itself.
    dots = jnp.dot(
        queries,
        corpus.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if distance == "cosine":
        corpus_norm = jnp.linalg.norm(corpus, axis=-1)
        query_norm = jnp.linalg.norm(queries, axis=-1)
        denom = jnp.maximum(query_norm[:, None] * corpus_norm[None, :], 1e-30)
        return 1.0 - dots / denom
    if distance == "l2":
        corpus_sq = jnp.sum(corpus * corpus, axis=-1)
        query_sq = jnp.sum(queries * queries, axis=-1)
        sq = jnp.maximum(query_sq[:, None] - 2.0 * dots + corpus_sq[None, :], 0.0)
        return jnp.sqrt(sq)
    raise ValueError(f"Unknown distance {distance!r}")


def aggregate_rows(
    row_dist,
    group_ids,
    num_groups: int,
    aggregation: Aggregation = "min",
    row_valid=None,
    weights=None,
):
    """Per-row distances → per-group (per-item) rank values.

    row_dist: (N,) f32; group_ids: (N,) int32 in [0, num_groups);
    weights: optional (N,) f32 per-row confidence weights — when given the
    aggregate is ``SUM(d·w)/SUM(w)`` and ``aggregation`` is ignored
    (exact.rs:64-80). Returns (group_dist (num_groups,), group_valid).

    Invalid rows never contribute; groups with no valid rows come back
    invalid with +inf distance.
    """
    row_dist = jnp.asarray(row_dist, dtype=jnp.float32)
    n = row_dist.shape[0]
    if row_valid is None:
        row_valid = jnp.ones((n,), dtype=bool)
    # Route invalid rows to a scrap group so they cannot contribute.
    safe_ids = jnp.where(row_valid, group_ids, num_groups)
    counts = jax.ops.segment_sum(
        row_valid.astype(jnp.int32), safe_ids, num_segments=num_groups + 1
    )
    group_valid = counts[:num_groups] > 0

    if weights is not None:
        w = jnp.where(row_valid, jnp.asarray(weights, dtype=jnp.float32), 0.0)
        num = jax.ops.segment_sum(row_dist * w, safe_ids, num_segments=num_groups + 1)
        den = jax.ops.segment_sum(w, safe_ids, num_segments=num_groups + 1)
        group_dist = num[:num_groups] / jnp.maximum(den[:num_groups], 1e-30)
    elif aggregation == "min":
        group_dist = jax.ops.segment_min(
            jnp.where(row_valid, row_dist, INF), safe_ids, num_segments=num_groups + 1
        )[:num_groups]
    elif aggregation == "max":
        group_dist = jax.ops.segment_max(
            jnp.where(row_valid, row_dist, -INF), safe_ids, num_segments=num_groups + 1
        )[:num_groups]
    elif aggregation == "avg":
        total = jax.ops.segment_sum(
            jnp.where(row_valid, row_dist, 0.0), safe_ids, num_segments=num_groups + 1
        )[:num_groups]
        group_dist = total / jnp.maximum(counts[:num_groups].astype(jnp.float32), 1.0)
    else:
        raise ValueError(f"Unknown aggregation {aggregation!r}")

    group_dist = jnp.where(group_valid, group_dist, INF)
    return group_dist, group_valid


def topk_ascending(values, valid, k: int):
    """Smallest-k with deterministic lowest-index tiebreak.

    values: (M,) f32; valid: (M,) bool → (top_values (k,), top_indices (k,),
    top_valid (k,)). ``lax.top_k`` prefers lower indices on ties, which is
    exactly the reference's ascending-id tiebreak when positions follow id
    order. Invalid entries sort last; when fewer than k are valid the tail
    comes back with ``top_valid`` False and +inf values.
    """
    values = jnp.where(valid, values, INF)
    neg, idx = jax.lax.top_k(-values, k)
    top_values = -neg
    top_valid = jnp.isfinite(top_values)
    return top_values, idx, top_valid


def topk_descending(values, valid, k: int):
    """Largest-k with deterministic lowest-index tiebreak."""
    values = jnp.where(valid, values, -INF)
    top_values, idx = jax.lax.top_k(values, k)
    top_valid = jnp.isfinite(top_values)
    return top_values, idx, top_valid


@functools.partial(
    jax.jit, static_argnames=("distance", "aggregation", "k", "num_groups")
)
def exact_search(
    corpus,
    row_valid,
    group_ids,
    queries,
    *,
    num_groups: int,
    k: int,
    distance: Distance = "cosine",
    aggregation: Aggregation = "min",
    weights=None,
):
    """One-shot exact search: queries (Q, D) → per-query top-k groups.

    Returns (dist (Q, k), group_idx (Q, k), valid (Q, k)). This is the
    fp32 brute-force baseline named by BASELINE config #1.
    """
    dists = pairwise_distance(corpus, queries, distance)  # (Q, N)

    def per_query(row_dist):
        group_dist, group_valid = aggregate_rows(
            row_dist,
            group_ids,
            num_groups,
            aggregation,
            row_valid=row_valid,
            weights=weights,
        )
        return topk_ascending(group_dist, group_valid, k)

    return jax.vmap(per_query)(dists)
