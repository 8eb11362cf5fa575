"""Device-side multi-space RRF fusion — the composed-query hot path.

The reference's composed semantic queries (its headline perf wins,
docs/vector-int8-quant.md:236-252) fuse per-filter rank lists with
reciprocal-rank fusion in SQL. Here the fusion runs ON DEVICE over each
space's oversampled candidate list: per-space top-kk ids arrive ranked
(rank r = list position), every id's contributions sum as
``Σ_s w_s / (rrf_k + r_s + 1)``, and one top-k extracts the fused page.
No (Q, N) surface ever round-trips the host; multi-chip composition is
per-space ``index.sharded.sharded_search`` feeding the same join.

Exactness bound (for serving layers that must match a full-rank oracle):
an item absent from EVERY space's candidate list has fused total
< Σ_s w_s/(rrf_k + kk + 1). If the returned k-th total is ≥ that bound,
the page is provably identical to full-rank RRF; otherwise the caller
falls back to full-surface ranks (``rrf_fuse_full``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

RANK_MISSING = jnp.iinfo(jnp.int32).max


def candidate_exactness_bound(weights, rrf_k, kk: int) -> float:
    """Max possible fused total for an item outside all candidate lists.
    ``rrf_k`` may be one float or a per-space sequence."""
    try:
        ks = list(rrf_k)
    except TypeError:
        ks = [rrf_k] * len(list(weights))
    return float(sum(w / (kf + kk + 1.0) for w, kf in zip(weights, ks)))


@functools.partial(jax.jit, static_argnames=("k",))
def rrf_fuse_candidates(cand_ids, weights, *, k: int, rrf_k=60.0):
    """Fuse S spaces' ranked candidate ids → fused top-k per query.

    cand_ids: (S, Q, kk) int32 — each space's top-kk ids in rank order
    (invalid slots = a sentinel id < 0 or 2^30; they contribute nothing).
    weights: (S,) f32; rrf_k: scalar or (S,) per-space constants (PQL's
    ``Rrf{k, weight}`` is per filter). Returns (totals (Q, k), ids (Q, k)).

    The duplicate-sum join is sort-based: ids sort per query, and since an
    id appears at most once per space, at most S adjacent entries share an
    id — S-1 adjacent-pair adds replace a segment reduction.
    """
    s, q, kk = cand_ids.shape
    ranks = jnp.arange(1.0, kk + 1.0, dtype=jnp.float32)
    rrf_ks = jnp.broadcast_to(
        jnp.asarray(rrf_k, jnp.float32).reshape(-1, 1, 1), (s, 1, 1)
    )
    contrib = weights[:, None, None].astype(jnp.float32) / (
        rrf_ks + ranks[None, None, :]
    )
    contrib = jnp.broadcast_to(contrib, (s, q, kk))
    valid = (cand_ids >= 0) & (cand_ids < jnp.int32(2**30))
    contrib = jnp.where(valid, contrib, 0.0)
    safe_ids = jnp.where(valid, cand_ids, jnp.int32(2**30))

    flat_ids = jnp.transpose(safe_ids, (1, 0, 2)).reshape(q, s * kk)
    flat_sc = jnp.transpose(contrib, (1, 0, 2)).reshape(q, s * kk)
    order = jnp.argsort(flat_ids, axis=1)
    sid = jnp.take_along_axis(flat_ids, order, axis=1)
    ssc = jnp.take_along_axis(flat_sc, order, axis=1)
    # Sum runs of equal ids into their FIRST position: each id appears at
    # most S times, so S-1 shifted adds cover every run.
    total = ssc
    for shift in range(1, s):
        same = sid[:, shift:] == sid[:, :-shift]
        total = total.at[:, : sid.shape[1] - shift].add(
            jnp.where(same, ssc[:, shift:], 0.0)
        )
    first = jnp.concatenate(
        [jnp.ones_like(sid[:, :1], bool), sid[:, 1:] != sid[:, :-1]], axis=1
    )
    fused = jnp.where(first & (sid < 2**30), total, -jnp.inf)
    top_v, pos = jax.lax.top_k(fused, k)
    top_ids = jnp.take_along_axis(sid, pos, axis=1)
    return top_v, top_ids


@functools.partial(
    jax.jit, static_argnames=("kk", "n_items", "contig_offsets")
)
def rank_join_topk_batch(surfs, valids, item_idx, weights, rrf_ks, *,
                         kk: int, n_items: int, contig_offsets=None):
    """Batched EXACT RRF rank join: ``rank_join_topk`` over B co-arriving
    queries in ONE program (the serving coalescer's composed-query runner).

    surfs/valids: tuples of (B, M_s) arrays; item_idx: tuples of (M_s,)
    slot→item maps SHARED across the batch (one space snapshot serves all
    rows); weights/rrf_ks: (B, S) f32 — each query keeps its own PQL
    ``Rrf{k, weight}``. Every per-row operation (argsort ranks, scatter,
    contribution sum, top-k) is row-independent, so row b of the batched
    program is bit-identical to its solo ``rank_join_topk`` run — the same
    argument that makes the int8 scan coalescer exact.

    Returns (cand_items (B, kk) int32, cand_ranks (B, kk, S) int32 with
    RANK_MISSING for absent, totals_f32 (B, kk)).
    """
    if contig_offsets is None:
        contig_offsets = (None,) * len(surfs)
    b = surfs[0].shape[0]
    total = jnp.zeros((b, n_items), jnp.float32)
    item_ranks = []
    for si, (surf, valid, idx, off) in enumerate(
        zip(surfs, valids, item_idx, contig_offsets)
    ):
        key = jnp.where(valid, surf, jnp.inf)
        m = key.shape[1]
        rank = (
            jnp.argsort(jnp.argsort(key, axis=1), axis=1).astype(jnp.int32)
            + jnp.int32(1)
        )
        rank = jnp.where(valid, rank, RANK_MISSING)
        if off is not None:
            ir = jnp.pad(
                rank, ((0, 0), (off, max(n_items - off - m, 0))),
                constant_values=RANK_MISSING,
            )[:, :n_items]
        else:
            safe_idx = jnp.where(idx >= 0, idx, n_items)  # pads → scrap
            ir = jnp.full((b, n_items + 1), RANK_MISSING, jnp.int32)
            ir = ir.at[:, safe_idx].min(rank)
            ir = ir[:, :n_items]
        item_ranks.append(ir)
        contrib = jnp.where(
            ir < RANK_MISSING,
            weights[:, si, None] / (
                rrf_ks[:, si, None] + ir.astype(jnp.float32)
            ),
            0.0,
        )
        total = total + contrib
    t32, cand = jax.lax.top_k(total, kk)
    cand_ranks = jnp.stack(
        [jnp.take_along_axis(ir, cand, axis=1) for ir in item_ranks], axis=2
    )
    return cand.astype(jnp.int32), cand_ranks, t32


@functools.partial(
    jax.jit, static_argnames=("kk", "n_items", "contig_offsets")
)
def rank_join_topk(surfs, valids, item_idx, weights, rrf_ks, *, kk: int,
                   n_items: int, contig_offsets=None):
    """EXACT device-side RRF rank join over full score surfaces.

    The serving answer to SURVEY §7 hard part 3: per-space distance
    surfaces (different slot domains, different dims upstream) become
    per-item RANKS via a device argsort, scatter into a shared item-id
    domain, and fuse as Σ w/(k + rank) — the reference's SQL rank join
    (pql/builder.rs OrderByFilter coalescing) with the O(N log N) work on
    the device instead of the host. Only the top-kk candidates (ids, their
    per-space ranks, f32 totals) read back; the host recomputes exact f64
    totals from the integer ranks and certifies the page against the
    kk-th f32 total (+ float-error margin), so the served page is
    bit-identical to the full host path.

    surfs/valids/item_idx: tuples of (M_s,) arrays — ascending-better f32
    scores, validity, and slot→item-id maps (−1 = padding). Stable argsort
    ties resolve by slot index; callers must guarantee slot order == the
    host's base-row tie order (checked host-side). weights/rrf_ks: (S,)
    f32 — traced, so per-query RRF parameters don't retrigger compilation.

    Returns (cand_items (kk,) int32, cand_ranks (kk, S) int32 with
    RANK_MISSING for absent, totals_f32 (kk,)).
    """
    if contig_offsets is None:
        contig_offsets = (None,) * len(surfs)
    total = jnp.zeros((n_items,), jnp.float32)
    item_ranks = []
    for si, (surf, valid, idx, off) in enumerate(
        zip(surfs, valids, item_idx, contig_offsets)
    ):
        key = jnp.where(valid, surf, jnp.inf)
        m = key.shape[0]
        # Inverse permutation via double argsort: a positional scatter
        # costs ~70 ms at 4M on this chip; the second argsort rides the
        # already-sorted keys for ~10 ms (measured, tools/rank_join_probe).
        rank = (
            jnp.argsort(jnp.argsort(key)).astype(jnp.int32) + jnp.int32(1)
        )
        rank = jnp.where(valid, rank, RANK_MISSING)
        if off is not None:
            # Contiguous slot→item map (fresh corpora: item id = slot +
            # off): pad/slice instead of a scatter (~100 ms saved at 4M).
            ir = jnp.pad(
                rank, (off, max(n_items - off - m, 0)),
                constant_values=RANK_MISSING,
            )[:n_items]
        else:
            safe_idx = jnp.where(idx >= 0, idx, n_items)  # pads → scrap
            ir = jnp.full((n_items + 1,), RANK_MISSING, jnp.int32)
            ir = ir.at[safe_idx].min(rank)
            ir = ir[:n_items]
        item_ranks.append(ir)
        contrib = jnp.where(
            ir < RANK_MISSING,
            weights[si] / (rrf_ks[si] + ir.astype(jnp.float32)),
            0.0,
        )
        total = total + contrib
    t32, cand = jax.lax.top_k(total, kk)
    cand_ranks = jnp.stack([ir[cand] for ir in item_ranks], axis=1)
    return cand.astype(jnp.int32), cand_ranks, t32


@functools.partial(jax.jit, static_argnames=("k", "rrf_k"))
def rrf_fuse_full(dists, valids, weights, *, k: int, rrf_k: float = 60.0):
    """Full-surface RRF: per-space (Q, M) distances over a SHARED id domain
    → exact fused top-k. Ranks come from a per-space argsort (ascending
    distance, invalid last); invalid entries contribute nothing.

    dists: (S, Q, M) f32; valids: (S, Q, M) bool; weights: (S,).
    Returns (totals (Q, k), ids (Q, k)) with ids = column indices.
    """
    s, q, m = dists.shape
    masked = jnp.where(valids, dists, jnp.inf)
    order = jnp.argsort(masked, axis=2)  # (S, Q, M) ids by ascending dist
    rank = jnp.argsort(order, axis=2).astype(jnp.float32)  # rank of each id
    contrib = weights[:, None, None].astype(jnp.float32) / (rrf_k + rank + 1.0)
    contrib = jnp.where(valids, contrib, 0.0)
    totals = jnp.sum(contrib, axis=0)  # (Q, M)
    any_valid = jnp.any(valids, axis=0)
    totals = jnp.where(any_valid, totals, -jnp.inf)
    top_v, top_ids = jax.lax.top_k(totals, k)
    return top_v, top_ids
