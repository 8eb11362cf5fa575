"""Streaming fused scorer: chunked GEMM + distance epilogue + running top-k.

The production query path. The corpus (f32 vectors or int8 codes) is scanned
in static-shape chunks; each chunk contributes one MXU GEMM, a distance
epilogue computed from the dot products and precomputed per-row sum-of-
squares, and a fold into the running result — either a running top-k (one
row per item) or running per-group aggregates (multi-row items: text chunks,
video frames). Nothing of size (Q, N) is ever materialized, so HBM traffic
is the corpus bytes themselves — the design condition for hitting the
bandwidth roof at 1M+ vectors.

Distance semantics over int8 codes match the reference's quant arm, which
evaluates sqlite-vec distances directly on the codes
(docs/vector-int8-quant.md:53-79):

- COSINE on codes equals cosine on the dequantized vectors exactly — the
  scale cancels — so values are on the true axis already.
- L2 on codes is the true distance ÷ scale; ranking is identical. We rescale
  by the pair's frozen scale before returning, so values live on the true
  distance axis (the reference documents the raw code-space axis as a
  caveat; rescaling removes it without touching membership or order).

The int8 GEMM itself is `int8 × int8 → int32` on the MXU
(``preferred_element_type=jnp.int32``).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

from panoptikon_tpu.ops.exact import INF, topk_ascending

Distance = Literal["l2", "cosine"]
Aggregation = Literal["min", "max", "avg"]


@functools.partial(jax.jit, static_argnames=("k", "distance"))
def exact_oneshot(corpus, row_valid, queries, *, k: int, distance: Distance = "cosine"):
    """One-shot exact fp32 top-k (ground truth; HIGHEST matmul precision).

    Materializes (Q, N) — use only when that fits; the streaming scorer
    covers larger shapes.
    """
    corpus = corpus.astype(jnp.float32)
    queries = queries.astype(jnp.float32)
    dots = jax.lax.dot_general(
        queries, corpus,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    dist = _distance_epilogue(dots, row_sumsq(corpus), row_sumsq(queries), distance, 1.0)
    dist = jnp.where(row_valid[None, :], dist, INF)
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx, jnp.isfinite(-neg)


@functools.partial(
    jax.jit, static_argnames=("k", "oversample", "distance", "rescore")
)
def int8_topk_rescored(
    codes,
    sumsq,
    row_valid,
    corpus_f32,
    q_codes,
    q_f32,
    *,
    k: int,
    oversample: int = 8,
    distance: Distance = "cosine",
    scale: float = 1.0,
    rescore: bool = True,
):
    """The serving fast path: one-shot int8 scan + approx top-k + f32 rescore.

    Design notes (measured on the target chip):
    - int8 codes are the HBM-resident payload (¼ the f32 bytes — the scan
      is bandwidth-bound at large N); they are cast to bf16 INSIDE the
      kernel, which the MXU runs at full rate, and the cast is exact: both
      operands are integers ≤127, products ≤16129, and |dot| ≤ D·127² <
      2²⁴ stays exactly representable in the f32 accumulator for D ≤ 1040.
      The int8 dot products are therefore bit-identical to an int32 GEMM.
    - ``lax.approx_min_k`` is the TPU-native partial-reduction top-k; it
      costs ~nothing over the GEMM (measured), where exact ``top_k`` adds
      ~40%.
    - the optional f32 rescoring stage gathers the oversampled candidates'
      full-precision rows and re-ranks them exactly — recovering ≥99%
      recall@k from the int8 candidate set the same way the reference's
      design reserves rescoring for (vector-index-design.md upstream
      datum: int8 ≈ perfect at 2.6× oversample).

    Returns (dist (Q,k), row_idx (Q,k), valid (Q,k)).
    """
    q = q_codes.shape[0]
    kk = min(k * oversample, codes.shape[0])
    dots = jax.lax.dot_general(
        q_codes.astype(jnp.bfloat16),
        codes.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = _distance_epilogue(dots, sumsq, row_sumsq(q_codes), distance, scale)
    dist = jnp.where(row_valid[None, :], dist, INF)
    cand_v, cand_i = jax.lax.approx_min_k(dist, k=kk)
    if not rescore:
        neg, sel = jax.lax.top_k(-cand_v, k)
        top_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return -neg, top_i, jnp.isfinite(-neg)
    # (Q, kk, D) gather; upcast once — the rescore corpus may be stored
    # bf16 (memory parity: int8 codes + bf16 rescore rows = 3 B/dim, still
    # under the 4 B/dim fp32-exact baseline) and all math runs f32.
    cand_rows = corpus_f32[cand_i].astype(jnp.float32)
    qf = q_f32.astype(jnp.float32)
    cdots = jnp.einsum(
        "qd,qkd->qk", qf, cand_rows,
        preferred_element_type=jnp.float32,
    )
    if distance == "cosine":
        cn = jnp.linalg.norm(cand_rows, axis=-1)
        qn = jnp.linalg.norm(qf, axis=-1)[:, None]
        exact_d = 1.0 - cdots / jnp.maximum(cn * qn, 1e-30)
    else:
        csq = jnp.sum(cand_rows * cand_rows, axis=-1)
        qsq = jnp.sum(qf * qf, axis=-1)[:, None]
        exact_d = jnp.sqrt(jnp.maximum(qsq - 2.0 * cdots + csq, 0.0))
    exact_d = jnp.where(jnp.isfinite(cand_v), exact_d, INF)
    neg, sel = jax.lax.top_k(-exact_d, k)
    top_i = jnp.take_along_axis(cand_i, sel, axis=1)
    top_v = -neg
    return top_v, top_i, jnp.isfinite(top_v)


def row_sumsq(corpus) -> jax.Array:
    """Per-row sum of squares, precomputed at index build.

    int8 codes → int32 (exact: ≤ D·128² needs 31 bits up to D=131072);
    f32 vectors → f32.
    """
    if corpus.dtype == jnp.int8:
        wide = corpus.astype(jnp.int32)
        return jnp.sum(wide * wide, axis=-1)
    corpus = corpus.astype(jnp.float32)
    return jnp.sum(corpus * corpus, axis=-1)


def row_sumsq_chunked(corpus, chunk_rows: int = 250_000) -> jax.Array:
    """Host-driver row_sumsq for multi-GB corpora: the widened square
    (int8→int32 or bf16→f32) materializes 2×4 B/element when XLA declines
    to fuse it into the reduce — 20 GiB at 5M×512. Chunking bounds the
    transient to one slice."""
    n = corpus.shape[0]
    if n <= chunk_rows:
        return row_sumsq(corpus)
    fn = jax.jit(row_sumsq)
    parts = [
        fn(jax.lax.slice_in_dim(corpus, i, min(i + chunk_rows, n)))
        for i in range(0, n, chunk_rows)
    ]
    return jnp.concatenate(parts)


def _chunk_dots(queries, chunk):
    """(Q, D) × (C, D)ᵀ on the MXU. int8 inputs accumulate in int32."""
    if chunk.dtype == jnp.int8:
        return jax.lax.dot_general(
            queries.astype(jnp.int8),
            chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    return jax.lax.dot_general(
        queries.astype(jnp.float32),
        chunk.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _distance_epilogue(dots, chunk_sumsq, query_sumsq, distance, scale):
    """Dot products → distances on the true axis. All f32, VPU-only."""
    dots = dots.astype(jnp.float32)
    xx = chunk_sumsq.astype(jnp.float32)[None, :]
    qq = query_sumsq.astype(jnp.float32)[:, None]
    if distance == "cosine":
        denom = jnp.sqrt(jnp.maximum(xx * qq, 1e-30))
        return 1.0 - dots / denom
    if distance == "l2":
        sq = jnp.maximum(qq - 2.0 * dots + xx, 0.0)
        return jnp.float32(scale) * jnp.sqrt(sq)
    raise ValueError(f"Unknown distance {distance!r}")


@functools.partial(
    jax.jit,
    static_argnames=("k", "distance", "chunk_rows"),
)
def streaming_topk(
    corpus,
    sumsq,
    row_valid,
    queries,
    *,
    k: int,
    distance: Distance = "cosine",
    scale: float = 1.0,
    chunk_rows: int = 32768,
):
    """Top-k rows per query, streamed. One row per item (fast path).

    corpus: (N_pad, D) int8 or f32, N_pad divisible by chunk_rows;
    queries: (Q, D) same dtype domain as corpus (int8 codes quantized with
    the space's frozen scale, or f32). Returns (dist (Q,k), row_idx (Q,k),
    valid (Q,k)) with ascending distance, lowest-row-index tiebreak.
    """
    n = corpus.shape[0]
    num_chunks = n // chunk_rows
    assert num_chunks * chunk_rows == n, "corpus must be padded to chunk_rows"
    corpus_c = corpus.reshape(num_chunks, chunk_rows, corpus.shape[1])
    sumsq_c = sumsq.reshape(num_chunks, chunk_rows)
    valid_c = row_valid.reshape(num_chunks, chunk_rows)
    query_sumsq = row_sumsq(queries)
    q = queries.shape[0]

    init = (
        jnp.full((q, k), INF, dtype=jnp.float32),
        jnp.full((q, k), jnp.iinfo(jnp.int32).max, dtype=jnp.int32),
    )

    def body(carry, chunk_data):
        top_v, top_i = carry
        chunk_idx, chunk, chunk_sumsq, chunk_valid = chunk_data
        dots = _chunk_dots(queries, chunk)
        dist = _distance_epilogue(dots, chunk_sumsq, query_sumsq, distance, scale)
        dist = jnp.where(chunk_valid[None, :], dist, INF)
        rows = chunk_idx * chunk_rows + jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk_rows), 1
        )
        # Candidate set = carried top-k ++ this chunk; lax.top_k prefers
        # lower candidate positions on ties, and carried rows (always lower
        # row indices than this chunk's) sit first, so the ascending-row
        # tiebreak is preserved across chunks.
        cand_v = jnp.concatenate([top_v, dist], axis=1)
        cand_i = jnp.concatenate([top_i, jnp.broadcast_to(rows, (q, chunk_rows))], axis=1)
        neg_v, sel = jax.lax.top_k(-cand_v, k)
        return (-neg_v, jnp.take_along_axis(cand_i, sel, axis=1)), None

    chunk_ids = jnp.arange(num_chunks, dtype=jnp.int32)
    (top_v, top_i), _ = jax.lax.scan(
        body, init, (chunk_ids, corpus_c, sumsq_c, valid_c)
    )
    return top_v, top_i, jnp.isfinite(top_v)


@functools.partial(
    jax.jit,
    static_argnames=(
        "distance", "aggregation", "num_groups", "chunk_rows", "weighted",
        "identity",
    ),
)
def grouped_scores(
    corpus,
    sumsq,
    row_valid,
    group_ids,
    queries,
    *,
    num_groups: int,
    distance: Distance = "cosine",
    aggregation: Aggregation = "min",
    scale: float = 1.0,
    chunk_rows: int = 32768,
    weighted: bool = False,
    weights=None,
    identity: bool = False,
):
    """Full per-group score arrays: (Q, num_groups) distances, validity, counts.

    Streams per-group aggregates (MIN/MAX/AVG, or the confidence-weighted
    average ``SUM(d·w)/SUM(w)`` when ``weighted`` — exact.rs:64-80) into
    (Q, num_groups) accumulators. This is the PQL composition surface: rank
    fusion needs every candidate's score, not just top-k. Accumulator HBM
    footprint is Q·M·4 bytes, independent of rows per item.

    The third return is the per-group contributing row count (or weight sum
    when ``weighted``): multi-space AVG composition needs it to weight each
    space's mean by its row population, matching the reference's single
    ``AVG`` over the unioned rows (exact.rs:64-80) instead of a mean of
    per-space means.
    """
    n = corpus.shape[0]
    if identity and not weighted:
        # One-row-per-group layout (row i IS group slot i, the common case
        # for image-embedding spaces): the segment machinery degenerates to
        # the per-row epilogue — one GEMM, no scatters. Per-row dot products
        # and epilogue are the same computation as the segmented path
        # (segment_min/avg of a singleton segment is the element), so the
        # values are identical; this is purely a fast path. `num_groups` may
        # be < n (capacity padding) — pad rows are invalid by construction.
        dots = _chunk_dots(queries, corpus)
        dist = _distance_epilogue(dots, sumsq, row_sumsq(queries), distance, scale)
        dist = jnp.where(row_valid[None, :], dist, INF)[:, :num_groups]
        group_valid = row_valid[None, :num_groups]
        cnt = jnp.broadcast_to(
            group_valid.astype(jnp.float32), dist.shape
        )
        group_valid = jnp.broadcast_to(group_valid, dist.shape)
        return dist, group_valid, cnt
    num_chunks = n // chunk_rows
    assert num_chunks * chunk_rows == n, "corpus must be padded to chunk_rows"
    corpus_c = corpus.reshape(num_chunks, chunk_rows, corpus.shape[1])
    sumsq_c = sumsq.reshape(num_chunks, chunk_rows)
    valid_c = row_valid.reshape(num_chunks, chunk_rows)
    gid_c = group_ids.reshape(num_chunks, chunk_rows)
    if weights is None:
        weights = jnp.ones((n,), dtype=jnp.float32)
    w_c = weights.reshape(num_chunks, chunk_rows)
    query_sumsq = row_sumsq(queries)
    q = queries.shape[0]
    m = num_groups

    if weighted:
        init = (jnp.zeros((q, m), jnp.float32), jnp.zeros((q, m), jnp.float32))
    elif aggregation == "min":
        init = (jnp.full((q, m), INF, jnp.float32), jnp.zeros((q, m), jnp.float32))
    elif aggregation == "max":
        init = (jnp.full((q, m), -INF, jnp.float32), jnp.zeros((q, m), jnp.float32))
    else:  # avg: (sum, count)
        init = (jnp.zeros((q, m), jnp.float32), jnp.zeros((q, m), jnp.float32))

    def body(carry, chunk_data):
        acc_a, acc_b = carry
        chunk, chunk_sumsq, chunk_valid, gids, w = chunk_data
        dots = _chunk_dots(queries, chunk)
        dist = _distance_epilogue(dots, chunk_sumsq, query_sumsq, distance, scale)
        # Invalid rows route to a scrap segment.
        safe_ids = jnp.where(chunk_valid, gids, m)

        def seg(vals, reducer, fill):
            return reducer(
                jnp.where(chunk_valid[None, :], vals, fill),
                safe_ids,
                num_segments=m + 1,
            )[:, :m]

        seg_sum = functools.partial(jax.vmap(
            lambda v, i: jax.ops.segment_sum(v, i, num_segments=m + 1),
            in_axes=(0, None),
        ))
        if weighted:
            wv = jnp.where(chunk_valid, w, 0.0)
            acc_a = acc_a + seg_sum(dist * wv[None, :], safe_ids)[:, :m]
            acc_b = acc_b + seg_sum(jnp.broadcast_to(wv[None, :], dist.shape), safe_ids)[:, :m]
        elif aggregation == "min":
            chunk_min = jax.vmap(
                lambda v, i: jax.ops.segment_min(v, i, num_segments=m + 1),
                in_axes=(0, None),
            )(jnp.where(chunk_valid[None, :], dist, INF), safe_ids)[:, :m]
            acc_a = jnp.minimum(acc_a, chunk_min)
            acc_b = acc_b + seg_sum(
                jnp.broadcast_to(chunk_valid[None, :].astype(jnp.float32), dist.shape),
                safe_ids,
            )[:, :m]
        elif aggregation == "max":
            chunk_max = jax.vmap(
                lambda v, i: jax.ops.segment_max(v, i, num_segments=m + 1),
                in_axes=(0, None),
            )(jnp.where(chunk_valid[None, :], dist, -INF), safe_ids)[:, :m]
            acc_a = jnp.maximum(acc_a, chunk_max)
            acc_b = acc_b + seg_sum(
                jnp.broadcast_to(chunk_valid[None, :].astype(jnp.float32), dist.shape),
                safe_ids,
            )[:, :m]
        else:  # avg
            acc_a = acc_a + seg_sum(jnp.where(chunk_valid[None, :], dist, 0.0), safe_ids)[:, :m]
            acc_b = acc_b + seg_sum(
                jnp.broadcast_to(chunk_valid[None, :].astype(jnp.float32), dist.shape),
                safe_ids,
            )[:, :m]
        return (acc_a, acc_b), None

    (acc_a, acc_b), _ = jax.lax.scan(body, init, (corpus_c, sumsq_c, valid_c, gid_c, w_c))

    group_valid = acc_b > 0
    if weighted:
        group_dist = acc_a / jnp.maximum(acc_b, 1e-30)
    elif aggregation in ("min", "max"):
        group_dist = acc_a
    else:
        group_dist = acc_a / jnp.maximum(acc_b, 1.0)
    group_dist = jnp.where(group_valid, group_dist, INF)
    return group_dist, group_valid, acc_b


@functools.partial(jax.jit, static_argnames=("kk", "largest"))
def topk_of_scores(dist, valid, *, kk: int, largest: bool = False):
    """Exact top-kk over an existing (Q, M) score surface (device-resident —
    the output of :func:`grouped_scores`), reading back only kk entries.

    This is the fused serving path's second stage: chaining it after
    ``grouped_scores`` keeps the full surface on device and guarantees the
    candidate VALUES are bit-identical to the full-readback path (same
    program produced them). ``largest=False`` returns ascending distances
    (best first); ``largest=True`` descending. Ties resolve to the lowest
    slot (lax.top_k's positional preference). Invalid slots come back as
    ±INF with ``valid_out`` False.
    """
    fill = -INF if largest else INF
    key = jnp.where(valid, dist, fill)
    if largest:
        top_v, top_i = jax.lax.top_k(key, kk)
    else:
        neg, top_i = jax.lax.top_k(-key, kk)
        top_v = -neg
    return top_v, top_i, jnp.isfinite(top_v)


@functools.partial(jax.jit, static_argnames=("kk", "largest"))
def masked_topk_of_scores(dist, valid, mask, *, kk: int, largest: bool = False):
    """Top-kk over a surface RESTRICTED to a per-query group mask.

    The fused path's scoped primitive for big scopes: a metadata/FTS
    filter's item-set ships host→device as a (B, M) bool mask (uploads are
    ~70× cheaper than readbacks over the serving link), the top-k runs over
    the masked surface on device, and only kk entries read back — instead
    of gathering the whole scope's scores to the host. Same tie/fill
    semantics as :func:`topk_of_scores`."""
    fill = -INF if largest else INF
    key = jnp.where(valid & mask, dist, fill)
    if largest:
        top_v, top_i = jax.lax.top_k(key, kk)
    else:
        neg, top_i = jax.lax.top_k(-key, kk)
        top_v = -neg
    return top_v, top_i, jnp.isfinite(top_v)


@jax.jit
def gather_of_scores(dist, valid, idx):
    """Gather specific slots' scores off a device surface: (Q, M) × (S,)
    padded slot indices (−1 = pad) → ((Q, S) values, (Q, S) valid).

    The fused path's SCOPED primitive: when a metadata/FTS filter narrows
    the context to a small row set, the exact ranks inside that scope need
    each scope item's score — a tiny gather instead of a top-k over the
    whole domain. Readback is S·8 bytes."""
    safe = jnp.clip(idx, 0, dist.shape[1] - 1)
    ok = (idx >= 0)[None, :] & jnp.take(valid, safe, axis=1)
    vals = jnp.where(ok, jnp.take(dist, safe, axis=1), INF)
    return vals, ok


@jax.jit
def gather_rows_of_scores(dist, valid, idx):
    """Per-row gather variant for COALESCED queries: (B, M) surfaces ×
    (B, S) padded slot indices (−1 = pad), each batched query gathering its
    OWN scope. Same element semantics as :func:`gather_of_scores`."""
    safe = jnp.clip(idx, 0, dist.shape[1] - 1)
    ok = (idx >= 0) & jnp.take_along_axis(valid, safe, axis=1)
    vals = jnp.where(ok, jnp.take_along_axis(dist, safe, axis=1), INF)
    return vals, ok


@functools.partial(
    jax.jit,
    static_argnames=("k", "distance", "aggregation", "num_groups", "chunk_rows", "weighted"),
)
def streaming_grouped_topk(
    corpus,
    sumsq,
    row_valid,
    group_ids,
    queries,
    *,
    num_groups: int,
    k: int,
    distance: Distance = "cosine",
    aggregation: Aggregation = "min",
    scale: float = 1.0,
    chunk_rows: int = 32768,
    weighted: bool = False,
    weights=None,
):
    """Top-k groups per query: :func:`grouped_scores` + masked top-k."""
    group_dist, group_valid, _ = grouped_scores(
        corpus,
        sumsq,
        row_valid,
        group_ids,
        queries,
        num_groups=num_groups,
        distance=distance,
        aggregation=aggregation,
        scale=scale,
        chunk_rows=chunk_rows,
        weighted=weighted,
        weights=weights,
    )
    return jax.vmap(lambda v, va: topk_ascending(v, va, k))(group_dist, group_valid)
