"""Pallas fused int8 scan kernel: GEMM + distance epilogue + partial top-k.

Motivation: the XLA one-shot path materializes the (Q, N) f32 distance
matrix to HBM before ``approx_min_k`` reads it back; this kernel keeps each
distance tile in VMEM, reduces it to per-tile top-k candidates on the spot,
and writes only (tiles, Q, K).

Measured outcome on the target chip (1M×512, Q=512, k=10): 37.9 ms vs
31.6 ms for the XLA ``approx_min_k``+rescore path — XLA's scheduling of the
large single GEMM beats the per-tile kernel (whose K-round extract-min and
smaller MXU tiles cost more than the avoided HBM round-trip at this chip's
33 TFLOPs / 69 GB/s balance). The XLA path is therefore the production
default (``ops.scoring.int8_topk_rescored``); this kernel remains the
fused alternative — bit-identical results, and the better candidate on
hardware where the FLOP:BW ratio tilts further toward bandwidth. tile_n is
VMEM-bounded: (Q·tile_n·4 + tile_n·D·3 + Q·D·2 + 2·Q·128·8) ≲ 16 MB.

Shape strategy:
- grid over corpus tiles of ``TILE_N`` rows; queries (≤512) stay resident
  in VMEM across the whole sweep;
- int8 codes are cast to bf16 in VMEM right before the MXU dot (exact for
  int8 operands, see ops.scoring); the epilogue runs on the VPU in f32;
- the per-tile top-k is K rounds of (min, argmin, mask) — K·Q·TILE_N VPU
  ops, noise next to the MXU work;
- the host-side finish is one ``top_k`` over (Q, tiles·K).

CPU tests run the kernel in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")  # plain literal — jnp constants would be captured consts


OUT_K = 128  # out-block lane width (Mosaic needs 128-aligned lane slices)


def _scan_kernel(q_ref, codes_ref, sumsq_ref, valid_ref, qq_ref, out_v, out_i, *, k, tile_n):
    # (Q, D) bf16 × (TILE_N, D) int8→bf16 → (Q, TILE_N) f32 on the MXU.
    codes = codes_ref[:].astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        q_ref[:],
        codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xx = sumsq_ref[:].astype(jnp.float32)  # (1, TILE_N)
    qq = qq_ref[:].astype(jnp.float32)  # (Q, 1)
    denom = jax.lax.rsqrt(jnp.maximum(xx * qq, 1e-30))
    dist = 1.0 - dots * denom
    dist = jnp.where(valid_ref[:] != 0, dist, INF)

    tile = pl.program_id(0)
    base = tile * tile_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)

    # K rounds of extract-min (value + lowest-index tiebreak, then mask the
    # winner). Results accumulate in registers and land as ONE aligned
    # (Q, OUT_K) block write — per-column stores would slice lanes at
    # unaligned widths, which Mosaic rejects.
    vals, idxs = [], []
    for _ in range(k):
        row_min = jnp.min(dist, axis=1)  # (Q,)
        is_min = dist == row_min[:, None]
        min_col = jnp.min(jnp.where(is_min, col_ids, jnp.int32(2**30)), axis=1)
        vals.append(row_min)
        idxs.append(min_col + base)
        dist = jnp.where(col_ids == min_col[:, None], INF, dist)
    q_n = dist.shape[0]
    val_block = jnp.stack(vals, axis=1)  # (Q, k)
    idx_block = jnp.stack(idxs, axis=1)
    pad = OUT_K - k
    out_v[:, :] = jnp.concatenate(
        [val_block, jnp.full((q_n, pad), INF, jnp.float32)], axis=1
    )
    out_i[:, :] = jnp.concatenate(
        [idx_block, jnp.full((q_n, pad), jnp.int32(2**30), jnp.int32)], axis=1
    )


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def pallas_int8_topk(
    codes,
    sumsq,
    row_valid,
    q_codes,
    *,
    k: int = 10,
    tile_n: int = 2048,
    interpret: bool = False,
):
    """Cosine top-k of int8 query codes against int8 corpus codes.

    codes: (N, D) int8, N divisible by tile_n; q_codes: (Q, D) int8.
    Returns (dist (Q, k), row_idx (Q, k), valid (Q, k)).
    """
    n, d = codes.shape
    q = q_codes.shape[0]
    assert n % tile_n == 0, "corpus must be padded to tile_n"
    tiles = n // tile_n
    assert k <= OUT_K, f"k must be <= {OUT_K}"

    q_bf = q_codes.astype(jnp.bfloat16)
    qq = jnp.sum(
        q_codes.astype(jnp.int32) ** 2, axis=1, keepdims=True
    ).astype(jnp.float32)  # (Q, 1)
    sumsq2 = sumsq.astype(jnp.float32).reshape(1, n)
    valid2 = row_valid.astype(jnp.int8).reshape(1, n)

    grid_spec = pl.GridSpec(
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, q, OUT_K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, OUT_K), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    def kernel(q_ref, codes_ref, sumsq_ref, valid_ref, qq_ref, out_v, out_i):
        _scan_kernel(
            q_ref, codes_ref, sumsq_ref, valid_ref, qq_ref,
            out_v.at[0], out_i.at[0], k=k, tile_n=tile_n,
        )

    part_v, part_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tiles, q, OUT_K), jnp.float32),
            jax.ShapeDtypeStruct((tiles, q, OUT_K), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * q * n * d,
            bytes_accessed=n * d + q * d * 2 + tiles * q * k * 8,
            transcendentals=0,
        ),
    )(q_bf, codes, sumsq2, valid2, qq)

    # Merge: (tiles, Q, K) → (Q, tiles·K) → exact top-k. Candidate order is
    # (tile, rank); lax.top_k's lowest-position preference keeps the global
    # ascending-row tiebreak.
    part_v = part_v[:, :, :k]
    part_i = part_i[:, :, :k]
    cand_v = jnp.transpose(part_v, (1, 0, 2)).reshape(q, tiles * k)
    cand_i = jnp.transpose(part_i, (1, 0, 2)).reshape(q, tiles * k)
    neg, sel = jax.lax.top_k(-cand_v, k)
    top_v = -neg
    top_i = jnp.take_along_axis(cand_i, sel, axis=1)
    return top_v, top_i, jnp.isfinite(top_v)
