"""Benchmark rig. Prints ONE JSON line for the driver.

Primary metric: int8 query throughput at 1M×512d on one chip (BASELINE.md
rebuild target: ≥5,000 QPS; the reference's SQL scan is a fraction of a QPS
at this scale — docs/vector-int8-quant.md:218-226 measures 0.37-1.4 s per
query on 90k-690k vectors). ``vs_baseline`` is the ratio against the 5,000
QPS target.

Also verifies recall@10 of the int8 path against the fp32 exact scorer on
the same corpus and reports it to stderr — a throughput number with broken
recall is meaningless.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from panoptikon_tpu.ops import codec, scoring

    n, d, k = 1_000_000, 512, 10
    q_batch = 4096

    key = jax.random.key(0)
    kc, kq = jax.random.split(key)

    # Build the corpus on device: unit-norm f32 → frozen scale → int8 codes.
    corpus = jax.random.normal(kc, (n, d), dtype=jnp.float32)
    corpus = corpus / jnp.linalg.norm(corpus, axis=1, keepdims=True)
    absmax = float(jnp.max(jnp.abs(corpus)))
    scale = codec.scale_from_absmax(absmax)
    codes = codec.quantize_int8_jax(corpus, scale)
    row_valid = jnp.ones((n,), bool)
    sumsq = scoring.row_sumsq(codes)

    queries = jax.random.normal(kq, (q_batch, d), dtype=jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    q_codes = codec.quantize_int8_jax(queries, scale)

    def run():
        # Production path: int8 scan (bf16-exact GEMM) + approx top-k +
        # f32 rescoring of the oversampled candidates.
        return scoring.int8_topk_rescored(
            codes, sumsq, row_valid, corpus, q_codes, queries,
            k=k, oversample=8, distance="cosine", scale=scale,
        )

    # Warmup (compile) + timed runs; the scalar fetch forces execution.
    out = run()
    jax.block_until_ready(out)
    float(out[0][0, 0])
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run()
        float(out[0][0, 0])  # device sync via scalar readback
        times.append(time.perf_counter() - t0)
    best = min(times)
    qps = q_batch / best

    # Recall@10 vs fp32 exact on a query subsample.
    sub = 64
    f32_sumsq = scoring.row_sumsq(corpus)
    ev, ei, _ = scoring.streaming_topk(
        corpus, f32_sumsq, row_valid, queries[:sub], k=k, distance="cosine",
        chunk_rows=125_000,
    )
    qv, qi, _ = run()
    ei, qi = np.asarray(ei), np.asarray(qi)[:sub]
    recall = float(
        np.mean([len(set(ei[i]) & set(qi[i])) / k for i in range(sub)])
    )

    print(
        f"[bench] {n} x {d} int8+rescore, batch={q_batch}: best {best*1000:.1f} ms "
        f"({qps:.0f} QPS), recall@10 vs fp32 exact = {recall:.4f}, "
        f"times={['%.3f' % t for t in times]}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "int8_search_qps_1M_512d",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / 5000.0, 3),
                "detail": {
                    "recall_at_10_vs_fp32_exact": round(recall, 4),
                    "query_batch": q_batch,
                    "best_batch_latency_ms": round(best * 1000, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
