"""Oversample↔recall↔QPS tradeoff at 1M×512 (steady-state timing).

Weak-point context: recall@10 at oversample=8 is 0.9938 on the
adversarial iid corpus — 0.0038 over the 0.99 floor. With the scan at
the bf16 roofline (149k QPS), spending throughput on a deeper candidate
set may buy a structurally safer margin.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from panoptikon_tpu.ops import codec, scoring

print("devices:", jax.devices(), flush=True)

N, D, Q, K = 1_000_000, 512, 4096, 10
R = 8
key = jax.random.key(7)
kc, kq = jax.random.split(key)

import functools

chunks, rows = 10, N // 10


@functools.partial(jax.jit, donate_argnums=(1,))
def gen(ck, buf, i):
    c = jax.random.normal(ck, (rows, D), dtype=jnp.float32)
    c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
    return jax.lax.dynamic_update_slice(buf, c, (i * rows, 0)), jnp.max(jnp.abs(c))


buf = jnp.zeros((N, D), jnp.float32)
absmax = 0.0
for i in range(chunks):
    buf, am = gen(jax.random.fold_in(kc, i), buf, i)
    absmax = max(absmax, float(am))
scale = codec.scale_from_absmax(absmax)
codes = codec.quantize_int8_jax(buf, scale)
corpus = buf
row_valid = jnp.ones((N,), bool)
sumsq = scoring.row_sumsq_chunked(codes)
queries = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
q_codes = codec.quantize_int8_jax(queries, scale)
print("corpus built", flush=True)

# Exact ground truth on a subsample.
SUB = 128
f32_sumsq = scoring.row_sumsq_chunked(corpus)
ev, ei, _ = scoring.streaming_topk(
    corpus, f32_sumsq, row_valid, queries[:SUB], k=K,
    distance="cosine", chunk_rows=125_000)
ei = np.asarray(ei)
print("exact truth done", flush=True)

for oversample in (8, 12, 16, 24):
    @jax.jit
    def chained(codes, sumsq, row_valid, corpus, q_codes, queries,
                oversample=oversample):
        def body(i, carry):
            qc, qf, acc = carry
            dist, idx, valid = scoring.int8_topk_rescored(
                codes, sumsq, row_valid, corpus, qc, qf,
                k=K, oversample=oversample, distance="cosine", scale=scale)
            qf = qf + dist[:, :1] * 1e-6
            qc = qc + (dist[:, :1] > 1e30).astype(jnp.int8)
            return qc, qf, acc + dist[0, 0]

        _, _, acc = jax.lax.fori_loop(
            0, R, body, (q_codes, queries, jnp.float32(0.0)))
        return acc

    acc = chained(codes, sumsq, row_valid, corpus, q_codes, queries)
    float(acc)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        acc = chained(codes, sumsq, row_valid, corpus, q_codes, queries)
        float(acc)
        times.append(time.perf_counter() - t0)
    qps = Q * R / min(times)

    out = scoring.int8_topk_rescored(
        codes, sumsq, row_valid, corpus, q_codes, queries,
        k=K, oversample=oversample, distance="cosine", scale=scale)
    qi = np.asarray(out[1])[:SUB]
    recall = float(np.mean(
        [len(set(ei[i]) & set(qi[i])) / K for i in range(SUB)]))
    print(f"oversample={oversample}: {qps:.0f} QPS steady-state, "
          f"recall@10={recall:.4f}", flush=True)
print("done", flush=True)
