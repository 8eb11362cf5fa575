"""Asymmetric scan probe: bf16 queries × int8 codes vs symmetric
int8 × int8. Queries are never stored, so keeping them full-precision is
free memory-wise, and the scan GEMM runs at bf16 MXU rate either way
(codes cast to bf16 in-kernel). Only question: recall and QPS.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from panoptikon_tpu.ops import codec, scoring
from panoptikon_tpu.ops.exact import INF

print("devices:", jax.devices(), flush=True)

N, D, Q, K = 1_000_000, 512, 4096, 10
R = 8
key = jax.random.key(7)
kc, kq = jax.random.split(key)
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

SUB = 128
f32_sumsq = scoring.row_sumsq_chunked(corpus)
ev, ei, _ = scoring.streaming_topk(
    corpus, f32_sumsq, row_valid, queries[:SUB], k=K,
    distance="cosine", chunk_rows=125_000)
ei = np.asarray(ei)
print("exact truth done", flush=True)


@functools.partial(jax.jit, static_argnames=("k", "oversample"))
def asym_topk(codes, sumsq, row_valid, corpus, queries, *, k, oversample):
    """bf16 queries × int8 codes (cast bf16): cosine is scale-invariant
    in the corpus argument, so code-space column norms work unchanged."""
    kk = k * oversample
    dots = jax.lax.dot_general(
        queries.astype(jnp.bfloat16), codes.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    qq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=1)[:, None]
    cc = sumsq.astype(jnp.float32)[None, :]
    dist = 1.0 - dots / jnp.sqrt(jnp.maximum(qq * cc, 1e-30))
    dist = jnp.where(row_valid[None, :], dist, INF)
    cand_v, cand_i = jax.lax.approx_min_k(dist, k=kk)
    cand_rows = corpus[cand_i].astype(jnp.float32)
    qf = queries.astype(jnp.float32)
    cdots = jnp.einsum("qd,qkd->qk", qf, cand_rows,
                       preferred_element_type=jnp.float32)
    cn = jnp.linalg.norm(cand_rows, axis=-1)
    qn = jnp.linalg.norm(qf, axis=-1)[:, None]
    exact_d = 1.0 - cdots / jnp.maximum(cn * qn, 1e-30)
    exact_d = jnp.where(jnp.isfinite(cand_v), exact_d, INF)
    neg, sel = jax.lax.top_k(-exact_d, k)
    return -neg, jnp.take_along_axis(cand_i, sel, axis=1)


for oversample in (4, 8):
    out = asym_topk(codes, sumsq, row_valid, corpus, queries,
                    k=K, oversample=oversample)
    qi = np.asarray(out[1])[:SUB]
    recall = float(np.mean(
        [len(set(ei[i]) & set(qi[i])) / K for i in range(SUB)]))

    @jax.jit
    def chained(codes, sumsq, row_valid, corpus, queries,
                oversample=oversample):
        def body(i, carry):
            qf, acc = carry
            dist, idx = asym_topk(codes, sumsq, row_valid, corpus, qf,
                                  k=K, oversample=oversample)
            return qf + dist[:, :1] * 1e-6, acc + dist[0, 0]

        _, acc = jax.lax.fori_loop(0, R, body, (queries, jnp.float32(0.0)))
        return acc

    acc = chained(codes, sumsq, row_valid, corpus, queries)
    float(acc)
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        acc = chained(codes, sumsq, row_valid, corpus, queries)
        float(acc)
        times.append(time.perf_counter() - t0)
    qps = Q * R / min(times)
    print(f"asymmetric oversample={oversample}: {qps:.0f} QPS, "
          f"recall@10={recall:.4f}", flush=True)
print("done", flush=True)
