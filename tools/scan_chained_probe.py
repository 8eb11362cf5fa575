"""Chained-timing scan probe: how much of bench.py's measured scan time
is the ~25 ms tunnel readback constant vs true device time?

Chains R dependent scan iterations inside one jit (queries perturbed by
the previous iteration's top distances so no CSE), one scalar readback.
Compares per-iter time against the single-shot (readback-per-run) form.
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


def build_corpus():
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
    return buf, codes, scale


corpus, codes, scale = build_corpus()
row_valid = jnp.ones((N,), bool)
sumsq = scoring.row_sumsq_chunked(codes)
queries = jax.random.normal(kq, (Q, D), dtype=jnp.float32)
queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
q_codes = codec.quantize_int8_jax(queries, scale)
print("corpus built", flush=True)


def single():
    return scoring.int8_topk_rescored(
        codes, sumsq, row_valid, corpus, q_codes, queries,
        k=K, oversample=8, distance="cosine", scale=scale)


out = single()
float(out[0][0, 0])
times = []
for _ in range(5):
    t0 = time.perf_counter()
    out = single()
    float(out[0][0, 0])
    times.append(time.perf_counter() - t0)
print(f"single-shot (readback/run): {min(times)*1000:.1f} ms -> "
      f"{Q/min(times):.0f} QPS", flush=True)


@jax.jit
def chained(codes, sumsq, row_valid, corpus, q_codes, queries):
    def body(i, carry):
        qc, qf, acc = carry
        dist, idx, valid = scoring.int8_topk_rescored(
            codes, sumsq, row_valid, corpus, qc, qf,
            k=K, oversample=8, distance="cosine", scale=scale)
        # Perturb both query forms data-dependently so XLA can neither
        # CSE nor hoist any stage out of the loop (the perturbations are
        # zero in practice but not provably so).
        qf = qf + dist[:, :1] * 1e-6
        qc = qc + (dist[:, :1] > 1e30).astype(jnp.int8)
        return qc, qf, acc + dist[0, 0]

    _, _, acc = jax.lax.fori_loop(
        0, R, body, (q_codes, queries, jnp.float32(0.0)))
    return acc


t0 = time.perf_counter()
acc = chained(codes, sumsq, row_valid, corpus, q_codes, queries)
float(acc)
print(f"chained compile {time.perf_counter()-t0:.0f}s", flush=True)
times = []
for _ in range(5):
    t0 = time.perf_counter()
    acc = chained(codes, sumsq, row_valid, corpus, q_codes, queries)
    float(acc)
    times.append(time.perf_counter() - t0)
best = min(times)
print(f"chained x{R}: {best*1000:.1f} ms -> {best*1000/R:.1f} ms/iter -> "
      f"{Q*R/best:.0f} QPS steady-state", flush=True)
print("done", flush=True)
