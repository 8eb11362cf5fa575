"""pallas_int8_topk_v2 vs the XLA approx_min_k path at the bench shape
(1M×512, Q=4096), raw candidates and end-to-end with f32 rescore."""

import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.ops import scoring
from panoptikon_tpu.ops.pallas_scan import pallas_int8_topk_v2

print("devices:", jax.devices(), flush=True)
n, d, q, k = 1_000_000, 512, 4096, 10
TILE = 2048
n_pad = ((n + TILE - 1) // TILE) * TILE
key = jax.random.key(0)
codes = jax.random.randint(key, (n, d), -127, 128, dtype=jnp.int8)
codes = jnp.pad(codes, ((0, n_pad - n), (0, 0)))
qc = jax.random.randint(jax.random.key(1), (q, d), -127, 128, dtype=jnp.int8)
sumsq = scoring.row_sumsq_chunked(codes)
valid = (jnp.arange(n_pad) < n)


def timed(name, fn, *args, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    float(out[0][0, 0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        float(out[0][0, 0])
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: {best*1000:.1f} ms -> {q/best:.0f} QPS", flush=True)
    return out


import functools


@functools.partial(jax.jit, static_argnames=("kk",))
def xla_approx(qc, codes, sumsq, valid, kk=80):
    dots = jax.lax.dot_general(
        qc.astype(jnp.bfloat16), codes.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    qq = jnp.sum(qc.astype(jnp.int32) ** 2, axis=-1).astype(jnp.float32)
    dist = 1.0 - dots / jnp.sqrt(
        jnp.maximum(sumsq.astype(jnp.float32)[None, :] * qq[:, None], 1e-30)
    )
    dist = jnp.where(valid[None, :], dist, jnp.inf)
    return jax.lax.approx_min_k(dist, k=kk)


a = timed("xla approx_min_k(80)", xla_approx, qc, codes, sumsq, valid)
b = timed(
    "pallas v2 (k=80, k_tile=8)", pallas_int8_topk_v2,
    codes, sumsq, valid, qc, k=80, k_tile=8, tile_n=2048, q_block=256,
)

# Candidate overlap sanity between the two approximate paths.
import numpy as np

ai = np.asarray(a[1])[:64]
bi = np.asarray(b[1])[:64]
overlap = np.mean([
    len(set(ai[i]) & set(bi[i])) / ai.shape[1] for i in range(len(ai))
])
print(f"candidate overlap xla-vs-pallas: {overlap:.3f}", flush=True)
