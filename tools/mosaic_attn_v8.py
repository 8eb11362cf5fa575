"""V8: loop-chained timing (16 dependent iterations inside one jit, one
scalar readback) — removes the ~25 ms tunnel round-trip constant that
poisoned standalone micro-benchmarks.

Measures per-iteration cost of:
  noop chain     (the timing floor)
  pallas V6 kernel (batched 16-head attention, pre-T layout)
  XLA SDPA       (same layout)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

print("devices:", jax.devices(), flush=True)

B, N, H, D = 256, 257, 16, 64
HB = 16
ITERS = 16
ks = jax.random.split(jax.random.key(0), 3)
qT = jax.random.normal(ks[0], (B * H, N, D), dtype=jnp.bfloat16)
kT = jax.random.normal(ks[1], (B * H, N, D), dtype=jnp.bfloat16)
vT = jax.random.normal(ks[2], (B * H, N, D), dtype=jnp.bfloat16)
scale = D ** -0.5


def v6_kernel(q_ref, k_ref, v_ref, o_ref):
    lt = jax.lax.dot_general(
        k_ref[...], q_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(lt, axis=1, keepdims=True)
    e = jnp.exp(lt - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = (e / s).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        p, v_ref[...], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


block = pl.BlockSpec((HB, N, D), lambda i: (i, 0, 0))
pallas_attn = lambda q, k, v: pl.pallas_call(
    v6_kernel,
    grid=(B * H // HB,),
    in_specs=[block, block, block],
    out_specs=block,
    out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
)(q, k, v)


def chain(attn_fn):
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            out = attn_fn(q, k, v)
            return q + out * jnp.bfloat16(1e-4)

        return jax.lax.fori_loop(0, ITERS, body, q)

    return run


def noop_chain():
    @jax.jit
    def run(q, k, v):
        def body(i, q):
            return q * jnp.bfloat16(1.0001)

        return jax.lax.fori_loop(0, ITERS, body, q)

    return run


def xla_sdpa(q, k, v):
    q4 = q.reshape(B, H, N, D)
    k4 = k.reshape(B, H, N, D)
    v4 = v.reshape(B, H, N, D)
    # (B, H, N, D) -> jax SDPA wants (B, N, H, D)
    out = jax.nn.dot_product_attention(
        q4.transpose(0, 2, 1, 3), k4.transpose(0, 2, 1, 3),
        v4.transpose(0, 2, 1, 3))
    return out.transpose(0, 2, 1, 3).reshape(B * H, N, D)


def bench(fn, label):
    try:
        t0 = time.perf_counter()
        out = fn(qT, kT, vT)
        _ = float(jnp.asarray(out).ravel()[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(qT, kT, vT)
            _ = float(jnp.asarray(out).ravel()[0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{label}: compile {compile_s:.1f}s best {best*1000:.2f} ms "
              f"-> {best*1000/ITERS:.2f} ms/iter", flush=True)
    except Exception as exc:
        print(f"{label} FAILED: {str(exc)[:250]}", flush=True)


bench(noop_chain(), "noop chain")
bench(chain(pallas_attn), "pallas V6 x16")
bench(chain(xla_sdpa), "XLA SDPA x16")
print("done", flush=True)
