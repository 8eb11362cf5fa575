"""V7: decompose the in-kernel cost of the V6 batched attention kernel.
All variants use the pre-transposed (B*H, N, D) layout, grid (B*H/HB,).

  full        : dots + softmax (V6 baseline re-measure)
  dots_only   : QK^T -> *c -> AV (no softmax at all)
  no_exp      : max/sum reductions kept, exp replaced by identity
  no_reduce   : exp kept, max/sum replaced by constants
  qk_only     : QK^T -> sum into (N, D) shape via slice trick (no AV)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

print("devices:", jax.devices(), flush=True)

B, N, H, D = 256, 257, 16, 64
HB = 16
ks = jax.random.split(jax.random.key(0), 3)
qT = jax.random.normal(ks[0], (B * H, N, D), dtype=jnp.bfloat16)
kT = jax.random.normal(ks[1], (B * H, N, D), dtype=jnp.bfloat16)
vT = jax.random.normal(ks[2], (B * H, N, D), dtype=jnp.bfloat16)
scale = D ** -0.5


def bench(fn, label):
    try:
        t0 = time.perf_counter()
        out = fn(qT, kT, vT)
        _ = float(jnp.asarray(out).ravel()[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = fn(qT, kT, vT)
            _ = float(jnp.asarray(out).ravel()[0])
            times.append(time.perf_counter() - t0)
        print(f"{label}: compile {compile_s:.1f}s best {min(times)*1000:.2f} ms",
              flush=True)
    except Exception as exc:
        print(f"{label} FAILED: {str(exc)[:250]}", flush=True)


def make(flavor):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        lt = jax.lax.dot_general(
            k_ref[...], q_ref[...], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (HB, Nk, Nq)
        if flavor == "dots_only":
            p = (lt * 0.001).astype(jnp.bfloat16)
        elif flavor == "no_exp":
            m = jnp.max(lt, axis=1, keepdims=True)
            e = lt - m
            s = jnp.sum(e, axis=1, keepdims=True)
            p = (e / s).astype(jnp.bfloat16)
        elif flavor == "no_reduce":
            e = jnp.exp(lt)
            p = (e * 0.001).astype(jnp.bfloat16)
        else:  # full
            m = jnp.max(lt, axis=1, keepdims=True)
            e = jnp.exp(lt - m)
            s = jnp.sum(e, axis=1, keepdims=True)
            p = (e / s).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            p, v_ref[...], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (HB, Nq, D)
        o_ref[...] = out.astype(o_ref.dtype)

    block = pl.BlockSpec((HB, N, D), lambda i: (i, 0, 0))
    return jax.jit(lambda q, k, v: pl.pallas_call(
        kernel,
        grid=(B * H // HB,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
    )(q, k, v))


for flavor in ("full", "dots_only", "no_exp", "no_reduce"):
    bench(make(flavor), f"V7 {flavor}")

# How fast is XLA's own SDPA standalone at this shape (bf16)?
q4 = qT.reshape(B, H, N, D).transpose(0, 2, 1, 3)
k4 = kT.reshape(B, H, N, D).transpose(0, 2, 1, 3)
v4 = vT.reshape(B, H, N, D).transpose(0, 2, 1, 3)
sdpa = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
t0 = time.perf_counter()
out = sdpa(q4, k4, v4)
_ = float(jnp.asarray(out).ravel()[0])
c = time.perf_counter() - t0
times = []
for _ in range(6):
    t0 = time.perf_counter()
    out = sdpa(q4, k4, v4)
    _ = float(jnp.asarray(out).ravel()[0])
    times.append(time.perf_counter() - t0)
print(f"XLA SDPA standalone: compile {c:.1f}s best {min(times)*1000:.2f} ms",
      flush=True)
print("done", flush=True)
