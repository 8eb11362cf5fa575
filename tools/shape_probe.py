"""GEMM rate at ViT-L/14 MLP shapes, with REAL chained dependencies.

The first version consumed only y[0,0]; XLA narrowed the GEMM to one row
and reported fantasy rates. Here each iteration's full output feeds the
next matmul, like gemm_probe.py.
"""

import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
M, K, N = 65792, 1024, 4096  # batch 256 x 257 tokens, MLP fc/proj pair
ITERS = 8
k = jax.random.key(0)
xb = jax.random.normal(k, (M, K), dtype=jnp.bfloat16) * 0.05
w1 = jax.random.normal(k, (K, N), dtype=jnp.bfloat16) * 0.02
w2 = jax.random.normal(k, (N, K), dtype=jnp.bfloat16) * 0.02
FLOPS_PER_ITER = 2 * M * K * N * 2  # fc + proj


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(
        f"{name}: {best*1000:.1f} ms -> {FLOPS_PER_ITER*ITERS/best/1e12:.1f} T/s",
        flush=True,
    )


@jax.jit
def loop_bf16(x, w1, w2):
    def body(i, h):
        y = jax.lax.dot_general(
            h, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        y = jax.nn.gelu(y.astype(jnp.bfloat16), approximate=True)
        z = jax.lax.dot_general(
            y, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return jnp.tanh(z).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, ITERS, body, x)


timed("bf16 MLP chain", loop_bf16, xb, w1, w2)

# int8 with PRE-QUANTIZED weights and dynamic per-token activation quant.
sw1 = jnp.max(jnp.abs(w1.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
w1q = jnp.round(w1.astype(jnp.float32) / sw1).astype(jnp.int8)
sw2 = jnp.max(jnp.abs(w2.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
w2q = jnp.round(w2.astype(jnp.float32) / sw2).astype(jnp.int8)


@jax.jit
def loop_int8(x, w1q, sw1, w2q, sw2):
    def q(x32):
        sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        return jnp.round(x32 / sx).astype(jnp.int8), sx

    def body(i, h):
        xq, sx = q(h.astype(jnp.float32))
        y = jax.lax.dot_general(
            xq, w1q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = y.astype(jnp.float32) * sx * sw1
        y = jax.nn.gelu(y, approximate=True)
        yq, sy = q(y)
        z = jax.lax.dot_general(
            yq, w2q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        z = z.astype(jnp.float32) * sy * sw2
        return jnp.tanh(z).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, ITERS, body, x)


timed("int8 chain (pre-quant w, dyn act)", loop_int8, xb, w1q, sw1, w2q, sw2)

# int8 with STATIC activation scale (calibrated per tensor): the quant
# fuses into the previous epilogue, no absmax pass.
@jax.jit
def loop_int8_static(x, w1q, sw1, w2q, sw2):
    s_act = jnp.float32(0.05)

    def body(i, h):
        xq = jnp.clip(
            jnp.round(h.astype(jnp.float32) / s_act), -127, 127
        ).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, w1q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = y.astype(jnp.float32) * (s_act * sw1)
        y = jax.nn.gelu(y, approximate=True)
        yq = jnp.clip(jnp.round(y / s_act), -127, 127).astype(jnp.int8)
        z = jax.lax.dot_general(
            yq, w2q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        z = z.astype(jnp.float32) * (s_act * sw2)
        return jnp.tanh(z).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, ITERS, body, x)


timed("int8 chain (static act scale)", loop_int8_static, xb, w1q, sw1, w2q, sw2)
