"""GEMM rate at ViT-L/14 shapes: bf16 vs int8 (weights pre-quantized),
plus the dynamic-quant epilogue cost."""

import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
M, K, N = 131584, 1024, 4096  # batch 512 x 257 tokens, MLP fc
ITERS = 8
k = jax.random.key(0)
xb = jax.random.normal(k, (M, K), dtype=jnp.bfloat16)
wb = jax.random.normal(k, (K, N), dtype=jnp.bfloat16)
xi = jax.random.randint(k, (M, K), -127, 127, dtype=jnp.int8)
wi = jax.random.randint(k, (K, N), -127, 127, dtype=jnp.int8)


def timed(name, fn, *args, flops=2 * M * K * N * ITERS):
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
    print(f"{name}: {best*1000:.1f} ms -> {flops/best/1e12:.1f} T/s", flush=True)


@jax.jit
def loop_bf16(x, w):
    def body(i, acc):
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc + y[0, 0]

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("bf16 MLP shape", loop_bf16, xb, wb)


@jax.jit
def loop_int8(x, w):
    def body(i, acc):
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc + y[0, 0]

    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


timed("int8 MLP shape (pre-quant)", loop_int8, xi, wi)


@jax.jit
def loop_int8_dynamic(x, w):
    # weights quantized once outside the loop; activations per iteration
    sw = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    wq = jnp.round(w.astype(jnp.float32) / sw).astype(jnp.int8)

    def body(i, acc):
        x32 = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
        xq = jnp.round(x32 / jnp.maximum(sx, 1e-12)).astype(jnp.int8)
        y = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = y.astype(jnp.float32) * sx * sw
        return acc + y[0, 0]

    return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))


timed("int8 dynamic (quant+dequant epilogues)", loop_int8_dynamic, xb, wb)
