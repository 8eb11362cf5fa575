"""Measure the chip's bf16 GEMM roofline (amortized, no dispatch floor)."""

import time

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
k = jax.random.key(0)
m = n = kk = 8192
a = jax.random.normal(k, (m, kk), dtype=jnp.bfloat16)
b = jax.random.normal(k, (kk, n), dtype=jnp.bfloat16)

ITERS = 32


@jax.jit
def loop(a, b):
    def body(i, acc):
        # Rotate the operand so the matmuls chain (no DCE, no CSE).
        return (acc @ b).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, ITERS, body, a)


out = loop(a, b)
float(out[0, 0].astype(jnp.float32))
for _ in range(3):
    t0 = time.perf_counter()
    out = loop(a, b)
    float(out[0, 0].astype(jnp.float32))
    dt = time.perf_counter() - t0
    fl = 2 * m * n * kk * ITERS
    print(f"{dt*1000:.1f} ms -> {fl/dt/1e12:.1f} TFLOP/s", flush=True)
