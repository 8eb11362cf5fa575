"""Can Pallas reach the 2× int8 MXU path on the scan GEMM shape?

XLA's int8×int8→int32 dot_general measured EQUAL to bf16 at the scan
shapes (round 2); if a Pallas int8 kernel hits a materially higher rate,
a scan-v3 kernel is worth building. Chained timing.

Shapes: (Q=4096, D=512) × (D, C) per corpus chunk.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

print("devices:", jax.devices(), flush=True)

Q, D, C = 4096, 512, 32768
ITERS = 8
kq, kc = jax.random.split(jax.random.key(0))
qi8 = jax.random.randint(kq, (Q, D), -127, 128, dtype=jnp.int8)
ci8 = jax.random.randint(kc, (C, D), -127, 128, dtype=jnp.int8)
FLOPS = 2 * Q * D * C * ITERS


def bench(fn, label, *args):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(out).ravel()[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = float(jnp.asarray(out).ravel()[0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{label}: compile {compile_s:.1f}s best {best*1000:.2f} ms "
              f"-> {FLOPS/best/1e12:.1f} T(op)/s", flush=True)
    except Exception as exc:
        print(f"{label} FAILED: {str(exc)[:300]}", flush=True)


def chain(body):
    @jax.jit
    def run(q, c):
        def step(i, carry):
            qq, acc = carry
            out = body(qq, c)
            # Full consumption (a sum reduce) — consuming out[0,0] alone
            # lets XLA narrow the GEMM to one row (the documented probe
            # pitfall).
            tot = jnp.sum(out, dtype=jnp.int32)
            qq = qq + (tot > jnp.int32(2**30)).astype(jnp.int8)
            return qq, acc + tot

        _, acc = jax.lax.fori_loop(0, ITERS, step, (q, jnp.int32(0)))
        return acc

    return run


# XLA int8 -> int32
def xla_int8(q, c):
    return jax.lax.dot_general(
        q, c, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)


# XLA bf16 (the current scan form)
def xla_bf16(q, c):
    return jax.lax.dot_general(
        q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)


# Pallas int8 tiled matmul: grid over (Q tiles, C tiles)
def make_pallas(tm, tn):
    def kernel(q_ref, c_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            q_ref[...], c_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    def run(q, c):
        return pl.pallas_call(
            kernel,
            grid=(Q // tm, C // tn),
            in_specs=[
                pl.BlockSpec((tm, D), lambda i, j: (i, 0)),
                pl.BlockSpec((tn, D), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((Q, C), jnp.int32),
        )(q, c)

    return run


bench(chain(xla_bf16), "XLA bf16-cast", qi8, ci8)
bench(chain(xla_int8), "XLA int8->int32", qi8, ci8)
for tm, tn in ((256, 512), (512, 512), (128, 1024)):
    bench(chain(make_pallas(tm, tn)), f"pallas int8 {tm}x{tn}", qi8, ci8)
print("done", flush=True)
