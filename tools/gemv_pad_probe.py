"""Q=1 matvec vs tile-padded GEMM on the chip: the serving surface cost."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp

N, D = 4_000_000, 512
key = jax.random.key(0)
corpus = jax.random.randint(key, (N, D), -127, 127, jnp.int8)

def timed(name, jfn, *args):
    out = jfn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = jfn(*args)
        float(jnp.sum(out[:1, :8].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

def dots_int(q, c):
    return jax.lax.dot_general(q, c, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)

def dots_bf16(q, c):
    return jax.lax.dot_general(q.astype(jnp.bfloat16), c.astype(jnp.bfloat16),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

q1 = jax.random.randint(key, (1, D), -127, 127, jnp.int8)
q8 = jnp.broadcast_to(q1, (8, D))
q128 = jnp.broadcast_to(q1, (128, D))
timed("int8->int32 Q=1", jax.jit(dots_int), q1, corpus)
timed("int8->int32 Q=8", jax.jit(dots_int), q8, corpus)
timed("int8->int32 Q=128", jax.jit(dots_int), q128, corpus)
timed("bf16 Q=1", jax.jit(dots_bf16), q1, corpus)
timed("bf16 Q=8", jax.jit(dots_bf16), q8, corpus)
timed("bf16 Q=128", jax.jit(dots_bf16), q128, corpus)
