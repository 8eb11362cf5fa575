"""Where does the device rank join spend its time at 4M? Single-shot
timing (ops here are 50-300 ms >> the ~25 ms tunnel constant)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp

N = 4_000_000
key = jax.random.key(0)
surf = jax.random.uniform(key, (N,), jnp.float32)
idx = jnp.arange(N, dtype=jnp.int32)

def timed(name, jfn, *args):
    out = jfn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = jfn(*args); jax.block_until_ready(out)
        o = out[0] if isinstance(out, (tuple, list)) else out
        float(jnp.sum(o[:1].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

timed("argsort 4M", jax.jit(lambda x: jnp.argsort(x)), surf)
timed("sort 4M", jax.jit(lambda x: jnp.sort(x)), surf)
timed("rank=argsort(argsort) 4M", jax.jit(lambda x: jnp.argsort(jnp.argsort(x))), surf)
timed("scatter-set 4M", jax.jit(
    lambda x, i: jnp.zeros((N,), jnp.int32).at[i].set(jnp.arange(N, dtype=jnp.int32))), surf, idx)
timed("scatter-min 4M", jax.jit(
    lambda x, i: jnp.full((N + 1,), 2**30, jnp.int32).at[i].min(
        jnp.arange(N, dtype=jnp.int32))), surf, idx)
timed("top_k 4M->592", jax.jit(lambda x: jax.lax.top_k(x, 592)[0]), surf)
timed("gemv int8 4Mx512", jax.jit(
    lambda c, q: jax.lax.dot_general(q, c, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)),
    jax.random.randint(key, (N, 512), -127, 127, jnp.int8),
    jax.random.randint(key, (1, 512), -127, 127, jnp.int8))
