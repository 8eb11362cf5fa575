"""mpnet-base text embedding throughput: Pallas masked-attention kernel
vs the XLA additive-bias path, chained timing (see perf doc methodology).
"""

import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import text_embed
from panoptikon_tpu.ops import vit_attention

print("devices:", jax.devices(), flush=True)
cfg = text_embed.CONFIGS["mpnet-base"]
params = text_embed.init_params(jax.random.key(0), cfg)
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)

B, N = 128, 256
ids = jax.random.randint(jax.random.key(1), (B, N), 0, cfg.vocab)
# Realistic ragged lengths: mask off a varying tail per row.
lens = jax.random.randint(jax.random.key(2), (B, 1), N // 4, N + 1)
mask = (jnp.arange(N)[None, :] < lens).astype(jnp.int32)
R = 8


def bench(label):
    @jax.jit
    def run(params, ids, mask):
        def body(i, carry):
            ids_c, acc = carry
            out = text_embed.encode(params, cfg, ids_c, mask)
            ids_c = ids_c + (out[0, 0] > 1e30).astype(ids_c.dtype)
            return ids_c, acc + out[0, 0]

        _, acc = jax.lax.fori_loop(0, R, body, (ids, jnp.float32(0.0)))
        return acc

    acc = run(params, ids, mask)
    float(acc)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = run(params, ids, mask)
        float(acc)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label}: {best*1000/R:.2f} ms/batch -> {B*R/best:.0f} docs/s",
          flush=True)


bench("pallas masked kernel")

orig = vit_attention.mha
import jax.nn as jnn


def xla_only(q, k, v, *, causal=False, key_mask=None, **kw):
    bias = jnp.where(key_mask.astype(bool)[:, None, None, :], 0.0,
                     -1e9).astype(jnp.float32)
    return jnn.dot_product_attention(q, k, v, bias=bias)


vit_attention.mha = xla_only
bench("XLA additive-bias path")
vit_attention.mha = orig
print("done", flush=True)
