"""Ablation probe: where do ViT-L/14's cycles go, and what does int8 buy?

Variants at batch 256:
  full        — encode_image as shipped
  no-attn     — attention replaced by the value projection (GEMM skeleton +
                LN/gelu; isolates the attention cost)
  no-ln       — layernorms replaced by identity (isolates VPU cost)
  int8-gemm   — pure 8k^3 int8 GEMM roofline (v5e doubles int8 MACs)
"""

import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import clip

print("devices:", jax.devices(), flush=True)
cfg = clip.CONFIGS["ViT-L-14"]
params = clip.init_params(jax.random.key(0), cfg)
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)
B = 256
images = jax.random.normal(
    jax.random.key(1), (B, cfg.image_size, cfg.image_size, 3), dtype=jnp.bfloat16
)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    try:
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    except Exception:
        pass
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name}: best {best*1000:.1f} ms -> {B/best:.0f} img/s", flush=True)
    return best


# ---- full ----
full = jax.jit(lambda p, im: clip.encode_image(p, cfg, im))
timed("full", full, params, images)

# ---- no-attn: monkeypatch attention to v-projection only ----
orig_attention = clip._attention


def _no_attn(x, p, heads, causal):
    qkv = x @ p["qkv_w"].astype(x.dtype) + p["qkv_b"].astype(x.dtype)
    v = qkv[..., -x.shape[-1]:]
    return v @ p["out_w"].astype(x.dtype) + p["out_b"].astype(x.dtype)


clip._attention = _no_attn
no_attn = jax.jit(lambda p, im: clip.encode_image(p, cfg, im))
timed("no-attn", no_attn, params, images)
clip._attention = orig_attention

# ---- no-ln ----
orig_ln = clip._layernorm
clip._layernorm = lambda x, p: x
no_ln = jax.jit(lambda p, im: clip.encode_image(p, cfg, im))
timed("no-ln", no_ln, params, images)
clip._layernorm = orig_ln

# ---- int8 GEMM roofline ----
m = n = kk = 8192
ai = jax.random.randint(jax.random.key(2), (m, kk), -127, 127, dtype=jnp.int8)
bi = jax.random.randint(jax.random.key(3), (kk, n), -127, 127, dtype=jnp.int8)
ITERS = 32


@jax.jit
def int8_loop(a, b):
    def body(i, acc):
        c = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.bitwise_xor(acc, c)

    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((m, n), jnp.int32))


out = int8_loop(ai, bi)
float(out[0, 0])
times = []
for _ in range(3):
    t0 = time.perf_counter()
    out = int8_loop(ai, bi)
    float(out[0, 0])
    times.append(time.perf_counter() - t0)
best = min(times)
print(
    f"int8-gemm: {best*1000:.1f} ms -> {2*m*n*kk*ITERS/best/1e12:.1f} TOP/s",
    flush=True,
)
