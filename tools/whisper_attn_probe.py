"""Whisper-base encoder (N=1500) on the q-blocked Pallas attention vs
XLA SDPA, chained timing."""

import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import whisper
from panoptikon_tpu.ops import vit_attention

print("devices:", jax.devices(), flush=True)
cfg = whisper.CONFIGS["whisper-base"]
params = whisper.init_params(jax.random.key(0), cfg)
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)
B = 8
mel = jax.random.normal(jax.random.key(1), (B, cfg.n_mels, 3000),
                        dtype=jnp.float32)
R = 6
print("plan:", vit_attention._plan_blocks(
    cfg.n_audio_heads, cfg.n_audio_state // cfg.n_audio_heads,
    cfg.n_audio_ctx, cfg.n_audio_ctx), flush=True)


def bench(label):
    @jax.jit
    def run(params, mel):
        def body(i, carry):
            m, acc = carry
            feats = whisper.encode_audio(params, cfg, m)
            m = m + (feats[0, 0, 0] * 1e-8).astype(m.dtype)
            return m, acc + feats[0, 0, 0]

        _, acc = jax.lax.fori_loop(0, R, body, (mel, jnp.float32(0.0)))
        return acc

    t0 = time.perf_counter()
    acc = run(params, mel)
    float(acc)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = run(params, mel)
        float(acc)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label}: compile {compile_s:.0f}s {best*1000/R:.1f} ms/batch-8 "
          f"-> {B*R/best:.1f} enc/s", flush=True)


bench("pallas q-blocked")

orig = vit_attention.attention
vit_attention.attention = lambda q, k, v, causal=False: (
    jax.nn.dot_product_attention(q, k, v, is_causal=causal))
bench("XLA SDPA")
vit_attention.attention = orig
print("done", flush=True)
