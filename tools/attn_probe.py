"""Attention micro-probe at ViT-L/14 shapes (B=256, H=16, N=257, hd=64).

jax.nn.dot_product_attention measured 192 ms of the 517 ms forward —
6% MXU efficiency on 4% of the FLOPs. Candidates:
  manual   — einsum QK^T → f32 softmax → PV
  flash    — pallas TPU flash_attention (N padded to 384, key-masked)
"""

import functools
import time

import jax
import jax.numpy as jnp

B, H, N, D = 256, 16, 257, 64
print("devices:", jax.devices(), flush=True)
k = jax.random.key(0)
q = jax.random.normal(k, (B, N, H, D), dtype=jnp.bfloat16)
kk = jax.random.normal(k, (B, N, H, D), dtype=jnp.bfloat16)
v = jax.random.normal(k, (B, N, H, D), dtype=jnp.bfloat16)


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).reshape(-1)[0].astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    print(f"{name}: best {min(times)*1000:.1f} ms", flush=True)


@jax.jit
def baseline(q, kk, v):
    return jax.nn.dot_product_attention(q, kk, v)


timed("dot_product_attention", baseline, q, kk, v)


@jax.jit
def manual(q, kk, v):
    # (B, N, H, D) → (B, H, N, D)
    qt = q.transpose(0, 2, 1, 3)
    kt = kk.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", qt, kt, preferred_element_type=jnp.float32
    ) * (1.0 / D**0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vt)
    return out.transpose(0, 2, 1, 3)


timed("manual einsum", manual, q, kk, v)

from jax.experimental.pallas.ops.tpu import flash_attention as fa

PAD = 384


@jax.jit
def flash(q, kk, v):
    # flash_attention wants (B, H, N, D), N a multiple of the block size;
    # pad keys/values and mask the padded keys via segment ids.
    qt = q.transpose(0, 2, 1, 3)
    kt = kk.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    pad = PAD - N
    qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad), (0, 0)))
    seg = (jnp.arange(PAD) < N).astype(jnp.int32)[None, :]
    seg = jnp.broadcast_to(seg, (B, PAD))
    ids = fa.SegmentIds(q=seg, kv=seg)
    out = fa.flash_attention(
        qt, kt, vt, segment_ids=ids, sm_scale=1.0 / D**0.5
    )
    return out[:, :, :N, :].transpose(0, 2, 1, 3)


try:
    timed("pallas flash (pad 384)", flash, q, kk, v)
except Exception as e:
    print("pallas flash failed:", repr(e)[:300], flush=True)

# Parity check (manual vs baseline) on a small slice
o1 = jax.jit(baseline)(q[:2], kk[:2], v[:2])
o2 = jax.jit(manual)(q[:2], kk[:2], v[:2])
import numpy as np

diff = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
print("manual vs baseline max abs diff:", diff, flush=True)
