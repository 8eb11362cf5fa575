"""Tagger trunk throughput on the chip: ViT-B/32 raw-feature embeds,
bf16 vs opt-in static-int8 (chained timing). Also the hardware proof for
the int8 tagger path at ViT-B geometry (12 heads, N=50 — a different
kernel plan than ViT-L's 16×257)."""

import dataclasses
import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import clip

print("devices:", jax.devices(), flush=True)
B, R = 128, 8
cfg_bf16 = clip.CONFIGS["ViT-B-32"]
cfg_int8 = dataclasses.replace(cfg_bf16, matmul_precision="int8")
params = clip.init_params(jax.random.key(0), cfg_bf16)
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)
params_q = clip.quantize_block_weights(params)
images = jax.random.normal(
    jax.random.key(1), (B, cfg_bf16.image_size, cfg_bf16.image_size, 3),
    dtype=jnp.bfloat16)
calib = jax.random.normal(
    jax.random.key(2), (32, cfg_bf16.image_size, cfg_bf16.image_size, 3),
    dtype=jnp.bfloat16)
scales = clip.calibrate_image_scales(params_q, cfg_int8, calib)
jax.block_until_ready(scales)
print("calibrated", flush=True)


def bench(label, fn, *args):
    @jax.jit
    def run(*a):
        def body(i, carry):
            imgs, acc = carry
            feats = fn(imgs, *a)
            imgs = imgs + (feats[0, 0] * 1e-8).astype(imgs.dtype)
            return imgs, acc + feats[0, 0]

        _, acc = jax.lax.fori_loop(0, R, body, (images, jnp.float32(0.0)))
        return acc

    t0 = time.perf_counter()
    acc = run(*args)
    _ = float(acc)
    c = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = run(*args)
        _ = float(acc)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label}: compile {c:.0f}s {best*1000/R:.1f} ms/batch-{B} -> "
          f"{B*R/best:.0f} img/s", flush=True)


bench("ViT-B/32 bf16 raw feats",
      lambda imgs: clip.encode_image(params_q, cfg_bf16, imgs,
                                     normalize=False))
bench("ViT-B/32 static-int8 raw feats",
      lambda imgs: clip.encode_image(params_q, cfg_int8, imgs,
                                     normalize=False, act_scales=scales))
print("done", flush=True)
