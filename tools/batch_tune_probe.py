"""Batch-size and kernel-blocking tuning for the production int8-static
embed (pallas attention + fused block). Scalar-readback timing on full
batches (the 25 ms tunnel constant is <10% at these runtimes)."""

import dataclasses
import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import clip

print("devices:", jax.devices(), flush=True)
CFG = dataclasses.replace(clip.CONFIGS["ViT-L-14"], matmul_precision="int8")
params = clip.init_params(jax.random.key(0), clip.CONFIGS["ViT-L-14"])
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)
params_q = clip.quantize_block_weights(params)
calib = jax.random.normal(
    jax.random.key(9), (32, CFG.image_size, CFG.image_size, 3), dtype=jnp.bfloat16
)
scales = clip.calibrate_image_scales(params, CFG, calib)
jax.block_until_ready(scales)
print("calibrated", flush=True)


@jax.jit
def embed(params, images, scales):
    return clip.encode_image(params, CFG, images, act_scales=scales)


for b in (256, 512, 1024):
    images = jax.random.normal(
        jax.random.key(b), (b, CFG.image_size, CFG.image_size, 3),
        dtype=jnp.bfloat16,
    )
    t0 = time.perf_counter()
    out = embed(params_q, images, scales)
    _ = float(out[0, 0])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = embed(params_q, images, scales)
        _ = float(out[0, 0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"batch {b}: compile {compile_s:.0f}s best {best*1000:.1f} ms -> "
          f"{b/best:.0f} img/s", flush=True)
print("done", flush=True)
