"""ViT-L/14 embed throughput with calibrated static-scale int8."""

import dataclasses
import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import clip

print("devices:", jax.devices(), flush=True)
cfg = dataclasses.replace(clip.CONFIGS["ViT-L-14"], matmul_precision="int8")
params = clip.init_params(jax.random.key(0), clip.CONFIGS["ViT-L-14"])
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)

calib = jax.random.normal(
    jax.random.key(9), (32, cfg.image_size, cfg.image_size, 3),
    dtype=jnp.bfloat16,
)
t0 = time.perf_counter()
scales = clip.calibrate_image_scales(params, cfg, calib)
jax.block_until_ready(scales)
print(f"calibration: {time.perf_counter()-t0:.1f}s", flush=True)


@jax.jit
def embed(params, images, scales):
    return clip.encode_image(params, cfg, images, act_scales=scales)


for b in (256, 512):
    images = jax.random.normal(
        jax.random.key(b), (b, cfg.image_size, cfg.image_size, 3),
        dtype=jnp.bfloat16,
    )
    t0 = time.perf_counter()
    out = embed(params, images, scales)
    float(out[0, 0])
    print(f"batch {b}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = embed(params, images, scales)
        float(out[0, 0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"batch {b}: best {best*1000:.1f} ms -> {b/best:.0f} img/s", flush=True)
