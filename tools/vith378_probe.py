"""ViT-H-14-378 embed throughput — the reference's EXACT benchmark model
(docs/clip-fp16-precision-evaluation.md: 114.2 img/s fp16 on an
RTX 5090). Calibrated static-int8 + the attention kernel (N=730 plans a
q-blocked tiling), chained timing."""

import dataclasses
import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import clip
from panoptikon_tpu.ops import vit_attention

print("devices:", jax.devices(), flush=True)
cfg = dataclasses.replace(clip.CONFIGS["ViT-H-14-378"],
                          matmul_precision="int8")
print("attention plan (H, D, N):",
      vit_attention._plan_blocks(16, 80, 730, 730), flush=True)
params = clip.init_params(jax.random.key(0), clip.CONFIGS["ViT-H-14-378"])
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)
params_q = clip.quantize_block_weights(params)
B, R = 64, 4
calib = jax.random.normal(
    jax.random.key(9), (8, cfg.image_size, cfg.image_size, 3),
    dtype=jnp.bfloat16)
t0 = time.perf_counter()
scales = clip.calibrate_image_scales(params_q, cfg, calib)
jax.block_until_ready(scales)
print(f"calibrated in {time.perf_counter()-t0:.0f}s", flush=True)
images = jax.random.normal(
    jax.random.key(1), (B, cfg.image_size, cfg.image_size, 3),
    dtype=jnp.bfloat16)


@jax.jit
def chained(params, images, scales):
    def body(i, carry):
        imgs, acc = carry
        feats = clip.encode_image(params, cfg, imgs, act_scales=scales)
        imgs = imgs + (feats[0, 0] * 1e-8).astype(imgs.dtype)
        return imgs, acc + feats[0, 0]

    _, acc = jax.lax.fori_loop(0, R, body, (images, jnp.float32(0.0)))
    return acc


t0 = time.perf_counter()
acc = chained(params_q, images, scales)
_ = float(acc)
print(f"compile+first {time.perf_counter()-t0:.0f}s", flush=True)
times = []
for _ in range(4):
    t0 = time.perf_counter()
    acc = chained(params_q, images, scales)
    _ = float(acc)
    times.append(time.perf_counter() - t0)
best = min(times)
print(f"ViT-H-14-378 static-int8: {best*1000/R:.1f} ms/batch-{B} -> "
      f"{B*R/best:.1f} img/s steady-state "
      f"(reference fp16 datum: 114.2 img/s)", flush=True)
print("done", flush=True)
