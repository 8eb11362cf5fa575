"""Probe: is the 649→780 img/s gap GEMM-output materialization traffic?

Each int8 block linear emits int32 (4 B/elem) that a separate kernel
converts/scales/activates/requantizes — at ViT-L the fc output alone is
~1 GB per batch-256 layer pass. Variants (perf-indicative):

  1. baseline (current int8-static path)
  2. int8 dots with preferred_element_type=f32 (dot emits f32 directly —
     drops the int32→f32 convert pass; f32 accumulation of integer
     products is exact to ~2^24, marginal vs quant noise)
  3. int8 dots with preferred bf16 (halves dot-output bytes; accumulation
     precision loss — perf probe only)
  4. LN → scale-only (mean/var reduction cost inside the real program)
  5. gelu → relu (activation cost)
"""

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

B = 256
images = jax.random.normal(
    jax.random.key(7), (B, CFG.image_size, CFG.image_size, 3), dtype=jnp.bfloat16
)


def bench(label):
    @jax.jit
    def embed(params, images, scales):
        return clip.encode_image(params, CFG, images, act_scales=scales)

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
    print(f"{label}: compile {compile_s:.0f}s best {best*1000:.1f} ms -> "
          f"{B/best:.0f} img/s", flush=True)
    return best


orig_linear = clip._linear
orig_ln = clip._layernorm


def linear_with_pref(pref):
    def _linear(x, w, b, precision, act_scale=None, collector=None):
        if precision != "int8" or not isinstance(w, dict):
            return orig_linear(x, w, b, precision, act_scale, collector)
        x32 = x.astype(jnp.float32)
        sx = jnp.maximum(act_scale.astype(jnp.float32) / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
        wq, sw = w["q"], w["s"]
        y = jax.lax.dot_general(
            xq, wq,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=pref,
        )
        y = y.astype(jnp.float32) * sx * sw
        if b is not None:
            y = y + b.astype(jnp.float32)
        return y.astype(x.dtype)

    return _linear


def ln_scale_only(x, p):
    return (x.astype(jnp.float32) * p["scale"] + p["bias"]).astype(x.dtype)


bench("baseline int32-out")
clip._linear = linear_with_pref(jnp.float32)
bench("dot emits f32")
clip._linear = linear_with_pref(jnp.bfloat16)
bench("dot emits bf16")
clip._linear = orig_linear
clip._layernorm = ln_scale_only
bench("LN -> scale-only")
clip._layernorm = orig_ln

_gelu = jax.nn.gelu
jax.nn.gelu = lambda x, approximate=True: jnp.maximum(x, 0)
bench("gelu -> relu")
jax.nn.gelu = _gelu
print("probe done", flush=True)
