"""A/B the LN→quant fusion inside the real embed:
  a) production (_block_int8_static with pallas ln_quant)
  b) same structure, ln_quant -> jnp reference (XLA fuses it)
  c) legacy block structure (separate LN + in-linear quantize) + pallas attn
"""

import dataclasses
import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import clip
from panoptikon_tpu.ops import ln_quant

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


bench("a) pallas ln_quant")

orig_lnq = ln_quant.ln_quant
ln_quant.ln_quant = lambda x, p, s: ln_quant._ln_quant_ref(
    x, p["scale"], p["bias"], jnp.asarray(s))
bench("b) jnp ln_quant (XLA-fused)")
ln_quant.ln_quant = orig_lnq

orig_block_static = clip._block_int8_static


def legacy_block(x, p, heads, causal, scales):
    x = x + clip._attention(clip._layernorm(x, p["ln_1"]), p["attn"], heads,
                            causal, "int8", scales, None)
    h = clip._layernorm(x, p["ln_2"])
    h = clip._linear(h, p["mlp"]["fc_w"], p["mlp"]["fc_b"], "int8", scales[2])
    h = jax.nn.gelu(h, approximate=True)
    h = clip._linear(h, p["mlp"]["proj_w"], p["mlp"]["proj_b"], "int8", scales[3])
    return x + h


clip._block_int8_static = legacy_block
bench("c) legacy structure + pallas attn")
clip._block_int8_static = orig_block_static
print("done", flush=True)
