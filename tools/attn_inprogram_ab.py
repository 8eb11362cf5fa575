"""A/B attention kernel forms INSIDE the real int8-static embed program.

Forms:
  baseline : jax.nn.dot_product_attention (XLA)
  swap8/16 : production kernel, heads_per_step 8/16 (bf16 swapaxes)
  lane8/16 : lane-sliced head loop over (1, N, hps*D) blocks, no swapaxes
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from panoptikon_tpu.models import clip
from panoptikon_tpu.ops import vit_attention

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


orig = vit_attention.attention


def swap_form(hps):
    def attention(q, k, v, *, causal=False):
        return vit_attention.mha(q, k, v, causal=causal, heads_per_step=hps)

    return attention


def lane_form(hps):
    def attention(q, k, v, *, causal=False):
        b, n, h, d = q.shape
        scale = d ** -0.5

        def kernel(q_ref, k_ref, v_ref, o_ref):
            for i in range(hps):
                sl = slice(i * d, (i + 1) * d)
                qh = q_ref[0, :, sl]
                kh = k_ref[0, :, sl]
                vh = v_ref[0, :, sl]
                lt = jax.lax.dot_general(
                    kh, qh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
                m = jnp.max(lt, axis=0, keepdims=True)
                e = jnp.exp(lt - m)
                s = jnp.sum(e, axis=0, keepdims=True)
                p = (e / s).astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    p, vh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[0, :, sl] = out.astype(o_ref.dtype)

        block = pl.BlockSpec((1, n, hps * d), lambda bi, gi: (bi, 0, gi))
        out = pl.pallas_call(
            kernel,
            grid=(b, h // hps),
            in_specs=[block, block, block],
            out_specs=block,
            out_shape=jax.ShapeDtypeStruct((b, n, h * d), q.dtype),
        )(q.reshape(b, n, h * d), k.reshape(b, n, h * d),
          v.reshape(b, n, h * d))
        return out.reshape(b, n, h, d)

    return attention


bench("production (pallas attention + fused LN-quant)")
print("done", flush=True)
