"""Probe: decompose the ~200 ms attention-side cost exposed by
ln_fused_probe's 160 ms GEMM-chain floor (vs 393 ms full program).

Variants, each patched into the REAL int8-static embed program
(batch 256, ViT-L/14), all consuming q, k AND v so no GEMM slice is
dead-code-eliminated:

  A. identity core: out = max(q, min(k, v)) in (B,N,H,D) layout — no
     transposes, no GEMMs, no softmax. Measures everything EXCEPT the
     attention core.
  B. einsum attention, no explicit transposes: bnhd,bmhd->bhnm then
     bhnm,bmhd->bnhd — XLA folds layout into the GEMMs. With softmax.
  C. same as B but softmax -> *(1/sqrt(N)) rescale (isolates softmax).
  D. current jax.nn.dot_product_attention (baseline re-measure).
  E. B with bf16 probs for the AV GEMM (halves probs bytes).
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

orig_attention = clip._attention


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


def make_attn(core):
    def attn(x, p, heads, causal, precision, scales_blk=None, collector=None):
        b, n, w = x.shape
        qkv = clip._linear(x, p["qkv_w"], p["qkv_b"], precision,
                           scales_blk[0] if scales_blk is not None else None,
                           collector)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = w // heads
        q = q.reshape(b, n, heads, hd)
        k = k.reshape(b, n, heads, hd)
        v = v.reshape(b, n, heads, hd)
        out = core(q, k, v, hd)
        out = out.reshape(b, n, w)
        return clip._linear(out, p["out_w"], p["out_b"], precision,
                            scales_blk[1] if scales_blk is not None else None,
                            collector)

    return attn


def core_identity(q, k, v, hd):
    return jnp.maximum(q, jnp.minimum(k, v))


def core_einsum(q, k, v, hd):
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (hd ** -0.5), axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def core_einsum_nosoftmax(q, k, v, hd):
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    probs = logits * (1.0 / (hd ** 0.5) / logits.shape[-1])
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def core_einsum_bf16probs(q, k, v, hd):
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (hd ** -0.5), axis=-1).astype(jnp.bfloat16)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


for label, core in (
    ("A identity core (floor + full qkv)", core_identity),
    ("B einsum attn + softmax", core_einsum),
    ("C einsum attn, softmax->rescale", core_einsum_nosoftmax),
    ("E einsum attn, bf16 probs", core_einsum_bf16probs),
):
    clip._attention = make_attn(core)
    try:
        bench(label)
    finally:
        clip._attention = orig_attention

bench("D baseline dot_product_attention")
print("probe done", flush=True)
