"""Probe: (a) the honest in-program GEMM-chain floor (LN → scale-only AND
attention core → passthrough, all linears kept), (b) a Pallas fused
LN→int8-quantize kernel in the REAL program (replaces LN + separate
quantize with one pass emitting int8).
"""

import dataclasses
import functools
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
orig_attn = clip._attention
orig_block = clip._block

bench("baseline")

# ---- (a) GEMM-chain floor: LN scale-only + attention core passthrough.
clip._layernorm = lambda x, p: (
    x.astype(jnp.float32) * p["scale"] + p["bias"]
).astype(x.dtype)


def attn_passthrough(x, p, heads, causal, precision, scales_blk, collector):
    qkv = clip._linear(x, p["qkv_w"], p["qkv_b"], precision,
                       scales_blk[0] if scales_blk is not None else None,
                       collector)
    v = qkv[..., -x.shape[-1]:]
    return clip._linear(v, p["out_w"], p["out_b"], precision,
                        scales_blk[1] if scales_blk is not None else None,
                        collector)


clip._attention = attn_passthrough
bench("GEMM-chain floor (LN scale-only + attn passthrough)")
clip._layernorm = orig_ln
clip._attention = orig_attn

# ---- (b) Pallas fused LN → int8 quantize in the real program.
from jax.experimental import pallas as pl


def make_ln_quant(block_rows: int):
    def kernel(x_ref, g_ref, b_ref, s_ref, o_ref):
        xv = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(xv, axis=-1, keepdims=True)
        xc = xv - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + 1e-5)
        y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
        s = jnp.maximum(s_ref[0, 0] / 127.0, 1e-12)
        o_ref[...] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)

    @jax.jit
    def ln_quant(x, g, b, sx):
        bsz, n, w = x.shape
        rows = bsz * n
        x2 = x.reshape(rows, w)
        pad = (-rows) % block_rows
        if pad:
            x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((x2.shape[0], w), jnp.int8),
            grid=(x2.shape[0] // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, w), lambda i: (i, 0)),
                pl.BlockSpec((w,), lambda i: (0,)),
                pl.BlockSpec((w,), lambda i: (0,)),
                pl.BlockSpec((1, 1), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_rows, w), lambda i: (i, 0)),
        )(x2, g.astype(jnp.float32), b.astype(jnp.float32),
          sx.reshape(1, 1).astype(jnp.float32))
        return out[:rows].reshape(bsz, n, w)

    return ln_quant


def linear_prequantized(xq, sx_scalar, w, b):
    wq, sw = w["q"], w["s"]
    y = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sx = jnp.maximum(sx_scalar.astype(jnp.float32) / 127.0, 1e-12)
    y = y.astype(jnp.float32) * sx * sw
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def block_fused(ln_quant):
    def _block(x, p, heads, causal, precision, scales_blk, collector):
        if precision != "int8" or scales_blk is None or collector is not None:
            return orig_block(x, p, heads, causal, precision, scales_blk, collector)
        # ln_1 → qkv quant fused into one pass.
        xq = ln_quant(x, p["ln_1"]["scale"], p["ln_1"]["bias"], scales_blk[0])
        b_, n, w = x.shape
        qkv = linear_prequantized(xq, scales_blk[0], p["attn"]["qkv_w"],
                                  p["attn"]["qkv_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = w // heads
        q = q.reshape(b_, n, heads, hd)
        k = k.reshape(b_, n, heads, hd)
        v = v.reshape(b_, n, heads, hd)
        out = jax.nn.dot_product_attention(q, k, v, is_causal=causal)
        out = out.reshape(b_, n, w)
        x = x + clip._linear(out, p["attn"]["out_w"], p["attn"]["out_b"],
                             precision, scales_blk[1], None)
        hq = ln_quant(x, p["ln_2"]["scale"], p["ln_2"]["bias"], scales_blk[2])
        h = linear_prequantized(hq, scales_blk[2], p["mlp"]["fc_w"],
                                p["mlp"]["fc_b"])
        h = jax.nn.gelu(h, approximate=True)
        h = clip._linear(h, p["mlp"]["proj_w"], p["mlp"]["proj_b"],
                         precision, scales_blk[3], None)
        return x + h

    return _block


for rows in (1028, 4112):
    try:
        clip._block = block_fused(make_ln_quant(rows))
        bench(f"pallas LN+quant fused (block {rows} rows)")
    except Exception as exc:
        print(f"pallas block {rows} failed: {type(exc).__name__}: {exc}",
              flush=True)
    finally:
        clip._block = orig_block
print("probe done", flush=True)
