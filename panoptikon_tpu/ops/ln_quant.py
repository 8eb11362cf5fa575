"""Fused LayerNorm → static-scale int8 quantize.

In the static-int8 transformer block, every LN output exists only to be
quantized as the next GEMM's input. XLA runs that as separate passes over
the (B·N, W) activation surface: a statistics pass, a normalize pass
writing bf16, and a quantize pass writing int8 — measured ~34 ms of a
393 ms ViT-L/14 embed batch (tools/epilogue_probe.py: LN → scale-only
saves exactly that). This kernel reads each row once, computes f32
statistics, normalizes, applies γ/β, and emits int8 directly — one pass,
one output.

The jnp fallback (`_ln_quant_ref`) is the same math op-for-op; it is the
production path off-TPU and the oracle in tests.

Reference anchor: the reference's fp16 CLIP path leaves LN in fp32 via
torch autocast (python/inferio/impl/clip.py); here the LN statistics are
f32 inside the kernel for the same reason.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BLOCK_ROWS = 1024


def _kernel(x_ref, g_ref, b_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + 1e-5)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    sx = jnp.maximum(s_ref[0, 0] / 127.0, 1e-12)
    o_ref[...] = jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8)


def _ln_quant_ref(x, gamma, beta, act_scale):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + 1e-5)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    sx = jnp.maximum(act_scale.astype(jnp.float32) / 127.0, 1e-12)
    return jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ln_quant_2d(x, gamma, beta, act_scale, *, interpret: bool = False):
    """(R, W) activations → (R, W) int8: LN(x)·γ+β quantized at the
    calibrated per-tensor ``act_scale`` (absmax; /127 inside, matching
    models.clip._linear's static path bit-for-bit)."""
    r, w = x.shape
    grid = -(-r // _BLOCK_ROWS)
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, w), lambda i: (i, 0)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((w,), lambda i: (0,)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, w), jnp.int8),
        interpret=interpret,
    )(x, gamma.astype(jnp.float32), beta.astype(jnp.float32),
      jnp.asarray(act_scale, jnp.float32).reshape(1, 1))


def ln_quant(x, ln_params, act_scale):
    """(…, W) → int8. Production uses the jnp form on every backend:
    measured IN the full ViT-L/14 embed (tools/ln_ab_probe.py), XLA fuses
    it to 287.8 ms total while routing through the Pallas kernel cost
    346.3 ms — the pallas_call boundary materialization outweighs the
    pass it saves (same verdict as ops/pallas_scan.py's two kernels).
    ``ln_quant_2d`` stays as the measured-alternative record, covered by
    interpret-mode tests."""
    return _ln_quant_ref(x, ln_params["scale"], ln_params["bias"],
                         jnp.asarray(act_scale))
