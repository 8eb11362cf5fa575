"""Fused LN→int8-quantize kernel (ops/ln_quant.py): interpret-mode
equivalence against the jnp reference (which is itself the off-TPU
production path), including non-block-divisible row counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panoptikon_tpu.ops import ln_quant


@pytest.mark.parametrize("r,w", [(1024, 1024), (100, 512), (2049, 768)])
def test_kernel_matches_reference(r, w):
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (r, w), dtype=jnp.bfloat16) * 3.0
    g = jax.random.normal(ks[1], (w,), dtype=jnp.float32)
    b = jax.random.normal(ks[2], (w,), dtype=jnp.float32)
    s = jnp.float32(4.2)
    got = ln_quant.ln_quant_2d(x, g, b, s, interpret=True)
    want = ln_quant._ln_quant_ref(x, g, b, s)
    assert got.dtype == jnp.int8
    # Same math; allow off-by-one codes on exact .5 rounding boundaries.
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_quantization_matches_linear_static_path():
    # The /127, clip, round pipeline must match models.clip._linear's
    # static act_scale quantization applied to the LN output.
    from panoptikon_tpu.models import clip as clip_mod

    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (64, 256), dtype=jnp.float32)
    p = {"scale": jax.random.normal(ks[1], (256,), jnp.float32),
         "bias": jax.random.normal(ks[2], (256,), jnp.float32)}
    s = jnp.float32(3.0)
    got = ln_quant._ln_quant_ref(x, p["scale"], p["bias"], s)
    y = clip_mod._layernorm(x, p).astype(jnp.float32)
    sx = jnp.maximum(s / 127.0, 1e-12)
    want = jnp.clip(jnp.round(y / sx), -127, 127).astype(jnp.int8)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1


def test_nd_wrapper_reshapes():
    ks = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(ks[0], (2, 7, 128), dtype=jnp.bfloat16)
    p = {"scale": jnp.ones((128,), jnp.float32),
         "bias": jnp.zeros((128,), jnp.float32)}
    out = ln_quant.ln_quant(x, p, jnp.float32(2.0))
    assert out.shape == x.shape and out.dtype == jnp.int8
    ref = ln_quant._ln_quant_ref(x.reshape(-1, 128), p["scale"], p["bias"],
                                 jnp.float32(2.0)).reshape(x.shape)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
