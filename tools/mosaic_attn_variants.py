"""Micro-test: which in-kernel layout strategy does Mosaic accept/prefer
for the VMEM-resident attention kernel?

  V1: jnp.swapaxes(x, 0, 1) then batch-dim-0 dot_general
  V2: unrolled per-head loop, middle-dim slice, 2D matmuls
  V3: 2D lane-sliced heads from (N, hps*D) blocks
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

print("devices:", jax.devices(), flush=True)

B, N, H, D = 256, 257, 16, 64
HPS = 8
ks = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(ks[0], (B, N, H, D), dtype=jnp.bfloat16)
k = jax.random.normal(ks[1], (B, N, H, D), dtype=jnp.bfloat16)
v = jax.random.normal(ks[2], (B, N, H, D), dtype=jnp.bfloat16)
scale = D ** -0.5

want = jax.nn.dot_product_attention(
    q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
)
want = np.asarray(jax.device_get(want))


def check(out, label):
    got = np.asarray(jax.device_get(out), np.float32)
    err = np.max(np.abs(got - want))
    print(f"{label}: max err {err:.4f}", flush=True)


def bench(fn, *args, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    print(f"{label}: compile {compile_s:.1f}s best {min(times)*1000:.2f} ms",
          flush=True)
    return out


# --- V1: swapaxes + batch0 dots --------------------------------------------
def kernel_v1(q_ref, k_ref, v_ref, o_ref):
    qh = jnp.swapaxes(q_ref[0].astype(jnp.float32), 0, 1)  # (hps, N, D)
    kh = jnp.swapaxes(k_ref[0].astype(jnp.float32), 0, 1)
    vh = jnp.swapaxes(v_ref[0].astype(jnp.float32), 0, 1)
    logits = jax.lax.dot_general(
        qh, kh, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, vh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = jnp.swapaxes(out, 0, 1).astype(o_ref.dtype)


# --- V2: unrolled head loop, 2D matmuls -------------------------------------
def kernel_v2(q_ref, k_ref, v_ref, o_ref):
    for h in range(HPS):
        qh = q_ref[0, :, h, :].astype(jnp.float32)  # (N, D)
        kh = k_ref[0, :, h, :].astype(jnp.float32)
        vh = v_ref[0, :, h, :].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, h, :] = out.astype(o_ref.dtype)


block = pl.BlockSpec((1, N, HPS, D), lambda b, g: (b, 0, g, 0))
for name, kern in (("V1 swapaxes+batch0", kernel_v1),
                   ("V2 head loop 2D", kernel_v2)):
    try:
        fn = jax.jit(lambda q, k, v, kern=kern: pl.pallas_call(
            kern,
            grid=(B, H // HPS),
            in_specs=[block, block, block],
            out_specs=block,
            out_shape=jax.ShapeDtypeStruct((B, N, H, D), q.dtype),
        )(q, k, v))
        out = bench(fn, q, k, v, label=name)
        check(out, name)
    except Exception as exc:
        print(f"{name} FAILED: {str(exc)[:300]}", flush=True)

# --- V3: lane-sliced heads from (N, hps*D) ----------------------------------
q3 = q.reshape(B, N, H * D)
k3 = k.reshape(B, N, H * D)
v3 = v.reshape(B, N, H * D)


def kernel_v3(q_ref, k_ref, v_ref, o_ref):
    for h in range(HPS):
        sl = slice(h * D, (h + 1) * D)
        qh = q_ref[0, :, sl].astype(jnp.float32)
        kh = k_ref[0, :, sl].astype(jnp.float32)
        vh = v_ref[0, :, sl].astype(jnp.float32)
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


block3 = pl.BlockSpec((1, N, HPS * D), lambda b, g: (b, 0, g))
try:
    fn3 = jax.jit(lambda q, k, v: pl.pallas_call(
        kernel_v3,
        grid=(B, H // HPS),
        in_specs=[block3, block3, block3],
        out_specs=block3,
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), q.dtype),
    )(q, k, v))
    out3 = bench(fn3, q3, k3, v3, label="V3 lane-sliced")
    check(out3.reshape(B, N, H, D), "V3 lane-sliced")
except Exception as exc:
    print(f"V3 FAILED: {str(exc)[:300]}", flush=True)

print("done", flush=True)
