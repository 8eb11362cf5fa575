"""V5: software-pipelined head loop — issue QK^T for head h+1 between
softmax(h) and AV(h) so the MXU works while the VPU runs softmax.
Also: V6 batched-dot flavor with bf16 operands (V1 redo minus f32 dots),
and a 2-step lookahead flavor.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

print("devices:", jax.devices(), flush=True)

B, N, H, D = 256, 257, 16, 64
ks = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(ks[0], (B, N, H * D), dtype=jnp.bfloat16)
k = jax.random.normal(ks[1], (B, N, H * D), dtype=jnp.bfloat16)
v = jax.random.normal(ks[2], (B, N, H * D), dtype=jnp.bfloat16)
scale = D ** -0.5

want = jax.nn.dot_product_attention(
    q.reshape(B, N, H, D).astype(jnp.float32),
    k.reshape(B, N, H, D).astype(jnp.float32),
    v.reshape(B, N, H, D).astype(jnp.float32),
).reshape(B, N, H * D)
want = np.asarray(jax.device_get(want))


def bench_check(fn, label):
    try:
        t0 = time.perf_counter()
        out = fn(q, k, v)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = fn(q, k, v)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        err = np.max(np.abs(np.asarray(jax.device_get(out), np.float32) - want))
        print(f"{label}: compile {compile_s:.1f}s best {min(times)*1000:.2f} ms"
              f" maxerr {err:.4f}", flush=True)
    except Exception as exc:
        print(f"{label} FAILED: {str(exc)[:250]}", flush=True)


def qk(k_ref, q_ref, h):
    sl = slice(h * D, (h + 1) * D)
    return jax.lax.dot_general(
        k_ref[0, :, sl], q_ref[0, :, sl], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (Nk, Nq)


def softmax_T(lt):
    m = jnp.max(lt, axis=0, keepdims=True)
    e = jnp.exp(lt - m)
    s = jnp.sum(e, axis=0, keepdims=True)
    return (e / s).astype(jnp.bfloat16)


def av(p, v_ref, h):
    sl = slice(h * D, (h + 1) * D)
    return jax.lax.dot_general(
        p, v_ref[0, :, sl], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (Nq, D)


def kernel_v5(q_ref, k_ref, v_ref, o_ref):
    lt = qk(k_ref, q_ref, 0)
    for h in range(H):
        p = softmax_T(lt)
        if h + 1 < H:
            lt_next = qk(k_ref, q_ref, h + 1)  # MXU overlaps VPU softmax
        out = av(p, v_ref, h)
        o_ref[0, :, h * D:(h + 1) * D] = out.astype(o_ref.dtype)
        if h + 1 < H:
            lt = lt_next


def kernel_v5b(q_ref, k_ref, v_ref, o_ref):
    # 2-deep lookahead
    lts = [qk(k_ref, q_ref, 0), qk(k_ref, q_ref, 1)]
    for h in range(H):
        p = softmax_T(lts[0])
        if h + 2 < H:
            lts.append(qk(k_ref, q_ref, h + 2))
        out = av(p, v_ref, h)
        o_ref[0, :, h * D:(h + 1) * D] = out.astype(o_ref.dtype)
        lts.pop(0)


block = pl.BlockSpec((1, N, H * D), lambda b: (b, 0, 0))


def build(kern):
    return jax.jit(lambda q, k, v: pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), q.dtype),
    )(q, k, v))


bench_check(build(kernel_v5), "V5 pipelined 1-deep")
bench_check(build(kernel_v5b), "V5b pipelined 2-deep")

# V6: batched dots over all 16 heads, bf16 operands, pre-transposed layout
qT = jnp.swapaxes(q.reshape(B, N, H, D), 1, 2).reshape(B * H, N, D)
kT = jnp.swapaxes(k.reshape(B, N, H, D), 1, 2).reshape(B * H, N, D)
vT = jnp.swapaxes(v.reshape(B, N, H, D), 1, 2).reshape(B * H, N, D)
HB = 16  # head-batches per step


def kernel_v6(q_ref, k_ref, v_ref, o_ref):
    lt = jax.lax.dot_general(
        k_ref[...], q_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (HB, Nk, Nq)
    m = jnp.max(lt, axis=1, keepdims=True)
    e = jnp.exp(lt - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    p = (e / s).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        p, v_ref[...], (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (HB, Nq, D)
    o_ref[...] = out.astype(o_ref.dtype)


blockT = pl.BlockSpec((HB, N, D), lambda i: (i, 0, 0))
try:
    fn6 = jax.jit(lambda q, k, v: pl.pallas_call(
        kernel_v6,
        grid=(B * H // HB,),
        in_specs=[blockT, blockT, blockT],
        out_specs=blockT,
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
    )(q, k, v))
    t0 = time.perf_counter()
    out = fn6(qT, kT, vT)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = fn6(qT, kT, vT)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    got = np.asarray(jax.device_get(out), np.float32).reshape(B, H, N, D)
    got = np.swapaxes(got, 1, 2).reshape(B, N, H * D)
    err = np.max(np.abs(got - want))
    print(f"V6 batched16 pre-T (kernel only): compile {compile_s:.1f}s "
          f"best {min(times)*1000:.2f} ms maxerr {err:.4f}", flush=True)
except Exception as exc:
    print(f"V6 FAILED: {str(exc)[:250]}", flush=True)

print("done", flush=True)
