"""Chained-timing micro-tuning of the production attention kernel.

Variants (16 dependent iterations in one jit, one scalar readback):
  base        : production _attn_kernel (head loop, transposed logits)
  interleave  : software-pipelined — QK(h+1) issued between softmax(h)
                and AV(h) so MXU overlaps VPU
  recip       : e * (1/s) instead of e / s
  nomax       : skip max subtraction (perf probe only)
  combo       : interleave + recip
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

print("devices:", jax.devices(), flush=True)

B, N, H, D = 256, 257, 16, 64
HPS = 16
ITERS = 16
scale = D ** -0.5
ks = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(ks[0], (B, N, H * D), dtype=jnp.bfloat16)
k = jax.random.normal(ks[1], (B, N, H * D), dtype=jnp.bfloat16)
v = jax.random.normal(ks[2], (B, N, H * D), dtype=jnp.bfloat16)


def qk(q_ref, k_ref, h):
    sl = slice(h * D, (h + 1) * D)
    return jax.lax.dot_general(
        k_ref[0, :, sl], q_ref[0, :, sl], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale


def av_write(p, v_ref, o_ref, h):
    sl = slice(h * D, (h + 1) * D)
    out = jax.lax.dot_general(
        p, v_ref[0, :, sl], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, :, sl] = out.astype(o_ref.dtype)


def make_kernel_bps2(interleave):
    def qk2(q_ref, k_ref, b, h):
        sl = slice(h * D, (h + 1) * D)
        return jax.lax.dot_general(
            k_ref[b, :, sl], q_ref[b, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    def sm2(lt):
        m = jnp.max(lt, axis=0, keepdims=True)
        e = jnp.exp(lt - m)
        s = jnp.sum(e, axis=0, keepdims=True)
        return (e / s).astype(jnp.bfloat16)

    def av2(p, v_ref, o_ref, b, h):
        sl = slice(h * D, (h + 1) * D)
        out = jax.lax.dot_general(
            p, v_ref[b, :, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[b, :, sl] = out.astype(o_ref.dtype)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        pairs = [(b, h) for b in range(2) for h in range(HPS)]
        lt = qk2(q_ref, k_ref, *pairs[0])
        for i, (b, h) in enumerate(pairs):
            p = sm2(lt)
            if i + 1 < len(pairs):
                lt_next = qk2(q_ref, k_ref, *pairs[i + 1])
            av2(p, v_ref, o_ref, b, h)
            if i + 1 < len(pairs):
                lt = lt_next

    return kernel


def build_bps2():
    block = pl.BlockSpec((2, N, HPS * D), lambda b, g: (b, 0, g))
    attn = lambda q, k, v: pl.pallas_call(
        make_kernel_bps2(True),
        grid=(B // 2, H // HPS),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), q.dtype),
    )(q, k, v)

    @jax.jit
    def run(q, k, v):
        def body(i, q):
            out = attn(q, k, v)
            return q + out * jnp.bfloat16(1e-4)

        return jax.lax.fori_loop(0, ITERS, body, q)

    return run


def make_kernel(flavor):
    def sm(lt):
        if flavor in ("nomax",):
            e = jnp.exp(lt)
        else:
            m = jnp.max(lt, axis=0, keepdims=True)
            e = jnp.exp(lt - m)
        s = jnp.sum(e, axis=0, keepdims=True)
        if flavor in ("recip", "combo"):
            return (e * (1.0 / s)).astype(jnp.bfloat16)
        return (e / s).astype(jnp.bfloat16)

    if flavor == "interleave2":
        def kernel(q_ref, k_ref, v_ref, o_ref):
            lts = [qk(q_ref, k_ref, 0), qk(q_ref, k_ref, 1)]
            for h in range(HPS):
                p = sm(lts[0])
                if h + 2 < HPS:
                    lts.append(qk(q_ref, k_ref, h + 2))
                av_write(p, v_ref, o_ref, h)
                lts.pop(0)
    elif flavor in ("interleave", "combo"):
        def kernel(q_ref, k_ref, v_ref, o_ref):
            lt = qk(q_ref, k_ref, 0)
            for h in range(HPS):
                p = sm(lt)
                if h + 1 < HPS:
                    lt_next = qk(q_ref, k_ref, h + 1)
                av_write(p, v_ref, o_ref, h)
                if h + 1 < HPS:
                    lt = lt_next
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            for h in range(HPS):
                p = sm(qk(q_ref, k_ref, h))
                av_write(p, v_ref, o_ref, h)

    return kernel


def build(flavor):
    block = pl.BlockSpec((1, N, HPS * D), lambda b, g: (b, 0, g))
    attn = lambda q, k, v: pl.pallas_call(
        make_kernel(flavor),
        grid=(B, H // HPS),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), q.dtype),
    )(q, k, v)

    @jax.jit
    def run(q, k, v):
        def body(i, q):
            out = attn(q, k, v)
            return q + out * jnp.bfloat16(1e-4)

        return jax.lax.fori_loop(0, ITERS, body, q)

    return run


@jax.jit
def noop(q, k, v):
    def body(i, q):
        return q * jnp.bfloat16(1.0001)

    return jax.lax.fori_loop(0, ITERS, body, q)


def bench(fn, label):
    try:
        t0 = time.perf_counter()
        out = fn(q, k, v)
        _ = float(jnp.asarray(out).ravel()[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(q, k, v)
            _ = float(jnp.asarray(out).ravel()[0])
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"{label}: compile {compile_s:.1f}s best {best*1000:.2f} ms "
              f"-> {best*1000/ITERS:.2f} ms/iter", flush=True)
    except Exception as exc:
        print(f"{label} FAILED: {str(exc)[:250]}", flush=True)


bench(noop, "noop")
for flavor in ("interleave", "interleave2"):
    bench(build(flavor), flavor)
bench(build_bps2(), "bps2+interleave")
print("done", flush=True)
