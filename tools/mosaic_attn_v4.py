"""V4: transposed-logits attention kernel.

Per head (2D ops only, no transposes anywhere):
  logits_T = Kh @ Qhᵀ        (N_k, N_q)  bf16 MXU, f32 out
  softmax over axis 0 (sublanes — cheaper reductions than lanes)
  out      = probsᵀ @ Vh      (N_q, D)   contraction over axis 0 of both
Variants: hps=8 grid (B,2); hps=16 grid (B,); hps=16 2 batches/step.
Plus a no-max-subtraction flavor (exp of scale-bounded logits).
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


def make_kernel(hps, bps, submax):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        for b in range(bps):
            for h in range(hps):
                sl = slice(h * D, (h + 1) * D)
                qh = q_ref[b, :, sl]
                kh = k_ref[b, :, sl]
                vh = v_ref[b, :, sl]
                lt = jax.lax.dot_general(
                    kh, qh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # (Nk, Nq)
                if submax:
                    m = jnp.max(lt, axis=0, keepdims=True)
                    e = jnp.exp(lt - m)
                else:
                    e = jnp.exp(lt)
                s = jnp.sum(e, axis=0, keepdims=True)
                p = (e / s).astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    p, vh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (Nq, D)
                o_ref[b, :, sl] = out.astype(o_ref.dtype)

    return kernel


def build(hps, bps, submax):
    block = pl.BlockSpec((bps, N, hps * D), lambda b, g: (b, 0, g))
    return jax.jit(lambda q, k, v: pl.pallas_call(
        make_kernel(hps, bps, submax),
        grid=(B // bps, H // hps),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, N, H * D), q.dtype),
    )(q, k, v))


bench_check(build(8, 1, True), "V4 hps=8 bps=1")
bench_check(build(16, 1, True), "V4 hps=16 bps=1")
bench_check(build(16, 2, True), "V4 hps=16 bps=2")
bench_check(build(16, 4, True), "V4 hps=16 bps=4")
bench_check(build(16, 1, False), "V4 hps=16 no-submax")
print("done", flush=True)
