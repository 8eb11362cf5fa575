"""whisper-base transcription: KV-cached incremental decode vs the
full-prefix re-run form. Single-readback timing (the decode dominates at
seconds scale; the ~25 ms constant is noise here)."""

import time

import jax
import jax.numpy as jnp

from panoptikon_tpu.models import whisper

print("devices:", jax.devices(), flush=True)
cfg = whisper.CONFIGS["whisper-base"]
params = whisper.init_params(jax.random.key(0), cfg)
params = jax.tree.map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
)
B, MT = 4, 32
mel = jax.random.normal(jax.random.key(1), (B, cfg.n_mels, 3000),
                        dtype=jnp.float32)


def bench(fn, label):
    t0 = time.perf_counter()
    out = fn(params, cfg, mel, max_tokens=MT)
    _ = float(out[2][0])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(params, cfg, mel, max_tokens=MT)
        _ = float(out[2][0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{label}: compile {compile_s:.0f}s best {best*1000:.0f} ms "
          f"(batch {B}, {MT} tokens)", flush=True)


bench(whisper.greedy_decode, "cached incremental decode")
bench(whisper._greedy_decode_rerun, "full-prefix re-run decode")
print("done", flush=True)
