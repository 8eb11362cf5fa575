"""TPU probe: ViT-L/14 image-embed throughput at several batch sizes.

Target (BASELINE.md): ≥1,000 embeds/sec/chip on a v5e. Reference datum:
114 img/s fp16 on an RTX 5090 (docs/clip-fp16-precision-evaluation.md:24-31).

Run on the real chip:  python tools/embed_probe.py
CPU smoke (tiny cfg):  JAX_PLATFORMS=cpu python tools/embed_probe.py --tiny
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from panoptikon_tpu.models import clip


def main() -> None:
    tiny = "--tiny" in sys.argv
    name = "test-tiny" if tiny else "ViT-L-14"
    cfg = clip.CONFIGS[name]
    params = clip.init_params(jax.random.key(0), cfg)
    # bf16 weight storage: halves HBM weight traffic; layernorm statistics
    # stay f32 inside the kernels regardless of storage dtype.
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    print(f"devices: {jax.devices()}", flush=True)

    @jax.jit
    def embed(params, images):
        return clip.encode_image(params, cfg, images)

    batches = [64] if tiny else [128, 256, 512]
    steps = 3 if tiny else 10
    for b in batches:
        key = jax.random.key(b)
        images = jax.random.normal(
            key, (b, cfg.image_size, cfg.image_size, 3), dtype=jnp.bfloat16
        )
        t0 = time.perf_counter()
        out = embed(params, images)
        float(out[0, 0])
        print(f"batch {b}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        times = []
        for _ in range(steps):
            t0 = time.perf_counter()
            out = embed(params, images)
            float(out[0, 0])  # scalar readback forces execution via tunnel
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(
            f"batch {b}: best {best*1000:.1f} ms -> {b/best:.0f} img/s "
            f"(times {['%.3f' % t for t in times]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
