"""Model-zoo hardware smoke: every impl family's predict path once on
the real chip, tiny configs — exercises the Pallas kernel lowerings at
odd small geometries (test-tiny vision: 2 heads × 16d at N=5; whisper
test-tiny encoder N=32) that the big benches never hit.
"""

import io
import sys

import numpy as np
from PIL import Image

import jax

print("devices:", jax.devices(), flush=True)

from panoptikon_tpu.models.base import PredictionInput  # noqa: E402
from panoptikon_tpu.models.impls import (  # noqa: E402
    CaptionerImpl, ClipImpl, OcrImpl, TaggerImpl, TextEmbedImpl,
    VlmTaggerImpl, WhisperImpl,
)

buf = io.BytesIO()
Image.new("RGB", (64, 64), (120, 60, 200)).save(buf, format="PNG")
png = buf.getvalue()


def wav_bytes(seconds=1.0, freq=440.0):
    import struct
    import wave

    sr = 16000
    n = int(sr * seconds)
    pcm = (np.sin(2 * np.pi * freq * np.arange(n) / sr) * 12000).astype(
        np.int16)
    out = io.BytesIO()
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(struct.pack(f"<{n}h", *pcm.tolist()))
    return out.getvalue()


failures = []


def smoke(name, impl, inputs, check):
    try:
        out = impl.predict(inputs)
        assert check(out), out
        print(f"{name}: OK", flush=True)
    except Exception as exc:
        failures.append((name, repr(exc)[:200]))
        print(f"{name}: FAIL {exc!r}", flush=True)
    finally:
        try:
            impl.unload()
        except Exception:
            pass


smoke("clip bf16", ClipImpl(model_arch="test-tiny"),
      [PredictionInput(file=png), PredictionInput(data={"text": "hi"})],
      lambda o: all(isinstance(x, bytes) for x in o))
smoke("clip int8-static", ClipImpl(model_arch="test-tiny", precision="int8"),
      [PredictionInput(file=png)],
      lambda o: isinstance(o[0], bytes))
smoke("tagger int8", TaggerImpl(model_arch="test-tiny", precision="int8",
                                tag_vocab=[f"g{i}" for i in range(8)]),
      [PredictionInput(file=png, data={"threshold": 0.01})],
      lambda o: "tags" in o[0])
smoke("text embed", TextEmbedImpl(model_arch="test-tiny"),
      [PredictionInput(data={"text": "alpha beta gamma"})],
      lambda o: isinstance(o[0], bytes))
smoke("whisper", WhisperImpl(model_arch="test-tiny"),
      [PredictionInput(file=wav_bytes())],
      lambda o: "text" in o[0] and "language" in o[0])
smoke("ocr", OcrImpl(),
      [PredictionInput(file=png)],
      lambda o: "text" in o[0])
smoke("ocr attn", OcrImpl(model_arch="test-tiny", recognizer="attn"),
      [PredictionInput(file=png)],
      lambda o: "text" in o[0])
smoke("captioner", CaptionerImpl(model_arch="test-tiny", max_tokens=8),
      [PredictionInput(file=png)],
      lambda o: "text" in o[0])
smoke("vlm tagger", VlmTaggerImpl(model_arch="test-tiny", max_tokens=8),
      [PredictionInput(file=png)],
      lambda o: "tags" in o[0])

# ---- Production-width int8 fidelity gate (VERDICT r3 ask #7) -----------
# cosine(static-int8 embeds, bf16 embeds) at the REAL model widths on the
# real chip — the tiny-width test config amplifies quant noise, so the
# asserted production bar lives here. Measured on this chip (2026-08-17):
# ViT-L min 0.99923-0.99928 / mean 0.99932-0.99937 and ViT-H-378 min
# 0.99912 across noise + smooth input classes with same-batch calibration;
# the floor sits just under the measured band so a kernel change that
# degrades the static-int8 path fails here. Reference anchor:
# docs/clip-fp16-precision-evaluation.md:24-31 — the reference SHIPPED
# fp16 at 0.9993 relevance retained, the same fidelity class.
FIDELITY_FLOOR = 0.999


def fidelity(arch: str, batch: int = 8) -> float:
    import dataclasses

    from panoptikon_tpu.models import clip

    cfg_bf16 = clip.CONFIGS[arch]
    params = clip.init_params(jax.random.key(2), cfg_bf16)
    params = jax.tree.map(
        lambda a: a.astype(jax.numpy.bfloat16)
        if a.dtype == jax.numpy.float32 else a,
        params,
    )
    images = jax.random.normal(
        jax.random.key(3), (batch, cfg_bf16.image_size, cfg_bf16.image_size, 3),
        dtype=jax.numpy.bfloat16,
    )
    ref = np.asarray(clip.embed_images_jit(params, cfg_bf16, images))
    cfg_q = dataclasses.replace(cfg_bf16, matmul_precision="int8")
    qparams = clip.quantize_block_weights(params)
    scales = clip.calibrate_image_scales(qparams, cfg_q, images)
    got = np.asarray(
        clip.embed_images_scaled_jit(qparams, cfg_q, images, scales)
    )
    num = (ref * got).sum(axis=1)
    den = np.linalg.norm(ref, axis=1) * np.linalg.norm(got, axis=1)
    return float(np.min(num / den))


for arch in ("ViT-L-14", "ViT-H-14-378"):
    try:
        cos = fidelity(arch)
        status = "OK" if cos >= FIDELITY_FLOOR else "FAIL"
        print(f"fidelity {arch}: min-cosine(int8, bf16) = {cos:.5f} "
              f"(floor {FIDELITY_FLOOR}) {status}", flush=True)
        if cos < FIDELITY_FLOOR:
            failures.append((f"fidelity {arch}", f"{cos:.5f} < {FIDELITY_FLOOR}"))
    except Exception as exc:  # noqa: BLE001
        failures.append((f"fidelity {arch}", repr(exc)[:200]))
        print(f"fidelity {arch}: FAIL {exc!r}", flush=True)

print("SMOKE", "FAIL" if failures else "OK", failures, flush=True)
sys.exit(1 if failures else 0)
