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
smoke("captioner", CaptionerImpl(model_arch="test-tiny", max_tokens=8),
      [PredictionInput(file=png)],
      lambda o: "text" in o[0])
smoke("vlm tagger", VlmTaggerImpl(model_arch="test-tiny", max_tokens=8),
      [PredictionInput(file=png)],
      lambda o: "tags" in o[0])

print("SMOKE", "FAIL" if failures else "OK", failures, flush=True)
sys.exit(1 if failures else 0)
