"""Media intake: video frame sampling, animated images, audio PCM
extraction, PDF page rendering, blurhash.

The reference does this inside the file scan (jobs/files.rs: video frame
sampling :5300, render_pdf_pages :4484, audio metadata via lofty, blurhash)
with ffmpeg/pdfium/browser as host dependencies; a missing dependency
ledgers the item as ``blocked`` and heals when the tool appears
(docs/failed-media-retry-design.md, heal_blocked_scan_errors files.rs:719).

This build's decode ladder per capability:

- video: OpenCV (bundled FFmpeg decoders — no system ffmpeg needed) with a
  subprocess-ffmpeg fallback; both absent → ``blocked('video-decoder')``.
- animated images (GIF/APNG/WEBP): PIL frame iteration.
- PDF: pypdfium2 / PyMuPDF when importable, else ``blocked('pdfium')``.
- audio: WAV natively; other containers via ffmpeg when present, else
  ``blocked('ffmpeg')``.
- blurhash: pure NumPy DCT (the algorithm is public; output is the
  standard base83 string).
"""

from __future__ import annotations

import io
import shutil
import subprocess
from dataclasses import dataclass
from typing import Optional

import numpy as np

FRAMES_VERSION = 1
DEFAULT_MAX_FRAMES = 4
FRAME_JPEG_QUALITY = 87


class MediaError(Exception):
    """Typed intake failure. ``error_class`` follows the slot-error
    taxonomy: 'input' = settled verdict on the media (persists),
    'transient' = retry later; ``blocker`` names a missing host dependency
    (the heal pass clears those when the dependency appears)."""

    def __init__(self, message: str, *, error_class: str = "input",
                 blocker: Optional[str] = None):
        super().__init__(message)
        self.error_class = error_class
        self.blocker = blocker


# ---------------------------------------------------------------------------
# Capability probes
# ---------------------------------------------------------------------------


def cv2_available() -> bool:
    try:
        import cv2  # noqa: F401

        return True
    except Exception:
        return False


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def pdf_renderer_available() -> bool:
    for mod in ("pypdfium2", "fitz"):
        try:
            __import__(mod)
            return True
        except Exception:
            continue
    return False


def capabilities() -> dict:
    """Host-dependency availability, keyed by the blocker names the intake
    ledgers use (heal_blocked matches these against scan_errors.blocker)."""
    return {
        "video-decoder": cv2_available() or ffmpeg_available(),
        "ffmpeg": ffmpeg_available(),
        "pdfium": pdf_renderer_available(),
    }


# ---------------------------------------------------------------------------
# Video
# ---------------------------------------------------------------------------


@dataclass
class VideoInfo:
    width: int
    height: int
    fps: float
    frame_count: int
    duration: Optional[float]


def probe_video(path: str) -> VideoInfo:
    if not cv2_available():
        raise MediaError(
            "no video decoder on host", error_class="input",
            blocker="video-decoder",
        )
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise MediaError("container not decodable")
        width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        fps = float(cap.get(cv2.CAP_PROP_FPS)) or 0.0
        count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        duration = count / fps if fps > 0 and count > 0 else None
        return VideoInfo(width, height, fps, count, duration)
    finally:
        cap.release()


def _encode_jpeg(rgb: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="JPEG", quality=FRAME_JPEG_QUALITY)
    return buf.getvalue()


def sample_video_frames(
    path: str,
    *,
    max_frames: int = DEFAULT_MAX_FRAMES,
    skip_tail_s: float = 0.0,
) -> list[tuple[bytes, int, int]]:
    """Evenly spaced frames across the duration → [(jpeg, w, h)].

    Mirrors the reference's sampling (files.rs:5300): positions at
    (i+0.5)/n of the usable duration; ``skip_tail_s`` trims a detected
    outro card off the end so end-cards never become search content.
    """
    if not cv2_available():
        raise MediaError(
            "no video decoder on host", error_class="input",
            blocker="video-decoder",
        )
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            raise MediaError("container not decodable")
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = float(cap.get(cv2.CAP_PROP_FPS)) or 0.0
        usable = total
        if skip_tail_s > 0 and fps > 0:
            usable = max(1, total - int(skip_tail_s * fps))
        if usable <= 0:
            raise MediaError("video has no frames")
        n = min(max_frames, max(1, usable))
        targets = [int((i + 0.5) * usable / n) for i in range(n)]
        out: list[tuple[bytes, int, int]] = []
        for t in dict.fromkeys(targets):  # dedupe, keep order
            cap.set(cv2.CAP_PROP_POS_FRAMES, t)
            ok, frame = cap.read()
            if not ok:
                continue
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            out.append((_encode_jpeg(rgb), rgb.shape[1], rgb.shape[0]))
        if not out:
            raise MediaError("no decodable frames")
        return out
    finally:
        cap.release()


def decode_tail_frames(
    path: str, *, seconds: float, fps: float, width: int
) -> Optional[np.ndarray]:
    """Last ``seconds`` of video resampled to ``fps`` at ``width`` px —
    the outro detector's stage-2 input, via OpenCV (no system ffmpeg)."""
    if not cv2_available():
        return None
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        if not cap.isOpened():
            return None
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        src_fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
        n_out = int(seconds * fps)
        start = max(0, total - int(seconds * src_fps))
        frames = []
        for i in range(n_out):
            pos = start + int(i * src_fps / fps)
            if pos >= total:
                break
            cap.set(cv2.CAP_PROP_POS_FRAMES, pos)
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            h = max(1, int(rgb.shape[0] * width / rgb.shape[1]))
            frames.append(cv2.resize(rgb, (width, h)))
        if not frames:
            return None
        return np.stack(frames)
    finally:
        cap.release()


# ---------------------------------------------------------------------------
# Animated images (GIF/APNG/animated WEBP)
# ---------------------------------------------------------------------------


def sample_animated_frames(
    payload: bytes, *, max_frames: int = DEFAULT_MAX_FRAMES
) -> list[tuple[bytes, int, int]]:
    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        n = getattr(im, "n_frames", 1)
        if n <= 1:
            raise MediaError("not animated")
        picks = sorted({int((i + 0.5) * n / min(max_frames, n))
                        for i in range(min(max_frames, n))})
        out = []
        for idx in picks:
            im.seek(idx)
            rgb = np.asarray(im.convert("RGB"))
            out.append((_encode_jpeg(rgb), rgb.shape[1], rgb.shape[0]))
        return out


# ---------------------------------------------------------------------------
# PDF
# ---------------------------------------------------------------------------


def render_pdf_pages(
    path: str, *, max_pages: int = 8, scale: float = 2.0
) -> list[tuple[bytes, int, int]]:
    """PDF pages → [(png, w, h)] via pdfium (files.rs:4484). Missing
    renderer → blocked('pdfium'); heals when the dependency appears."""
    try:
        import pypdfium2 as pdfium
    except Exception:
        pdfium = None
    if pdfium is not None:
        doc = pdfium.PdfDocument(path)
        out = []
        for i in range(min(len(doc), max_pages)):
            bitmap = doc[i].render(scale=scale)
            pil = bitmap.to_pil().convert("RGB")
            buf = io.BytesIO()
            pil.save(buf, format="PNG")
            out.append((buf.getvalue(), pil.width, pil.height))
        doc.close()
        return out
    try:
        import fitz
    except Exception:
        raise MediaError(
            "no PDF renderer on host", error_class="input", blocker="pdfium"
        ) from None
    doc = fitz.open(path)
    out = []
    for i in range(min(doc.page_count, max_pages)):
        pix = doc[i].get_pixmap(matrix=fitz.Matrix(scale, scale))
        out.append((pix.tobytes("png"), pix.width, pix.height))
    doc.close()
    return out


# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------


def extract_audio_pcm(
    path: str, mime: str, *, target_rate: int = 16_000
) -> tuple[np.ndarray, int]:
    """Audio payload → (mono f32 PCM, sample rate). WAV decodes natively;
    other containers need ffmpeg (blocked when absent)."""
    if mime == "audio/wav" or path.lower().endswith(".wav"):
        import wave

        with wave.open(path, "rb") as w:
            rate = w.getframerate()
            n = w.getnframes()
            width = w.getsampwidth()
            channels = w.getnchannels()
            raw = w.readframes(n)
        if width == 2:
            pcm = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        elif width == 4:
            pcm = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2**31
        elif width == 1:
            pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise MediaError(f"unsupported WAV sample width {width}")
        if channels > 1:
            pcm = pcm.reshape(-1, channels).mean(axis=1)
        return pcm, rate
    if not ffmpeg_available():
        raise MediaError(
            "non-WAV audio needs ffmpeg", error_class="input", blocker="ffmpeg"
        )
    args = [
        "ffmpeg", "-v", "error", "-i", path, "-f", "f32le", "-ac", "1",
        "-ar", str(target_rate), "-",
    ]
    try:
        out = subprocess.run(args, capture_output=True, timeout=300)
    except Exception as exc:
        raise MediaError(f"ffmpeg failed: {exc}", error_class="transient") from exc
    if out.returncode != 0 or not out.stdout:
        raise MediaError(
            f"ffmpeg decode failed: {out.stderr.decode(errors='replace')[:200]}"
        )
    return np.frombuffer(out.stdout, dtype=np.float32), target_rate


def wav_duration(path: str) -> Optional[float]:
    try:
        import wave

        with wave.open(path, "rb") as w:
            rate = w.getframerate()
            return w.getnframes() / rate if rate else None
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Blurhash (pure NumPy — standard algorithm, base83 output)
# ---------------------------------------------------------------------------

_B83 = (
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "#$%*+,-.:;=?@[]^_{|}~"
)


def _b83_encode(value: int, length: int) -> str:
    out = []
    for i in range(1, length + 1):
        digit = (value // (83 ** (length - i))) % 83
        out.append(_B83[digit])
    return "".join(out)


def _srgb_to_linear(v: np.ndarray) -> np.ndarray:
    v = v / 255.0
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(v: float) -> int:
    # The standard truncates (x + 0.5) — no extra round() on top, which
    # would shift half of all values by one and break byte-parity with
    # conforming encoders.
    v = max(0.0, min(1.0, v))
    if v <= 0.0031308:
        return int(v * 12.92 * 255 + 0.5)
    return int((1.055 * v ** (1 / 2.4) - 0.055) * 255 + 0.5)


def blurhash_encode(rgb: np.ndarray, x_components: int = 4, y_components: int = 3) -> str:
    """Standard blurhash over an (H, W, 3) uint8 array — one vectorized DCT
    instead of the reference's per-pixel loops (blurhash crate)."""
    h, w, _ = rgb.shape
    linear = _srgb_to_linear(rgb.astype(np.float64))
    xs = np.arange(w) / w
    ys = np.arange(h) / h
    cos_x = np.cos(np.pi * np.outer(np.arange(x_components), xs))  # (X, W)
    cos_y = np.cos(np.pi * np.outer(np.arange(y_components), ys))  # (Y, H)
    # components[y, x, c] = mean over pixels of cosy·cosx·linear
    comp = np.einsum("yh,xw,hwc->yxc", cos_y, cos_x, linear) / (w * h)
    norm = np.ones((y_components, x_components, 1))
    norm[0, 0] = 1.0
    norm[(np.arange(y_components) > 0)[:, None] | (np.arange(x_components) > 0)[None, :]] = 2.0
    comp = comp * norm

    dc = comp[0, 0]
    ac = comp.reshape(-1, 3)[1:]
    out = [_b83_encode((x_components - 1) + (y_components - 1) * 9, 1)]
    if len(ac):
        actual_max = float(np.abs(ac).max())
        quant_max = max(0, min(82, int(actual_max * 166 - 0.5)))
        max_val = (quant_max + 1) / 166
        out.append(_b83_encode(quant_max, 1))
    else:
        max_val = 1.0
        out.append(_b83_encode(0, 1))
    dc_int = (
        (_linear_to_srgb(dc[0]) << 16)
        + (_linear_to_srgb(dc[1]) << 8)
        + _linear_to_srgb(dc[2])
    )
    out.append(_b83_encode(dc_int, 4))

    def quant_ac(v: float) -> int:
        s = np.sign(v) * (abs(v / max_val) ** 0.5)
        return max(0, min(18, int(s * 9 + 9.5)))

    for comp_rgb in ac:
        out.append(_b83_encode(
            quant_ac(comp_rgb[0]) * 19 * 19
            + quant_ac(comp_rgb[1]) * 19
            + quant_ac(comp_rgb[2]),
            2,
        ))
    return "".join(out)


def blurhash_for_image_bytes(payload: bytes) -> Optional[str]:
    try:
        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            im.thumbnail((64, 64))
            rgb = np.asarray(im.convert("RGB"))
        return blurhash_encode(rgb)
    except Exception:
        return None
