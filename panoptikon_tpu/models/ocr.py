"""OCR: host-side line segmentation + a CTC sequence recognizer.

Replaces the reference's OCR workers (``python/inferio/impl/ocr.py`` docTR,
``eocr.py`` EasyOCR-CRNN) with a TPU-native recognition stack:

- **line segmentation** (host): grayscale → global-mean binarization →
  row-projection profiles → line spans, column-profile trim per line. The
  classic projection method; no external engine dependency.
- **recognizer**: fixed-height line strips → column patch embedding as one
  matmul → bidirectional transformer trunk (the CLIP block, MXU-shaped) →
  per-column class logits → CTC greedy decode (collapse repeats, drop
  blanks). Sequence recognition with CTC is exactly the EasyOCR/CRNN
  formulation; the recurrent trunk is replaced by attention (static
  shapes, no scan-over-time serialization).
- **trainable**: ``ctc_loss`` pairs with ``optax.ctc_loss`` — the test
  suite trains the tiny config to read rendered text, proving the stack
  recognizes rather than stubs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from panoptikon_tpu.models import clip as _clip

Params = dict[str, Any]

# Index 0 is the CTC blank.
DEFAULT_CHARSET = " !\"#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`abcdefghijklmnopqrstuvwxyz{|}~"


@dataclasses.dataclass(frozen=True)
class OcrConfig:
    height: int = 32
    max_width: int = 512
    col_patch: int = 4  # columns per token
    width: int = 256
    layers: int = 4
    heads: int = 4
    charset: str = DEFAULT_CHARSET
    matmul_precision: str = "bf16"

    @property
    def tokens(self) -> int:
        return self.max_width // self.col_patch

    @property
    def classes(self) -> int:
        return len(self.charset) + 1  # + CTC blank at index 0


CONFIGS = {
    "crnn-base": OcrConfig(),
    "test-tiny": OcrConfig(
        height=16, max_width=128, col_patch=4, width=64, layers=2, heads=2,
        charset="0123456789",
    ),
}


def init_params(key, cfg: OcrConfig) -> Params:
    kp, kpos, kb, kh = jax.random.split(key, 4)
    patch_dim = cfg.height * cfg.col_patch
    blocks = [
        _clip._init_block(k, cfg.width, 4 * cfg.width)
        for k in jax.random.split(kb, cfg.layers)
    ]
    return {
        "patch_w": jax.random.normal(kp, (patch_dim, cfg.width)) * patch_dim**-0.5,
        "pos_emb": jax.random.normal(kpos, (cfg.tokens, cfg.width)) * 0.02,
        "blocks": blocks,
        "ln_out": {"scale": jnp.ones(cfg.width), "bias": jnp.zeros(cfg.width)},
        "head_w": jax.random.normal(kh, (cfg.width, cfg.classes)) * cfg.width**-0.5,
        "head_b": jnp.zeros(cfg.classes),
    }


def encode_strips(params: Params, cfg: OcrConfig, strips):
    """Trunk features (B, tokens, width) bf16 — shared by the CTC head and
    the attention recognizer's cross-attention memory."""
    b = strips.shape[0]
    x = strips.astype(jnp.bfloat16)
    # (B, H, T·cp) → (B, T, H·cp): column patches as tokens.
    x = x.reshape(b, cfg.height, cfg.tokens, cfg.col_patch)
    x = x.transpose(0, 2, 1, 3).reshape(b, cfg.tokens, -1)
    x = x @ params["patch_w"].astype(x.dtype)
    x = x + params["pos_emb"].astype(x.dtype)[None]
    for blk in params["blocks"]:
        x = _clip._block(x, blk, cfg.heads, causal=False,
                         precision=cfg.matmul_precision)
    return _clip._layernorm(x, params["ln_out"])


def logits(params: Params, cfg: OcrConfig, strips):
    """strips: (B, height, max_width) f32 in [0,1] → (B, tokens, classes)."""
    x = encode_strips(params, cfg, strips)
    return (x @ params["head_w"].astype(x.dtype)).astype(jnp.float32) + params[
        "head_b"
    ]


@functools.partial(jax.jit, static_argnames=("cfg",))
def recognize_jit(params, cfg: OcrConfig, strips):
    """Greedy CTC: per-column argmax + mean top-prob confidence."""
    lg = logits(params, cfg, strips)
    probs = jax.nn.softmax(lg, axis=-1)
    ids = jnp.argmax(lg, axis=-1)  # (B, T)
    conf = jnp.mean(jnp.max(probs, axis=-1), axis=-1)
    return ids, conf


def ctc_collapse(ids: np.ndarray, charset: str) -> str:
    """Collapse repeats, drop blanks (id 0)."""
    out = []
    prev = -1
    for i in ids.tolist():
        if i != prev and i != 0:
            out.append(charset[i - 1])
        prev = i
    return "".join(out)


def ctc_loss(params: Params, cfg: OcrConfig, strips, labels, label_lengths):
    """CTC training objective (optax.ctc_loss; blank=0). ``labels`` are
    1-based charset indices padded with 0."""
    import optax

    lg = logits(params, cfg, strips)
    b, t, _ = lg.shape
    logit_pad = jnp.zeros((b, t))
    label_pad = (
        jnp.arange(labels.shape[1])[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    per = optax.ctc_loss(lg, logit_pad, labels, label_pad, blank_id=0)
    return jnp.mean(per)


# ---------------------------------------------------------------------------
# Host-side line segmentation (projection profiles)
# ---------------------------------------------------------------------------


def segment_lines(gray: np.ndarray, *, min_height: int = 4) -> list[tuple[int, int, int, int]]:
    """(H, W) grayscale [0,255] → [(top, bottom, left, right)] line boxes.

    Dark-on-light assumed; inverts automatically when the page mean says
    otherwise. Row-projection with gap splitting, column trim per line.
    """
    g = gray.astype(np.float32)
    if g.mean() < 127:
        g = 255.0 - g
    ink = (g < g.mean() - 0.15 * g.std()).astype(np.float32)
    rows = ink.sum(axis=1)
    active = rows > max(1.0, 0.02 * ink.shape[1])
    boxes = []
    start = None
    for y, a in enumerate(active.tolist() + [False]):
        if a and start is None:
            start = y
        elif not a and start is not None:
            if y - start >= min_height:
                cols = ink[start:y].sum(axis=0)
                nz = np.flatnonzero(cols > 0)
                if len(nz):
                    boxes.append((start, y, int(nz[0]), int(nz[-1]) + 1))
            start = None
    return boxes


def prepare_strip(gray: np.ndarray, box, cfg: OcrConfig) -> np.ndarray:
    """Crop a line box, normalize to (height, max_width) in [0,1] ink-on-
    zero orientation, right-padded."""
    top, bottom, left, right = box
    crop = gray[top:bottom, left:right].astype(np.float32)
    if crop.mean() > 127:
        crop = 255.0 - crop  # ink → high values
    crop /= max(crop.max(), 1.0)
    h, w = crop.shape
    new_w = max(1, int(round(w * cfg.height / h)))
    # Nearest-neighbor resize (no external deps).
    yi = np.clip((np.arange(cfg.height) * h / cfg.height).astype(int), 0, h - 1)
    xi = np.clip((np.arange(new_w) * w / new_w).astype(int), 0, w - 1)
    resized = crop[yi][:, xi]
    if new_w >= cfg.max_width:
        return resized[:, : cfg.max_width]
    out = np.zeros((cfg.height, cfg.max_width), np.float32)
    out[:, :new_w] = resized
    return out


# ---------------------------------------------------------------------------
# Second recognizer architecture: attention decoder (seq2seq)
# ---------------------------------------------------------------------------
# The reference ships multiple OCR engines (impl/ocr.py docTR, eocr.py
# EasyOCR, dotsocr.py); architecturally they split into CTC recognizers
# and attention/seq2seq recognizers. ``recognize_jit`` above is the CTC
# family; this is the attention family — the SAME strip encoder feeds a
# whisper-style autoregressive character decoder with cross-attention
# (reusing models/whisper.py's KV-cached incremental decode, exactly as
# the captioner does). Different failure modes: no per-column alignment
# assumption, an implicit character language model, native variable-length
# output.


@dataclasses.dataclass(frozen=True)
class AttnOcrConfig:
    enc: OcrConfig = OcrConfig()
    max_chars: int = 64  # decoder context (incl. SOT + EOT)
    dec_layers: int = 2
    dec_heads: int = 4

    # Vocabulary layout shares the CTC label convention: 0 is PAD/blank,
    # chars are 1 + charset.index(c); SOT/EOT follow.
    @property
    def n_chars(self) -> int:
        return len(self.enc.charset)

    @property
    def sot(self) -> int:
        return self.n_chars + 1

    @property
    def eot(self) -> int:
        return self.n_chars + 2

    @property
    def n_vocab(self) -> int:
        return self.n_chars + 3

    def decoder_cfg(self):
        """Synthetic WhisperConfig driving the shared decoder kernels —
        only the text-side fields matter here."""
        from panoptikon_tpu.models import whisper as _w

        return _w.WhisperConfig(
            n_vocab=self.n_vocab,
            n_text_ctx=self.max_chars,
            n_text_state=self.enc.width,
            n_text_layers=self.dec_layers,
            n_text_heads=self.dec_heads,
            n_audio_state=self.enc.width,
            sot=self.sot,
            eot=self.eot,
        )


ATTN_CONFIGS = {
    "attn-base": AttnOcrConfig(),
    "test-tiny": AttnOcrConfig(
        enc=CONFIGS["test-tiny"], max_chars=16, dec_layers=2, dec_heads=2
    ),
}


def init_attn_params(key, cfg: AttnOcrConfig) -> Params:
    """Encoder trunk (same layout as the CTC recognizer — checkpoints
    share the trunk) + whisper-layout ``decoder``."""
    from panoptikon_tpu.models import whisper as _w

    k_enc, k_emb, k_pos, kb = jax.random.split(key, 4)
    params = init_params(k_enc, cfg.enc)
    w = cfg.enc.width
    dec_blocks = [
        {
            "ln_1": _w._ln_init(w),
            "attn": _w._init_attn(k1, w),
            "ln_cross": _w._ln_init(w),
            "cross": _w._init_cross(k2, w),
            "ln_2": _w._ln_init(w),
            "mlp": _w._init_mlp(k3, w),
        }
        for k1, k2, k3 in jax.random.split(
            kb, (cfg.dec_layers, 3)
        )
    ]
    params["decoder"] = {
        "token_emb": jax.random.normal(k_emb, (cfg.n_vocab, w)) * 0.02,
        "pos_emb": jax.random.normal(k_pos, (cfg.max_chars, w)) * 0.01,
        "blocks": dec_blocks,
        "ln_post": _w._ln_init(w),
    }
    return params


@functools.partial(jax.jit, static_argnames=("cfg",))
def attn_read_jit(params, cfg: AttnOcrConfig, strips):
    """strips (B, height, max_width) → (tokens (B, max_chars), lengths,
    confidence) via KV-cached greedy decode. tokens[:, 0] is the SOT
    prompt; generated chars are tokens[j, 1:lengths[j]]."""
    from panoptikon_tpu.models import whisper as _w

    memory = encode_strips(params, cfg.enc, strips)
    b = strips.shape[0]
    prompt = jnp.full((b, 1), cfg.sot, jnp.int32)
    tokens, lengths, avg_logp = _w.decode_from_feats(
        params, cfg.decoder_cfg(), memory, prompt, cfg.max_chars
    )
    return tokens, lengths, jnp.exp(avg_logp)


def attn_collapse(tokens: np.ndarray, length: int, charset: str) -> str:
    """Generated token ids → text (PAD and specials dropped)."""
    out = []
    for t in tokens[1:length]:
        t = int(t)
        if 1 <= t <= len(charset):
            out.append(charset[t - 1])
    return "".join(out)


def attn_loss(params: Params, cfg: AttnOcrConfig, strips, labels,
              label_lengths):
    """Teacher-forced cross-entropy. ``labels``: (B, L) CTC-convention ids
    (0 = pad, chars 1-based), L ≤ max_chars - 2. The decoder input is
    [SOT, chars…]; the target appends EOT at each row's length."""
    from panoptikon_tpu.models import whisper as _w

    b, ll = labels.shape
    memory = encode_strips(params, cfg.enc, strips)
    sot_col = jnp.full((b, 1), cfg.sot, jnp.int32)
    dec_in = jnp.concatenate([sot_col, labels.astype(jnp.int32)], axis=1)
    lg = _w._decoder_logits(params, cfg.decoder_cfg(), dec_in, memory, None)
    # Target at position i is the token AFTER dec_in[i]: the chars shifted
    # left, with EOT at each row's end.
    pos = jnp.arange(ll + 1)[None]
    lens = label_lengths[:, None]
    targets = jnp.where(
        pos < lens,
        jnp.concatenate(
            [labels.astype(jnp.int32), jnp.zeros((b, 1), jnp.int32)], axis=1
        ),
        jnp.where(pos == lens, cfg.eot, 0),
    )
    valid = (pos <= lens).astype(jnp.float32)
    logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)
