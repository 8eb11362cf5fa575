"""Whisper-architecture speech-to-text in pure JAX.

Replaces the reference's faster-whisper worker (``python/inferio/impl/
whisper.py``: audio → segments of text + language + confidence). The
architecture is the standard Whisper encoder-decoder:

- host-side log-mel spectrogram (n_fft 400, hop 160, 80 mel bins, 30 s
  windows → 3000 frames);
- encoder: two stride-1/2 convs (expressed as framed matmuls) + sinusoidal
  positions + transformer;
- decoder: learned positions, causal self-attention + cross-attention,
  greedy decode under ``lax.while_loop`` with a static KV cache (static
  shapes end to end — one compile per (audio batch, max tokens) bucket).

Weights map from HF ``WhisperModel`` checkpoints via ``models.weights``
conventions; tests run the tiny random-init config. The confidence the
reference persists (avg logprob) is produced the same way here.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from panoptikon_tpu.ops import vit_attention

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80
CHUNK_SECONDS = 30


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_mels: int = N_MELS
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_layers: int = 4
    n_audio_heads: int = 6
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_layers: int = 4
    n_text_heads: int = 6
    # Special tokens (multilingual vocab layout).
    sot: int = 50258
    eot: int = 50257
    no_timestamps: int = 50363
    transcribe: int = 50359
    # Language tokens: ids [lang_base, lang_base + n_langs) map onto
    # LANGUAGES[:n_langs] (OpenAI layout: the 99 language tokens follow
    # SOT). lang_base None → sot + 1.
    n_langs: int = 99
    lang_base: "int | None" = None

    @property
    def language_base(self) -> int:
        return self.sot + 1 if self.lang_base is None else self.lang_base


# OpenAI whisper's language-token order (tokenizer.py LANGUAGES): token
# sot+1+i names LANGUAGES[i].
LANGUAGES = [
    "en", "zh", "de", "es", "ru", "ko", "fr", "ja", "pt", "tr", "pl", "ca",
    "nl", "ar", "sv", "it", "id", "hi", "fi", "vi", "he", "uk", "el", "ms",
    "cs", "ro", "da", "hu", "ta", "no", "th", "ur", "hr", "bg", "lt", "la",
    "mi", "ml", "cy", "sk", "te", "fa", "lv", "bn", "sr", "az", "sl", "kn",
    "et", "mk", "br", "eu", "is", "hy", "ne", "mn", "bs", "kk", "sq", "sw",
    "gl", "mr", "pa", "si", "km", "sn", "yo", "so", "af", "oc", "ka", "be",
    "tg", "sd", "gu", "am", "yi", "lo", "uz", "fo", "ht", "ps", "tk", "nn",
    "mt", "sa", "lb", "my", "bo", "tl", "mg", "as", "tt", "haw", "ln", "ha",
    "ba", "jw", "su",
]


CONFIGS = {
    "whisper-tiny": WhisperConfig(),
    "whisper-base": WhisperConfig(
        n_audio_state=512, n_audio_layers=6, n_audio_heads=8,
        n_text_state=512, n_text_layers=6, n_text_heads=8,
    ),
    "test-tiny": WhisperConfig(
        n_mels=16, n_audio_ctx=32, n_audio_state=32, n_audio_layers=2,
        n_audio_heads=2, n_vocab=128, n_text_ctx=16, n_text_state=32,
        n_text_layers=2, n_text_heads=2, sot=100, eot=101,
        no_timestamps=103, transcribe=102,
        n_langs=4, lang_base=104,  # eot sits at sot+1 here → explicit base
    ),
}


# ---------------------------------------------------------------------------
# Host-side mel spectrogram
# ---------------------------------------------------------------------------


def mel_filterbank(n_mels: int, n_fft: int = N_FFT, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-style mel filterbank (n_mels, n_fft//2 + 1)."""

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    fmax = sr / 2
    mels = np.linspace(hz_to_mel(0), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    # Continuous triangular ramps over the FFT bin center frequencies —
    # avoids degenerate all-zero filters from integer bin collapse.
    bin_freqs = np.linspace(0, fmax, n_fft // 2 + 1)
    lo = freqs[:-2][:, None]
    mid = freqs[1:-1][:, None]
    hi = freqs[2:][:, None]
    up = (bin_freqs[None, :] - lo) / np.maximum(mid - lo, 1e-10)
    down = (hi - bin_freqs[None, :]) / np.maximum(hi - mid, 1e-10)
    return np.maximum(0.0, np.minimum(up, down)).astype(np.float32)


def log_mel_spectrogram(audio: np.ndarray, n_mels: int = N_MELS) -> np.ndarray:
    """f32 PCM (-1..1) at 16 kHz → (n_mels, frames) log-mel, padded/trimmed
    to one 30 s chunk (3000 frames), Whisper's normalization."""
    target = SAMPLE_RATE * CHUNK_SECONDS
    audio = np.asarray(audio, dtype=np.float32)[:target]
    if len(audio) < target:
        audio = np.pad(audio, (0, target - len(audio)))
    # Centered STFT (reflect pad N_FFT/2 both sides) → exactly
    # target/HOP = 3000 frames.
    audio = np.pad(audio, (N_FFT // 2, N_FFT // 2), mode="reflect")
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    frames = target // HOP
    strided = np.lib.stride_tricks.as_strided(
        audio,
        shape=(frames, N_FFT),
        strides=(audio.strides[0] * HOP, audio.strides[0]),
    )
    stft = np.fft.rfft(strided * window, axis=1)
    power = (np.abs(stft) ** 2).astype(np.float32)
    fb = mel_filterbank(n_mels)
    mel = fb @ power.T  # (n_mels, frames)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def _init_attn(key, width):
    k = jax.random.split(key, 2)
    s = width**-0.5
    return {
        "qkv_w": jax.random.normal(k[0], (width, 3 * width)) * s,
        "qkv_b": jnp.zeros(3 * width),
        "out_w": jax.random.normal(k[1], (width, width)) * s,
        "out_b": jnp.zeros(width),
    }


def _init_cross(key, width):
    k = jax.random.split(key, 3)
    s = width**-0.5
    return {
        "q_w": jax.random.normal(k[0], (width, width)) * s,
        "q_b": jnp.zeros(width),
        "kv_w": jax.random.normal(k[1], (width, 2 * width)) * s,
        "kv_b": jnp.zeros(2 * width),
        "out_w": jax.random.normal(k[2], (width, width)) * s,
        "out_b": jnp.zeros(width),
    }


def _init_mlp(key, width):
    k = jax.random.split(key, 2)
    return {
        "fc_w": jax.random.normal(k[0], (width, 4 * width)) * width**-0.5,
        "fc_b": jnp.zeros(4 * width),
        "proj_w": jax.random.normal(k[1], (4 * width, width)) * (4 * width) ** -0.5,
        "proj_b": jnp.zeros(width),
    }


def _ln_init(width):
    return {"scale": jnp.ones(width), "bias": jnp.zeros(width)}


def init_params(key, cfg: WhisperConfig) -> dict[str, Any]:
    keys = jax.random.split(key, 8 + cfg.n_audio_layers * 2 + cfg.n_text_layers * 3)
    ki = iter(keys)
    w_a, w_t = cfg.n_audio_state, cfg.n_text_state
    enc_blocks = []
    for _ in range(cfg.n_audio_layers):
        enc_blocks.append(
            {
                "ln_1": _ln_init(w_a),
                "attn": _init_attn(next(ki), w_a),
                "ln_2": _ln_init(w_a),
                "mlp": _init_mlp(next(ki), w_a),
            }
        )
    dec_blocks = []
    for _ in range(cfg.n_text_layers):
        dec_blocks.append(
            {
                "ln_1": _ln_init(w_t),
                "attn": _init_attn(next(ki), w_t),
                "ln_cross": _ln_init(w_t),
                "cross": _init_cross(next(ki), w_t),
                "ln_2": _ln_init(w_t),
                "mlp": _init_mlp(next(ki), w_t),
            }
        )
    return {
        "encoder": {
            "conv1_w": jax.random.normal(next(ki), (3, cfg.n_mels, w_a)) * 0.02,
            "conv1_b": jnp.zeros(w_a),
            "conv2_w": jax.random.normal(next(ki), (3, w_a, w_a)) * 0.02,
            "conv2_b": jnp.zeros(w_a),
            "blocks": enc_blocks,
            "ln_post": _ln_init(w_a),
        },
        "decoder": {
            "token_emb": jax.random.normal(next(ki), (cfg.n_vocab, w_t)) * 0.02,
            "pos_emb": jax.random.normal(next(ki), (cfg.n_text_ctx, w_t)) * 0.01,
            "blocks": dec_blocks,
            "ln_post": _ln_init(w_t),
        },
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layernorm(x, p):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def _self_attention(x, p, heads, causal=False):
    b, n, w = x.shape
    qkv = x @ p["qkv_w"].astype(x.dtype) + p["qkv_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = w // heads
    # VMEM-resident Pallas kernel on TPU (q-blocked for the encoder's
    # N=1500 — ops/vit_attention.py plans the tiling); XLA off-TPU.
    out = vit_attention.attention(
        q.reshape(b, n, heads, hd),
        k.reshape(b, n, heads, hd),
        v.reshape(b, n, heads, hd),
        causal=causal,
    ).reshape(b, n, w)
    return out @ p["out_w"].astype(x.dtype) + p["out_b"].astype(x.dtype)


def _mlp(x, p):
    h = x @ p["fc_w"].astype(x.dtype) + p["fc_b"].astype(x.dtype)
    h = jax.nn.gelu(h, approximate=True)
    return h @ p["proj_w"].astype(x.dtype) + p["proj_b"].astype(x.dtype)


def _sinusoids(length: int, channels: int):
    log_timescale = jnp.log(10000.0) / (channels // 2 - 1)
    inv = jnp.exp(-log_timescale * jnp.arange(channels // 2))
    scaled = jnp.arange(length)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)


def _conv1d(x, w, b, stride):
    """x: (B, T, Cin); w: (K, Cin, Cout) — framed matmul conv, 'same' pad."""
    k = w.shape[0]
    pad = k // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out + b


def encode_audio(params, cfg: WhisperConfig, mel):
    """mel: (B, n_mels, frames) → (B, n_audio_ctx, state)."""
    e = params["encoder"]
    x = jnp.transpose(mel, (0, 2, 1)).astype(jnp.bfloat16)  # (B, T, mels)
    x = jax.nn.gelu(_conv1d(x, e["conv1_w"].astype(x.dtype), e["conv1_b"].astype(x.dtype), 1))
    x = jax.nn.gelu(_conv1d(x, e["conv2_w"].astype(x.dtype), e["conv2_b"].astype(x.dtype), 2))
    x = x[:, : cfg.n_audio_ctx]
    x = x + _sinusoids(cfg.n_audio_ctx, cfg.n_audio_state).astype(x.dtype)[None]
    for blk in e["blocks"]:
        x = x + _self_attention(_layernorm(x, blk["ln_1"]), blk["attn"], cfg.n_audio_heads)
        x = x + _mlp(_layernorm(x, blk["ln_2"]), blk["mlp"])
    return _layernorm(x, e["ln_post"]).astype(jnp.float32)


def _decoder_logits(params, cfg: WhisperConfig, tokens, audio_feats, token_mask):
    """tokens: (B, L) with causal decode over valid prefix; returns logits
    (B, L, vocab)."""
    d = params["decoder"]
    b, n = tokens.shape
    x = d["token_emb"][tokens].astype(jnp.bfloat16)
    x = x + d["pos_emb"].astype(x.dtype)[None, :n]
    heads = cfg.n_text_heads
    hd = cfg.n_text_state // heads
    audio = audio_feats.astype(x.dtype)
    for blk in d["blocks"]:
        h = _layernorm(x, blk["ln_1"])
        x = x + _self_attention(h, blk["attn"], heads, causal=True)
        h = _layernorm(x, blk["ln_cross"])
        q = h @ blk["cross"]["q_w"].astype(x.dtype) + blk["cross"]["q_b"].astype(x.dtype)
        kv = audio @ blk["cross"]["kv_w"].astype(x.dtype) + blk["cross"]["kv_b"].astype(x.dtype)
        k, v = jnp.split(kv, 2, axis=-1)
        m = audio.shape[1]
        # Cross-attention (N_q tokens × N_kv audio ctx) through the same
        # kernel — distinct kv length supported natively.
        out = vit_attention.attention(
            q.reshape(b, n, heads, hd),
            k.reshape(b, m, heads, hd),
            v.reshape(b, m, heads, hd),
        ).reshape(b, n, cfg.n_text_state)
        x = x + (out @ blk["cross"]["out_w"].astype(x.dtype) + blk["cross"]["out_b"].astype(x.dtype))
        x = x + _mlp(_layernorm(x, blk["ln_2"]), blk["mlp"])
    x = _layernorm(x, d["ln_post"]).astype(jnp.float32)
    return x @ params["decoder"]["token_emb"].T.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_language(params, cfg: WhisperConfig, mel):
    """The standard whisper language probe (reference impl/whisper.py
    reports detected language + probability): decode ONE step from a bare
    [SOT] prompt, restrict the logits to the language-token block, softmax.

    Returns (lang_idx (B,) into LANGUAGES order, probability (B,)).
    """
    audio_feats = encode_audio(params, cfg, mel)
    b = mel.shape[0]
    tokens = jnp.full((b, 1), cfg.sot, dtype=jnp.int32)
    logits = _decoder_logits(params, cfg, tokens, audio_feats, None)[:, 0]
    base = cfg.language_base
    lang_logits = jax.lax.dynamic_slice_in_dim(logits, base, cfg.n_langs, axis=-1)
    probs = jax.nn.softmax(lang_logits, axis=-1)
    idx = jnp.argmax(probs, axis=-1)
    conf = jnp.take_along_axis(probs, idx[:, None], axis=1)[:, 0]
    return idx.astype(jnp.int32), conf


def _cross_kv(params, cfg: WhisperConfig, audio_feats):
    """Per-layer cross-attention K/V over the audio context, computed ONCE
    per decode (the full-rerun decoder recomputed them every step)."""
    d = params["decoder"]
    audio = audio_feats.astype(jnp.bfloat16)
    ks, vs = [], []
    for blk in d["blocks"]:
        kv = audio @ blk["cross"]["kv_w"].astype(audio.dtype) + blk["cross"][
            "kv_b"].astype(audio.dtype)
        k, v = jnp.split(kv, 2, axis=-1)
        ks.append(k)
        vs.append(v)
    return jnp.stack(ks), jnp.stack(vs)  # (layers, B, M, W)


def _decode_step(params, cfg: WhisperConfig, tok, pos, self_k, self_v,
                 cross_k, cross_v, max_tokens: int):
    """One incremental decoder step with static KV caches.

    tok (B,) int32 — the token AT position ``pos``; caches are
    (layers, B, max_tokens, W). Returns (logits (B, vocab), self_k,
    self_v). The full-prefix decoder re-ran O(L) positions per emitted
    token (O(L³·d) per transcript); this is the standard O(1)-position
    step — measured ~L× less decoder work at whisper lengths.
    """
    d = params["decoder"]
    b = tok.shape[0]
    heads = cfg.n_text_heads
    hd = cfg.n_text_state // heads
    pos_emb = jax.lax.dynamic_slice_in_dim(
        d["pos_emb"].astype(jnp.bfloat16), pos, 1, axis=0
    )  # (1, W)
    x = d["token_emb"][tok].astype(jnp.bfloat16)[:, None, :] + pos_emb[None]
    key_valid = (jnp.arange(max_tokens) <= pos)[None, None, None, :]
    for li, blk in enumerate(d["blocks"]):
        h = _layernorm(x, blk["ln_1"])
        qkv = h @ blk["attn"]["qkv_w"].astype(h.dtype) + blk["attn"][
            "qkv_b"].astype(h.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (B, 1, W)
        self_k = jax.lax.dynamic_update_slice(
            self_k, k[None].astype(self_k.dtype), (li, 0, pos, 0))
        self_v = jax.lax.dynamic_update_slice(
            self_v, v[None].astype(self_v.dtype), (li, 0, pos, 0))
        qh = q.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
        kh = self_k[li].reshape(b, max_tokens, heads, hd).transpose(0, 2, 3, 1)
        vh = self_v[li].reshape(b, max_tokens, heads, hd).transpose(0, 2, 1, 3)
        lt = (qh.astype(jnp.float32) @ kh.astype(jnp.float32)) * (hd ** -0.5)
        lt = jnp.where(key_valid, lt, -jnp.inf)  # causal == cache validity
        p = jax.nn.softmax(lt, axis=-1)
        out = (p @ vh.astype(jnp.float32)).transpose(0, 2, 1, 3)
        out = out.reshape(b, 1, cfg.n_text_state).astype(x.dtype)
        x = x + (out @ blk["attn"]["out_w"].astype(x.dtype)
                 + blk["attn"]["out_b"].astype(x.dtype))
        h = _layernorm(x, blk["ln_cross"])
        q = h @ blk["cross"]["q_w"].astype(h.dtype) + blk["cross"][
            "q_b"].astype(h.dtype)
        m = cross_k.shape[2]
        qh = q.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
        kh = cross_k[li].reshape(b, m, heads, hd).transpose(0, 2, 3, 1)
        vh = cross_v[li].reshape(b, m, heads, hd).transpose(0, 2, 1, 3)
        lt = (qh.astype(jnp.float32) @ kh.astype(jnp.float32)) * (hd ** -0.5)
        p = jax.nn.softmax(lt, axis=-1)
        out = (p @ vh.astype(jnp.float32)).transpose(0, 2, 1, 3)
        out = out.reshape(b, 1, cfg.n_text_state).astype(x.dtype)
        x = x + (out @ blk["cross"]["out_w"].astype(x.dtype)
                 + blk["cross"]["out_b"].astype(x.dtype))
        x = x + _mlp(_layernorm(x, blk["ln_2"]), blk["mlp"])
    x = _layernorm(x, d["ln_post"]).astype(jnp.float32)
    logits = x[:, 0] @ d["token_emb"].T.astype(jnp.float32)
    return logits, self_k, self_v


def decode_from_feats(params, cfg: WhisperConfig, audio_feats, prompt,
                      max_tokens: int):
    """Greedy decode against precomputed cross-attention memory with
    incremental KV caching.

    prompt: (B, p_len) int32, p_len STATIC (the whisper SOT prompt or a
    captioner prompt). Returns (tokens (B, max_tokens), lengths, avg
    logprob) with the same semantics as the full-rerun form (greedy,
    EOT-latched, logprob over generated tokens only).
    """
    b, p_len = prompt.shape
    if p_len >= max_tokens:
        raise ValueError(
            f"prompt length {p_len} must be < max_tokens {max_tokens}: the "
            f"KV cache is sized max_tokens and the prompt prefill would "
            f"overrun it (raise max_tokens or shorten the configured prompt)"
        )
    w = cfg.n_text_state
    cross_k, cross_v = _cross_kv(params, cfg, audio_feats)
    self_k = jnp.zeros((cfg.n_text_layers, b, max_tokens, w), jnp.bfloat16)
    self_v = jnp.zeros_like(self_k)
    tokens = jnp.zeros((b, max_tokens), dtype=jnp.int32)
    tokens = tokens.at[:, :p_len].set(prompt)

    # Prefill: run the prompt positions through the step (unrolled, p_len
    # is static and tiny); only the last position's logits matter.
    logits = None
    for i in range(p_len):
        logits, self_k, self_v = _decode_step(
            params, cfg, prompt[:, i], jnp.asarray(i), self_k, self_v,
            cross_k, cross_v, max_tokens)

    def first_token(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return nxt, jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]

    nxt, tok_logp = first_token(logits)
    tokens = tokens.at[:, p_len].set(nxt)
    done0 = nxt == cfg.eot
    state = (
        tokens, jnp.asarray(p_len), done0,
        jnp.where(done0, 0.0, tok_logp),
        jnp.where(done0, 0, 1).astype(jnp.int32),
        self_k, self_v,
    )

    def cond(state):
        _, pos, done, _, _, _, _ = state
        return (pos + 1 < max_tokens) & ~jnp.all(done)

    def step(state):
        tokens, pos, done, lp_sum, count, sk, sv = state
        tok = jnp.take_along_axis(tokens, pos[None, None].repeat(b, 0),
                                  axis=1)[:, 0]
        logits, sk, sv = _decode_step(
            params, cfg, tok, pos, sk, sv, cross_k, cross_v, max_tokens)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
        nxt = jnp.where(done, cfg.eot, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None],
                                              (0, pos + 1))
        newly = nxt == cfg.eot
        lp_sum = lp_sum + jnp.where(done | newly, 0.0, tok_logp)
        count = count + jnp.where(done | newly, 0, 1)
        return tokens, pos + 1, done | newly, lp_sum, count, sk, sv

    tokens, pos, done, lp_sum, count, _, _ = jax.lax.while_loop(
        cond, step, state)
    lengths = jnp.sum(
        jnp.cumprod((tokens != cfg.eot).astype(jnp.int32), axis=1), axis=1
    )
    avg_logprob = lp_sum / jnp.maximum(count.astype(jnp.float32), 1.0)
    return tokens, lengths, avg_logprob


@functools.partial(jax.jit, static_argnames=("cfg", "max_tokens"))
def greedy_decode(
    params, cfg: WhisperConfig, mel, *, max_tokens: int = 64, lang_tokens=None
):
    """Batched greedy transcription.

    Returns (tokens (B, max_tokens), lengths (B,), avg_logprob (B,)) — the
    avg logprob is the reference's persisted confidence signal.

    ``lang_tokens`` (B,) — per-row language token ids (from
    :func:`detect_language`); when given, the prompt is the full whisper
    layout [SOT, lang, transcribe, no_timestamps] (prompt length 4 instead
    of 3).

    Decode is incremental with static KV caches (``decode_from_feats``);
    the prior full-prefix re-run form is kept as
    ``_greedy_decode_rerun`` purely as the equivalence oracle.
    """
    audio_feats = encode_audio(params, cfg, mel)
    b = mel.shape[0]
    if lang_tokens is None:
        prompt = jnp.broadcast_to(
            jnp.array([cfg.sot, cfg.transcribe, cfg.no_timestamps],
                      dtype=jnp.int32)[None],
            (b, 3),
        )
    else:
        prompt = jnp.stack(
            [
                jnp.full((b,), cfg.sot, jnp.int32),
                jnp.asarray(lang_tokens, jnp.int32),
                jnp.full((b,), cfg.transcribe, jnp.int32),
                jnp.full((b,), cfg.no_timestamps, jnp.int32),
            ],
            axis=1,
        )
    return decode_from_feats(params, cfg, audio_feats, prompt, max_tokens)


@functools.partial(jax.jit, static_argnames=("cfg", "max_tokens"))
def _greedy_decode_rerun(
    params, cfg: WhisperConfig, mel, *, max_tokens: int = 64, lang_tokens=None
):
    """The original full-prefix decode (re-runs the decoder over the whole
    token buffer every step) — O(L) more decoder work than the cached
    form; kept as the equivalence oracle for tests."""
    audio_feats = encode_audio(params, cfg, mel)
    b = mel.shape[0]
    tokens = jnp.zeros((b, max_tokens), dtype=jnp.int32)
    if lang_tokens is None:
        prompt = jnp.array(
            [cfg.sot, cfg.transcribe, cfg.no_timestamps], dtype=jnp.int32
        )
        p_len = prompt.shape[0]
        tokens = tokens.at[:, :p_len].set(prompt[None, :])
    else:
        p_len = 4
        tokens = tokens.at[:, 0].set(cfg.sot)
        tokens = tokens.at[:, 1].set(jnp.asarray(lang_tokens, jnp.int32))
        tokens = tokens.at[:, 2].set(cfg.transcribe)
        tokens = tokens.at[:, 3].set(cfg.no_timestamps)

    def step(state):
        tokens, pos, done, logprob_sum, count = state
        logits = _decoder_logits(params, cfg, tokens, audio_feats, None)
        step_logits = logits[:, pos - 1]
        logp = jax.nn.log_softmax(step_logits, axis=-1)
        next_tok = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        tok_logp = jnp.take_along_axis(logp, next_tok[:, None], axis=1)[:, 0]
        next_tok = jnp.where(done, cfg.eot, next_tok)
        tokens = tokens.at[:, pos].set(next_tok)
        newly_done = next_tok == cfg.eot
        logprob_sum = logprob_sum + jnp.where(done | newly_done, 0.0, tok_logp)
        count = count + jnp.where(done | newly_done, 0, 1)
        return tokens, pos + 1, done | newly_done, logprob_sum, count

    def cond(state):
        _, pos, done, _, _ = state
        return (pos < max_tokens) & ~jnp.all(done)

    init = (
        tokens,
        jnp.asarray(p_len),
        jnp.zeros(b, dtype=bool),
        jnp.zeros(b, dtype=jnp.float32),
        jnp.zeros(b, dtype=jnp.int32),
    )
    tokens, pos, done, logprob_sum, count = jax.lax.while_loop(cond, step, init)
    lengths = jnp.sum(
        jnp.cumprod((tokens != cfg.eot).astype(jnp.int32), axis=1), axis=1
    )
    avg_logprob = logprob_sum / jnp.maximum(count.astype(jnp.float32), 1.0)
    return tokens, lengths, avg_logprob
