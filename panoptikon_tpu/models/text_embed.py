"""Sentence-transformer-class text encoder in pure JAX.

Replaces the reference's Sentence Transformers worker
(``python/inferio/impl/sentence_transformers.py``): a bidirectional
transformer encoder with masked mean pooling, plus the exact chunking
contract the index layer depends on:

- texts longer than the model context are split into max-token chunks with
  a **rebalanced tail** (a final chunk shorter than ``max_tokens // 3``
  borrows tokens from its neighbor — sentence_transformers.py:155-180);
- each chunk yields its own embedding row (one text → 2D array, every row
  stored under one item_data);
- past ``combine_threshold`` chunks an extra mean-pooled "combined"
  embedding is appended (same file :129-140).

The encoder is BERT-shaped (learned positions, post-LN blocks, GELU) to be
weight-compatible with MiniLM/mpnet-class checkpoints via
``models.weights``; bf16 matmuls, f32 statistics, static (B, ctx) shapes
via the bucketing layer.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from panoptikon_tpu.ops import vit_attention

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    vocab: int = 30522
    ctx: int = 512
    width: int = 384
    layers: int = 6
    heads: int = 12
    mlp_ratio: int = 4
    embed_dim: int = 384  # == width unless a projection head exists
    type_vocab: int = 2


CONFIGS = {
    "minilm-l6": TextEncoderConfig(),
    "mpnet-base": TextEncoderConfig(width=768, layers=12, heads=12, embed_dim=768),
    "test-tiny": TextEncoderConfig(vocab=128, ctx=32, width=32, layers=2, heads=2, embed_dim=32),
}


def init_params(key, cfg: TextEncoderConfig) -> Params:
    keys = jax.random.split(key, cfg.layers + 3)
    s = cfg.width**-0.5

    def block(k):
        kk = jax.random.split(k, 4)
        return {
            "attn": {
                "qkv_w": jax.random.normal(kk[0], (cfg.width, 3 * cfg.width)) * s,
                "qkv_b": jnp.zeros(3 * cfg.width),
                "out_w": jax.random.normal(kk[1], (cfg.width, cfg.width)) * s,
                "out_b": jnp.zeros(cfg.width),
            },
            "ln_attn": {"scale": jnp.ones(cfg.width), "bias": jnp.zeros(cfg.width)},
            "mlp": {
                "fc_w": jax.random.normal(kk[2], (cfg.width, cfg.mlp_ratio * cfg.width)) * s,
                "fc_b": jnp.zeros(cfg.mlp_ratio * cfg.width),
                "proj_w": jax.random.normal(kk[3], (cfg.mlp_ratio * cfg.width, cfg.width))
                * (cfg.mlp_ratio * cfg.width) ** -0.5,
                "proj_b": jnp.zeros(cfg.width),
            },
            "ln_mlp": {"scale": jnp.ones(cfg.width), "bias": jnp.zeros(cfg.width)},
        }

    params: Params = {
        "token_emb": jax.random.normal(keys[0], (cfg.vocab, cfg.width)) * 0.02,
        "pos_emb": jax.random.normal(keys[1], (cfg.ctx, cfg.width)) * 0.02,
        "type_emb": jnp.zeros((cfg.type_vocab, cfg.width)),
        "ln_emb": {"scale": jnp.ones(cfg.width), "bias": jnp.zeros(cfg.width)},
        "blocks": [block(k) for k in keys[2 : 2 + cfg.layers]],
    }
    if cfg.embed_dim != cfg.width:
        params["proj"] = jax.random.normal(keys[-1], (cfg.width, cfg.embed_dim)) * s
    return params


def _layernorm(x, p):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-12)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def encode(
    params: Params,
    cfg: TextEncoderConfig,
    token_ids,
    attention_mask,
    normalize: bool = False,
):
    """token_ids, attention_mask: (B, ctx) int32 → (B, embed_dim) f32 via
    masked mean pooling (the sentence-transformers pooling head)."""
    b, n = token_ids.shape
    x = params["token_emb"][token_ids]
    x = x + params["pos_emb"][None, :n]
    x = x + params["type_emb"][0][None, None]
    x = _layernorm(x, params["ln_emb"]).astype(jnp.bfloat16)
    mask = attention_mask.astype(bool)
    # Additive bias mask for attention: (B, 1, 1, N).
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
    heads = cfg.heads
    head_dim = cfg.width // heads
    for blk in params["blocks"]:
        h = x
        qkv = h @ blk["attn"]["qkv_w"].astype(h.dtype) + blk["attn"]["qkv_b"].astype(h.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, heads, head_dim)
        k = k.reshape(b, n, heads, head_dim)
        v = v.reshape(b, n, heads, head_dim)
        if jax.default_backend() == "tpu":
            # VMEM-resident kernel with the key-padding mask folded in as
            # a −1e9 bias (bit-parity with the additive-bias path below);
            # XLA materializes the (B, H, N, N) softmax surface otherwise
            # (ops/vit_attention.py — measured on the CLIP towers).
            attn = vit_attention.mha(q, k, v, key_mask=mask)
        else:
            attn = jax.nn.dot_product_attention(q, k, v, bias=bias)
        attn = attn.reshape(b, n, cfg.width)
        attn = attn @ blk["attn"]["out_w"].astype(h.dtype) + blk["attn"]["out_b"].astype(h.dtype)
        x = _layernorm(x + attn, blk["ln_attn"]).astype(jnp.bfloat16)
        h = x @ blk["mlp"]["fc_w"].astype(x.dtype) + blk["mlp"]["fc_b"].astype(x.dtype)
        h = jax.nn.gelu(h, approximate=True)
        h = h @ blk["mlp"]["proj_w"].astype(x.dtype) + blk["mlp"]["proj_b"].astype(x.dtype)
        x = _layernorm(x + h, blk["ln_mlp"]).astype(jnp.bfloat16)
    x = x.astype(jnp.float32)
    m = mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    if "proj" in params:
        pooled = pooled @ params["proj"]
    if normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-8
        )
    return pooled


@functools.partial(jax.jit, static_argnames=("cfg", "normalize"))
def encode_jit(params, cfg: TextEncoderConfig, token_ids, attention_mask, normalize=False):
    return encode(params, cfg, token_ids, attention_mask, normalize)


# ---------------------------------------------------------------------------
# Chunking contract (host side)
# ---------------------------------------------------------------------------


def split_tokens(tokens: Sequence[int], max_tokens: int) -> list[list[int]]:
    """Max-token chunks with a rebalanced tail: a final chunk shorter than
    ``max_tokens // 3`` borrows its missing tokens from the previous chunk
    (sentence_transformers.py:155-180)."""
    tokens = list(tokens)
    chunks = [tokens[i : i + max_tokens] for i in range(0, len(tokens), max_tokens)]
    if not chunks:
        return [[]]
    min_chunk = max_tokens // 3
    if len(chunks) > 1 and len(chunks[-1]) < min_chunk:
        needed = min_chunk - len(chunks[-1])
        chunks[-1] = chunks[-2][-needed:] + chunks[-1]
        chunks[-2] = chunks[-2][:-needed]
    return chunks


def combine_chunks(chunk_embeddings: np.ndarray, combine_threshold: int) -> np.ndarray:
    """Append the mean "combined" embedding once the chunk count reaches the
    threshold (−1 disables). chunk_embeddings: (n_chunks, D) → (n, D) or
    (n+1, D)."""
    arr = np.asarray(chunk_embeddings)
    if combine_threshold != -1 and arr.shape[0] >= combine_threshold:
        arr = np.concatenate([arr, arr.mean(axis=0, keepdims=True)], axis=0)
    return arr
