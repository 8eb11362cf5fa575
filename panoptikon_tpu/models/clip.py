"""CLIP in pure JAX — the flagship encoder pair of the framework.

Replaces the reference's OpenCLIP Python worker (``python/inferio/impl/
clip.py``: load → encode image/text → L2-normalize → npy bytes) with an
in-process, jit-compiled, bf16 tower pair designed for the MXU:

- patch embedding as reshape + one matmul (identical math to the stride-p
  conv, but explicitly MXU-shaped);
- all matmuls in bf16 with f32 layernorms/softmax accumulators — the same
  precision recipe the reference measured as retrieval-safe on GPU
  (docs/clip-fp16-precision-evaluation.md: relevance retained 0.9993);
- static shapes everywhere: images are (B, H, W, 3) with fixed B buckets,
  text is (B, ctx) padded to the full context length;
- the contrastive train step (finetuning — absent from the reference, which
  is inference-only) shards batch over ``data`` and the wide MLP/attention
  projections over ``model`` via sharding annotations, letting GSPMD insert
  the collectives.

Weights load from HuggingFace/OpenCLIP checkpoints via
``models.weights`` when available; tests run on randomly initialized small
configs.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from panoptikon_tpu.ops import ln_quant, vit_attention

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_vocab: int = 49408
    text_ctx: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    embed_dim: int = 512
    mlp_ratio: int = 4
    # "bf16" runs every matmul in bf16 (the MXU default). "int8" runs the
    # block linears (qkv/out/fc/proj) with dynamic per-token activation
    # scales × per-output-channel weight scales on the int8 MXU path —
    # the v5e doubles int8 MACs over bf16, and the embed-throughput target
    # (≥1,000 ViT-L/14 img/s, BASELINE.md) exceeds this chip's measured
    # bf16 roofline, so int8 is the only route there. Attention and
    # layernorms stay bf16/f32.
    matmul_precision: str = "bf16"

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


# Reference OpenCLIP architectures the registry names (inference.toml clip
# groups). ViT-L/14 is the BASELINE.json throughput model.
CONFIGS = {
    "ViT-B-32": ClipConfig(),
    "ViT-B-16": ClipConfig(patch_size=16),
    "ViT-L-14": ClipConfig(
        patch_size=14,
        vision_width=1024,
        vision_layers=24,
        vision_heads=16,
        text_width=768,
        text_layers=12,
        text_heads=12,
        embed_dim=768,
    ),
    "ViT-H-14": ClipConfig(
        patch_size=14,
        vision_width=1280,
        vision_layers=32,
        vision_heads=16,
        text_width=1024,
        text_layers=24,
        text_heads=16,
        embed_dim=1024,
    ),
    # The reference's benchmark model (clip-fp16-precision-evaluation.md:
    # ViT-H-14-378 at 114 img/s fp16): 378px input → 27×27+1 = 730 tokens.
    "ViT-H-14-378": ClipConfig(
        image_size=378,
        patch_size=14,
        vision_width=1280,
        vision_layers=32,
        vision_heads=16,
        text_width=1024,
        text_layers=24,
        text_heads=16,
        embed_dim=1024,
    ),
    # Tiny config for tests / dry-runs.
    "test-tiny": ClipConfig(
        image_size=32,
        patch_size=16,
        vision_width=64,
        vision_layers=2,
        vision_heads=2,
        text_vocab=512,
        text_ctx=16,
        text_width=64,
        text_layers=2,
        text_heads=2,
        embed_dim=32,
    ),
}


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_block(key, width: int, mlp: int) -> Params:
    k = jax.random.split(key, 4)
    s_attn = width**-0.5
    s_mlp = (2 * width) ** -0.5
    return {
        "ln_1": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "attn": {
            "qkv_w": jax.random.normal(k[0], (width, 3 * width)) * s_attn,
            "qkv_b": jnp.zeros(3 * width),
            "out_w": jax.random.normal(k[1], (width, width)) * s_attn,
            "out_b": jnp.zeros(width),
        },
        "ln_2": {"scale": jnp.ones(width), "bias": jnp.zeros(width)},
        "mlp": {
            "fc_w": jax.random.normal(k[2], (width, mlp)) * s_attn,
            "fc_b": jnp.zeros(mlp),
            "proj_w": jax.random.normal(k[3], (mlp, width)) * s_mlp,
            "proj_b": jnp.zeros(width),
        },
    }


def init_params(key, cfg: ClipConfig) -> Params:
    kv, kt, kp, ke, kpos, ktpos, kproj, ktproj = jax.random.split(key, 8)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    n_patches = cfg.grid * cfg.grid
    vision_blocks = [
        _init_block(k, cfg.vision_width, cfg.mlp_ratio * cfg.vision_width)
        for k in jax.random.split(kv, cfg.vision_layers)
    ]
    text_blocks = [
        _init_block(k, cfg.text_width, cfg.mlp_ratio * cfg.text_width)
        for k in jax.random.split(kt, cfg.text_layers)
    ]
    return {
        "visual": {
            "patch_w": jax.random.normal(kp, (patch_dim, cfg.vision_width))
            * patch_dim**-0.5,
            "class_emb": jax.random.normal(ke, (cfg.vision_width,)) * 0.02,
            "pos_emb": jax.random.normal(kpos, (n_patches + 1, cfg.vision_width))
            * 0.02,
            "ln_pre": {"scale": jnp.ones(cfg.vision_width), "bias": jnp.zeros(cfg.vision_width)},
            "blocks": vision_blocks,
            "ln_post": {"scale": jnp.ones(cfg.vision_width), "bias": jnp.zeros(cfg.vision_width)},
            "proj": jax.random.normal(kproj, (cfg.vision_width, cfg.embed_dim))
            * cfg.vision_width**-0.5,
        },
        "text": {
            "token_emb": jax.random.normal(ktproj, (cfg.text_vocab, cfg.text_width))
            * 0.02,
            "pos_emb": jax.random.normal(ktpos, (cfg.text_ctx, cfg.text_width)) * 0.01,
            "blocks": text_blocks,
            "ln_final": {"scale": jnp.ones(cfg.text_width), "bias": jnp.zeros(cfg.text_width)},
            "proj": jax.random.normal(kt, (cfg.text_width, cfg.embed_dim))
            * cfg.text_width**-0.5,
        },
        "logit_scale": jnp.asarray(math.log(1 / 0.07), dtype=jnp.float32),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layernorm(x, p):
    # f32 statistics regardless of activation dtype (bf16-safe).
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(x, w, b, precision: str, act_scale=None, collector=None):
    """Block linear: bf16 MXU matmul, or an int8 path.

    int8 variants (both: per-output-channel weight scale, int8×int8→int32
    on the MXU — 2× the bf16 MAC rate on v5e, dequant fused):

    - dynamic (``act_scale=None``): per-token activation absmax/127. Safe
      without calibration but the per-row reduction serializes a VPU pass
      before each GEMM — measured only ~5% faster than bf16 end to end.
    - static (``act_scale`` a calibrated per-tensor scalar): the quant is
      one fused clip-round-cast, measured +42% over bf16 at ViT-L shapes
      (tools/shape_probe.py). Scales come from a calibration pass
      (``collector`` records per-linear input absmax).

    Fidelity gates: the bf16-vs-int8 cosine test and the bench's recall
    check.
    """
    if collector is not None:
        collector.append(jnp.max(jnp.abs(x.astype(jnp.float32))))
    prequant = isinstance(w, dict)  # {"q": int8, "s": per-channel scales}
    if precision != "int8":
        if prequant:
            # Calibration/bf16 passes over a weight-quantized tree run on
            # the dequantized weights — the values the int8 forward sees.
            wm = (w["q"].astype(jnp.float32) * w["s"]).astype(x.dtype)
        else:
            wm = w.astype(x.dtype)
        y = x @ wm
        if b is not None:
            y = y + b.astype(x.dtype)
        return y
    x32 = x.astype(jnp.float32)
    if act_scale is not None:
        sx = jnp.maximum(act_scale.astype(jnp.float32) / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    else:
        sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        xq = jnp.round(x32 / sx).astype(jnp.int8)
    if prequant:
        wq, sw = w["q"], w["s"]
    else:
        w32 = w.astype(jnp.float32)
        sw = jnp.max(jnp.abs(w32), axis=0, keepdims=True) / 127.0
        sw = jnp.maximum(sw, 1e-12)
        wq = jnp.round(w32 / sw).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * sw
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_block_weights(params: Params) -> Params:
    """Pre-quantize every block linear (qkv/out/fc/proj) to int8 + f32
    per-output-channel scales, matching the in-kernel quantization
    bit-for-bit — so the int8 forward stops re-reading and re-rounding
    ~300M weight elements per batch (pure redundant bandwidth on the hot
    embed path)."""
    import copy

    def q(w):
        w32 = np.asarray(w, np.float32)
        sw = np.maximum(np.abs(w32).max(axis=0, keepdims=True) / 127.0, 1e-12)
        return {
            "q": jnp.asarray(np.round(w32 / sw).astype(np.int8)),
            "s": jnp.asarray(sw.astype(np.float32)),
        }

    out = copy.copy(params)
    for tower in ("visual", "text"):
        if tower not in params:
            continue
        tw = dict(params[tower])
        blocks = []
        for blk in tw["blocks"]:
            nb = {
                "ln_1": blk["ln_1"],
                "ln_2": blk["ln_2"],
                "attn": dict(blk["attn"], qkv_w=q(blk["attn"]["qkv_w"]),
                             out_w=q(blk["attn"]["out_w"])),
                "mlp": dict(blk["mlp"], fc_w=q(blk["mlp"]["fc_w"]),
                            proj_w=q(blk["mlp"]["proj_w"])),
            }
            blocks.append(nb)
        tw["blocks"] = blocks
        out[tower] = tw
    return out


def _attention(x, p, heads: int, causal: bool, precision: str = "bf16",
               scales=None, collector=None):
    b, n, w = x.shape
    qkv = _linear(x, p["qkv_w"], p["qkv_b"], precision,
                  scales[0] if scales is not None else None, collector)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    head_dim = w // heads
    q = q.reshape(b, n, heads, head_dim)
    k = k.reshape(b, n, heads, head_dim)
    v = v.reshape(b, n, heads, head_dim)
    # VMEM-resident Pallas attention on TPU (the XLA path materializes the
    # (B, H, N, N) softmax surface in HBM — measured ~196 ms of a 397 ms
    # ViT-L/14 embed batch; the kernel removes it). XLA fused path off-TPU.
    out = vit_attention.attention(q, k, v, causal=causal)
    out = out.reshape(b, n, w)
    return _linear(out, p["out_w"], p["out_b"], precision,
                   scales[1] if scales is not None else None, collector)


def _linear_prequant(xq, act_scale, w, b):
    """int8 GEMM with an already-quantized activation (the fused
    LN→quantize path): y = (xq·wq)·sx·sw + b, bf16 out. ``w`` must be a
    pre-quantized {"q", "s"} dict (quantize_block_weights)."""
    y = jax.lax.dot_general(
        xq, w["q"],
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sx = jnp.maximum(jnp.asarray(act_scale, jnp.float32) / 127.0, 1e-12)
    y = y.astype(jnp.float32) * sx * w["s"]
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def _block_int8_static(x, p, heads: int, causal: bool, scales):
    """The serving embed path: fused LN→quantize (one pass emitting int8,
    ops/ln_quant.py) feeding prequantized int8 GEMMs, Pallas attention.
    Same math as the generic path modulo quantizing from f32 LN output
    instead of its bf16 round-trip (strictly less rounding)."""
    aq = ln_quant.ln_quant(x, p["ln_1"], scales[0])
    qkv = _linear_prequant(aq, scales[0], p["attn"]["qkv_w"], p["attn"]["qkv_b"])
    b, n, w = x.shape
    head_dim = w // heads
    if (jax.default_backend() == "tpu"
            and vit_attention.qkv_fused_fits(heads, head_dim, n)):
        # One pallas input for the unsplit qkv (no split copies) and int8
        # out in-register (the out-projection's input quant).
        att_q = vit_attention.mha_qkv(qkv, heads=heads, causal=causal,
                                      out_scale=scales[1])
        att = _linear_prequant(att_q, scales[1], p["attn"]["out_w"],
                               p["attn"]["out_b"])
    else:
        # Split path: off-TPU (XLA attention), or shapes whose unsplit
        # qkv block exceeds VMEM (ViT-H-378) — the split kernel q-blocks.
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = vit_attention.attention(
            q.reshape(b, n, heads, head_dim),
            k.reshape(b, n, heads, head_dim),
            v.reshape(b, n, heads, head_dim), causal=causal)
        att = _linear(out.reshape(b, n, w), p["attn"]["out_w"],
                      p["attn"]["out_b"], "int8", scales[1])
    x = x + att
    hq = ln_quant.ln_quant(x, p["ln_2"], scales[2])
    h = _linear_prequant(hq, scales[2], p["mlp"]["fc_w"], p["mlp"]["fc_b"])
    h = jax.nn.gelu(h, approximate=True)
    h = _linear(h, p["mlp"]["proj_w"], p["mlp"]["proj_b"], "int8", scales[3])
    return x + h


def _block(x, p, heads: int, causal: bool, precision: str = "bf16",
           scales=None, collector=None):
    if (precision == "int8" and scales is not None and collector is None
            and isinstance(p["attn"]["qkv_w"], dict)):
        return _block_int8_static(x, p, heads, causal, scales)
    x = x + _attention(_layernorm(x, p["ln_1"]), p["attn"], heads, causal,
                       precision, scales, collector)
    h = _layernorm(x, p["ln_2"])
    h = _linear(h, p["mlp"]["fc_w"], p["mlp"]["fc_b"], precision,
                scales[2] if scales is not None else None, collector)
    h = jax.nn.gelu(h, approximate=True)
    h = _linear(h, p["mlp"]["proj_w"], p["mlp"]["proj_b"], precision,
                scales[3] if scales is not None else None, collector)
    return x + h


def encode_image(params: Params, cfg: ClipConfig, images, normalize: bool = True,
                 act_scales=None, _collector=None):
    """images: (B, H, W, 3) f32/bf16 (already mean/std normalized) →
    (B, embed_dim) f32 features.

    ``act_scales`` — optional (L, 4) calibrated per-tensor activation
    absmax array enabling the static-scale int8 path (see
    :func:`calibrate_image_scales`)."""
    v = params["visual"]
    b = images.shape[0]
    p = cfg.patch_size
    g = cfg.grid
    x = images.astype(jnp.bfloat16)
    # (B, g, p, g, p, 3) → (B, g·g, p·p·3): the stride-p conv as one matmul.
    x = x.reshape(b, g, p, g, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
    x = x @ v["patch_w"].astype(x.dtype)
    if "patch_b" in v:
        x = x + v["patch_b"].astype(x.dtype)  # timm ViTs carry a patch bias
    cls = jnp.broadcast_to(v["class_emb"].astype(x.dtype), (b, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos_emb"].astype(x.dtype)[None]
    x = _layernorm(x, v["ln_pre"])
    for i, blk in enumerate(v["blocks"]):
        x = _block(x, blk, cfg.vision_heads, causal=False,
                   precision=cfg.matmul_precision,
                   scales=act_scales[i] if act_scales is not None else None,
                   collector=_collector)
    x = _layernorm(x[:, 0], v["ln_post"])
    feats = (x @ v["proj"].astype(x.dtype)).astype(jnp.float32)
    if normalize:
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8
        )
    return feats


@functools.partial(jax.jit, static_argnames=("cfg",))
def calibrate_image_scales(params, cfg: ClipConfig, images):
    """One bf16 calibration pass → (vision_layers, 4) per-tensor activation
    absmax (qkv/out/fc/proj inputs per block). Feeding the result back as
    ``act_scales`` turns the int8 path's per-token dynamic quant into one
    fused clip-round-cast (+42% measured over bf16 at ViT-L shapes;
    tools/shape_probe.py). Standard PTQ calibration — scale quality follows
    the calibration batch's coverage."""
    collector: list = []
    bf16_cfg = dataclasses.replace(cfg, matmul_precision="bf16")
    encode_image(params, bf16_cfg, images, _collector=collector)
    return jnp.stack(collector).reshape(cfg.vision_layers, 4)


def encode_image_tokens(params: Params, cfg: ClipConfig, images):
    """Full patch-token features (B, 1+N, vision_width) — the conditioning
    sequence for captioner/VLM decoders (cross-attention memory)."""
    v = params["visual"]
    b = images.shape[0]
    p = cfg.patch_size
    g = cfg.grid
    x = images.astype(jnp.bfloat16)
    x = x.reshape(b, g, p, g, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * g, p * p * 3)
    x = x @ v["patch_w"].astype(x.dtype)
    if "patch_b" in v:
        x = x + v["patch_b"].astype(x.dtype)  # timm ViTs carry a patch bias
    cls = jnp.broadcast_to(v["class_emb"].astype(x.dtype), (b, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos_emb"].astype(x.dtype)[None]
    x = _layernorm(x, v["ln_pre"])
    for blk in v["blocks"]:
        x = _block(x, blk, cfg.vision_heads, causal=False,
                   precision=cfg.matmul_precision)
    return x.astype(jnp.float32)


def encode_text(params: Params, cfg: ClipConfig, token_ids, normalize: bool = True,
                act_scales=None, _collector=None):
    """token_ids: (B, ctx) int32, EOT at argmax position (CLIP convention) →
    (B, embed_dim) f32 features.

    ``act_scales`` — optional (text_layers, 4) calibrated per-tensor
    activation absmax enabling the static-int8 block path (mirrors
    :func:`encode_image`; the tclip cross-modal extraction embeds bulk
    text through this tower)."""
    t = params["text"]
    x = t["token_emb"][token_ids].astype(jnp.bfloat16)
    x = x + t["pos_emb"].astype(x.dtype)[None]
    for i, blk in enumerate(t["blocks"]):
        x = _block(x, blk, cfg.text_heads, causal=True,
                   precision=cfg.matmul_precision,
                   scales=act_scales[i] if act_scales is not None else None,
                   collector=_collector)
    x = _layernorm(x, t["ln_final"])
    eot = jnp.argmax(token_ids, axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    feats = (x @ t["proj"].astype(x.dtype)).astype(jnp.float32)
    if normalize:
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-8
        )
    return feats


# ---------------------------------------------------------------------------
# Contrastive training step (finetuning support; beyond-reference)
# ---------------------------------------------------------------------------


def clip_loss(params: Params, cfg: ClipConfig, images, token_ids):
    img = encode_image(params, cfg, images)
    txt = encode_text(params, cfg, token_ids)
    scale = jnp.exp(jnp.clip(params["logit_scale"], max=math.log(100.0)))
    logits = scale * img @ txt.T
    labels = jnp.arange(logits.shape[0])
    li = jnp.mean(
        -jax.nn.log_softmax(logits, axis=-1)[jnp.arange(len(labels)), labels]
    )
    lt = jnp.mean(
        -jax.nn.log_softmax(logits.T, axis=-1)[jnp.arange(len(labels)), labels]
    )
    return 0.5 * (li + lt)


@functools.partial(jax.jit, static_argnames=("cfg",))
def embed_images_jit(params, cfg: ClipConfig, images):
    return encode_image(params, cfg, images)


@functools.partial(jax.jit, static_argnames=("cfg",))
def embed_images_scaled_jit(params, cfg: ClipConfig, images, act_scales):
    """Static-scale int8 image embed (calibrated act_scales)."""
    return encode_image(params, cfg, images, act_scales=act_scales)


@functools.partial(jax.jit, static_argnames=("cfg",))
def embed_images_raw_jit(params, cfg: ClipConfig, images):
    """Unnormalized pooled features — classifier heads (taggers) apply on
    the raw trunk output, not the L2-normalized retrieval embedding."""
    return encode_image(params, cfg, images, normalize=False)


@functools.partial(jax.jit, static_argnames=("cfg",))
def embed_images_raw_scaled_jit(params, cfg: ClipConfig, images, act_scales):
    """Raw pooled features on the static-int8 path (tagger trunks with
    ``precision = "int8"`` — same fused block as the retrieval embed)."""
    return encode_image(params, cfg, images, normalize=False,
                        act_scales=act_scales)


@functools.partial(jax.jit, static_argnames=("cfg",))
def embed_texts_jit(params, cfg: ClipConfig, token_ids):
    return encode_text(params, cfg, token_ids)


@functools.partial(jax.jit, static_argnames=("cfg",))
def calibrate_text_scales(params, cfg: ClipConfig, token_ids):
    """One bf16 pass → (text_layers, 4) per-tensor activation absmax for
    the static-int8 text path (same PTQ recipe as the image tower)."""
    collector: list = []
    bf16_cfg = dataclasses.replace(cfg, matmul_precision="bf16")
    encode_text(params, bf16_cfg, token_ids, _collector=collector)
    return jnp.stack(collector).reshape(cfg.text_layers, 4)


@functools.partial(jax.jit, static_argnames=("cfg",))
def embed_texts_scaled_jit(params, cfg: ClipConfig, token_ids, act_scales):
    """Static-scale int8 text embed (calibrated act_scales)."""
    return encode_text(params, cfg, token_ids, act_scales=act_scales)


def param_shard_rules(cfg: ClipConfig):
    """PartitionSpec per parameter class for the ``model`` axis (tensor
    parallelism): split the 3·W qkv and MLP fc on their wide output axis,
    the out/proj matmuls on their input axis; everything small replicated.
    Returns a callable path→PartitionSpec for use with tree_map_with_path.
    """
    from jax.sharding import PartitionSpec as P

    def rule(path: str):
        if path.endswith("qkv_w") or path.endswith("fc_w"):
            return P(None, "model")
        if path.endswith("qkv_b") or path.endswith("fc_b"):
            return P("model")
        if path.endswith("out_w") or path.endswith("proj_w"):
            return P("model", None)
        if path.endswith("token_emb"):
            return P(None, None)
        return P()

    return rule
