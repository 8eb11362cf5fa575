"""Checkpoint mapping tests against synthetic HF-layout state dicts
(zero-egress: shapes + forward-pass validity, not numerics of real models)."""

import numpy as np

from panoptikon_tpu.models import clip, text_embed, weights, whisper


def _lin(rng, i, o, bias=True):
    out = {"weight": rng.normal(size=(o, i)).astype(np.float32) * 0.02}
    if bias:
        out["bias"] = np.zeros(o, np.float32)
    return out


def synth_hf_clip(cfg: clip.ClipConfig) -> dict:
    rng = np.random.default_rng(0)
    sd = {}

    def put(prefix, d):
        for k, v in d.items():
            sd[f"{prefix}.{k}"] = v

    vw, tw = cfg.vision_width, cfg.text_width
    sd["vision_model.embeddings.patch_embedding.weight"] = rng.normal(
        size=(vw, 3, cfg.patch_size, cfg.patch_size)
    ).astype(np.float32) * 0.02
    sd["vision_model.embeddings.class_embedding"] = rng.normal(size=(vw,)).astype(np.float32)
    sd["vision_model.embeddings.position_embedding.weight"] = rng.normal(
        size=(cfg.grid**2 + 1, vw)
    ).astype(np.float32)
    put("vision_model.pre_layrnorm", {"weight": np.ones(vw, np.float32), "bias": np.zeros(vw, np.float32)})
    put("vision_model.post_layernorm", {"weight": np.ones(vw, np.float32), "bias": np.zeros(vw, np.float32)})
    for i in range(cfg.vision_layers):
        p = f"vision_model.encoder.layers.{i}"
        for name, (ci, co) in {
            "self_attn.q_proj": (vw, vw), "self_attn.k_proj": (vw, vw),
            "self_attn.v_proj": (vw, vw), "self_attn.out_proj": (vw, vw),
            "mlp.fc1": (vw, 4 * vw), "mlp.fc2": (4 * vw, vw),
        }.items():
            put(f"{p}.{name}", _lin(rng, ci, co))
        for lnn in ("layer_norm1", "layer_norm2"):
            put(f"{p}.{lnn}", {"weight": np.ones(vw, np.float32), "bias": np.zeros(vw, np.float32)})
    sd["visual_projection.weight"] = rng.normal(size=(cfg.embed_dim, vw)).astype(np.float32) * 0.02

    sd["text_model.embeddings.token_embedding.weight"] = rng.normal(
        size=(cfg.text_vocab, tw)
    ).astype(np.float32) * 0.02
    sd["text_model.embeddings.position_embedding.weight"] = rng.normal(
        size=(cfg.text_ctx, tw)
    ).astype(np.float32) * 0.01
    put("text_model.final_layer_norm", {"weight": np.ones(tw, np.float32), "bias": np.zeros(tw, np.float32)})
    for i in range(cfg.text_layers):
        p = f"text_model.encoder.layers.{i}"
        for name, (ci, co) in {
            "self_attn.q_proj": (tw, tw), "self_attn.k_proj": (tw, tw),
            "self_attn.v_proj": (tw, tw), "self_attn.out_proj": (tw, tw),
            "mlp.fc1": (tw, 4 * tw), "mlp.fc2": (4 * tw, tw),
        }.items():
            put(f"{p}.{name}", _lin(rng, ci, co))
        for lnn in ("layer_norm1", "layer_norm2"):
            put(f"{p}.{lnn}", {"weight": np.ones(tw, np.float32), "bias": np.zeros(tw, np.float32)})
    sd["text_projection.weight"] = rng.normal(size=(cfg.embed_dim, tw)).astype(np.float32) * 0.02
    sd["logit_scale"] = np.float32(2.6592)
    return sd


def test_clip_mapping_forward(tmp_path, monkeypatch):
    cfg = clip.CONFIGS["test-tiny"]
    sd = synth_hf_clip(cfg)
    monkeypatch.setattr(weights, "load_state_dict", lambda p: sd)
    params = weights.load_clip_checkpoint("ignored", cfg)
    images = np.random.default_rng(1).normal(
        size=(2, cfg.image_size, cfg.image_size, 3)
    ).astype(np.float32)
    feats = np.asarray(clip.embed_images_jit(params, cfg, images))
    assert feats.shape == (2, cfg.embed_dim)
    assert np.isfinite(feats).all()
    tokens = np.zeros((1, cfg.text_ctx), np.int32)
    tokens[0, 0] = 5
    tokens[0, 2] = cfg.text_vocab - 1
    tfeats = np.asarray(clip.embed_texts_jit(params, cfg, tokens))
    assert np.isfinite(tfeats).all()


def synth_hf_whisper(cfg: whisper.WhisperConfig) -> dict:
    rng = np.random.default_rng(2)
    sd = {}

    def put(prefix, d):
        for k, v in d.items():
            sd[f"model.{prefix}.{k}"] = v

    wa, wt = cfg.n_audio_state, cfg.n_text_state
    sd["model.encoder.conv1.weight"] = rng.normal(size=(wa, cfg.n_mels, 3)).astype(np.float32) * 0.02
    sd["model.encoder.conv1.bias"] = np.zeros(wa, np.float32)
    sd["model.encoder.conv2.weight"] = rng.normal(size=(wa, wa, 3)).astype(np.float32) * 0.02
    sd["model.encoder.conv2.bias"] = np.zeros(wa, np.float32)
    put("encoder.layer_norm", {"weight": np.ones(wa, np.float32), "bias": np.zeros(wa, np.float32)})
    put("decoder.layer_norm", {"weight": np.ones(wt, np.float32), "bias": np.zeros(wt, np.float32)})
    sd["model.decoder.embed_tokens.weight"] = rng.normal(size=(cfg.n_vocab, wt)).astype(np.float32) * 0.02
    sd["model.decoder.embed_positions.weight"] = rng.normal(size=(cfg.n_text_ctx, wt)).astype(np.float32) * 0.01
    for i in range(cfg.n_audio_layers):
        p = f"encoder.layers.{i}"
        for name in ("q_proj", "v_proj", "out_proj"):
            put(f"{p}.self_attn.{name}", _lin(rng, wa, wa))
        put(f"{p}.self_attn.k_proj", _lin(rng, wa, wa, bias=False))
        put(f"{p}.fc1", _lin(rng, wa, 4 * wa))
        put(f"{p}.fc2", _lin(rng, 4 * wa, wa))
        put(f"{p}.self_attn_layer_norm", {"weight": np.ones(wa, np.float32), "bias": np.zeros(wa, np.float32)})
        put(f"{p}.final_layer_norm", {"weight": np.ones(wa, np.float32), "bias": np.zeros(wa, np.float32)})
    for i in range(cfg.n_text_layers):
        p = f"decoder.layers.{i}"
        for attn in ("self_attn", "encoder_attn"):
            for name in ("q_proj", "v_proj", "out_proj"):
                put(f"{p}.{attn}.{name}", _lin(rng, wt, wt))
            put(f"{p}.{attn}.k_proj", _lin(rng, wt, wt, bias=False))
        put(f"{p}.fc1", _lin(rng, wt, 4 * wt))
        put(f"{p}.fc2", _lin(rng, 4 * wt, wt))
        for lnn in ("self_attn_layer_norm", "encoder_attn_layer_norm", "final_layer_norm"):
            put(f"{p}.{lnn}", {"weight": np.ones(wt, np.float32), "bias": np.zeros(wt, np.float32)})
    return sd


def test_whisper_mapping_decode(monkeypatch):
    cfg = whisper.CONFIGS["test-tiny"]
    sd = synth_hf_whisper(cfg)
    monkeypatch.setattr(weights, "load_state_dict", lambda p: sd)
    params = weights.load_whisper_checkpoint("ignored", cfg)
    mel = np.random.default_rng(3).normal(size=(1, cfg.n_mels, 64)).astype(np.float32)
    tokens, lengths, logprob = whisper.greedy_decode(params, cfg, mel, max_tokens=8)
    assert np.asarray(tokens).shape == (1, 8)
    assert np.isfinite(np.asarray(logprob)).all()


def test_bert_mapping_forward(monkeypatch):
    cfg = text_embed.CONFIGS["test-tiny"]
    rng = np.random.default_rng(4)
    w = cfg.width
    sd = {
        "embeddings.word_embeddings.weight": rng.normal(size=(cfg.vocab, w)).astype(np.float32) * 0.02,
        "embeddings.position_embeddings.weight": rng.normal(size=(cfg.ctx, w)).astype(np.float32) * 0.02,
        "embeddings.token_type_embeddings.weight": np.zeros((2, w), np.float32),
        "embeddings.LayerNorm.weight": np.ones(w, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(w, np.float32),
    }
    for i in range(cfg.layers):
        p = f"encoder.layer.{i}"
        for name, (ci, co) in {
            "attention.self.query": (w, w), "attention.self.key": (w, w),
            "attention.self.value": (w, w), "attention.output.dense": (w, w),
            "intermediate.dense": (w, 4 * w), "output.dense": (4 * w, w),
        }.items():
            lin = _lin(rng, ci, co)
            sd[f"{p}.{name}.weight"] = lin["weight"]
            sd[f"{p}.{name}.bias"] = lin["bias"]
        for lnn in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[f"{p}.{lnn}.weight"] = np.ones(w, np.float32)
            sd[f"{p}.{lnn}.bias"] = np.zeros(w, np.float32)
    monkeypatch.setattr(weights, "load_state_dict", lambda p: sd)
    params = weights.load_text_encoder_checkpoint("ignored", cfg)
    ids = np.random.default_rng(5).integers(0, cfg.vocab, size=(2, cfg.ctx), dtype=np.int32)
    mask = np.ones((2, cfg.ctx), np.int32)
    out = np.asarray(text_embed.encode_jit(params, cfg, ids, mask))
    assert out.shape == (2, cfg.embed_dim) and np.isfinite(out).all()


class TestTimmVit:
    def test_timm_mapping_forward_parity(self, tmp_path):
        """Export our tiny visual tree to timm layout, reload through
        load_timm_vit_checkpoint, and assert bit-exact forward features +
        head logits."""
        import dataclasses

        import jax
        import torch

        from panoptikon_tpu.models import clip, weights

        cfg = dataclasses.replace(
            clip.CONFIGS["test-tiny"], embed_dim=clip.CONFIGS["test-tiny"].vision_width
        )
        params = clip.init_params(jax.random.key(3), cfg)
        v = params["visual"]
        rng = np.random.default_rng(0)
        width = cfg.vision_width
        p = cfg.patch_size
        head_w = rng.normal(size=(width, 7)).astype(np.float32)
        head_b = rng.normal(size=(7,)).astype(np.float32)
        patch_b = rng.normal(size=(width,)).astype(np.float32)

        sd = {}

        def put_lin(prefix, w, b):
            sd[f"{prefix}.weight"] = np.asarray(w, np.float32).T
            sd[f"{prefix}.bias"] = np.asarray(b, np.float32)

        def put_ln(prefix, ln):
            sd[f"{prefix}.weight"] = np.asarray(ln["scale"], np.float32)
            sd[f"{prefix}.bias"] = np.asarray(ln["bias"], np.float32)

        patch_w = np.asarray(v["patch_w"], np.float32)
        sd["patch_embed.proj.weight"] = (
            patch_w.reshape(p, p, 3, width).transpose(3, 2, 0, 1)
        )
        sd["patch_embed.proj.bias"] = patch_b
        sd["cls_token"] = np.asarray(v["class_emb"], np.float32).reshape(1, 1, -1)
        sd["pos_embed"] = np.asarray(v["pos_emb"], np.float32)[None]
        for i, blk in enumerate(v["blocks"]):
            put_ln(f"blocks.{i}.norm1", blk["ln_1"])
            put_lin(f"blocks.{i}.attn.qkv", blk["attn"]["qkv_w"], blk["attn"]["qkv_b"])
            put_lin(f"blocks.{i}.attn.proj", blk["attn"]["out_w"], blk["attn"]["out_b"])
            put_ln(f"blocks.{i}.norm2", blk["ln_2"])
            put_lin(f"blocks.{i}.mlp.fc1", blk["mlp"]["fc_w"], blk["mlp"]["fc_b"])
            put_lin(f"blocks.{i}.mlp.fc2", blk["mlp"]["proj_w"], blk["mlp"]["proj_b"])
        put_ln("norm", v["ln_post"])
        put_lin("head", head_w, head_b)
        ckpt = tmp_path / "timm.bin"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(x)) for k, x in sd.items()}, ckpt)

        visual, got_head_w, got_head_b = weights.load_timm_vit_checkpoint(ckpt, cfg)
        np.testing.assert_array_equal(got_head_w, head_w)
        np.testing.assert_array_equal(got_head_b, head_b)
        np.testing.assert_array_equal(visual["patch_b"], patch_b)

        # Forward parity: mapped tree with identity proj == original tree
        # (plus the patch bias) end to end. Both trees normalize to jnp
        # leaves first — mixed np/jnp trees hit weak-type promotion
        # differences that shift bf16 rounding without being a mapping bug.
        import jax.numpy as jnp

        images = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
        ref_params = jax.tree.map(jnp.asarray, {
            "visual": dict(v, patch_b=patch_b, proj=np.eye(width, dtype=np.float32))
        })
        mapped = jax.tree.map(jnp.asarray, {"visual": visual})
        a = np.asarray(clip.encode_image(ref_params, cfg, images, normalize=False))
        b = np.asarray(clip.encode_image(mapped, cfg, images, normalize=False))
        np.testing.assert_allclose(a, b, atol=0, rtol=0)
