"""Per-family real-checkpoint proofs (VERDICT r4 missing #3 / ask #7).

The CLIP family already proves the full interop loop (train tiny → export
HF format → load through the production mapping → behavior asserted,
tests/test_real_pipeline.py). This file extends the SAME pattern to the
remaining checkpointed families so every load mapping is behavior-proven,
not shape-proven:

- whisper: tiny model TRAINED TO TRANSCRIBE two rendered tones, exported in
  the HF ``WhisperModel`` layout (weights.save_whisper_checkpoint), loaded
  back through WhisperImpl's production ``checkpoint=`` path with a REAL
  BPE tokenizer, transcription asserted on WAV bytes end-to-end
  (reference: /root/reference/python/inferio/impl/whisper.py);
- wd-tagger: tiny ViT+head trained to tag color images, exported in the
  timm layout (save_timm_vit_checkpoint), loaded via TaggerImpl, mcut tag
  sets asserted (reference impl/wd_tagger.py:118-160);
- CLAP/AST: tiny audio tower trained to separate tones in embedding space,
  exported in the HF ``ASTModel`` layout (audio.save_ast_checkpoint),
  loaded via ClapImpl, similarity structure asserted (reference
  impl/clap.py).
"""

import io
import wave

import numpy as np
import pytest

pytest.importorskip("torch")
tokenizers = pytest.importorskip("tokenizers")

import jax
import jax.numpy as jnp
import optax

from panoptikon_tpu.models import audio, clip, weights, whisper
from panoptikon_tpu.models.base import PredictionInput
from panoptikon_tpu.models.impls import ClapImpl, TaggerImpl, WhisperImpl
from panoptikon_tpu.utils import npy


def make_wav(freq, seconds=1.0, rate=16000):
    t = np.linspace(0, seconds, int(rate * seconds), endpoint=False)
    pcm = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def assert_trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32)
        )


class TestWhisperRealCheckpoint:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("whisper_ckpt")
        cfg = whisper.CONFIGS["test-tiny"]

        # REAL BPE over the transcript corpus (ids < 100, under specials).
        from tokenizers import Tokenizer, models, pre_tokenizers, trainers

        tok = Tokenizer(models.BPE(unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        trainer = trainers.BpeTrainer(
            vocab_size=60, special_tokens=["<unk>", "<pad>"]
        )
        tok.train_from_iterator(
            ["low tone", "high tone", "low high tone sound"] * 4, trainer
        )
        tok_path = root / "tokenizer.json"
        tok.save(str(tok_path))

        words = {200.0: "low", 3000.0: "high"}
        mels = np.stack([
            whisper.log_mel_spectrogram(
                np.sin(2 * np.pi * f * np.linspace(0, 1, 16000)) * 0.5,
                cfg.n_mels,
            )
            for f in words
        ])
        # Teacher-forced targets: [sot, lang(en), transcribe, no_ts,
        # <word ids>, eot]; loss over predictions of positions >= 3.
        prompts = []
        for f in words:
            ids = tok.encode(f"{words[f]} tone").ids
            seq = [cfg.sot, cfg.lang_base, cfg.transcribe,
                   cfg.no_timestamps, *ids, cfg.eot]
            prompts.append(seq + [cfg.eot] * (cfg.n_text_ctx - len(seq)))
        toks = np.asarray(prompts, np.int32)
        lengths = np.asarray(
            [4 + len(tok.encode(f"{w} tone").ids) + 1 for w in words.values()]
        )

        params = whisper.init_params(jax.random.key(11), cfg)
        # Positions 3..len-1 predict the next token (the transcript + eot).
        tpos = np.zeros(toks.shape, bool)
        for r, ln in enumerate(lengths):
            tpos[r, 3 : ln - 1] = True

        def loss_fn(params):
            feats = whisper.encode_audio(params, cfg, mels)
            logits = whisper._decoder_logits(
                params, cfg, jnp.asarray(toks), feats, None
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            nxt = jnp.roll(jnp.asarray(toks), -1, axis=1)
            pick = jnp.take_along_axis(logp, nxt[:, :, None], axis=2)[..., 0]
            return -(pick * tpos).sum() / tpos.sum()

        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            return optax.apply_updates(params, updates), opt, loss

        loss = None
        for _ in range(250):
            params, opt, loss = step(params, opt)
        assert float(loss) < 0.05, f"tiny whisper failed to fit ({loss})"

        ckpt = root / "tiny_whisper.safetensors"
        weights.save_whisper_checkpoint(params, ckpt)
        return {"params": params, "ckpt": ckpt, "tok": tok_path,
                "words": words}

    def test_round_trip_bit_exact(self, trained):
        cfg = whisper.CONFIGS["test-tiny"]
        loaded = weights.load_whisper_checkpoint(trained["ckpt"], cfg)
        assert_trees_equal(trained["params"], loaded)

    def test_transcribes_through_production_impl(self, trained):
        impl = WhisperImpl(
            model_arch="test-tiny",
            checkpoint=str(trained["ckpt"]),
            tokenizer_path=str(trained["tok"]),
            max_tokens=8,
        )
        impl.load()
        try:
            for freq, word in trained["words"].items():
                out = impl.predict([PredictionInput(file=make_wav(freq))])
                assert word in out[0]["text"], (freq, out[0])
                assert out[0]["confidence"] > 0.5
        finally:
            impl.unload()


class TestTaggerRealCheckpoint:
    COLORS = {
        "red": (255, 30, 30), "green": (30, 255, 30), "blue": (30, 30, 255),
    }

    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        import dataclasses

        root = tmp_path_factory.mktemp("tagger_ckpt")
        base = clip.CONFIGS["test-tiny"]
        # timm layout: identity projection, head on pooled trunk features.
        cfg = dataclasses.replace(base, embed_dim=base.vision_width)
        params = clip.init_params(jax.random.key(3), cfg)
        visual = dict(params["visual"])
        visual["proj"] = np.eye(cfg.vision_width, dtype=np.float32)
        visual["patch_b"] = np.zeros(cfg.vision_width, np.float32)

        rating_tags = ["general", "sensitive"]
        tag_vocab = list(self.COLORS)
        n_out = len(rating_tags) + len(tag_vocab)

        def image(color):
            rng = np.random.default_rng(sum(color))
            img = np.zeros((cfg.image_size, cfg.image_size, 3), np.float32)
            img[:] = np.asarray(color, np.float32) / 255.0 * 2 - 1
            return img + rng.normal(0, 0.05, img.shape).astype(np.float32)

        images = np.stack([image(c) for c in self.COLORS.values()])
        labels = np.zeros((len(self.COLORS), n_out), np.float32)
        labels[:, 0] = 1.0  # rating: "general" everywhere
        for i in range(len(self.COLORS)):
            labels[i, len(rating_tags) + i] = 1.0

        head_w = np.asarray(
            jax.random.normal(jax.random.key(4), (cfg.vision_width, n_out))
        ) * cfg.vision_width**-0.5
        head_b = np.zeros(n_out, np.float32)

        tx = optax.adam(3e-3)
        train = {"v": visual, "hw": head_w, "hb": head_b}
        opt = tx.init(train)

        def loss_fn(tr):
            feats = clip.encode_image(
                {"visual": tr["v"]}, cfg, jnp.asarray(images),
                normalize=False,
            )
            logits = feats @ tr["hw"] + tr["hb"]
            return optax.sigmoid_binary_cross_entropy(
                logits, jnp.asarray(labels)
            ).mean()

        @jax.jit
        def step(tr, opt):
            loss, grads = jax.value_and_grad(loss_fn)(tr)
            updates, opt = tx.update(grads, opt)
            tr = optax.apply_updates(tr, updates)
            # timm has no pre-LN (the loader synthesizes identity), so the
            # export is lossless only if ln_pre STAYS identity — freeze it.
            tr["v"] = dict(
                tr["v"],
                ln_pre={
                    "scale": jnp.ones(cfg.vision_width, jnp.float32),
                    "bias": jnp.zeros(cfg.vision_width, jnp.float32),
                },
                # proj likewise: the timm layout has none (loader: eye);
                # head_w already carries the full linear capacity.
                proj=jnp.eye(cfg.vision_width, dtype=jnp.float32),
            )
            return tr, opt, loss

        loss = None
        for _ in range(250):
            train, opt, loss = step(train, opt)
        assert float(loss) < 0.05, f"tiny tagger failed to fit ({loss})"

        ckpt = root / "tiny_tagger.safetensors"
        weights.save_timm_vit_checkpoint(
            train["v"], train["hw"], train["hb"], cfg, ckpt
        )
        return {
            "cfg": cfg, "ckpt": ckpt, "visual": train["v"],
            "head_w": train["hw"], "head_b": train["hb"],
            "rating_tags": rating_tags, "tag_vocab": tag_vocab,
            "images": images,
        }

    def test_round_trip_bit_exact(self, trained):
        visual, head_w, head_b = weights.load_timm_vit_checkpoint(
            trained["ckpt"], trained["cfg"]
        )
        assert_trees_equal(
            {k: v for k, v in trained["visual"].items()}, visual
        )
        np.testing.assert_array_equal(
            np.asarray(trained["head_w"], np.float32), head_w
        )
        np.testing.assert_array_equal(
            np.asarray(trained["head_b"], np.float32), head_b
        )

    def test_tags_through_production_impl(self, trained, tmp_path):
        from PIL import Image

        impl = TaggerImpl(
            model_arch="test-tiny",
            checkpoint=str(trained["ckpt"]),
            rating_tags=trained["rating_tags"],
            tag_vocab=trained["tag_vocab"],
        )
        impl.load()
        try:
            for i, name in enumerate(trained["tag_vocab"]):
                arr = ((trained["images"][i] + 1) / 2 * 255).clip(0, 255)
                buf = io.BytesIO()
                Image.fromarray(arr.astype(np.uint8)).save(buf, "PNG")
                out = impl.predict([PredictionInput(file=buf.getvalue())])
                tags = dict(out[0]["tags"])
                general = tags["general"]
                assert name in general, (name, out[0])
                assert max(general, key=general.get) == name
                assert "general" in tags["rating"]
        finally:
            impl.unload()


class TestClapRealCheckpoint:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("clap_ckpt")
        cfg = audio.CONFIGS["test-tiny"]
        params = audio.init_params(jax.random.key(6), cfg)

        def mel_of(freq):
            pcm = np.sin(
                2 * np.pi * freq * np.linspace(0, 1, 16000)
            ).astype(np.float32) * 0.5
            return audio.prepare_mels(pcm, cfg)

        mels = np.stack([mel_of(200.0), mel_of(3000.0)])
        anchors = np.zeros((2, cfg.embed_dim), np.float32)
        anchors[0, 0] = 1.0
        anchors[1, 1] = 1.0

        tx = optax.adam(3e-3)
        opt = tx.init(params)

        def loss_fn(params):
            emb = audio.encode_audio(params, cfg, jnp.asarray(mels))
            return -(emb * jnp.asarray(anchors)).sum(axis=1).mean()

        @jax.jit
        def step(params, opt):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, updates)
            # AST has no pre-LN (loader synthesizes identity) — freeze it
            # so the export stays lossless.
            params = dict(
                params,
                ln_pre={
                    "scale": jnp.ones(cfg.width, jnp.float32),
                    "bias": jnp.zeros(cfg.width, jnp.float32),
                },
            )
            return params, opt, loss

        loss = None
        for _ in range(200):
            params, opt, loss = step(params, opt)
        assert float(loss) < -0.9, f"tiny AST failed to separate ({loss})"

        ckpt = root / "tiny_ast.safetensors"
        audio.save_ast_checkpoint(params, cfg, ckpt)
        return {"params": params, "ckpt": ckpt, "cfg": cfg}

    def test_round_trip_bit_exact(self, trained):
        loaded = audio.load_ast_checkpoint(trained["ckpt"], trained["cfg"])
        assert_trees_equal(trained["params"], loaded)

    def test_embeds_through_production_impl(self, trained):
        impl = ClapImpl(
            model_arch="test-tiny", checkpoint=str(trained["ckpt"])
        )
        impl.load()
        try:
            lo = npy.parse_npy(
                impl.predict([PredictionInput(file=make_wav(200.0))])[0]
            )
            hi = npy.parse_npy(
                impl.predict([PredictionInput(file=make_wav(3000.0))])[0]
            )
            lo2 = npy.parse_npy(
                impl.predict([PredictionInput(file=make_wav(205.0))])[0]
            )
            # Trained structure survives the export→load round trip: the
            # anchors dominate, so near tones agree and far tones diverge.
            assert float(lo @ lo2) > 0.9
            assert float(lo @ hi) < 0.5
            np.testing.assert_allclose(np.linalg.norm(lo), 1.0, atol=1e-3)
        finally:
            impl.unload()
