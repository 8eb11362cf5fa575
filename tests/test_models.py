"""Model layer tests: CLIP towers, text encoder, chunking, batching."""

import jax
import numpy as np
import pytest

from panoptikon_tpu.models import batching, clip, text_embed


@pytest.fixture(scope="module")
def clip_tiny():
    cfg = clip.CONFIGS["test-tiny"]
    params = clip.init_params(jax.random.key(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def text_tiny():
    cfg = text_embed.CONFIGS["test-tiny"]
    params = text_embed.init_params(jax.random.key(1), cfg)
    return cfg, params


class TestClip:
    def test_image_tower_shapes_and_norm(self, clip_tiny):
        cfg, params = clip_tiny
        images = np.random.default_rng(0).normal(
            size=(4, cfg.image_size, cfg.image_size, 3)
        ).astype(np.float32)
        feats = np.asarray(clip.embed_images_jit(params, cfg, images))
        assert feats.shape == (4, cfg.embed_dim)
        assert feats.dtype == np.float32
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-3)

    def test_text_tower(self, clip_tiny):
        cfg, params = clip_tiny
        tokens = np.zeros((2, cfg.text_ctx), dtype=np.int32)
        tokens[:, 0] = 5
        tokens[0, 1] = 300  # EOT at argmax position
        tokens[1, 3] = 300
        feats = np.asarray(clip.embed_texts_jit(params, cfg, tokens))
        assert feats.shape == (2, cfg.embed_dim)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, atol=1e-3)

    def test_deterministic(self, clip_tiny):
        cfg, params = clip_tiny
        images = np.ones((2, cfg.image_size, cfg.image_size, 3), np.float32)
        a = np.asarray(clip.embed_images_jit(params, cfg, images))
        b = np.asarray(clip.embed_images_jit(params, cfg, images))
        np.testing.assert_array_equal(a, b)

    def test_loss_finite_and_differentiable(self, clip_tiny):
        cfg, params = clip_tiny
        images = np.random.default_rng(1).normal(
            size=(4, cfg.image_size, cfg.image_size, 3)
        ).astype(np.float32)
        tokens = np.random.default_rng(2).integers(
            1, cfg.text_vocab, size=(4, cfg.text_ctx), dtype=np.int32
        )
        loss, grads = jax.value_and_grad(clip.clip_loss)(params, cfg, images, tokens)
        assert np.isfinite(float(loss))
        leaf = grads["visual"]["patch_w"]
        assert np.isfinite(np.asarray(leaf)).all()


class TestTextEncoder:
    def test_masked_mean_pooling_ignores_padding(self, text_tiny):
        cfg, params = text_tiny
        ids = np.zeros((2, cfg.ctx), dtype=np.int32)
        mask = np.zeros((2, cfg.ctx), dtype=np.int32)
        ids[0, :4] = [5, 6, 7, 8]
        mask[0, :4] = 1
        # Same tokens but different garbage in the padded region.
        ids[1, :4] = [5, 6, 7, 8]
        ids[1, 10:] = 99
        mask[1, :4] = 1
        out = np.asarray(text_embed.encode_jit(params, cfg, ids, mask))
        np.testing.assert_allclose(out[0], out[1], atol=1e-4)

    def test_normalize_flag(self, text_tiny):
        cfg, params = text_tiny
        ids = np.random.default_rng(0).integers(1, cfg.vocab, (3, cfg.ctx), dtype=np.int32)
        mask = np.ones((3, cfg.ctx), dtype=np.int32)
        out = np.asarray(text_embed.encode_jit(params, cfg, ids, mask, normalize=True))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-3)


class TestChunking:
    def test_short_text_single_chunk(self):
        assert text_embed.split_tokens(list(range(10)), 128) == [list(range(10))]

    def test_exact_multiple(self):
        chunks = text_embed.split_tokens(list(range(256)), 128)
        assert [len(c) for c in chunks] == [128, 128]

    def test_rebalanced_tail(self):
        # 128 + 10 → tail below 128//3=42 borrows 32 tokens.
        chunks = text_embed.split_tokens(list(range(138)), 128)
        assert [len(c) for c in chunks] == [96, 42]
        # Token order preserved end-to-end.
        assert [t for c in chunks for t in c] == list(range(138))

    def test_tail_at_threshold_not_rebalanced(self):
        chunks = text_embed.split_tokens(list(range(128 + 42)), 128)
        assert [len(c) for c in chunks] == [128, 42]

    def test_combine_threshold(self):
        embs = np.arange(12, dtype=np.float32).reshape(4, 3)
        out = text_embed.combine_chunks(embs, combine_threshold=4)
        assert out.shape == (5, 3)
        np.testing.assert_allclose(out[-1], embs.mean(axis=0))
        assert text_embed.combine_chunks(embs, 5).shape == (4, 3)
        assert text_embed.combine_chunks(embs, -1).shape == (4, 3)


class TestBatching:
    def test_ladder(self):
        assert batching.bucket_ladder(64) == [1, 2, 4, 8, 16, 32, 64]
        assert batching.bucket_for(5, [1, 2, 4, 8]) == 8
        assert batching.bucket_for(100, [1, 2, 4, 8]) == 8

    def test_pad_batch(self):
        batch = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
        padded, valid = batching.pad_batch(batch, 8)
        assert padded.shape == (8, 3)
        assert valid.sum() == 5
        np.testing.assert_array_equal(padded[:5], batch)

    def test_pad_token_batch(self):
        ids, mask, valid = batching.pad_token_batch(
            [[1, 2, 3], [4, 5]], length_ladder=[8, 16], batch_ladder=[1, 2, 4]
        )
        assert ids.shape == (2, 8) and mask.shape == (2, 8)
        assert mask[0].sum() == 3 and mask[1].sum() == 2
        assert valid.tolist() == [True, True]

    def test_oversize_sequence_truncates(self):
        ids, mask, _ = batching.pad_token_batch(
            [list(range(100))], length_ladder=[8], batch_ladder=[1]
        )
        assert ids.shape == (1, 8) and mask[0].sum() == 8


class TestTaskRouting:
    def test_query_prompt_name_map_prefixes(self):
        from panoptikon_tpu.models.base import PredictionInput
        from panoptikon_tpu.models.impls import TextEmbedImpl
        from panoptikon_tpu.utils import npy as _npy

        impl = TextEmbedImpl(
            model_arch="test-tiny",
            query_prompt_name_map={"s2s": "query: "},
        )
        a = impl.predict([PredictionInput(data={"text": "hello", "task": "s2s"})])
        b = impl.predict([PredictionInput(data={"text": "query: hello"})])
        c = impl.predict([PredictionInput(data={"text": "hello"})])
        va = _npy.parse_npy_matrix(a[0])
        vb = _npy.parse_npy_matrix(b[0])
        vc = _npy.parse_npy_matrix(c[0])
        import numpy as np

        np.testing.assert_array_equal(va, vb)  # routed == prefixed
        assert not np.allclose(va, vc)  # and differs from unrouted
        impl.unload()


class TestTaggerCategories:
    def test_character_category_uses_fixed_threshold(self):
        from panoptikon_tpu.models.base import PredictionInput
        from panoptikon_tpu.models.impls import TaggerImpl

        impl = TaggerImpl(
            model_arch="test-tiny",
            tag_vocab=[f"g{i}" for i in range(8)],
            character_tags=["alice", "bob"],
            character_threshold=0.0,  # everything passes → both emitted
        )
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (32, 32), (120, 10, 10)).save(buf, format="PNG")
        out = impl.predict([PredictionInput(file=buf.getvalue())])
        cats = dict(out[0]["tags"])
        assert set(cats["character"]) == {"alice", "bob"}
        assert all(0.0 <= v <= 1.0 for v in cats["character"].values())
        # High threshold empties the category.
        out2 = impl.predict([
            PredictionInput(file=buf.getvalue(),
                            data={"character_threshold": 1.1})
        ])
        assert dict(out2[0]["tags"])["character"] == {}
        impl.unload()


class TestTaggerInt8:
    def test_int8_trunk_matches_bf16_probs(self):
        # precision="int8" runs the tagger trunk on the fused static-int8
        # block; sigmoid probabilities must track the bf16 trunk closely
        # enough that tag sets at reasonable thresholds are stable.
        import io

        import numpy as np
        from PIL import Image

        from panoptikon_tpu.models.base import PredictionInput
        from panoptikon_tpu.models.impls import TaggerImpl

        vocab = [f"g{i}" for i in range(8)]
        buf = io.BytesIO()
        Image.new("RGB", (32, 32), (40, 90, 200)).save(buf, format="PNG")
        png = buf.getvalue()

        a = TaggerImpl(model_arch="test-tiny", tag_vocab=vocab)
        b = TaggerImpl(model_arch="test-tiny", tag_vocab=vocab,
                       precision="int8")
        out_a = a.predict([PredictionInput(file=png,
                                           data={"threshold": 0.01})])
        out_b = b.predict([PredictionInput(file=png,
                                           data={"threshold": 0.01}),
                           PredictionInput(file=png,
                                           data={"threshold": 0.01})])
        ga = dict(out_a[0]["tags"])["general"]
        gb = dict(out_b[0]["tags"])["general"]
        # Same trunk init (both seeded key(2)) → same tags, close probs.
        assert set(ga) == set(gb)
        for tag, pa in ga.items():
            assert abs(pa - gb[tag]) < 0.05, (tag, pa, gb[tag])
        # Batch positions agree with each other (padding hygiene).
        assert dict(out_b[0]["tags"]) == dict(out_b[1]["tags"])
        a.unload()
        b.unload()
