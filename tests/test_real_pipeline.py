"""Real tokenizer + real checkpoint, proven end-to-end (VERDICT r1 #6).

- a REAL BPE tokenizer (huggingface `tokenizers`) trained on a caption
  corpus and saved as tokenizer.json — no HashTokenizer anywhere in this
  path;
- a REAL checkpoint: the tiny CLIP is contrastively finetuned (the train
  step from models/clip.py) until captions align with their images, then
  exported in HF CLIPModel state-dict format (weights.save_clip_checkpoint)
  and loaded back through weights.load_clip_checkpoint — the exact mapping
  real OpenCLIP/HF checkpoints use (reference impl/clip.py:77-110);
- retrieval quality asserted end-to-end: scan → extraction → PQL text
  query ranks the matching image first.
"""

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")
torch = pytest.importorskip("torch")

import jax
import optax

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter
from panoptikon_tpu.index.vector_index import VectorIndex
from panoptikon_tpu.jobs import extraction, scan
from panoptikon_tpu.models import clip, weights
from panoptikon_tpu.models.impls import IMPL_INDEX, ClipImpl
from panoptikon_tpu.models.manager import ModelManager
from panoptikon_tpu.models.registry import Registry
from panoptikon_tpu.pql import model as pql
from panoptikon_tpu.pql.executor import Executor
from panoptikon_tpu.utils import npy

COLORS = {
    "red": (255, 40, 40),
    "green": (40, 255, 40),
    "blue": (40, 40, 255),
    "yellow": (250, 250, 60),
}
CAPTIONS = {name: f"a solid {name} square" for name in COLORS}


def build_bpe_tokenizer(path):
    """Train a real byte-level BPE on the caption corpus (ids < 512)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=200, special_tokens=["<unk>", "<pad>"]
    )
    corpus = list(CAPTIONS.values()) * 4 + [
        "square circle triangle color solid bright dark"
    ]
    tok.train_from_iterator(corpus, trainer)
    tok.save(str(path))
    return path


def make_image(color, size=32):
    rng = np.random.default_rng(hash(color) % 2**32)
    img = np.zeros((size, size, 3), np.uint8)
    img[:] = color
    # A touch of texture so the patch embedding sees structure.
    img = np.clip(
        img.astype(np.int16) + rng.integers(-12, 12, img.shape), 0, 255
    ).astype(np.uint8)
    return img


def train_tiny_clip(tokenize, steps=300):
    cfg = clip.CONFIGS["test-tiny"]
    params = clip.init_params(jax.random.key(7), cfg)
    names = list(COLORS)
    images = np.stack(
        [make_image(COLORS[n]).astype(np.float32) / 255.0 * 2 - 1 for n in names]
    )
    toks = np.zeros((len(names), cfg.text_ctx), np.int32)
    for i, n in enumerate(names):
        ids = tokenize(CAPTIONS[n])[: cfg.text_ctx]
        toks[i, : len(ids)] = ids

    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, grads = jax.value_and_grad(clip.clip_loss)(
            params, cfg, images, toks
        )
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), opt, loss

    loss = None
    for _ in range(steps):
        params, opt, loss = step(params, opt)
    return params, float(loss), images, toks


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("realpipe")
    tok_path = build_bpe_tokenizer(root / "tokenizer.json")
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(str(tok_path))
    params, loss, images, toks = train_tiny_clip(
        lambda t: tok.encode(t).ids
    )
    assert loss < 0.1, f"tiny CLIP failed to align (loss {loss})"
    ckpt = root / "tiny_clip.bin"
    weights.save_clip_checkpoint(params, clip.CONFIGS["test-tiny"], ckpt)
    media = root / "media"
    media.mkdir()
    from PIL import Image

    for name, color in COLORS.items():
        Image.fromarray(make_image(color)).save(media / f"{name}.png")
    return {
        "root": root, "ckpt": ckpt, "tok": tok_path, "media": media,
        "params": params,
    }


class TestCheckpointRoundTrip:
    def test_save_load_bit_exact(self, trained):
        cfg = clip.CONFIGS["test-tiny"]
        loaded = weights.load_clip_checkpoint(trained["ckpt"], cfg)
        orig_leaves = jax.tree.leaves(trained["params"])
        loaded_leaves = jax.tree.leaves(loaded)
        assert len(orig_leaves) == len(loaded_leaves)
        for a, b in zip(orig_leaves, loaded_leaves):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=0, rtol=0,
            )


class TestRealPipeline:
    def test_text_to_image_retrieval_end_to_end(self, trained, tmp_path):
        reg_dir = tmp_path / "reg"
        reg_dir.mkdir()
        (reg_dir / "00.toml").write_text(f"""
[group.clip]
config.impl_class = "clip"
config.model_arch = "test-tiny"
config.checkpoint = "{trained['ckpt']}"
config.tokenizer_path = "{trained['tok']}"
[group.clip.metadata]
output_type = "clip"
input_mime_types = ["image/"]
[group.clip.inference_ids.real]
""")
        manager = ModelManager(Registry(reg_dir), IMPL_INDEX)
        db = Database(tmp_path / "data", "real")
        writer = IndexWriter(db)
        index = VectorIndex(chunk_rows=64)
        try:
            writer.call(lambda c: store.add_folder(c, str(trained["media"])))
            scan.rescan_folders(db, writer)
            report = extraction.run_extraction_job(
                db=db, writer=writer, index=index, manager=manager,
                inference_id="clip/real",
                output_type="clip", batch_size=4,
            )
            assert report.processed == len(COLORS)
            assert report.input_errors == 0

            # PQL text→image retrieval through the executor: the embed
            # rides the real tokenizer + mapped checkpoint via /predict's
            # manager path (EmbedArgs, not base64).
            ex = Executor(db, index, manager=manager)
            conn = db.reader()
            for name in COLORS:
                res = ex.execute(pql.PqlQuery.from_json({
                    "query": {"image_embeddings": {
                        "query": CAPTIONS[name], "model": "clip/real",
                        "embed": {}, "index": "exact",
                    }},
                    "page_size": len(COLORS),
                }))
                top_item = res.results[0]["item_id"]
                path = conn.execute(
                    "SELECT path FROM files WHERE item_id=?", (top_item,)
                ).fetchone()[0]
                assert path.endswith(f"{name}.png"), (
                    f"query {name!r} retrieved {path}"
                )
        finally:
            manager.shutdown()
            writer.close()

    def test_predict_surface_real_tokenizer(self, trained):
        impl = ClipImpl(
            model_arch="test-tiny",
            checkpoint=str(trained["ckpt"]),
            tokenizer_path=str(trained["tok"]),
        )
        impl.load()
        from panoptikon_tpu.models.base import PredictionInput

        out = impl.predict([PredictionInput(data={"text": CAPTIONS["red"]})])
        arr = npy.parse_npy(out[0])
        assert arr.shape == (clip.CONFIGS["test-tiny"].embed_dim,)
        np.testing.assert_allclose(np.linalg.norm(arr), 1.0, atol=1e-3)
        impl.unload()

    def test_tokenizer_is_real_bpe_not_hash(self, trained):
        from tokenizers import Tokenizer

        tok = Tokenizer.from_file(str(trained["tok"]))
        ids = tok.encode("a solid red square").ids
        # Deterministic, small-vocab, multi-token output with stable ids.
        assert 0 < len(ids) <= 6
        assert all(0 <= i < 200 for i in ids)
        assert tok.encode("a solid red square").ids == ids
