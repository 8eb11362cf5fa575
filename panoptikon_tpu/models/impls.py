"""In-process model implementations — the registry's ``impl_class`` index.

TPU-native replacements for the reference's worker impls
(``python/inferio/impl/``): same predict contract (inputs with ``data`` /
``file``, outputs npy bytes / JSON-like dicts / error slots), but the
compute is jit-compiled JAX on static-shape buckets instead of
torch-in-a-subprocess.

Image decode happens host-side (PIL) exactly like the reference's workers —
and like them, a payload the decoder rejects becomes an ``input`` error
slot for that position only, never failing its batch-mates
(docs/inferio-worker-protocol.md:99-126).
"""

from __future__ import annotations

import hashlib
import io
import time
from typing import Any, Optional, Sequence

import jax
import numpy as np

from panoptikon_tpu.models import batching, clip, text_embed
from panoptikon_tpu.models.base import InferenceModel, PredictionInput, SlotError
from panoptikon_tpu.utils import npy

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def decode_image(payload: bytes, size: int) -> np.ndarray:
    """bytes → (size, size, 3) f32, CLIP-normalized. Raises SlotError('input')
    for undecodable payloads — the worker's own decoder is the only component
    allowed to call media bad."""
    from PIL import Image

    try:
        with Image.open(io.BytesIO(payload)) as im:
            im = im.convert("RGB")
            # Resize shorter side then center crop (CLIP preprocessing).
            w, h = im.size
            scale = size / min(w, h)
            im = im.resize((max(size, round(w * scale)), max(size, round(h * scale))))
            w, h = im.size
            left, top = (w - size) // 2, (h - size) // 2
            im = im.crop((left, top, left + size, top + size))
            arr = np.asarray(im, dtype=np.float32) / 255.0
    except Exception as exc:
        raise SlotError("input", f"Undecodable image payload: {exc}") from exc
    return (arr - CLIP_MEAN) / CLIP_STD


class HashTokenizer:
    """Deterministic fallback tokenizer (no vocab files in this offline
    image): whitespace split + stable hash into the vocab. Architecture-
    complete stand-in; real deployments point ``tokenizer_path`` at a
    HuggingFace tokenizer directory and get the real BPE."""

    def __init__(self, vocab: int, bos: int = 1, eos: int = 2):
        self.vocab = vocab
        self.bos = bos
        self.eos = eos

    def encode(self, text: str) -> list[int]:
        ids = [self.bos]
        for word in text.lower().split():
            h = int.from_bytes(hashlib.sha1(word.encode()).digest()[:4], "little")
            ids.append(3 + h % (self.vocab - 3))
        ids.append(self.eos)
        return ids


def load_tokenizer(tokenizer_path: Optional[str], vocab: int):
    if tokenizer_path:
        try:
            from tokenizers import Tokenizer

            tok = Tokenizer.from_file(tokenizer_path)
            return lambda text: tok.encode(text).ids
        except Exception:
            pass
    ht = HashTokenizer(vocab)
    return ht.encode


class ClipImpl(InferenceModel):
    """OpenCLIP-equivalent image/text encoder (reference impl/clip.py):
    encodes image files and ``{"text": ...}`` inputs in one batch, L2-
    normalized f32 features as npy bytes."""

    def __init__(
        self,
        model_arch: str = "ViT-B-32",
        checkpoint: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        context_length: Optional[int] = None,
        batch_cap: int = 64,
        precision: str = "bf16",
        **_: Any,
    ):
        import dataclasses

        self.arch = model_arch
        self.cfg = clip.CONFIGS.get(model_arch) or clip.CONFIGS["ViT-B-32"]
        if precision != self.cfg.matmul_precision:
            self.cfg = dataclasses.replace(self.cfg, matmul_precision=precision)
        self.checkpoint = checkpoint
        self.context_length = context_length or self.cfg.text_ctx
        self.batch_ladder = batching.bucket_ladder(batch_cap)
        self.tokenize = load_tokenizer(tokenizer_path, self.cfg.text_vocab)
        self.params = None
        # Calibrated per-tensor activation scales for the static int8
        # paths; lazily derived from the FIRST real batch of each kind
        # (one extra bf16 pass), then frozen — standard PTQ calibration.
        self._act_scales = None
        self._text_scales = None

    @classmethod
    def name(cls) -> str:
        return "clip"

    def load(self) -> None:
        if self.params is not None:
            return
        if self.checkpoint:
            from panoptikon_tpu.models import weights

            self.params = weights.load_clip_checkpoint(self.checkpoint, self.cfg)
        else:
            self.params = clip.init_params(jax.random.key(0), self.cfg)
        if self.cfg.matmul_precision == "int8":
            # Weight quantization happens ONCE here, not per forward.
            self.params = clip.quantize_block_weights(self.params)

    def unload(self) -> None:
        self.params = None
        self._act_scales = None
        self._text_scales = None

    def prepare(self) -> None:
        """Prewarm: compile every bucket shape so the first real predict
        pays no jit stall (reference inferio/prewarm.rs made TPU-native —
        the warm thing is the jit cache)."""
        self.load()
        for bucket in self.batch_ladder:
            images = np.zeros(
                (bucket, self.cfg.image_size, self.cfg.image_size, 3),
                dtype=np.float32,
            )
            if self.cfg.matmul_precision == "int8":
                # Warm with THROWAWAY scales: act_scales is a traced
                # operand, so the compile is shared with any real scales.
                # Persisting a calibration from this all-zeros batch would
                # understate real activation ranges and freeze saturating
                # scales (predict only calibrates while unset) — the first
                # genuine batch must calibrate.
                warm = self._act_scales
                if warm is None:
                    warm = clip.calibrate_image_scales(
                        self.params, self.cfg, images
                    )
                clip.embed_images_scaled_jit(
                    self.params, self.cfg, images, warm
                )
            else:
                clip.embed_images_jit(self.params, self.cfg, images)
            ids = np.zeros((bucket, self.cfg.text_ctx), dtype=np.int32)
            if self.cfg.matmul_precision == "int8":
                # predict() routes int8 text through the static-scaled
                # program — warm THAT one (with throwaway scales, same
                # reasoning as the image tower above).
                warm_t = self._text_scales
                if warm_t is None:
                    warm_t = clip.calibrate_text_scales(
                        self.params, self.cfg, ids
                    )
                clip.embed_texts_scaled_jit(
                    self.params, self.cfg, ids, warm_t
                )
            else:
                clip.embed_texts_jit(self.params, self.cfg, ids)

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        self.load()
        outputs: list[Any] = [None] * len(inputs)
        images, image_pos = [], []
        texts, text_pos = [], []
        for i, inp in enumerate(inputs):
            if inp.file is not None:
                try:
                    images.append(decode_image(inp.file, self.cfg.image_size))
                    image_pos.append(i)
                except SlotError as err:
                    outputs[i] = err.to_slot()
            elif isinstance(inp.data, dict) and "pixels" in inp.data:
                # Pre-decoded pixels from the `decoded_image` input handler:
                # the loader pool already ran decode_image, so this thread
                # goes straight to the device batch.
                arr = np.asarray(inp.data["pixels"], dtype=np.float32)
                want = (self.cfg.image_size, self.cfg.image_size, 3)
                if arr.shape != want:
                    outputs[i] = SlotError(
                        "input", f"pixels shape {arr.shape} != {want}"
                    ).to_slot()
                else:
                    images.append(arr)
                    image_pos.append(i)
            elif isinstance(inp.data, dict) and "text" in inp.data:
                texts.append(str(inp.data["text"]))
                text_pos.append(i)
            else:
                outputs[i] = SlotError(
                    "input", "Input must be an image file or {'text': ...}"
                ).to_slot()

        if images:
            batch = np.stack(images)
            bucket = batching.bucket_for(len(images), self.batch_ladder)
            padded, valid = batching.pad_batch(batch, bucket)
            if self.cfg.matmul_precision == "int8":
                if self._act_scales is None:
                    self._act_scales = clip.calibrate_image_scales(
                        self.params, self.cfg, padded
                    )
                feats = np.asarray(clip.embed_images_scaled_jit(
                    self.params, self.cfg, padded, self._act_scales
                ))
            else:
                feats = np.asarray(
                    clip.embed_images_jit(self.params, self.cfg, padded)
                )
            for pos, j in zip(image_pos, range(len(images))):
                outputs[pos] = npy.serialize_npy(feats[j])
        if texts:
            seqs = [self.tokenize(t)[: self.context_length] for t in texts]
            ids, _mask, _ = batching.pad_token_batch(
                seqs, [self.cfg.text_ctx], self.batch_ladder
            )
            if self.cfg.matmul_precision == "int8":
                if self._text_scales is None:
                    self._text_scales = clip.calibrate_text_scales(
                        self.params, self.cfg, ids
                    )
                feats = np.asarray(clip.embed_texts_scaled_jit(
                    self.params, self.cfg, ids, self._text_scales
                ))
            else:
                feats = np.asarray(
                    clip.embed_texts_jit(self.params, self.cfg, ids))
            for pos, j in zip(text_pos, range(len(texts))):
                outputs[pos] = npy.serialize_npy(feats[j])
        return outputs


class TextEmbedImpl(InferenceModel):
    """Sentence-transformers-equivalent text embedder with the chunking +
    combined-embedding contract (reference impl/sentence_transformers.py).
    One input text → 2D npy array of chunk embeddings."""

    def __init__(
        self,
        model_arch: str = "minilm-l6",
        checkpoint: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        max_seq_length: Optional[int] = None,
        combine_threshold: int = -1,
        batch_cap: int = 64,
        query_prompt_name_map: Optional[dict] = None,
        **_: Any,
    ):
        self.cfg = text_embed.CONFIGS.get(model_arch) or text_embed.CONFIGS["minilm-l6"]
        self.checkpoint = checkpoint
        self.max_seq_length = min(max_seq_length or self.cfg.ctx, self.cfg.ctx)
        self.combine_threshold = combine_threshold
        self.batch_ladder = batching.bucket_ladder(batch_cap)
        self.length_ladder = [
            l for l in (32, 64, 128, 256, 512) if l <= self.max_seq_length
        ] or [self.max_seq_length]
        self.tokenize = load_tokenizer(tokenizer_path, self.cfg.vocab)
        self.query_prompt_name_map = query_prompt_name_map or {}
        self.params = None

    @classmethod
    def name(cls) -> str:
        return "sentence_transformers"

    def load(self) -> None:
        if self.params is not None:
            return
        if self.checkpoint:
            from panoptikon_tpu.models import weights

            self.params = weights.load_text_encoder_checkpoint(self.checkpoint, self.cfg)
        else:
            self.params = text_embed.init_params(jax.random.key(1), self.cfg)

    def unload(self) -> None:
        self.params = None

    def prepare(self) -> None:
        """Prewarm the (length × batch) bucket grid's jit cache."""
        self.load()
        for length in self.length_ladder:
            for bucket in self.batch_ladder:
                ids = np.zeros((bucket, length), dtype=np.int32)
                mask = np.ones((bucket, length), dtype=np.float32)
                text_embed.encode_jit(self.params, self.cfg, ids, mask)

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        self.load()
        texts = []
        combine_at = []
        for inp in inputs:
            data = inp.data if isinstance(inp.data, dict) else {}
            text = str(data.get("text", ""))
            # Task routing (reference sentence_transformers.py
            # query_prompt_name_map): query-side embeds carry a task name
            # (preprocess sends "s2s"); the mapped prompt prefixes the text
            # so asymmetric models see their query prompt.
            task = data.get("task")
            if task and task in self.query_prompt_name_map:
                text = f"{self.query_prompt_name_map[task]}{text}"
            texts.append(text)
            combine_at.append(int(data.get("combine_threshold", self.combine_threshold)))

        # Chunk every text (rebalanced tail), track ownership.
        all_chunks: list[list[int]] = []
        chunk_map: list[int] = []
        for idx, text in enumerate(texts):
            tokens = self.tokenize(text) or [0]
            for chunk in text_embed.split_tokens(tokens, self.max_seq_length):
                all_chunks.append(chunk or [0])
                chunk_map.append(idx)

        ids, mask, valid = batching.pad_token_batch(
            all_chunks, self.length_ladder, self.batch_ladder
        )
        feats = np.asarray(
            text_embed.encode_jit(self.params, self.cfg, ids, mask)
        )[: len(all_chunks)]

        grouped: list[list[np.ndarray]] = [[] for _ in texts]
        for emb, owner in zip(feats, chunk_map):
            grouped[owner].append(emb)
        outputs = []
        for idx, emb_list in enumerate(grouped):
            arr = text_embed.combine_chunks(np.stack(emb_list), combine_at[idx])
            outputs.append(npy.serialize_npy(arr))
        return outputs


class TaggerImpl(InferenceModel):
    """WD-tagger-equivalent multi-label tagger: ViT backbone + sigmoid head,
    mcut/fixed thresholds host-side, reference output shape
    (impl/wd_tagger.py:118-160: namespace + rating/character/general tag
    maps + mcut)."""

    def __init__(
        self,
        model_arch: str = "test-tiny",
        checkpoint: Optional[str] = None,
        namespace: str = "danbooru",
        tag_vocab: Optional[list[str]] = None,
        rating_tags: Optional[list[str]] = None,
        character_tags: Optional[list[str]] = None,
        character_threshold: float = 0.75,
        batch_cap: int = 32,
        precision: str = "bf16",
        **_: Any,
    ):
        # precision="int8" runs the trunk on the static-int8 fused block
        # (calibrated on the first real batch, like ClipImpl) — ~2× trunk
        # throughput; sigmoid probs shift by the trunk's quantization
        # error (cosine ≥0.999 gate), and mcut thresholds on the sorted
        # gap are shift-stable. Opt-in per registry entry; default bf16.
        self.precision = precision
        self.cfg = clip.CONFIGS.get(model_arch) or clip.CONFIGS["test-tiny"]
        if precision == "int8":
            import dataclasses as _dc

            self.cfg = _dc.replace(self.cfg, matmul_precision="int8")
        self._act_scales = None
        self.checkpoint = checkpoint
        self.namespace = namespace
        self.rating_tags = rating_tags or ["general", "safe", "sensitive", "questionable", "explicit"]
        self.tag_vocab = tag_vocab or [f"tag_{i}" for i in range(64)]
        # The WD head layout is [ratings | general | characters]; character
        # tags use a fixed threshold rather than mcut (impl/wd_tagger.py).
        self.character_tags = character_tags or []
        self.character_threshold = character_threshold
        self.batch_ladder = batching.bucket_ladder(batch_cap)
        self.params = None
        self.head = None
        self.head_bias = None

    @classmethod
    def name(cls) -> str:
        return "wd_tagger"

    def load(self) -> None:
        if self.params is not None:
            return
        if self.checkpoint:
            # timm ViT mapping (the reference's WD taggers are timm models):
            # identity projection, head on the raw pooled features.
            import dataclasses as _dc

            from panoptikon_tpu.models import weights

            self.cfg = _dc.replace(self.cfg, embed_dim=self.cfg.vision_width)
            visual, head_w, head_b = weights.load_timm_vit_checkpoint(
                self.checkpoint, self.cfg
            )
            self.params = {"visual": visual}
            self.head = head_w
            self.head_bias = head_b
            n_out = head_w.shape[1]
            declared = (
                len(self.rating_tags) + len(self.tag_vocab)
                + len(self.character_tags)
            )
            if declared != n_out:
                # Vocab must match the checkpoint's head width; absent a
                # full tag list, synthesize general names and drop the
                # character split.
                self.character_tags = []
                self.tag_vocab = [
                    f"tag_{i}" for i in range(n_out - len(self.rating_tags))
                ]
            if self.precision == "int8":
                self.params = clip.quantize_block_weights(self.params)
            return
        self.params = clip.init_params(jax.random.key(2), self.cfg)
        n_out = (
            len(self.rating_tags) + len(self.tag_vocab)
            + len(self.character_tags)
        )
        self.head = np.asarray(
            jax.random.normal(jax.random.key(3), (self.cfg.embed_dim, n_out))
        ) * self.cfg.embed_dim**-0.5
        self.head_bias = np.zeros(n_out, np.float32)
        if self.precision == "int8":
            self.params = clip.quantize_block_weights(self.params)

    def unload(self) -> None:
        self.params = None
        self.head = None
        self._act_scales = None

    @staticmethod
    def mcut_threshold(probs: np.ndarray) -> float:
        """Maximum-category-cut: threshold at the largest gap in the sorted
        score curve (impl/utils.py mcut)."""
        sorted_probs = np.sort(probs)[::-1]
        if len(sorted_probs) < 2:
            return 0.0
        gaps = sorted_probs[:-1] - sorted_probs[1:]
        t = int(np.argmax(gaps))
        return float((sorted_probs[t] + sorted_probs[t + 1]) / 2)

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        self.load()
        outputs: list[Any] = [None] * len(inputs)
        images, kept = [], []
        for i, inp in enumerate(inputs):
            if inp.file is None:
                outputs[i] = SlotError("input", "Tagger requires an image file").to_slot()
                continue
            try:
                images.append(decode_image(inp.file, self.cfg.image_size))
                kept.append(i)
            except SlotError as err:
                outputs[i] = err.to_slot()
        if images:
            bucket = batching.bucket_for(len(images), self.batch_ladder)
            padded, _ = batching.pad_batch(np.stack(images), bucket)
            if self.precision == "int8":
                if self._act_scales is None:
                    self._act_scales = clip.calibrate_image_scales(
                        self.params, self.cfg, padded
                    )
                feats = np.asarray(clip.embed_images_raw_scaled_jit(
                    self.params, self.cfg, padded, self._act_scales
                ))
            else:
                feats = np.asarray(
                    clip.embed_images_raw_jit(self.params, self.cfg, padded)
                )
            logits = feats[: len(images)] @ self.head + self.head_bias
            probs = 1.0 / (1.0 + np.exp(-logits))
            n_rating = len(self.rating_tags)
            n_general = len(self.tag_vocab)
            for j, pos in enumerate(kept):
                config = inputs[pos].data if isinstance(inputs[pos].data, dict) else {}
                rating_probs = probs[j, :n_rating]
                general_probs = probs[j, n_rating : n_rating + n_general]
                char_probs = probs[j, n_rating + n_general :]
                thresh = config.get("threshold")
                mcut = self.mcut_threshold(general_probs)
                eff = mcut if not thresh else float(thresh)
                general = {
                    self.tag_vocab[t]: float(general_probs[t])
                    for t in np.flatnonzero(general_probs >= eff)
                }
                char_eff = float(
                    config.get("character_threshold", self.character_threshold)
                )
                character = {
                    self.character_tags[t]: float(char_probs[t])
                    for t in np.flatnonzero(char_probs >= char_eff)
                }
                rating = {self.rating_tags[int(np.argmax(rating_probs))]: float(rating_probs.max())}
                outputs[pos] = {
                    "namespace": self.namespace,
                    "tags": [
                        ("rating", rating),
                        ("character", character),
                        ("general", general),
                    ],
                    "mcut": mcut,
                    "rating_severity": self.rating_tags,
                    "metadata": {},
                    "metadata_score": 0.0,
                }
        return outputs


def decode_wav(payload: bytes) -> np.ndarray:
    """WAV bytes → mono f32 PCM at 16 kHz (linear resample). Non-WAV audio
    needs ffmpeg, which is probed and ledgered as a blocker when missing —
    the failed-media 'blocked' pattern."""
    import io as _io
    import wave

    try:
        with wave.open(_io.BytesIO(payload)) as w:
            rate = w.getframerate()
            channels = w.getnchannels()
            width = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except Exception as exc:
        raise SlotError("input", f"Undecodable WAV payload: {exc}") from exc
    if width == 2:
        pcm = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128) / 128.0
    elif width == 4:
        pcm = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2**31
    else:
        raise SlotError("input", f"Unsupported WAV sample width {width}")
    if channels > 1:
        pcm = pcm.reshape(-1, channels).mean(axis=1)
    if rate != 16000:
        n_out = int(len(pcm) * 16000 / rate)
        pcm = np.interp(
            np.linspace(0, len(pcm) - 1, n_out), np.arange(len(pcm)), pcm
        ).astype(np.float32)
    return pcm


class WhisperImpl(InferenceModel):
    """Whisper STT (reference impl/whisper.py): audio file → text with
    language + confidence (avg logprob)."""

    def __init__(
        self,
        model_arch: str = "test-tiny",
        checkpoint: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        max_tokens: int = 64,
        **_: Any,
    ):
        from panoptikon_tpu.models import whisper as _w

        self._w = _w
        self.cfg = _w.CONFIGS.get(model_arch) or _w.CONFIGS["test-tiny"]
        self.checkpoint = checkpoint
        self.tokenizer_path = tokenizer_path
        self.max_tokens = max_tokens
        self.params = None
        self.detokenize = None

    @classmethod
    def name(cls) -> str:
        return "whisper"

    def load(self) -> None:
        if self.params is not None:
            return
        if self.checkpoint:
            from panoptikon_tpu.models import weights

            self.params = weights.load_whisper_checkpoint(self.checkpoint, self.cfg)
        else:
            self.params = self._w.init_params(jax.random.key(4), self.cfg)
        if self.tokenizer_path and self.detokenize is None:
            try:
                from tokenizers import Tokenizer

                tok = Tokenizer.from_file(self.tokenizer_path)
                self.detokenize = lambda ids: tok.decode(
                    [i for i in ids if 0 <= i < tok.get_vocab_size()]
                )
            except Exception:
                pass

    def unload(self) -> None:
        self.params = None

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        self.load()
        outputs: list[Any] = [None] * len(inputs)
        mels, kept = [], []
        for i, inp in enumerate(inputs):
            if inp.file is None:
                outputs[i] = SlotError("input", "Whisper requires an audio file").to_slot()
                continue
            try:
                pcm = decode_wav(inp.file)
                mels.append(self._w.log_mel_spectrogram(pcm, self.cfg.n_mels))
                kept.append(i)
            except SlotError as err:
                outputs[i] = err.to_slot()
        if mels:
            batch = np.stack(mels)
            # Language ID from the SOT-step language-token logits (the
            # standard whisper probe; reference impl/whisper.py reports
            # detected language + its probability).
            import jax

            lang_idx, lang_conf = jax.device_get(self._w.detect_language(
                self.params, self.cfg, batch
            ))
            lang_tokens = (self.cfg.language_base + lang_idx).astype(np.int32)
            # One batched transfer: per-array readbacks each pay the relay's
            # ~25 ms round-trip constant.
            tokens, lengths, logprob = jax.device_get(self._w.greedy_decode(
                self.params, self.cfg, batch, max_tokens=self.max_tokens,
                lang_tokens=lang_tokens,
            ))
            for j, pos in enumerate(kept):
                toks = tokens[j, 4 : lengths[j]].tolist()
                text = (
                    self.detokenize(toks)
                    if self.detokenize
                    else " ".join(f"<{t}>" for t in toks)
                )
                outputs[pos] = {
                    "text": text,
                    "language": self._w.LANGUAGES[int(lang_idx[j])],
                    "language_confidence": float(lang_conf[j]),
                    "confidence": float(np.exp(logprob[j])),
                }
        return outputs


class ClapImpl(InferenceModel):
    """CLAP-class audio embeddings (reference impl/clap.py): audio file →
    normalized embedding npy.

    The audio tower is a REAL AST-style transformer over log-mel patches
    (models/audio.py): patch-embed → bidirectional attention trunk → mean
    pool → projection. The audio content passes through attention — the
    round-1 placeholder (zero-id text encoder + additive patch energy) did
    not. HF ASTModel checkpoints load via audio.load_ast_checkpoint."""

    def __init__(
        self,
        model_arch: str = "test-tiny",
        checkpoint: Optional[str] = None,
        batch_cap: int = 16,
        **_: Any,
    ):
        from panoptikon_tpu.models import audio as _audio

        self._audio = _audio
        self.cfg = _audio.CONFIGS.get(model_arch) or _audio.CONFIGS["test-tiny"]
        self.checkpoint = checkpoint
        self.batch_ladder = batching.bucket_ladder(batch_cap)
        self.params = None

    @classmethod
    def name(cls) -> str:
        return "clap"

    def load(self) -> None:
        if self.params is not None:
            return
        if self.checkpoint:
            self.params = self._audio.load_ast_checkpoint(self.checkpoint, self.cfg)
        else:
            self.params = self._audio.init_params(jax.random.key(5), self.cfg)

    def unload(self) -> None:
        self.params = None

    def prepare(self) -> None:
        self.load()
        for bucket in self.batch_ladder:
            mels = np.zeros(
                (bucket, self.cfg.n_mels, self.cfg.time_frames), np.float32
            )
            self._audio.embed_audio_jit(self.params, self.cfg, mels)

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        self.load()
        outputs: list[Any] = [None] * len(inputs)
        mels, kept = [], []
        for i, inp in enumerate(inputs):
            if inp.file is None:
                outputs[i] = SlotError("input", "CLAP requires an audio file").to_slot()
                continue
            try:
                pcm = decode_wav(inp.file)
                mels.append(self._audio.prepare_mels(pcm, self.cfg))
                kept.append(i)
            except SlotError as err:
                outputs[i] = err.to_slot()
        if mels:
            batch = np.stack(mels)
            bucket = batching.bucket_for(len(mels), self.batch_ladder)
            padded, _ = batching.pad_batch(batch, bucket)
            feats = np.asarray(
                self._audio.embed_audio_jit(self.params, self.cfg, padded)
            )
            for j, pos in enumerate(kept):
                outputs[pos] = npy.serialize_npy(feats[j])
        return outputs


class CaptionerImpl(InferenceModel):
    """VLM captioner family (reference impl/florence2.py / md_captioner.py /
    qwen3_vl.py): image → caption text. Architecture: CLIP vision tokens as
    cross-attention memory into a Whisper-style text decoder, greedy decode
    on static shapes."""

    def __init__(
        self,
        model_arch: str = "test-tiny",
        checkpoint: Optional[str] = None,
        decoder_checkpoint: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        max_tokens: int = 32,
        prompt: Optional[str] = None,
        **_: Any,
    ):
        from panoptikon_tpu.models import whisper as _w

        self._w = _w
        self.vision_cfg = clip.CONFIGS.get(model_arch) or clip.CONFIGS["test-tiny"]
        self.checkpoint = checkpoint
        self.decoder_checkpoint = decoder_checkpoint
        self.max_tokens = max_tokens
        self.prompt = prompt
        self.tokenizer_path = tokenizer_path
        n_ctx = 1 + self.vision_cfg.grid**2
        self.decoder_cfg = _w.WhisperConfig(
            n_mels=1,
            n_audio_ctx=n_ctx,
            n_audio_state=self.vision_cfg.vision_width,
            n_audio_layers=0,
            n_audio_heads=1,
            n_vocab=512,
            n_text_ctx=max(max_tokens, 16),
            n_text_state=self.vision_cfg.vision_width,
            n_text_layers=2,
            n_text_heads=2,
            sot=500, eot=501, no_timestamps=503, transcribe=502,
        )
        self.vision_params = None
        self.decoder_params = None
        self.detokenize = None
        self._prompt_ids: tuple = ()

    @classmethod
    def name(cls) -> str:
        return "captioner"

    def load(self) -> None:
        if self.vision_params is not None:
            return
        if self.checkpoint:
            from panoptikon_tpu.models import weights

            self.vision_params = weights.load_clip_checkpoint(
                self.checkpoint, self.vision_cfg
            )
        else:
            self.vision_params = clip.init_params(jax.random.key(7), self.vision_cfg)
        if self.decoder_checkpoint:
            # Real decoder weights (HF whisper decoder layout; the same
            # cross-attention block mapping the whisper loader uses) —
            # without these the decoder decodes noise (VERDICT r2 #6).
            from panoptikon_tpu.models import weights

            self.decoder_params = weights.load_whisper_decoder_checkpoint(
                self.decoder_checkpoint, self.decoder_cfg
            )
        else:
            self.decoder_params = self._w.init_params(jax.random.key(8), self.decoder_cfg)
        if self.tokenizer_path and self.detokenize is None:
            try:
                from tokenizers import Tokenizer

                tok = Tokenizer.from_file(self.tokenizer_path)
                self.detokenize = lambda ids: tok.decode(
                    [i for i in ids if 0 <= i < tok.get_vocab_size()]
                )
                if self.prompt:
                    # Task-prompted decode (reference florence2.py task
                    # prompts): the tokenized prompt extends the SOT
                    # triple; decoding continues after it. The budget is
                    # bounded by BOTH the decoder context and the KV-cache
                    # length (max_tokens − SOT triple − ≥1 generated slot),
                    # so a long configured prompt can't overrun the cache
                    # at trace time.
                    ids = tok.encode(self.prompt).ids
                    budget = max(
                        min(self.decoder_cfg.n_text_ctx // 2,
                            self.max_tokens - 4), 1
                    )
                    self._prompt_ids = tuple(
                        int(i) for i in ids[:budget]
                        if 0 <= i < self.decoder_cfg.n_vocab
                    )
            except Exception:
                pass

    def unload(self) -> None:
        self.vision_params = None
        self.decoder_params = None
        self.detokenize = None

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        import functools

        self.load()
        outputs: list[Any] = [None] * len(inputs)
        images, kept = [], []
        for i, inp in enumerate(inputs):
            if inp.file is None:
                outputs[i] = SlotError("input", "Captioner requires an image file").to_slot()
                continue
            try:
                images.append(decode_image(inp.file, self.vision_cfg.image_size))
                kept.append(i)
            except SlotError as err:
                outputs[i] = err.to_slot()
        if images:
            batch = np.stack(images)
            feats = np.asarray(
                clip.encode_image_tokens(self.vision_params, self.vision_cfg, batch)
            )
            tokens, lengths, logprob = _caption_decode(
                self.decoder_params, self.decoder_cfg, feats,
                self.max_tokens, self._prompt_ids
            )
            p_len = 3 + len(self._prompt_ids)
            tokens, lengths = np.asarray(tokens), np.asarray(lengths)
            for j, pos in enumerate(kept):
                toks = tokens[j, p_len : lengths[j]].tolist()
                text = (
                    self.detokenize(toks)
                    if self.detokenize
                    else " ".join(f"<{t}>" for t in toks)
                )
                outputs[pos] = {
                    "text": text,
                    "confidence": float(np.exp(np.asarray(logprob)[j])),
                    "language": "en",
                    "language_confidence": 1.0,
                }
        return outputs


def _caption_decode_jit():
    """Module-level jit for the caption decode — defining the jitted
    function inside `_caption_decode` would mint a fresh jit wrapper (and
    a full re-trace + XLA compile) on every predict() call, since jit's
    cache is keyed on the function object."""
    import functools

    from panoptikon_tpu.models import whisper as _w

    @functools.partial(
        jax.jit, static_argnames=("cfg", "max_tokens", "extra_ids"))
    def run(params, cfg, feats, max_tokens, extra_ids=()):
        import jax.numpy as jnp

        b = feats.shape[0]
        ids = [cfg.sot, cfg.transcribe, cfg.no_timestamps, *extra_ids]
        prompt = jnp.broadcast_to(
            jnp.array(ids, dtype=jnp.int32)[None], (b, len(ids)))
        return _w.decode_from_feats(params, cfg, feats, prompt, max_tokens)

    return run


_CAPTION_DECODE = None


def _caption_decode(params, cfg, feats, max_tokens, extra_ids=()):
    """Greedy decode against precomputed vision features (bypasses the
    audio encoder by feeding the cross-attention memory directly) —
    routed through the shared KV-cached incremental decoder
    (whisper.decode_from_feats; the full-prefix re-run form this
    replaced did O(L) more decoder work per emitted token)."""
    global _CAPTION_DECODE
    if _CAPTION_DECODE is None:
        _CAPTION_DECODE = _caption_decode_jit()
    return _CAPTION_DECODE(params, cfg, feats, max_tokens, extra_ids)


class VlmTaggerImpl(CaptionerImpl):
    """VLM-prompted tagger (reference impl/md_tagger.py: a moondream VLM
    asked to list tags). Reuses the captioner's vision-tokens →
    cross-attention decoder; the decoded text is parsed as a comma/
    whitespace-separated tag list and emitted in the tagger output shape
    so extraction's tags output-handler ingests it unchanged. Confidence
    is the decode's avg-logprob (one value for the whole list — the
    reference's VLM taggers report a fixed confidence the same way)."""

    def __init__(self, namespace: str = "vlm", max_tags: int = 16,
                 **kwargs: Any):
        super().__init__(**kwargs)
        self.namespace = namespace
        self.max_tags = max_tags

    @classmethod
    def name(cls) -> str:
        return "vlm_tagger"

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        caps = super().predict(inputs)
        outputs: list[Any] = []
        for cap in caps:
            if not isinstance(cap, dict) or "text" not in cap:
                outputs.append(cap)  # slot error passthrough
                continue
            conf = float(cap.get("confidence", 0.0))
            seen: dict[str, float] = {}
            for raw in cap["text"].replace(",", " ").split():
                tag = raw.strip().strip(".").lower()
                if tag and tag not in seen:
                    seen[tag] = conf
                if len(seen) >= self.max_tags:
                    break
            outputs.append({
                "namespace": self.namespace,
                "tags": [("rating", {}), ("character", {}), ("general", seen)],
                "mcut": 0.0,
                "rating_severity": [],
                "metadata": {},
                "metadata_score": conf,
            })
        return outputs


class Md5LookupImpl(InferenceModel):
    """md5-lookup tagger (reference impl/danbooru.py + saucenao/): tags by
    hash against a local dump (JSON/sqlite: md5 → [[namespace, name,
    confidence], ...]). Remote lookups are out of scope in a zero-egress
    build; a missing dump yields transient blocked errors, never verdicts."""

    def __init__(self, dump_path: Optional[str] = None, namespace: str = "danbooru", **_: Any):
        self.dump_path = dump_path
        self.namespace = namespace
        self.table: Optional[dict] = None
        self._conn = None  # sqlite backend (the at-scale default)

    @classmethod
    def name(cls) -> str:
        return "md5_lookup"

    def load(self) -> None:
        if self.table is not None or self._conn is not None or self.dump_path is None:
            return
        from pathlib import Path as _Path

        path = _Path(self.dump_path)
        if not path.exists():
            return
        if path.suffix in (".db", ".sqlite", ".sqlite3"):
            # sqlite dump (a danbooru-scale table is GBs as a resident
            # dict): `tags(md5 TEXT, namespace TEXT, name TEXT,
            # confidence REAL)` with an md5 index, queried per batch.
            import sqlite3 as _sqlite3

            self._conn = _sqlite3.connect(
                f"file:{path}?mode=ro", uri=True, check_same_thread=False
            )
        else:
            import json as _json

            self.table = _json.loads(path.read_text())

    def _lookup(self, md5: str):
        if self.table is not None:
            return self.table.get(md5)
        rows = self._conn.execute(
            "SELECT namespace, name, confidence FROM tags WHERE md5 = ?",
            (md5,),
        ).fetchall()
        return rows or None

    def unload(self) -> None:
        self.table = None
        if self._conn is not None:
            self._conn.close()
            self._conn = None

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        self.load()
        out = []
        for inp in inputs:
            md5 = (inp.data or {}).get("md5") if isinstance(inp.data, dict) else None
            if md5 is None:
                out.append(SlotError("input", "md5 lookup requires data.md5").to_slot())
                continue
            if self.table is None and self._conn is None:
                out.append(
                    {
                        "__error__": {
                            "class": "transient",
                            "message": "blocked: no tag dump configured (blocker=tag-dump)",
                        }
                    }
                )
                continue
            entry = self._lookup(md5)
            tags: dict[str, float] = {}
            if entry:
                for ns, tag_name, conf in entry:
                    tags[tag_name] = float(conf)
            out.append(
                {
                    "namespace": self.namespace,
                    "tags": [("general", tags)],
                    "mcut": 0.0,
                    "rating_severity": [],
                    "metadata": {},
                    "metadata_score": 0.0,
                }
            )
        return out


class ApiEmbedImpl(InferenceModel):
    """Remote-API embedding backends (reference impl/jina_clip.py — Jina's
    hosted CLIP API — and the nemotron/qwen embed family): text and image
    inputs are POSTed to an OpenAI/Jina-style ``/embeddings`` endpoint and
    the returned vectors are re-emitted as L2-normalized npy bytes.

    Offline/gated semantics follow the failed-media design: no endpoint
    configured → every slot gets a typed ``transient`` error naming the
    blocker; a transport failure is likewise transient (retry later), and
    a per-item API rejection is an ``input`` verdict."""

    def __init__(
        self,
        endpoint: Optional[str] = None,
        model: str = "jina-clip-v1",
        api_key_env: str = "EMBED_API_KEY",
        timeout: float = 60.0,
        normalize: bool = True,
        **_: Any,
    ):
        self.endpoint = endpoint
        self.model = model
        self.api_key_env = api_key_env
        self.timeout = timeout
        self.normalize = normalize

    @classmethod
    def name(cls) -> str:
        return "api_embed"

    @classmethod
    def available(cls, config: dict) -> bool:
        """Availability overlay (the reference's capability probe,
        inferio/capability.rs): API backends are usable only with an
        endpoint configured."""
        return bool(config.get("endpoint"))

    def load(self) -> None:
        pass

    def unload(self) -> None:
        pass

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        import base64
        import json as _json
        import os
        import urllib.request

        if not self.endpoint:
            err = SlotError(
                "transient",
                "blocked: no embeddings endpoint configured (blocker=embed-api)",
            ).to_slot()
            return [err for _ in inputs]
        payload_inputs = []
        for inp in inputs:
            if inp.file is not None:
                payload_inputs.append(
                    {"image": base64.b64encode(inp.file).decode()}
                )
            elif isinstance(inp.data, dict) and "text" in inp.data:
                payload_inputs.append({"text": str(inp.data["text"])})
            else:
                payload_inputs.append({"text": ""})
        body = _json.dumps(
            {"model": self.model, "input": payload_inputs}
        ).encode()
        headers = {"content-type": "application/json"}
        key = os.environ.get(self.api_key_env)
        if key:
            headers["authorization"] = f"Bearer {key}"
        req = urllib.request.Request(
            self.endpoint, data=body, headers=headers, method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                out = _json.loads(resp.read())
        except Exception as exc:
            err = SlotError("transient", f"embeddings API failed: {exc}").to_slot()
            return [err for _ in inputs]
        outputs: list[Any] = []
        data = out.get("data", [])
        # OpenAI/Jina-style responses may reorder or omit entries; the
        # per-entry "index" field is authoritative for slot alignment.
        by_index = {}
        for pos, entry in enumerate(data):
            if isinstance(entry, dict):
                by_index[int(entry.get("index", pos))] = entry
        for i in range(len(inputs)):
            entry = by_index.get(i)
            if not entry or "embedding" not in entry:
                outputs.append(
                    SlotError("input", "no embedding returned for slot").to_slot()
                )
                continue
            vec = np.asarray(entry["embedding"], np.float32)
            if self.normalize:
                vec = vec / max(float(np.linalg.norm(vec)), 1e-8)
            outputs.append(npy.serialize_npy(vec))
        return outputs


class TagApiImpl(InferenceModel):
    """Remote tag-lookup backend (reference impl/saucenao/ + the hosted
    half of impl/danbooru.py): each image's md5 (or the provided hash) is
    POSTed to a configured JSON API and the response's tag map is emitted
    in the tagger output shape. Same offline/gated semantics as
    ApiEmbedImpl: no endpoint → typed transient blocker; transport
    failure → transient; an explicit per-item miss → empty tags (a valid
    verdict, not an error — the reference records "no match" results)."""

    def __init__(
        self,
        endpoint: Optional[str] = None,
        namespace: str = "danbooru",
        api_key_env: str = "TAG_API_KEY",
        timeout: float = 30.0,
        default_confidence: float = 1.0,
        **_: Any,
    ):
        self.endpoint = endpoint
        self.namespace = namespace
        self.api_key_env = api_key_env
        self.timeout = timeout
        self.default_confidence = default_confidence

    @classmethod
    def name(cls) -> str:
        return "tag_api"

    @classmethod
    def available(cls, config: dict) -> bool:
        return bool(config.get("endpoint"))

    def load(self) -> None:
        pass

    def unload(self) -> None:
        pass

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        import json as _json
        import os
        import urllib.request

        if not self.endpoint:
            err = SlotError(
                "transient",
                "blocked: no tag API endpoint configured (blocker=tag-api)",
            ).to_slot()
            return [err for _ in inputs]
        hashes = []
        for inp in inputs:
            if isinstance(inp.data, dict) and inp.data.get("md5"):
                hashes.append(str(inp.data["md5"]))
            elif inp.file is not None:
                hashes.append(hashlib.md5(inp.file).hexdigest())
            else:
                hashes.append(None)
        body = _json.dumps({"md5": [h for h in hashes if h]}).encode()
        headers = {"content-type": "application/json"}
        key = os.environ.get(self.api_key_env)
        if key:
            headers["authorization"] = f"Bearer {key}"
        req = urllib.request.Request(
            self.endpoint, data=body, headers=headers, method="POST"
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                out = _json.loads(resp.read())
        except Exception as exc:
            err = SlotError("transient", f"tag API failed: {exc}").to_slot()
            return [err for _ in inputs]
        # Response: {"results": {"<md5>": {"tags": {name: conf | null}}}}.
        results = out.get("results", {})
        outputs: list[Any] = []
        for h in hashes:
            if h is None:
                outputs.append(
                    SlotError("input", "tag lookup requires a file or md5").to_slot()
                )
                continue
            entry = results.get(h) or {}
            tags = {
                str(name): (float(conf) if conf is not None
                            else self.default_confidence)
                for name, conf in (entry.get("tags") or {}).items()
            }
            outputs.append({
                "namespace": self.namespace,
                "tags": [("rating", {}), ("character", {}), ("general", tags)],
                "mcut": 0.0,
                "rating_severity": [],
                "metadata": {"source": "tag_api", "matched": bool(tags)},
                "metadata_score": 0.0,
            })
        return outputs


class OcrImpl(InferenceModel):
    """OCR (reference impl/ocr.py docTR / eocr.py EasyOCR): image →
    ``{"text", "confidence", "language"}``.

    Real recognition stack (models/ocr.py): projection-profile line
    segmentation on the host, then one of TWO recognizer families over
    fixed-height line strips — ``recognizer="ctc"`` (the EasyOCR/CRNN
    formulation, recurrent trunk replaced by attention) or
    ``recognizer="attn"`` (seq2seq attention decoder reusing the whisper
    KV-cached decode, the reference's second OCR engine family). Both are
    trainable; the test suite trains BOTH tiny configs to read rendered
    text."""

    def __init__(
        self,
        model_arch: str = "crnn-base",
        checkpoint: Optional[str] = None,
        batch_cap: int = 16,
        min_confidence: float = 0.0,
        recognizer: str = "ctc",
        **_: Any,
    ):
        from panoptikon_tpu.models import ocr as _ocr

        self._ocr = _ocr
        # Two recognizer families over the same strip encoder + host
        # segmentation (the reference's engine spread): "ctc" (EasyOCR/CRNN
        # formulation) and "attn" (seq2seq attention decoder).
        self.recognizer = recognizer
        if recognizer == "attn":
            self.attn_cfg = (
                _ocr.ATTN_CONFIGS.get(model_arch)
                or _ocr.ATTN_CONFIGS["attn-base"]
            )
            self.cfg = self.attn_cfg.enc
        else:
            self.attn_cfg = None
            self.cfg = _ocr.CONFIGS.get(model_arch) or _ocr.CONFIGS["crnn-base"]
        self.checkpoint = checkpoint
        self.batch_ladder = batching.bucket_ladder(batch_cap)
        self.min_confidence = min_confidence
        self.params = None

    @classmethod
    def name(cls) -> str:
        return "ocr"

    def load(self) -> None:
        if self.params is not None:
            return
        if self.checkpoint:
            import pickle

            with open(self.checkpoint, "rb") as f:
                raw = pickle.load(f)
            self.params = jax.tree.map(jnp_asarray, raw)
        elif self.recognizer == "attn":
            self.params = self._ocr.init_attn_params(
                jax.random.key(11), self.attn_cfg
            )
        else:
            self.params = self._ocr.init_params(jax.random.key(11), self.cfg)

    def unload(self) -> None:
        self.params = None

    def prepare(self) -> None:
        self.load()
        for bucket in self.batch_ladder:
            strips = np.zeros(
                (bucket, self.cfg.height, self.cfg.max_width), np.float32
            )
            if self.recognizer == "attn":
                self._ocr.attn_read_jit(self.params, self.attn_cfg, strips)
            else:
                self._ocr.recognize_jit(self.params, self.cfg, strips)

    def predict(self, inputs: Sequence[PredictionInput]) -> list[Any]:
        from PIL import Image

        self.load()
        outputs: list[Any] = [None] * len(inputs)
        strips, owners = [], []
        metas: list[dict] = []
        for i, inp in enumerate(inputs):
            if inp.file is None:
                outputs[i] = SlotError("input", "OCR requires an image file").to_slot()
                continue
            try:
                with Image.open(io.BytesIO(inp.file)) as im:
                    gray = np.asarray(im.convert("L"))
            except Exception as exc:
                outputs[i] = SlotError("input", f"Undecodable image: {exc}").to_slot()
                continue
            boxes = self._ocr.segment_lines(gray)
            metas.append({"pos": i, "lines": len(boxes)})
            for box in boxes:
                strips.append(self._ocr.prepare_strip(gray, box, self.cfg))
                owners.append(i)
            if not boxes:
                outputs[i] = {"text": "", "confidence": 0.0, "language": None}
        if strips:
            batch = np.stack(strips)
            bucket = batching.bucket_for(len(strips), self.batch_ladder)
            padded, _ = batching.pad_batch(batch, bucket)
            if self.recognizer == "attn":
                toks, lens, conf = self._ocr.attn_read_jit(
                    self.params, self.attn_cfg, padded
                )
                toks = np.asarray(toks)[: len(strips)]
                lens = np.asarray(lens)[: len(strips)]
                conf = np.asarray(conf)[: len(strips)]
                texts = [
                    self._ocr.attn_collapse(
                        toks[j], int(lens[j]), self.cfg.charset
                    )
                    for j in range(len(strips))
                ]
            else:
                ids, conf = self._ocr.recognize_jit(
                    self.params, self.cfg, padded
                )
                ids = np.asarray(ids)[: len(strips)]
                conf = np.asarray(conf)[: len(strips)]
                texts = [
                    self._ocr.ctc_collapse(ids[j], self.cfg.charset)
                    for j in range(len(strips))
                ]
            per_image: dict[int, list[tuple[str, float]]] = {}
            for j, owner in enumerate(owners):
                per_image.setdefault(owner, []).append(
                    (texts[j], float(conf[j]))
                )
            for owner, lines in per_image.items():
                kept = [
                    (t, c) for t, c in lines if c >= self.min_confidence and t
                ]
                outputs[owner] = {
                    "text": "\n".join(t for t, _ in kept),
                    "confidence": float(np.mean([c for _, c in kept])) if kept else 0.0,
                    "language": None,
                }
        return outputs


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


# ---------------------------------------------------------------------------
# Fixture impls — the reference's behavior-probe zoo (SURVEY.md §4), used by
# the manager/API tests exactly as the reference uses its fake workers.
# ---------------------------------------------------------------------------


class EchoImpl(InferenceModel):
    def __init__(self, **kwargs: Any):
        self.kwargs = kwargs
        self.loaded = False

    @classmethod
    def name(cls) -> str:
        return "echo_impl"

    def load(self) -> None:
        self.loaded = True

    def unload(self) -> None:
        self.loaded = False

    def predict(self, inputs):
        return [
            {"echo": inp.data, "file_len": len(inp.file) if inp.file else 0}
            for inp in inputs
        ]


class BatchSizeImpl(InferenceModel):
    """Reports the batch size it observed (batching-dynamics tests)."""

    def __init__(self, **_: Any):
        pass

    @classmethod
    def name(cls) -> str:
        return "batchsize_impl"

    def load(self) -> None:
        pass

    def unload(self) -> None:
        pass

    def predict(self, inputs):
        return [{"observed_batch": len(inputs)} for _ in inputs]


class OomImpl(InferenceModel):
    """Raises a device-OOM-shaped error for batches above ``oom_above`` —
    exercises the dispatch layer's batch-halving retry (the reference's
    run_with_oom_retry, impl/utils.py)."""

    def __init__(self, oom_above: int = 2, **_: Any):
        self.oom_above = oom_above
        self.calls: list[int] = []

    @classmethod
    def name(cls) -> str:
        return "oom_impl"

    def load(self) -> None:
        pass

    def unload(self) -> None:
        pass

    def predict(self, inputs):
        self.calls.append(len(inputs))
        if len(inputs) > self.oom_above:
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory allocating 9999 bytes"
            )
        return [{"n": len(inputs)} for _ in inputs]


class FailBatchImpl(InferenceModel):
    """Fails any merged batch (>1 input) — exercises the per-request
    fallback (dispatch.rs:28-35)."""

    def __init__(self, **_: Any):
        pass

    @classmethod
    def name(cls) -> str:
        return "failbatch_impl"

    def load(self) -> None:
        pass

    def unload(self) -> None:
        pass

    def predict(self, inputs):
        if len(inputs) > 1:
            raise RuntimeError("merged batch refused")
        return [{"ok": True} for _ in inputs]


class ErrorSlotImpl(InferenceModel):
    """Emits typed error slots on demand: data {"fail": "input"|"transient"}."""

    def __init__(self, **_: Any):
        pass

    @classmethod
    def name(cls) -> str:
        return "errorslot_impl"

    def load(self) -> None:
        pass

    def unload(self) -> None:
        pass

    def predict(self, inputs):
        out = []
        for inp in inputs:
            fail = (inp.data or {}).get("fail") if isinstance(inp.data, dict) else None
            if fail:
                out.append(SlotError(fail, f"requested {fail} failure").to_slot())
            else:
                out.append({"ok": True})
        return out


class SlowImpl(InferenceModel):
    def __init__(self, delay: float = 0.2, **_: Any):
        self.delay = delay

    @classmethod
    def name(cls) -> str:
        return "slow_impl"

    def load(self) -> None:
        pass

    def unload(self) -> None:
        pass

    def predict(self, inputs):
        time.sleep(self.delay)
        return [{"ok": True} for _ in inputs]


class BrokenLoadImpl(InferenceModel):
    def __init__(self, **_: Any):
        pass

    @classmethod
    def name(cls) -> str:
        return "broken_impl"

    def load(self) -> None:
        raise RuntimeError("deliberately broken load")

    def unload(self) -> None:
        pass

    def predict(self, inputs):
        return []


class LoadCountImpl(InferenceModel):
    """Class-level load()/prepare() call counters — proves prewarm-loop
    behavior (a warmed model's first predict must show NO load/compile
    stall, i.e. no additional load call)."""

    loads = 0
    prepares = 0

    def __init__(self, **_: Any):
        pass

    @classmethod
    def name(cls) -> str:
        return "loadcount_impl"

    @classmethod
    def reset_counters(cls) -> None:
        cls.loads = 0
        cls.prepares = 0

    def load(self) -> None:
        type(self).loads += 1

    def prepare(self) -> None:
        type(self).prepares += 1

    def unload(self) -> None:
        pass

    def predict(self, inputs):
        return [{"ok": True} for _ in inputs]


IMPL_INDEX: dict[str, type[InferenceModel]] = {
    cls.name(): cls
    for cls in [
        ClipImpl,
        TextEmbedImpl,
        TaggerImpl,
        WhisperImpl,
        ClapImpl,
        CaptionerImpl,
        VlmTaggerImpl,
        Md5LookupImpl,
        OcrImpl,
        ApiEmbedImpl,
        TagApiImpl,
        EchoImpl,
        BatchSizeImpl,
        FailBatchImpl,
        OomImpl,
        ErrorSlotImpl,
        SlowImpl,
        BrokenLoadImpl,
        LoadCountImpl,
    ]
}
