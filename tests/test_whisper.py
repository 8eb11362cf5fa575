"""Whisper architecture + audio impl tests."""

import io
import wave

import jax
import numpy as np

from panoptikon_tpu.models import whisper
from panoptikon_tpu.models.base import PredictionInput, is_error_slot
from panoptikon_tpu.models.impls import ClapImpl, WhisperImpl


def make_wav(seconds=1.0, rate=16000, freq=440.0, channels=1, width=2) -> bytes:
    t = np.linspace(0, seconds, int(rate * seconds), endpoint=False)
    pcm = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    if channels == 2:
        pcm = np.stack([pcm, pcm], axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


class TestMel:
    def test_shape_and_normalization(self):
        pcm = np.random.default_rng(0).normal(size=16000).astype(np.float32) * 0.1
        mel = whisper.log_mel_spectrogram(pcm)
        assert mel.shape == (80, 3000)  # 30s padded
        assert mel.max() <= 3.0 and mel.min() >= -3.0

    def test_filterbank_covers_spectrum(self):
        fb = whisper.mel_filterbank(80)
        assert fb.shape == (80, 201)
        assert (fb.sum(axis=1) > 0).all()


class TestDecode:
    def test_greedy_decode_shapes(self):
        cfg = whisper.CONFIGS["test-tiny"]
        params = whisper.init_params(jax.random.key(0), cfg)
        mel = np.random.default_rng(1).normal(size=(2, cfg.n_mels, 128)).astype(np.float32)
        tokens, lengths, logprob = whisper.greedy_decode(
            params, cfg, mel, max_tokens=8
        )
        assert tokens.shape == (2, 8)
        assert np.asarray(tokens)[:, 0].tolist() == [cfg.sot, cfg.sot]
        assert np.isfinite(np.asarray(logprob)).all()

    def test_decode_deterministic(self):
        cfg = whisper.CONFIGS["test-tiny"]
        params = whisper.init_params(jax.random.key(0), cfg)
        mel = np.random.default_rng(2).normal(size=(1, cfg.n_mels, 64)).astype(np.float32)
        a = np.asarray(whisper.greedy_decode(params, cfg, mel, max_tokens=8)[0])
        b = np.asarray(whisper.greedy_decode(params, cfg, mel, max_tokens=8)[0])
        np.testing.assert_array_equal(a, b)


class TestWhisperImpl:
    def test_wav_to_text_output(self):
        impl = WhisperImpl(model_arch="test-tiny", max_tokens=8)
        out = impl.predict([PredictionInput(file=make_wav())])
        assert isinstance(out[0], dict) and "text" in out[0]
        assert out[0]["language"] == "en"
        assert 0 <= out[0]["confidence"] <= 1.0

    def test_stereo_and_resample(self):
        impl = WhisperImpl(model_arch="test-tiny", max_tokens=8)
        out = impl.predict(
            [PredictionInput(file=make_wav(rate=44100, channels=2))]
        )
        assert "text" in out[0]

    def test_bad_audio_is_input_slot(self):
        impl = WhisperImpl(model_arch="test-tiny")
        out = impl.predict([PredictionInput(file=b"not a wav")])
        assert is_error_slot(out[0])

    def test_missing_file_is_input_slot(self):
        impl = WhisperImpl(model_arch="test-tiny")
        out = impl.predict([PredictionInput(data={"x": 1})])
        assert is_error_slot(out[0])


class TestClapImpl:
    def test_audio_embedding_normalized(self):
        impl = ClapImpl(model_arch="test-tiny")
        out = impl.predict([PredictionInput(file=make_wav())])
        from panoptikon_tpu.utils import npy

        vec = npy.parse_npy_embedding(out[0])
        assert vec.shape == (32,)
        assert abs(np.linalg.norm(vec) - 1.0) < 1e-3

    def test_different_audio_different_embedding(self):
        impl = ClapImpl(model_arch="test-tiny")
        a = impl.predict([PredictionInput(file=make_wav(freq=440))])
        b = impl.predict([PredictionInput(file=make_wav(freq=1200))])
        from panoptikon_tpu.utils import npy

        va, vb = npy.parse_npy_embedding(a[0]), npy.parse_npy_embedding(b[0])
        assert not np.allclose(va, vb)
