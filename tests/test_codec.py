"""Int8 codec parity tests — mirror the reference codec's unit surface
(vector_quants.rs tests + docs/vector-int8-quant.md)."""

import numpy as np
import pytest

from panoptikon_tpu.ops import codec


class TestScale:
    def test_scale_from_absmax(self):
        assert codec.scale_from_absmax(127.0) == 1.0
        assert codec.scale_from_absmax(254.0) == 2.0
        assert codec.scale_from_absmax(1.0) == pytest.approx(1.0 / 127.0)

    def test_zero_corpus_yields_unit_scale(self):
        # Degenerate all-zero corpus → scale 1.0, never a division by zero.
        assert codec.scale_from_absmax(0.0) == 1.0
        assert codec.scale_from_absmax(-1.0) == 1.0
        assert codec.scale_from_absmax(float("nan")) == 1.0
        assert codec.scale_from_absmax(float("inf")) == 1.0

    def test_artifact_round_trip(self):
        for scale in [1.0, 0.007874, 123.456]:
            art = codec.scale_artifact(scale)
            assert len(art) == 4
            assert codec.artifact_scale(art) == pytest.approx(scale, rel=1e-6)

    def test_artifact_rejects_unusable(self):
        assert codec.artifact_scale(codec.scale_artifact(0.0)) is None
        assert codec.artifact_scale(codec.scale_artifact(-1.0)) is None
        assert codec.artifact_scale(codec.scale_artifact(float("nan"))) is None
        assert codec.artifact_scale(codec.scale_artifact(float("inf"))) is None
        assert codec.artifact_scale(b"\x00\x00") is None
        assert codec.artifact_scale(b"\x00" * 8) is None

    def test_absmax_exactly_on_127(self):
        # scale = absmax/127 puts the corpus absmax exactly on +127.
        vecs = np.array([[0.5, -3.25, 1.0]], dtype=np.float32)
        scale = codec.scale_from_absmax(codec.corpus_absmax(vecs))
        codes = codec.quantize_int8(vecs, scale)
        assert codes[0, 1] == -127


class TestQuantize:
    def test_round_ties_even(self):
        # 0.5/s and 1.5/s with s=1: rint rounds half to even → 0 and 2.
        codes = codec.quantize_int8(np.array([0.5, 1.5, 2.5, -0.5, -1.5]), 1.0)
        np.testing.assert_array_equal(codes, [0, 2, 2, 0, -2])

    def test_clamp(self):
        codes = codec.quantize_int8(np.array([1000.0, -1000.0]), 1.0)
        np.testing.assert_array_equal(codes, [127, -128])

    def test_nan_becomes_zero(self):
        # Matches Rust's saturating `NaN as i8` = 0.
        codes = codec.quantize_int8(np.array([np.nan, 1.0]), 1.0)
        np.testing.assert_array_equal(codes, [0, 1])

    def test_query_quant_same_path(self):
        q = np.random.default_rng(0).normal(size=512).astype(np.float32)
        np.testing.assert_array_equal(
            codec.compute_query_quant(q, 0.01), codec.quantize_int8(q, 0.01)
        )

    def test_round_trip_error_bounded(self):
        rng = np.random.default_rng(1)
        vecs = rng.normal(size=(64, 128)).astype(np.float32)
        scale = codec.scale_from_absmax(codec.corpus_absmax(vecs))
        deq = codec.dequantize_int8(codec.quantize_int8(vecs, scale), scale)
        assert np.max(np.abs(deq - vecs)) <= scale / 2 + 1e-7


class TestJaxParity:
    def test_bit_identical_to_numpy(self):
        rng = np.random.default_rng(2)
        vecs = rng.normal(size=(256, 64)).astype(np.float32) * 3.7
        # Include exact tie points and extremes.
        vecs[0, :4] = [0.5, 1.5, -2.5, 127.5]
        scale = 1.0
        host = codec.quantize_int8(vecs, scale)
        dev = np.asarray(codec.quantize_int8_jax(vecs, scale))
        np.testing.assert_array_equal(host, dev)

    def test_jax_nan_and_clamp(self):
        vecs = np.array([np.nan, np.inf, -np.inf, 0.0], dtype=np.float32)
        dev = np.asarray(codec.quantize_int8_jax(vecs, 1.0))
        np.testing.assert_array_equal(dev, [0, 127, -128, 0])


class TestFaultFrugalPaths:
    """Chunked/masked/in-place variants added for the VMM-backed host
    (fresh pages fault in at ~75 MB/s, so full-size temporaries are the
    dominant cost of a 1M-row index build). Every variant must be
    bit-identical to the plain path."""

    def test_absmax_masked_matches_fancy_index(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(1000, 32)).astype(np.float32)
        x[3, 4] = np.nan
        valid = np.ones(1000, bool)
        valid[::7] = False
        ref = float(np.nanmax(np.abs(x[valid]), initial=0.0))
        assert codec.corpus_absmax(x, valid=valid) == ref

    def test_absmax_masked_all_invalid_is_zero(self):
        x = np.ones((8, 4), np.float32)
        assert codec.corpus_absmax(x, valid=np.zeros(8, bool)) == 0.0

    def test_absmax_chunked_path_matches(self):
        # Force the chunked branch with a >32 MB corpus.
        rng = np.random.default_rng(6)
        x = rng.normal(size=(70_000, 128)).astype(np.float32)
        assert x.nbytes > (32 << 20)
        assert codec.corpus_absmax(x) == float(np.nanmax(np.abs(x)))

    def test_quantize_out_param_bit_identical(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(512, 64)).astype(np.float32) * 2.3
        x[0, 0] = np.nan
        plain = codec.quantize_int8(x, 0.013)
        out = np.empty_like(plain)
        ret = codec.quantize_int8(x, 0.013, out=out)
        assert ret is out
        np.testing.assert_array_equal(plain, out)

    def test_quantize_out_param_empty(self):
        out = np.empty((0, 16), np.int8)
        ret = codec.quantize_int8(np.empty((0, 16), np.float32), 1.0, out=out)
        assert ret is out
