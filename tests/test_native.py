"""Native C++ codec: build + bit-parity with the NumPy reference."""

import numpy as np
import pytest

from panoptikon_tpu import native
from panoptikon_tpu.ops import codec
from panoptikon_tpu.utils import splitmix


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.ensure_built():
        pytest.skip("native toolchain unavailable")


def test_absmax_parity():
    rng = np.random.default_rng(0)
    data = rng.normal(size=4096).astype(np.float32) * 7
    data[17] = np.nan
    assert native.absmax(data) == codec.corpus_absmax(data)


def test_quantize_bit_parity():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(128, 64)).astype(np.float32) * 3
    data[0, :5] = [0.5, 1.5, -2.5, np.nan, 1e9]
    for scale in (1.0, 0.01, 123.0):
        np.testing.assert_array_equal(
            native.quantize_int8(data, scale), codec.quantize_int8(data, scale)
        )


def test_dequantize_parity():
    codes = np.random.default_rng(2).integers(-128, 128, size=(16, 32), dtype=np.int8)
    np.testing.assert_array_equal(
        native.dequantize_int8(codes, 0.02), codec.dequantize_int8(codes, 0.02)
    )


def test_row_sumsq_parity():
    codes = np.random.default_rng(3).integers(-128, 128, size=(64, 96), dtype=np.int8)
    expected = np.sum(codes.astype(np.int32) ** 2, axis=1)
    np.testing.assert_array_equal(native.row_sumsq_int8(codes), expected)


def test_pk_mix_parity():
    ids = np.array([0, 1, 42, 2**40, -1], dtype=np.int64)
    for seed in (0, 7, -3, 2**52):
        np.testing.assert_array_equal(
            native.pk_mix_array(ids, seed), splitmix.pk_mix_array(ids, seed)
        )
