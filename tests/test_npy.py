"""npy codec tests — mirror the reference's fixture matrix
(panoptikon/tests/fixtures/npy: f16/f32/f64, C/F order, big-endian, bool/int)."""

import io

import numpy as np
import pytest

from panoptikon_tpu.utils import npy


def roundtrip_via_numpy(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


@pytest.mark.parametrize(
    "dtype", ["<f2", "<f4", "<f8", ">f4", "<i4", "<u2", ">i8", "|b1", "<i1"]
)
def test_parse_dtypes(dtype):
    arr = (np.arange(8) % 2 if dtype == "|b1" else np.arange(8)).astype(dtype)
    parsed = npy.parse_npy_embedding(roundtrip_via_numpy(arr))
    np.testing.assert_allclose(parsed, arr.astype(np.float32))
    assert parsed.dtype == np.float32


def test_2d_takes_first_row():
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    parsed = npy.parse_npy_embedding(roundtrip_via_numpy(arr))
    np.testing.assert_array_equal(parsed, arr[0])


def test_fortran_order_first_row():
    arr = np.asfortranarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    parsed = npy.parse_npy_embedding(roundtrip_via_numpy(arr))
    np.testing.assert_array_equal(parsed, arr[0])


def test_matrix_keeps_all_rows():
    arr = np.random.default_rng(0).normal(size=(5, 16)).astype(np.float32)
    parsed = npy.parse_npy_matrix(roundtrip_via_numpy(arr))
    np.testing.assert_array_equal(parsed, arr)


def test_matrix_1d_becomes_row():
    arr = np.arange(7, dtype=np.float32)
    assert npy.parse_npy_matrix(roundtrip_via_numpy(arr)).shape == (1, 7)


def test_3d_rejected():
    arr = np.zeros((2, 2, 2), dtype=np.float32)
    with pytest.raises(npy.NpyError):
        npy.parse_npy_embedding(roundtrip_via_numpy(arr))


def test_truncated_rejected():
    buf = roundtrip_via_numpy(np.arange(100, dtype=np.float32))
    with pytest.raises(npy.NpyError):
        npy.parse_npy(buf[: len(buf) - 10])


def test_bad_magic_rejected():
    with pytest.raises(npy.NpyError):
        npy.parse_npy(b"NOTNUMPYxxxxxxxxxxxx")


def test_serialize_parse_roundtrip():
    for arr in [
        np.random.default_rng(1).normal(size=(3, 8)).astype(np.float32),
        np.arange(5, dtype=np.float32),
        np.arange(6, dtype=np.float16).reshape(2, 3),
    ]:
        out = npy.parse_npy(npy.serialize_npy(arr))
        np.testing.assert_array_equal(out, arr)
        # numpy itself must also accept our serialization.
        via_np = np.load(io.BytesIO(npy.serialize_npy(arr)))
        np.testing.assert_array_equal(via_np, arr)


def test_f32_blob_roundtrip():
    vec = np.random.default_rng(2).normal(size=64).astype(np.float32)
    blob = npy.f32_blob(vec)
    assert len(blob) == 256
    np.testing.assert_array_equal(npy.blob_f32(blob), vec)


def test_npy_v2_header():
    # Version 2.0 header: 4-byte length field.
    arr = np.arange(4, dtype=np.float32)
    buf = io.BytesIO()
    np.lib.format.write_array(buf, arr, version=(2, 0))
    np.testing.assert_array_equal(npy.parse_npy_embedding(buf.getvalue()), arr)
