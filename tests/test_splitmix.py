"""splitmix64 mixer tests (reference: db/sql_functions.rs pk_mix)."""

import numpy as np

from panoptikon_tpu.utils import splitmix


def test_mix64_known_vector():
    # splitmix64's first output from state 0 (published test vector).
    assert splitmix.mix64(0) == 0xE220A8397B1DCDAF


def test_pk_mix_deterministic_and_signed():
    v1 = splitmix.pk_mix(42, 7)
    assert v1 == splitmix.pk_mix(42, 7)
    assert -(1 << 63) <= v1 < (1 << 63)


def test_adjacent_seeds_uncorrelated():
    ids = np.arange(1000, dtype=np.int64)
    k1 = splitmix.pk_mix_array(ids, 1)
    k2 = splitmix.pk_mix_array(ids, 2)
    # Orderings from adjacent seeds should share almost nothing.
    o1, o2 = np.argsort(k1), np.argsort(k2)
    agreement = np.mean(o1 == o2)
    assert agreement < 0.01


def test_array_matches_scalar():
    ids = np.array([0, 1, 2, 12345, 2**40, 2**63 - 1], dtype=np.uint64)
    for seed in [0, 1, -5, 2**52]:
        arr = splitmix.pk_mix_array(ids, seed)
        expected = [splitmix.pk_mix(int(i), seed) for i in ids]
        np.testing.assert_array_equal(arr, np.array(expected, dtype=np.int64))


def test_negative_id_wraps_like_rust():
    # Rust casts i64 → u64 two's-complement; Python path must agree.
    assert splitmix.pk_mix(-1, 3) == splitmix.pk_mix((1 << 64) - 1, 3)
