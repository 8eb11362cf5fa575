"""Equivalence tests for the VMEM-resident attention kernel
(ops/vit_attention.py) against XLA's reference attention, in Pallas
interpret mode (the TPU lowering itself is exercised by the embed bench
and its fidelity gate on real hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from panoptikon_tpu.ops import vit_attention


def _ref(q, k, v, causal):
    return jax.nn.dot_product_attention(q, k, v, is_causal=causal)


@pytest.mark.parametrize(
    "b,n,h,d,causal",
    [
        (2, 257, 16, 64, False),  # ViT-L/14 vision tower shape (odd N)
        (2, 77, 8, 64, True),     # CLIP text tower (causal)
        (1, 50, 12, 64, False),   # ViT-B/32 vision tower
        (3, 16, 4, 32, True),
    ],
)
def test_matches_xla_attention(b, n, h, d, causal):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (b, n, h, d), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), dtype=jnp.float32)
    got = vit_attention.mha(q, k, v, causal=causal, interpret=True)
    want = _ref(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_inputs_f32_softmax():
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (2, 33, 4, 64), dtype=jnp.bfloat16)
    k = jax.random.normal(ks[1], (2, 33, 4, 64), dtype=jnp.bfloat16)
    v = jax.random.normal(ks[2], (2, 33, 4, 64), dtype=jnp.bfloat16)
    got = vit_attention.mha(q, k, v, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _ref(q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), False)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.02, atol=0.02
    )


def test_head_group_blocking_invariant():
    # Result must not depend on the heads_per_step blocking choice.
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (1, 29, 8, 32), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (1, 29, 8, 32), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (1, 29, 8, 32), dtype=jnp.float32)
    full = vit_attention.mha(q, k, v, heads_per_step=8, interpret=True)
    for hps in (1, 2, 4):
        part = vit_attention.mha(q, k, v, heads_per_step=hps, interpret=True)
        np.testing.assert_allclose(np.asarray(part), np.asarray(full),
                                   rtol=1e-6, atol=1e-6)


def test_block_planner():
    # ViT-L/14 vision tower: all 16 heads, whole q axis in one step.
    assert vit_attention._plan_blocks(16, 64, 257, 257) == (16, 257)
    # ViT-B towers: 12 heads x 64d.
    assert vit_attention._plan_blocks(12, 64, 257, 257) == (12, 257)
    assert vit_attention._plan_blocks(8, 64, 77, 77) == (8, 77)
    # Whisper encoder (8 heads x 64d, N=1500): q-blocked.
    hps, qb = vit_attention._plan_blocks(8, 64, 1500, 1500)
    assert qb < 1500 and hps >= 2
    # Huge N still plans something legal under VMEM.
    hps, qb = vit_attention._plan_blocks(16, 64, 4096, 4096)
    assert qb <= 256 and (hps * 64) % 128 == 0


def test_dispatch_takes_xla_path_off_tpu():
    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (1, 9, 2, 16), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (1, 9, 2, 16), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (1, 9, 2, 16), dtype=jnp.float32)
    got = vit_attention.attention(q, k, v, causal=True)
    want = _ref(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("causal", [False, True])
def test_mha_qkv_matches_split_path(causal):
    b, n, h, d = 2, 33, 4, 64
    qkv = jax.random.normal(jax.random.key(5), (b, n, 3 * h * d),
                            dtype=jnp.float32)
    got = vit_attention.mha_qkv(qkv, heads=h, causal=causal, interpret=True)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want = _ref(q.reshape(b, n, h, d), k.reshape(b, n, h, d),
                v.reshape(b, n, h, d), causal).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_mha_qkv_int8_out():
    b, n, h, d = 1, 17, 2, 32
    qkv = jax.random.normal(jax.random.key(6), (b, n, 3 * h * d),
                            dtype=jnp.float32)
    scale = jnp.float32(0.9)
    got = vit_attention.mha_qkv(qkv, heads=h, out_scale=scale,
                                interpret=True)
    assert got.dtype == jnp.int8
    out = vit_attention.mha_qkv(qkv, heads=h, interpret=True)
    sx = jnp.maximum(scale / 127.0, 1e-12)
    want = jnp.clip(jnp.round(out.astype(jnp.float32) / sx), -127,
                    127).astype(jnp.int8)
    diff = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert diff.max() <= 1


def test_key_mask_matches_additive_bias():
    # -1e9 key-padding inside the kernel must be bit-parity with the
    # additive-bias XLA form text_embed uses as its fallback.
    b, n, h, d = 2, 21, 4, 32
    ks = jax.random.split(jax.random.key(7), 4)
    q = jax.random.normal(ks[0], (b, n, h, d), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), dtype=jnp.float32)
    mask = jax.random.bernoulli(ks[3], 0.7, (b, n))
    mask = mask.at[:, 0].set(True)  # at least one valid key per row
    got = vit_attention.mha(q, k, v, key_mask=mask, interpret=True)
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
    want = jax.nn.dot_product_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_q_blocked_matches_single_block():
    # Force q-blocking and compare against the one-block form (whisper
    # long-N path); non-divisible N_q exercises the OOB-masked tail.
    b, n, h, d = 1, 70, 4, 32
    ks = jax.random.split(jax.random.key(8), 3)
    q = jax.random.normal(ks[0], (b, n, h, d), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), dtype=jnp.float32)
    full = vit_attention.mha(q, k, v, q_block=70, interpret=True)
    for qb in (32, 8):
        part = vit_attention.mha(q, k, v, q_block=qb, interpret=True)
        np.testing.assert_allclose(np.asarray(part), np.asarray(full),
                                   rtol=1e-6, atol=1e-6)
    # Causal must respect GLOBAL q positions across blocks.
    fullc = vit_attention.mha(q, k, v, causal=True, q_block=70,
                              interpret=True)
    partc = vit_attention.mha(q, k, v, causal=True, q_block=32,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(partc), np.asarray(fullc),
                               rtol=1e-6, atol=1e-6)
    want = _ref(q, k, v, True)
    np.testing.assert_allclose(np.asarray(partc), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_cross_attention_distinct_kv_length():
    # Whisper decoder cross-attention: N_q (tokens) != N_kv (audio ctx).
    b, nq, nkv, h, d = 2, 12, 40, 4, 32
    ks = jax.random.split(jax.random.key(9), 3)
    q = jax.random.normal(ks[0], (b, nq, h, d), dtype=jnp.float32)
    k = jax.random.normal(ks[1], (b, nkv, h, d), dtype=jnp.float32)
    v = jax.random.normal(ks[2], (b, nkv, h, d), dtype=jnp.float32)
    got = vit_attention.mha(q, k, v, interpret=True)
    want = _ref(q, k, v, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_qkv_fused_fit_planner():
    # ViT-L/14 and ViT-B take the unsplit-qkv fast path; ViT-H-14-378's
    # block demands 17.8 MB of scoped VMEM (measured compiler rejection)
    # and must fall back to the q-blocked split kernel.
    assert vit_attention.qkv_fused_fits(16, 64, 257) is True
    assert vit_attention.qkv_fused_fits(12, 64, 50) is True
    assert vit_attention.qkv_fused_fits(16, 80, 730) is False
