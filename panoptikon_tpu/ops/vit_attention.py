"""VMEM-resident multi-head attention — the model zoo's attention kernel.

Why this kernel exists (measured on the target chip, tools/attn_decomp_probe.py
and tools/attn_inprogram_ab.py): at ViT-L/14 shapes (B=256, H=16, N=257,
D=64) XLA materializes the (B, H, N, N) logits/probs surface in HBM and
runs softmax as multiple padded passes over it — the attention core costs
~196 ms of a 397 ms int8-static embed batch while its GEMMs are <1 ms of
MXU time. Keeping the per-(batch, head-group, q-block) working set —
q/k/v slices plus one logits tile at a time — in VMEM removes every HBM
round-trip beyond reading q/k/v once and writing the output once.
Measured in-program: ViT-L/14 int8-static embed 392 → 220 ms
(652 → 1,161 img/s single-batch, with :func:`mha_qkv`); whisper-base
encode (N=1500, q-blocked) +60%; mpnet-base text embeds (key-masked)
+36%. Serves self-, causal-, key-masked and cross-attention (N_q ≠ N_kv)
through one kernel.

Form notes (each alternative was measured and lost):
- Heads ride the LANE axis: blocks are (1, N, hps·D) slices of the
  natural (B, N, H·D) activation layout, and each head is a 64-lane
  in-VMEM slice. The (B, N, H, D)-blocked form with an in-kernel
  ``swapaxes`` relayout ran 1.5× SLOWER than XLA (bf16 relayouts at these
  tile shapes are expensive: 441 ms vs 392 baseline).
- Logits are computed TRANSPOSED (``Kh @ Qhᵀ`` → (N_k, N_q)) so softmax
  reduces over SUBLANES and the ``probs ᵀ@ V`` contraction needs no
  transpose: both contract over axis 0.
- The head loop is unrolled Python; per-head ops are 2D only — Mosaic's
  batched ``tpu.matmul`` requires batch dims at position 0 and pays a
  relayout to get there.

Layout: (B, N, H·D) in/out — exactly what the towers produce from the
fused qkv GEMM split, so no HBM transposes are introduced on either side.

Reference anchor: the reference runs torch SDPA inside its CLIP/tagger
workers (python/inferio/impl/clip.py); this is the TPU-native equivalent
of that fused path, built for the MXU/VPU/VMEM geometry instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


_VMEM_BUDGET = 12 * 1024 * 1024


def _plan_blocks(num_heads: int, head_dim: int, n_q: int,
                 n_kv: int) -> tuple[int, int]:
    """(heads_per_step, q_block) keeping the per-step working set under
    VMEM.

    Legality (Mosaic block constraints on the (1, rows, hps·D) blocks):
    the minor block dim hps·D must be a multiple of 128 or cover the
    whole H·D axis; the q/out row-block must be a multiple of 8 or the
    full N_q. VMEM sizing uses the PADDED (8,128)-tiled f32 logits tile
    (N_kv sublanes × q_block lanes) with a ~3× multiplier for the softmax
    temporaries (hps=16 at N=257 demanded 17.3 MB of scoped VMEM and was
    rejected by the compiler). Short sequences get the whole q axis in
    one step (the ViT fast path); long ones (whisper's N=1500 encoder)
    fall back to q-blocking — the full key axis always stays in-tile, so
    softmax never needs an online/carry form."""
    kv_sub = -(-n_kv // 8) * 8

    def fits(hps: int, qb: int) -> bool:
        tile = kv_sub * (-(-qb // 128) * 128) * 4 * 3
        blocks = (2 * n_kv + 2 * qb) * hps * head_dim * 2 * 2
        return tile + blocks <= _VMEM_BUDGET

    legal = [
        h for h in range(1, num_heads + 1)
        if num_heads % h == 0
        and (h == num_heads or (h * head_dim) % 128 == 0)
    ]
    for hps in sorted(legal, reverse=True):
        if fits(hps, n_q):
            return hps, n_q
    for qb in (512, 256, 128, 64, 32, 8):
        if qb >= n_q:
            continue
        for hps in sorted(legal, reverse=True):
            if fits(hps, qb):
                return hps, qb
    return min(legal), 8


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, heads: int,
                 head_dim: int, scale: float, causal: bool, masked: bool):
    nq = q_ref.shape[1]   # this step's q-block rows
    nk = k_ref.shape[1]   # the FULL key axis (always in-tile)
    qoff = pl.program_id(2) * nq
    # Mosaic lowers sub-32 contractions via broadcast+reduce, and that
    # path emits a malformed bf16->f32 vector.broadcast (verification
    # error observed at (32,16)x(32,16) — whisper test-tiny). Tiny head
    # dims compute in f32; perf is irrelevant at those shapes.
    in_dtype = jnp.float32 if head_dim < 32 else None

    def rd(ref, h):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        x = ref[0, :, sl]
        return x.astype(in_dtype) if in_dtype else x

    def qk(h):
        # Transposed logits: (N_k, q_block); softmax reduces over sublanes.
        lt = jax.lax.dot_general(
            rd(k_ref, h), rd(q_ref, h), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            krow = jax.lax.broadcasted_iota(jnp.int32, (nk, nq), 0)
            qcol = jax.lax.broadcasted_iota(jnp.int32, (nk, nq), 1) + qoff
            lt = jnp.where(krow <= qcol, lt, -jnp.inf)
        if masked:
            # Key-padding mask: invalid keys are ROWS of the transposed
            # logits. Additive -1e9 (not -inf) is bit-parity with the
            # additive-bias fallback: a fully-masked row softmaxes to
            # uniform, never NaN.
            lt = jnp.where(m_ref[0] > 0, lt, lt - 1e9)
        return lt

    # Software-pipelined head loop, 2-deep lookahead: heads h+1/h+2's QKᵀ
    # MXU work is issued between head h's softmax (VPU) and AV (MXU), so
    # the units overlap across the otherwise-serial per-head chains —
    # measured 5.33 (serial) → 4.31 (1-deep) → 3.80 ms/call (2-deep) at
    # ViT-L/14 shapes (tools/attn_kernel_tune.py). Two logits tiles are
    # live at once (+1 padded tile of VMEM).
    lts = [qk(0)]
    if heads > 1:
        lts.append(qk(1))
    for h in range(heads):
        lt = lts.pop(0)
        m = jnp.max(lt, axis=0, keepdims=True)
        e = jnp.exp(lt - m)
        s = jnp.sum(e, axis=0, keepdims=True)
        vh = rd(v_ref, h)
        p = (e / s).astype(vh.dtype)
        if h + 2 < heads:
            lts.append(qk(h + 2))
        out = jax.lax.dot_general(
            p, vh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (q_block, D)
        sl = slice(h * head_dim, (h + 1) * head_dim)
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "heads_per_step", "q_block", "interpret"),
)
def mha(q, k, v, *, causal: bool = False, key_mask=None,
        heads_per_step: int | None = None, q_block: int | None = None,
        interpret: bool = False):
    """Fused multi-head attention.

    q (B, N_q, H, D); k, v (B, N_kv, H, D) — self-attention when
    N_q == N_kv, cross-attention otherwise (whisper's decoder reads the
    audio encoding). Returns (B, N_q, H, D).

    Softmax runs in f32 regardless of input dtype; probs are cast to the
    value dtype for the AV matmul (bf16 in production — the MXU's native
    rate; XLA's SDPA does the same). The head axis is blocked by
    ``heads_per_step`` and, for long sequences whose (N_kv, N_q) logits
    tile exceeds VMEM, the q axis by ``q_block`` (both auto-planned; the
    key axis always stays whole in-tile so softmax needs no online
    carry). Sequence lengths are arbitrary — Mosaic masks tile padding.
    ``key_mask`` (B, N_kv) truthy-for-valid applies a −1e9 key-padding
    bias (bit-parity with an additive bias mask, the BERT convention).
    ``causal`` requires N_q == N_kv.
    """
    b, n_q, h, d = q.shape
    n_kv = k.shape[1]
    if causal:
        assert n_q == n_kv, (n_q, n_kv)
    auto_hps, auto_qb = _plan_blocks(h, d, n_q, n_kv)
    hps = heads_per_step or auto_hps
    qb = q_block or auto_qb
    assert h % hps == 0, (h, hps)
    scale = float(d) ** -0.5
    masked = key_mask is not None
    kernel = functools.partial(_attn_kernel, heads=hps, head_dim=d,
                               scale=scale, causal=causal, masked=masked)
    qblock = pl.BlockSpec((1, qb, hps * d), lambda bi, gi, qi: (bi, qi, gi))
    kvblock = pl.BlockSpec((1, n_kv, hps * d), lambda bi, gi, qi: (bi, 0, gi))
    mask_block = pl.BlockSpec((1, n_kv, 1), lambda bi, gi, qi: (bi, 0, 0))
    if key_mask is None:
        m = jnp.ones((b, n_kv, 1), jnp.float32)
    else:
        m = key_mask.astype(jnp.float32).reshape(b, n_kv, 1)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // hps, -(-n_q // qb)),
        in_specs=[qblock, kvblock, kvblock, mask_block],
        out_specs=qblock,
        out_shape=jax.ShapeDtypeStruct((b, n_q, h * d), q.dtype),
        interpret=interpret,
    )(q.reshape(b, n_q, h * d), k.reshape(b, n_kv, h * d),
      v.reshape(b, n_kv, h * d), m)
    return out.reshape(b, n_q, h, d)


def qkv_fused_fits(heads: int, head_dim: int, n: int) -> bool:
    """Whether :func:`mha_qkv`'s per-step working set fits scoped VMEM:
    the unsplit qkv block (double-buffered bf16) + output + two live
    logits tiles. ViT-L/14 (16×64, N=257) fits; ViT-H-14-378 (16×80,
    N=730) demands 17.8 MB and must take the q-blocked split path."""
    hd = heads * head_dim
    n_sub = -(-n // 8) * 8
    n_lane = -(-n // 128) * 128
    qkv_block = n * 3 * hd * 2 * 2
    out_block = n * hd * 2 * 2
    logits = 3 * n_sub * n_lane * 4
    return qkv_block + out_block + logits <= 14 * 1024 * 1024


def _attn_qkv_kernel(qkv_ref, s_ref, o_ref, *, heads: int, head_dim: int,
                     scale: float, causal: bool, quantize_out: bool):
    n = qkv_ref.shape[1]
    hd = heads * head_dim
    in_dtype = jnp.float32 if head_dim < 32 else None  # see _attn_kernel

    def rd(part, h):
        sl = slice(part * hd + h * head_dim, part * hd + (h + 1) * head_dim)
        x = qkv_ref[0, :, sl]
        return x.astype(in_dtype) if in_dtype else x

    def qk(h):
        lt = jax.lax.dot_general(
            rd(1, h), rd(0, h),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            krow = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            qcol = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            lt = jnp.where(krow <= qcol, lt, -jnp.inf)
        return lt

    lts = [qk(0)]
    if heads > 1:
        lts.append(qk(1))
    for h in range(heads):
        lt = lts.pop(0)
        m = jnp.max(lt, axis=0, keepdims=True)
        e = jnp.exp(lt - m)
        s = jnp.sum(e, axis=0, keepdims=True)
        vh = rd(2, h)
        p = (e / s).astype(vh.dtype)
        if h + 2 < heads:
            lts.append(qk(h + 2))
        out = jax.lax.dot_general(
            p, vh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N_q, D)
        sl = slice(h * head_dim, (h + 1) * head_dim)
        if quantize_out:
            sx = jnp.maximum(s_ref[0, 0] / 127.0, 1e-12)
            o_ref[0, :, sl] = jnp.clip(
                jnp.round(out / sx), -127, 127
            ).astype(jnp.int8)
        else:
            o_ref[0, :, sl] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "causal", "interpret"),
)
def mha_qkv(qkv, *, heads: int, causal: bool = False,
            out_scale=None, interpret: bool = False):
    """Fused attention over the UNSPLIT qkv GEMM output.

    qkv: (B, N, 3·H·D) — q | k | v along the lane axis, exactly as the
    fused qkv projection emits it. Reading it as one pallas input removes
    the three ``jnp.split`` copies XLA otherwise materializes to feed the
    kernel (~400 MB/layer at ViT-L/14 batch 256). With ``out_scale``
    (a static calibrated absmax), the kernel also quantizes the output to
    int8 in-register — the next (out-projection) GEMM's input quant —
    instead of XLA running a separate read→write pass.

    All heads run in one grid step per batch row (two live logits tiles,
    2-deep pipelined as in :func:`mha`); use :func:`mha` for shapes where
    head blocking is required.
    """
    b, n, w3 = qkv.shape
    w = w3 // 3
    d = w // heads
    quantize_out = out_scale is not None
    kernel = functools.partial(
        _attn_qkv_kernel, heads=heads, head_dim=d,
        scale=float(d) ** -0.5, causal=causal, quantize_out=quantize_out)
    s = jnp.asarray(
        1.0 if out_scale is None else out_scale, jnp.float32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, w3), lambda bi: (bi, 0, 0)),
            pl.BlockSpec((1, 1), lambda bi: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, w), lambda bi: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, n, w), jnp.int8 if quantize_out else qkv.dtype),
        interpret=interpret,
    )(qkv, s)


def attention(q, k, v, *, causal: bool = False):
    """Dispatch: the Pallas kernel on TPU, XLA's fused path elsewhere.

    The trace-time backend decides — CPU test runs (and the virtual-mesh
    multichip dryrun) take the XLA path; the kernel itself is covered by
    interpret-mode equivalence tests (tests/test_vit_attention.py).
    """
    if jax.default_backend() == "tpu":
        return mha(q, k, v, causal=causal)
    return jax.nn.dot_product_attention(q, k, v, is_causal=causal)
