"""Int8 vector codec with exact reference semantics.

The reference stores every embedding space as int8 codes under one frozen
per-space scale (global symmetric absmax quantization); the codec here is
byte-compatible with the reference implementation
(``panoptikon/src/db/vector_quants.rs:1446-1511``):

- ``scale = absmax / 127`` puts the corpus absmax exactly on +127; a
  degenerate all-zero (or non-finite-absmax) corpus yields scale 1.0 so
  every code is zero rather than dividing by zero.
- codes are ``clamp(rint(x / s), -128, 127)`` with round-half-to-even;
  clamping absorbs out-of-range *query* components (a query vector is not
  part of the corpus the scale was derived from).
- the scale artifact is the 4-byte little-endian f32 payload; reading
  rejects anything that is not a usable positive finite scale.

Both a NumPy path (host, bit-exact, used for artifacts and tests) and a JAX
path (device, used inside the index build pipeline) are provided. They agree
bit-for-bit: both use round-half-to-even (``np.rint`` / ``jnp.rint``) and
saturating NaN→0 casts, matching Rust's ``f32 as i8`` semantics.
"""

from __future__ import annotations

import struct

import numpy as np

INT8_MAX_CODE = 127.0

# The artifact only freezes once a space is statistically "real"; below this
# the reconcile loop keeps recomputing it (vector_quants.rs:34
# `ARTIFACT_MIN_VECTORS`).
ARTIFACT_MIN_VECTORS = 1024

_native_mod = None
_native_checked = False


def _native():
    """The C++ host codec (panoptikon_tpu.native), built lazily once per
    process; None without a toolchain/library — every caller keeps its
    NumPy path as the fallback AND the semantic reference (test_native
    cross-checks bit-identity element for element)."""
    global _native_mod, _native_checked
    if not _native_checked:
        _native_checked = True
        try:
            from panoptikon_tpu import native as n

            if n.ensure_built():
                _native_mod = n
        except Exception:
            _native_mod = None
    return _native_mod


def scale_from_absmax(absmax: float) -> float:
    """Scale for a corpus whose largest component magnitude is ``absmax``.

    Mirrors ``scale_from_absmax`` (vector_quants.rs:1465): positive finite
    absmax → ``absmax / 127``; anything else (zero corpus, inf/NaN) → 1.0.
    """
    absmax = float(absmax)
    if absmax > 0.0 and np.isfinite(absmax):
        # Canonicalize through f32: the artifact stores the scale as a
        # 4-byte LE f32, and freeze semantics require codes built at
        # derivation time to be byte-identical to codes backfilled under
        # the artifact-round-tripped scale.
        return float(np.float32(absmax / INT8_MAX_CODE))
    return 1.0


def scale_artifact(scale: float) -> bytes:
    """Serialize a scale as the 4-byte little-endian f32 artifact payload."""
    return struct.pack("<f", np.float32(scale))


def artifact_scale(artifact: bytes) -> float | None:
    """Read a scale artifact; ``None`` unless it is a positive finite f32.

    Callers treat ``None`` as "this quant pair is not usable", never as an
    excuse to divide by zero (vector_quants.rs:1457-1461).
    """
    if len(artifact) != 4:
        return None
    (scale,) = struct.unpack("<f", artifact)
    if np.isfinite(scale) and scale > 0.0:
        return float(scale)
    return None


def corpus_absmax(vectors: np.ndarray, valid: np.ndarray | None = None) -> float:
    """Largest component magnitude across a batch of f32 vectors.

    ``valid`` (optional, (n,) bool) restricts the reduction to masked rows
    without materializing a masked copy of the corpus. Big corpora reduce
    chunk-wise: this VM faults fresh pages in from the VMM at ~75 MB/s, so
    a full-size ``abs`` temporary costs minutes at 1M×512 while a 32 MB
    rolling chunk runs at memory speed (measured 69×).
    """
    x = np.asarray(vectors)
    if x.size == 0:
        return 0.0
    n = _native()
    if (
        n is not None and valid is None
        and x.dtype == np.float32 and x.flags["C_CONTIGUOUS"]
    ):
        # Single streaming native pass — no |x| temporary at all (the
        # chunked NumPy path below still allocates one chunk per step).
        return float(n.absmax(x))
    # NaN must not poison the absmax (max would propagate it); the reference
    # streams with `value > absmax` comparisons, which NaN never wins.
    if x.ndim < 2 or x.nbytes <= (32 << 20):
        x32 = x.astype(np.float32, copy=False)
        if valid is not None:
            x32 = x32[np.asarray(valid, bool)]
        return float(np.nanmax(np.abs(x32), initial=0.0))
    out = 0.0
    step = max(1, (32 << 20) // max(x[0].nbytes, 1))
    for lo in range(0, x.shape[0], step):
        chunk = x[lo : lo + step].astype(np.float32, copy=False)
        if valid is not None:
            chunk = chunk[np.asarray(valid[lo : lo + step], bool)]
        if chunk.size:
            out = max(out, float(np.nanmax(np.abs(chunk), initial=0.0)))
    return out


def quantize_int8(
    vectors: np.ndarray, scale: float, out: np.ndarray | None = None
) -> np.ndarray:
    """Quantize f32 vectors to int8 codes: ``clamp(rint(x/s), -128, 127)``.

    Round-half-to-even, matching ``quantize_int8`` (vector_quants.rs:1489).
    NaN inputs become 0, matching Rust's saturating `as i8` cast of NaN.
    Works on any shape; the last axis is the component axis. ``out``
    (optional, int8, same shape) receives the codes in place — bulk index
    builds pass their destination slab so the codes are written exactly
    once (a second full-size int8 temporary costs ~15 s of VMM page
    faults at 1M×512 on this host).
    """
    x = np.asarray(vectors, dtype=np.float32)
    if out is not None and (out.dtype != np.int8 or out.shape != x.shape):
        # Fail fast: the NumPy fallback's in-place assignment would
        # silently CAST into a wrong-dtype destination (and the native
        # path would silently decline), making behavior path-dependent.
        raise ValueError(
            f"out must be int8 with shape {x.shape}, got "
            f"{out.dtype}/{out.shape}"
        )
    n = _native()
    if n is not None and x.flags["C_CONTIGUOUS"]:
        dst = out if out is not None else np.empty(x.shape, dtype=np.int8)
        if n.quantize_int8_into(x, dst, scale):
            return dst
    if x.ndim >= 2 and x.shape[0] and (
        x.nbytes > (256 << 20) or out is not None
    ):
        # Chunk big corpora: the elementwise chain below materializes ~4
        # f32 temporaries of corpus size — 10 GB of allocation thrash at
        # 1M×512 (measured: ~6 min wall in the e2e rig vs seconds chunked).
        if out is None:
            out = np.empty(x.shape, dtype=np.int8)
        step = max(1, (64 << 20) // max(x[0].nbytes, 1))
        for lo in range(0, x.shape[0], step):
            out[lo : lo + step] = quantize_int8(x[lo : lo + step], scale)
        return out
    scaled = x / np.float32(scale)
    codes = np.rint(scaled)
    codes = np.where(np.isnan(codes), np.float32(0.0), codes)
    codes = np.clip(codes, -128.0, INT8_MAX_CODE)
    codes = codes.astype(np.int8)
    if out is not None:
        out[...] = codes
        return out
    return codes


def dequantize_int8(codes: np.ndarray, scale: float) -> np.ndarray:
    """Reconstruct f32 approximations from int8 codes."""
    return codes.astype(np.float32) * np.float32(scale)


def compute_query_quant(query: np.ndarray, scale: float) -> np.ndarray:
    """Quantize a query with the pair's frozen scale.

    Identical code path to the write side, so the two are byte-compatible by
    construction (vector_quants.rs:1501-1505). Saturation of out-of-range
    query components is expected and measured harmless.
    """
    return quantize_int8(query, scale)


# ---------------------------------------------------------------------------
# JAX (device) path — used inside jitted index-build pipelines.
# ---------------------------------------------------------------------------


def quantize_int8_jax(vectors, scale):
    """Device-side int8 quantization, bit-identical to :func:`quantize_int8`.

    ``jnp.rint`` is round-half-to-even on TPU; the clamp bounds the value
    into int8 range before the cast so XLA's cast is exact. NaNs map to 0
    via an explicit select (XLA float→int casts of NaN are undefined).
    """
    import jax.numpy as jnp

    x = jnp.asarray(vectors, dtype=jnp.float32)
    scaled = x / jnp.float32(scale)
    codes = jnp.rint(scaled)
    codes = jnp.where(jnp.isnan(codes), jnp.float32(0.0), codes)
    codes = jnp.clip(codes, -128.0, INT8_MAX_CODE)
    return codes.astype(jnp.int8)


def dequantize_int8_jax(codes, scale):
    import jax.numpy as jnp

    return codes.astype(jnp.float32) * jnp.float32(scale)
