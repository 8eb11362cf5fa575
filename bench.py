"""Benchmark rig. Prints ONE JSON line for the driver.

Primary metric: int8 query throughput at 1M×512d on one chip (BASELINE.md
rebuild target: ≥5,000 QPS). ``vs_baseline`` is the ratio against that
target. ``detail`` carries the remaining BASELINE/VERDICT metrics:

- recall@10 of the int8 path vs the fp32 exact scorer (target ≥0.99);
- ViT-L/14 image embed throughput, calibrated static-int8 matmul path
  (target ≥1,000 img/s/chip; reference datum 114 img/s fp16 on an
  RTX 5090 — docs/clip-fp16-precision-evaluation.md:24-31). The measured
  bf16 GEMM roofline of this tunneled chip is ~153 TFLOP/s
  (tools/gemm_probe.py), so the 1,000 target (≈162 TFLOP/s of ViT-L math)
  exceeds the chip's bf16 ceiling; int8 (241 TOP/s measured) is the
  vehicle and the number reported here is honest end-to-end throughput.
- composed 2-space RRF query throughput (512d + 768d spaces fused on
  device rank-join; the reference's composed-query datum is ~0.5-2.5 s
  per query — docs/vector-int8-quant.md:236-252);
- 5M×512d memory-parity configuration: int8 codes scanned + bf16 rescore
  rows = 3 B/dim resident, UNDER the 4 B/dim fp32-exact baseline
  (VERDICT r1 #9), with recall@10 vs exact on the same corpus.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def _build_corpus_chunked(jax, jnp, codec, *, n, d, key, store_dtype,
                          chunks=10):
    """Unit-norm corpus built chunk-by-chunk so the f32 intermediate never
    exceeds one chunk (5M×512 f32 would not fit HBM next to the payload).
    Returns (stored corpus, int8 codes, scale)."""
    import functools

    rows = n // chunks
    assert rows * chunks == n

    @functools.partial(jax.jit, donate_argnums=(1,))
    def gen_chunk(ck, buf, i):
        c = jax.random.normal(ck, (rows, d), dtype=jnp.float32)
        c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
        buf = jax.lax.dynamic_update_slice(buf, c.astype(buf.dtype), (i * rows, 0))
        return buf, jnp.max(jnp.abs(c))

    buf = jnp.zeros((n, d), dtype=store_dtype)
    absmax = 0.0
    for i in range(chunks):
        buf, am = gen_chunk(jax.random.fold_in(key, i), buf, i)
        absmax = max(absmax, float(am))
    scale = codec.scale_from_absmax(absmax)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def quant_chunk(src_chunk, qbuf, i):
        q = codec.quantize_int8_jax(src_chunk.astype(jnp.float32), scale)
        return jax.lax.dynamic_update_slice(qbuf, q, (i * rows, 0))

    qbuf = jnp.zeros((n, d), dtype=jnp.int8)
    for i in range(chunks):
        qbuf = quant_chunk(
            jax.lax.dynamic_slice(buf, (i * rows, 0), (rows, d)), qbuf, i
        )
    return buf, qbuf, scale


def _bench_search(jax, jnp, codec, scoring, *, n, d, q_batch, k=10,
                  rescore_dtype=None, oversample=8, repeats=5,
                  recall_sub=64):
    """Build corpus on device; time int8+rescore; recall vs exact over the
    stored payload (in memory-parity mode the stored payload IS bf16)."""
    if rescore_dtype is None:
        rescore_dtype = jnp.float32
    key = jax.random.key(n % 7919)
    kc, kq = jax.random.split(key)
    rescore_corpus, codes, scale = _build_corpus_chunked(
        jax, jnp, codec, n=n, d=d, key=kc, store_dtype=rescore_dtype,
    )
    row_valid = jnp.ones((n,), bool)
    sumsq = scoring.row_sumsq_chunked(codes)
    queries = jax.random.normal(kq, (q_batch, d), dtype=jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    q_codes = codec.quantize_int8_jax(queries, scale)

    def run():
        return scoring.int8_topk_rescored(
            codes, sumsq, row_valid, rescore_corpus, q_codes, queries,
            k=k, oversample=oversample, distance="cosine", scale=scale,
        )

    out = run()
    jax.block_until_ready(out)
    float(out[0][0, 0])
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run()
        float(out[0][0, 0])
        times.append(time.perf_counter() - t0)
    best = min(times)

    # Steady-state (pipelined) throughput: R data-dependent iterations
    # chained inside one jit, one scalar readback. The single-shot number
    # above carries the tunnel's ~25 ms per-readback constant (measured:
    # tools/scan_chained_probe.py — a production server pipelines query
    # batches, so the chained figure is the serving throughput; the
    # single-shot figure is the cold latency of one batch end to end).
    R = 8 if n <= 1_000_000 else 4

    @jax.jit
    def chained(codes, sumsq, row_valid, rescore_corpus, q_codes, queries):
        def body(i, carry):
            qc, qf, acc = carry
            dist, idx, valid = scoring.int8_topk_rescored(
                codes, sumsq, row_valid, rescore_corpus, qc, qf,
                k=k, oversample=oversample, distance="cosine", scale=scale,
            )
            # Zero-in-practice but not provably-zero perturbations: XLA
            # can neither CSE nor hoist any stage out of the loop.
            qf = qf + dist[:, :1] * 1e-6
            qc = qc + (dist[:, :1] > 1e30).astype(jnp.int8)
            return qc, qf, acc + dist[0, 0]

        _, _, acc = jax.lax.fori_loop(
            0, R, body, (q_codes, queries, jnp.float32(0.0)))
        return acc

    acc = chained(codes, sumsq, row_valid, rescore_corpus, q_codes, queries)
    float(acc)
    ctimes = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        acc = chained(codes, sumsq, row_valid, rescore_corpus, q_codes, queries)
        float(acc)
        ctimes.append(time.perf_counter() - t0)
    qps = q_batch * R / min(ctimes)

    # Recall vs exact on a query subsample (streamed; works at 5M too).
    f32_sumsq = scoring.row_sumsq_chunked(rescore_corpus)
    ev, ei, _ = scoring.streaming_topk(
        rescore_corpus, f32_sumsq, row_valid, queries[:recall_sub], k=k,
        distance="cosine", chunk_rows=min(125_000, n),
    )
    qi = np.asarray(out[1])[:recall_sub]
    ei = np.asarray(ei)
    recall = float(
        np.mean([len(set(ei[i]) & set(qi[i])) / k for i in range(recall_sub)])
    )
    return qps, best, recall


def _bench_embed(jax, jnp):
    """ViT-L/14 image tower, calibrated static-int8, batch 256."""
    import dataclasses

    from panoptikon_tpu.models import clip

    cfg = dataclasses.replace(clip.CONFIGS["ViT-L-14"], matmul_precision="int8")
    params = clip.init_params(jax.random.key(0), clip.CONFIGS["ViT-L-14"])
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params,
    )
    # Weights quantize ONCE (int8 + per-channel scales) — not per forward.
    params = clip.quantize_block_weights(params)
    b = 256
    calib = jax.random.normal(
        jax.random.key(9), (32, cfg.image_size, cfg.image_size, 3),
        dtype=jnp.bfloat16,
    )
    scales = clip.calibrate_image_scales(params, cfg, calib)
    images = jax.random.normal(
        jax.random.key(b), (b, cfg.image_size, cfg.image_size, 3),
        dtype=jnp.bfloat16,
    )
    out = clip.embed_images_scaled_jit(params, cfg, images, scales)
    float(out[0, 0])
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        out = clip.embed_images_scaled_jit(params, cfg, images, scales)
        float(out[0, 0])
        times.append(time.perf_counter() - t0)
    single = b / min(times)

    # Steady-state: chained batches, one readback (see _bench_search).
    R = 6

    @jax.jit
    def chained(params, images, scales):
        def body(i, carry):
            imgs, acc = carry
            feats = clip.encode_image(params, cfg, imgs, act_scales=scales)
            imgs = imgs + (feats[0, 0] * 1e-8).astype(imgs.dtype)
            return imgs, acc + feats[0, 0]

        _, acc = jax.lax.fori_loop(0, R, body, (images, jnp.float32(0.0)))
        return acc

    acc = chained(params, images, scales)
    float(acc)
    ctimes = []
    for _ in range(5):
        t0 = time.perf_counter()
        acc = chained(params, images, scales)
        float(acc)
        ctimes.append(time.perf_counter() - t0)
    return b * R / min(ctimes), single


def _bench_composed(jax, jnp, codec, scoring, n1=500_000, n2=250_000,
                    q_batch=256, kk=256, repeats=4):
    """Composed 2-space RRF: 512d + 768d grouped corpora, per-space ranks
    fused on device (the executor's fusion math, device-resident)."""
    d1 = 512
    d2 = 768
    k = jax.random.key(3)
    k1, k2, kq1, kq2 = jax.random.split(k, 4)

    def make(nk, n, d):
        c = jax.random.normal(nk, (n, d), dtype=jnp.float32)
        c = c / jnp.linalg.norm(c, axis=1, keepdims=True)
        scale = codec.scale_from_absmax(float(jnp.max(jnp.abs(c))))
        codes = codec.quantize_int8_jax(c, scale)
        return c, codes, scoring.row_sumsq(codes), scale

    c1, codes1, sumsq1, s1 = make(k1, n1, d1)
    c2, codes2, sumsq2, s2 = make(k2, n2, d2)
    q1 = jax.random.normal(kq1, (q_batch, d1), dtype=jnp.float32)
    q1 = q1 / jnp.linalg.norm(q1, axis=1, keepdims=True)
    q2 = jax.random.normal(kq2, (q_batch, d2), dtype=jnp.float32)
    q2 = q2 / jnp.linalg.norm(q2, axis=1, keepdims=True)
    qc1 = codec.quantize_int8_jax(q1, s1)
    qc2 = codec.quantize_int8_jax(q2, s2)
    valid1 = jnp.ones((n1,), bool)
    valid2 = jnp.ones((n2,), bool)

    from panoptikon_tpu.ops import fusion

    import functools

    @functools.partial(jax.jit, static_argnames=("k", "kk"))
    def composed(codes1, sumsq1, c1, qc1, q1, codes2, sumsq2, c2, qc2, q2,
                 *, k=10, kk=kk):
        # Per-space oversampled candidates with exact rescore...
        d1v, d1i, _ = scoring.int8_topk_rescored(
            codes1, sumsq1, valid1, c1, qc1, q1, k=kk, oversample=4,
            distance="cosine", scale=s1,
        )
        d2v, d2i, _ = scoring.int8_topk_rescored(
            codes2, sumsq2, valid2, c2, qc2, q2, k=kk, oversample=4,
            distance="cosine", scale=s2,
        )
        # ...then the framework's device RRF join (ops/fusion.py): both
        # spaces index the same item-id domain (row i <-> item i % n2).
        cand = jnp.stack([d1i, d2i * (n1 // n2)]).astype(jnp.int32)
        weights = jnp.ones((2,), jnp.float32)
        return fusion.rrf_fuse_candidates(cand, weights, k=k)

    out = composed(codes1, sumsq1, c1, qc1, q1, codes2, sumsq2, c2, qc2, q2)
    jax.block_until_ready(out)
    float(out[0][0, 0])

    # Steady-state: chained composed queries, one readback.
    R = 6

    @functools.partial(jax.jit, static_argnames=())
    def chained(codes1, sumsq1, c1, qc1, q1, codes2, sumsq2, c2, qc2, q2):
        def body(i, carry):
            q1c, q2c, acc = carry
            totals, ids = composed(
                codes1, sumsq1, c1, qc1, q1c, codes2, sumsq2, c2, qc2, q2c)
            q1c = q1c + totals[:, :1] * 1e-6
            q2c = q2c + totals[:, :1] * 1e-6
            return q1c, q2c, acc + totals[0, 0]

        _, _, acc = jax.lax.fori_loop(
            0, R, body, (q1, q2, jnp.float32(0.0)))
        return acc

    acc = chained(codes1, sumsq1, c1, qc1, q1, codes2, sumsq2, c2, qc2, q2)
    float(acc)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        acc = chained(codes1, sumsq1, c1, qc1, q1, codes2, sumsq2, c2, qc2, q2)
        float(acc)
        times.append(time.perf_counter() - t0)
    return q_batch * R / min(times)


def _preflight_backend(timeout_s: int = 150, attempts: int = 3,
                       retry_wait_s: int = 120) -> None:
    """Fail FAST (but not too fast) if the backend cannot initialize.

    A killed-mid-compile TPU process can wedge the tunnel relay; when that
    happens ``jax.devices()`` blocks forever inside ``make_c_api_client``
    (observed: the relay process gone, every init hanging — even under
    ``JAX_PLATFORMS=cpu``, because the axon plugin's get_backend hook
    initializes its platform regardless). Probing in a subprocess with a
    hard timeout turns an indefinite driver stall into a diagnosable
    failure; a wedged relay is sometimes restarted by its supervisor, so
    the probe retries over a ~7-minute window before giving up. Each probe
    is a fresh process holding no device claim — killing it is safe.
    Explicit-CPU runs skip the probe: no tunnel."""
    import os
    import subprocess
    import time as _t

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return

    def _relay_listening() -> bool:
        # The axon relay owns loopback ports in the 808x/811x band; when
        # NONE is listening the relay process is gone and every probe
        # below would just burn its full timeout.
        import socket

        for port in (8080, 8081, 8082, 8083, 8110, 8111, 8112, 8117):
            s = socket.socket()
            s.settimeout(0.2)
            try:
                if s.connect_ex(("127.0.0.1", port)) == 0:
                    return True
            finally:
                s.close()
        return False

    if not _relay_listening():
        # Cheap port poll while the relay is down — its supervisor may
        # restart it; a port appearing is the signal to start real probes.
        wait_budget = int(os.environ.get("BENCH_RELAY_WAIT_S", "1200"))
        deadline = _t.monotonic() + wait_budget
        print(
            f"[bench] no relay port listening — waiting up to "
            f"{wait_budget}s for the tunnel to come back",
            file=sys.stderr,
        )
        while _t.monotonic() < deadline:
            _t.sleep(30)
            if _relay_listening():
                print("[bench] relay port is back — probing", file=sys.stderr)
                break
        else:
            print(
                "[bench] FATAL: the TPU tunnel relay never came back "
                "(no loopback relay port listening). Restart the relay "
                "and re-run.",
                file=sys.stderr,
            )
            raise SystemExit(3)
    for attempt in range(attempts):
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; print(jax.devices())"],
                timeout=timeout_s, capture_output=True, text=True,
                check=True,
            )
            return
        except subprocess.TimeoutExpired:
            print(
                f"[bench] backend init probe {attempt + 1}/{attempts} hung "
                f"{timeout_s}s — tunnel relay likely down; "
                + ("retrying" if attempt + 1 < attempts else "giving up"),
                file=sys.stderr,
            )
            if attempt + 1 < attempts:
                _t.sleep(retry_wait_s)
        except subprocess.CalledProcessError as exc:
            print(
                f"[bench] FATAL: backend init failed: {exc.stderr[-500:]}",
                file=sys.stderr,
            )
            raise SystemExit(3)
    print(
        "[bench] FATAL: backend init never completed — the TPU tunnel "
        "relay is wedged (stale claim). Restart the relay and re-run.",
        file=sys.stderr,
    )
    raise SystemExit(3)


def main() -> None:
    _preflight_backend()
    import jax
    import jax.numpy as jnp

    from panoptikon_tpu.ops import codec, scoring

    # Wall-clock budget: the driver parses the LAST JSON line on stdout; an
    # external kill mid-stage must never leave the round without a metric
    # (BENCH_r04 came back rc=124/parsed=null exactly that way). Defenses:
    # the headline line prints IMMEDIATELY after the core stages and is
    # RE-printed, updated, after every later stage; the budget default is
    # calibrated under the driver's observed wall clock (r04 died < 5400 s;
    # stages at r05 sizes fit comfortably in 2400 s) so optional stages are
    # skipped rather than killed.
    t_start = time.perf_counter()
    budget_s = 2400.0
    for a in sys.argv[1:]:
        if a.startswith("--budget-s="):
            budget_s = float(a.split("=", 1)[1])

    def _over_budget(stage: str) -> bool:
        spent = time.perf_counter() - t_start
        if spent > budget_s:
            print(
                f"[bench] skipping {stage}: {spent:.0f}s spent > "
                f"{budget_s:.0f}s budget",
                file=sys.stderr,
            )
            return True
        return False

    # 1) Headline: 1M×512 int8+f32-rescore QPS + recall. The recall floor
    # is 0.992 — headroom over BASELINE's ≥0.99 so a silent tweak can't
    # creep up on the target (VERDICT r2 weak #1). Adaptive oversample:
    # if 8× misses the floor, the shipped config is 16× and the REPORTED
    # QPS is the config that meets it.
    RECALL_FLOOR = 0.992
    oversample = 8
    qps, best, recall = _bench_search(
        jax, jnp, codec, scoring, n=1_000_000, d=512, q_batch=4096,
        oversample=oversample,
    )
    if recall < RECALL_FLOOR:
        print(
            f"[bench] recall {recall:.4f} under the {RECALL_FLOOR} floor at "
            f"oversample=8 — retrying at 16", file=sys.stderr,
        )
        oversample = 16
        qps, best, recall = _bench_search(
            jax, jnp, codec, scoring, n=1_000_000, d=512, q_batch=4096,
            oversample=oversample,
        )
    print(
        f"[bench] 1M x 512 int8+rescore, batch=4096, oversample={oversample}: "
        f"{qps:.0f} QPS steady-state (single-batch latency {best*1000:.1f} ms "
        f"incl. tunnel readback), recall@10={recall:.4f}",
        file=sys.stderr,
    )

    # 2) ViT-L/14 embed throughput (static-int8).
    embed_rate, embed_single = _bench_embed(jax, jnp)
    print(
        f"[bench] ViT-L/14 static-int8 embeds: {embed_rate:.0f} img/s "
        f"steady-state ({embed_single:.0f} single-batch)",
        file=sys.stderr)

    # 3) Composed 2-space RRF.
    composed_qps = _bench_composed(jax, jnp, codec, scoring)
    print(f"[bench] composed 2-space RRF: {composed_qps:.0f} QPS",
          file=sys.stderr)

    # The headline line prints NOW — everything after this point can only
    # ADD detail rows. `emit()` re-prints the full, updated JSON line after
    # every stage; whether the driver keeps the first or the last parseable
    # stdout line, it gets a complete document with the same headline.
    detail = {
        "recall_at_10_vs_fp32_exact": round(recall, 4),
        "single_batch_latency_ms_incl_readback": round(best * 1000, 2),
        "query_batch": 4096,
        "throughput_method": "chained-8x-one-readback",
        "embed_vitl14_img_per_s": round(embed_rate, 1),
        "embed_single_batch_img_per_s": round(embed_single, 1),
        "embed_vs_target_1000": round(embed_rate / 1000.0, 3),
        "embed_vs_reference_114": round(embed_rate / 114.2, 1),
        "composed_rrf_2space_qps": round(composed_qps, 1),
        "oversample": oversample,
        "recall_floor": RECALL_FLOOR,
        "stages_completed": ["1M_512d", "embed", "composed_2space"],
    }

    def emit() -> None:
        doc = {
            "metric": "int8_search_qps_1M_512d",
            "value": round(qps, 1),
            "unit": "queries/s",
            "vs_baseline": round(qps / 5000.0, 3),
            "detail": detail,
        }
        print(json.dumps(doc), flush=True)
        # Same document to docs/bench_latest.json — the source of truth
        # tools/readme_sync_check.py diffs README's quoted numbers against
        # (committed whenever README perf claims change).
        try:
            latest = Path(__file__).resolve().parent / "docs" / "bench_latest.json"
            latest.write_text(json.dumps(doc, indent=1) + "\n")
        except OSError as exc:
            print(f"[bench] bench_latest.json not written: {exc}",
                  file=sys.stderr)

    emit()

    # 4) 5M×512 memory parity (BASELINE #2's memory-pressure shape) runs
    # BEFORE the optional stages: rounds are scored on captured numbers and
    # this one died uncaptured in r04 when it was sequenced last. q_batch
    # kept at 256: XLA materializes the (Q, N) f32 distance matrix on this
    # path when it does not fuse approx_min_k into the GEMM; at 5M rows a
    # 1024-query batch is a 19 GiB intermediate (> HBM).
    if "--skip-5m" not in sys.argv and not _over_budget("5M memory parity"):
        qps5, best5, recall5 = _bench_search(
            jax, jnp, codec, scoring, n=5_000_000, d=512, q_batch=256,
            rescore_dtype=jnp.bfloat16, repeats=3, recall_sub=32,
        )
        print(
            f"[bench] 5M x 512 int8+bf16-rescore, batch=256: {qps5:.0f} QPS "
            f"steady-state (single-batch latency {best5*1000:.1f} ms), "
            f"recall@10={recall5:.4f} "
            f"(resident: 2.5 GB codes + 5 GB bf16 = 7.5 GB, under the 10 GB "
            f"fp32-exact baseline)",
            file=sys.stderr,
        )
        detail.update(
            qps_5M_512d_bf16_rescore=round(qps5, 1),
            recall_at_10_5M=round(recall5, 4),
            hbm_resident_bytes_per_dim_5M=3,
        )
        detail["stages_completed"].append("5M_512d")
        emit()

    # 5) End-to-end production server: POST /api/search/pql over a REAL
    # 1M-row DB + device index (VERDICT r3 missing #2 — the reference's
    # baseline numbers are e2e API medians, docs/vector-int8-quant.md:236).
    if "--skip-e2e" not in sys.argv and not _over_budget("e2e server bench"):
        try:
            from tools import e2e_server_bench

            detail["e2e_server"] = e2e_server_bench.run(
                log=lambda *a: print(*a, file=sys.stderr)
            )
        except Exception as exc:  # noqa: BLE001 — e2e must not sink the bench
            print(f"[bench] e2e server bench failed: {exc}", file=sys.stderr)
            detail["e2e_server"] = {"error": str(exc)}
        detail["stages_completed"].append("e2e_server")
        emit()

    # 6) BASELINE config #5: 3-space OR-of-RRF composition at one-chip
    # capacity (4M×512 + 2M×768 + 1M×1024 int8 = 7 GB of codes), through
    # the executor's FUSED device path with on-chip fused-vs-full parity.
    if "--skip-or3" not in sys.argv and not _over_budget("or3 bench"):
        try:
            from tools import or3_bench

            detail["or3_composition"] = or3_bench.run(
                seq=16, thread_total=128, recall_queries=8,
                log=lambda *a: print(*a, file=sys.stderr),
            )
        except Exception as exc:  # noqa: BLE001
            print(f"[bench] or3 bench failed: {exc}", file=sys.stderr)
            detail["or3_composition"] = {"error": str(exc)}
        detail["stages_completed"].append("or3_composition")
        emit()

    # 7) BASELINE config #3: the BUILD path — scan → decode → embed
    # (static-int8 ViT-L/14) → quantize → insert over generated JPEGs,
    # plus the decode-in-predict baseline that shows the host-decode
    # saturation point.
    if "--skip-build" not in sys.argv and not _over_budget("build bench"):
        try:
            from tools import build_bench

            detail["build_path"] = build_bench.run(
                n=50_000, log=lambda *a: print(*a, file=sys.stderr)
            )
        except Exception as exc:  # noqa: BLE001
            print(f"[bench] build bench failed: {exc}", file=sys.stderr)
            detail["build_path"] = {"error": str(exc)}
        detail["stages_completed"].append("build_path")
        emit()

    if recall < RECALL_FLOOR:
        print(
            f"[bench] FAIL: recall@10 {recall:.4f} < floor {RECALL_FLOOR}",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
