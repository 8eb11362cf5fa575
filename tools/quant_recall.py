#!/usr/bin/env python
"""Quant recall harness: exact vs int8 over the real engine.

The acceptance gate named by BASELINE.json — the reference's
``tools/quant-recall/run_recall.py`` methodology applied to this engine:
build an index, run the same queries through the exact arm and the quant
arm, and report overlap@k, membership equality, and timings. The fp32
brute-force scorer is ground truth.

Usage:
    python tools/quant_recall.py [--n 100000] [--dim 512] [--queries 64]
        [--k 10 50 100] [--corpus {random,clustered}] [--rescore]

Prints a JSON report; exits nonzero if overlap@10 < --min-recall.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

# Recall checking defaults to CPU; pass --tpu to contend for the chip.
if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def make_corpus(kind: str, n: int, dim: int, rng) -> np.ndarray:
    if kind == "clustered":
        # CLIP-like geometry: anisotropic clusters on the unit sphere —
        # much closer to real embedding distributions than iid gaussian
        # (which is the adversarial worst case for quantization).
        n_clusters = max(8, n // 2000)
        centers = rng.normal(size=(n_clusters, dim)).astype(np.float32)
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, n_clusters, size=n)
        vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim)).astype(np.float32)
    else:
        vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--queries", type=int, default=64)
    parser.add_argument("--k", type=int, nargs="+", default=[10, 50, 100])
    parser.add_argument("--corpus", choices=["random", "clustered"], default="clustered")
    parser.add_argument("--rescore", action="store_true", default=True)
    parser.add_argument("--no-rescore", dest="rescore", action="store_false")
    parser.add_argument("--min-recall", type=float, default=0.99)
    args = parser.parse_args()

    from panoptikon_tpu.ops import codec, scoring

    rng = np.random.default_rng(0)
    corpus = make_corpus(args.corpus, args.n, args.dim, rng)
    queries = make_corpus(args.corpus, args.queries, args.dim, rng)

    scale = codec.scale_from_absmax(codec.corpus_absmax(corpus))
    codes = codec.quantize_int8(corpus, scale)
    q_codes = codec.compute_query_quant(queries, scale)
    valid = np.ones(args.n, bool)
    sumsq_q = np.asarray(scoring.row_sumsq(codes))
    sumsq_f = np.asarray(scoring.row_sumsq(corpus))
    kmax = max(args.k)

    import jax

    # Exact arm: one-shot fp32 at HIGHEST precision — the ground truth.
    t0 = time.perf_counter()
    ev, ei, _ = scoring.exact_oneshot(corpus, valid, queries, k=kmax)
    jax.block_until_ready(ei)
    exact_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    qv, qi, _ = scoring.int8_topk_rescored(
        codes, sumsq_q, valid, corpus, q_codes, queries,
        k=kmax, oversample=8, distance="cosine", scale=scale,
        rescore=args.rescore,
    )
    jax.block_until_ready(qi)
    quant_s = time.perf_counter() - t0

    ei_np, qi_np = np.asarray(ei), np.asarray(qi)
    report = {
        "n": args.n,
        "dim": args.dim,
        "queries": args.queries,
        "corpus": args.corpus,
        "rescore": args.rescore,
        "exact_batch_s": round(exact_s, 4),
        "quant_batch_s": round(quant_s, 4),
        "overlap": {},
    }
    for k in args.k:
        overlaps = [
            len(set(ei_np[i, :k]) & set(qi_np[i, :k])) / k
            for i in range(args.queries)
        ]
        report["overlap"][f"@{k}"] = round(float(np.mean(overlaps)), 4)
    # Candidate recall@kmax: is the true top-10 inside the quant top-kmax?
    cand = [
        len(set(ei_np[i, :10]) & set(qi_np[i, :kmax])) / 10
        for i in range(args.queries)
    ]
    report["candidate_recall@10_in_top_kmax"] = round(float(np.mean(cand)), 4)

    print(json.dumps(report, indent=2))
    ok = report["overlap"]["@10"] >= args.min_recall
    if not ok:
        print(
            f"FAIL: overlap@10 {report['overlap']['@10']} < {args.min_recall}",
            file=sys.stderr,
        )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
