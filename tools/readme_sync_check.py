#!/usr/bin/env python
"""Fail when README.md's quoted perf numbers drift from the captured bench.

Source of truth: ``docs/bench_latest.json`` — the exact JSON document
``bench.py`` prints for the driver (re-written by every ``emit()``), committed
alongside any README edit that quotes it. Each check below binds one README
claim (matched by regex, number captured) to one JSON path in the artifact;
a mismatch beyond the claim's own printed precision fails, naming both values.

Rounds 2–4 each re-asked for a README↔artifact sync (r2 weak #6, r3 weak #2,
r4 weak #5: the e2e table showed a flattering 50k quick capture while the
1M artifact measured lower) — this makes the sync mechanical:
``tests/test_readme_sync.py`` runs this in the suite, so README numbers
cannot change without the artifact (or vice versa).

Usage: python tools/readme_sync_check.py   (exit 0 = in sync)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# (json path, README regex with ONE numeric capture group, rel tolerance).
# Tolerance covers the README's own rounding (e.g. "11.4×" vs 11.43), not
# drift: anything beyond ~1% of the quoted figure is a stale README.
CHECKS = [
    ("value",
     r"\| int8 search QPS, 1M × 512d[^|]*\| \*\*([\d,]+) QPS\*\*", 0.01),
    ("detail.recall_at_10_vs_fp32_exact",
     r"recall@10 vs fp32-exact[^|]*\| \*\*([\d.]+)\*\*", 0.001),
    ("detail.composed_rrf_2space_qps",
     r"\| composed 2-space RRF QPS[^|]*\| \*\*([\d,]+) QPS\*\*", 0.01),
    ("detail.qps_5M_512d_bf16_rescore",
     r"\| 5M × 512d[^|]*\| \*\*([\d,]+) QPS", 0.01),
    ("detail.recall_at_10_5M",
     r"\| 5M × 512d[^|]*@ recall ([\d.]+)\*\*", 0.001),
    ("detail.embed_vitl14_img_per_s",
     r"\| ViT-L/14 image embeds/s[^|]*\| \*\*([\d,]+(?:\.\d+)?) img/s\*\*",
     0.01),
    # e2e API table (full-scale capture, NOT a quick run): p50 + QPS rows.
    ("detail.e2e_server.single_space_1M.p50_ms",
     r"\| single-space semantic \| ([\d.]+) ms", 0.01),
    ("detail.e2e_server.single_space_1M.qps",
     r"\| single-space semantic \| [\d.]+ ms \| ([\d,]+(?:\.\d+)?) ", 0.01),
    ("detail.e2e_server.rrf_2space.p50_ms",
     r"\| composed 2-space RRF \(device rank join\) \| ([\d.]+) ms", 0.01),
    ("detail.e2e_server.rrf_2space.qps",
     r"\| composed 2-space RRF \(device rank join\) \| [\d.]+ ms \| "
     r"([\d,]+(?:\.\d+)?) ", 0.01),
    ("detail.e2e_server.hybrid_fts_rrf.p50_ms",
     r"\| hybrid FTS × embedding RRF \| ([\d.]+) ms", 0.01),
    ("detail.e2e_server.hybrid_fts_rrf.qps",
     r"\| hybrid FTS × embedding RRF \| [\d.]+ ms \| ([\d,]+(?:\.\d+)?) ",
     0.01),
    ("detail.e2e_server.fts_only.qps",
     r"\| FTS-only \| [\d.]+ ms \| ([\d,]+(?:\.\d+)?) ", 0.01),
    ("detail.e2e_server.cache_hit.qps",
     r"\| span-cache hit \| [\d.]+ ms \| ([\d,]+(?:\.\d+)?) ", 0.01),
    # or3: the 3-space OR composition row.
    ("detail.or3_composition.or3_qps",
     r"\| 3-space OR-of-RRF[^|]*\| \*\*([\d,]+(?:\.\d+)?) QPS", 0.02),
    ("detail.or3_composition.or3_p50_ms",
     r"\| 3-space OR-of-RRF[^|]*p50 ([\d.]+) ms", 0.02),
    # build path: sustained img/s through scan→decode→embed→insert.
    ("detail.build_path.sustained_img_per_s",
     r"\| build path[^|]*\| \*\*([\d,]+(?:\.\d+)?) img/s\*\*", 0.02),
]


def _lookup(doc: dict, path: str):
    cur = doc
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def main() -> int:
    artifact = ROOT / "docs" / "bench_latest.json"
    readme = ROOT / "README.md"
    if not artifact.exists():
        print(
            "docs/bench_latest.json missing — run `python bench.py` (it "
            "writes the artifact) and commit it with the README numbers",
            file=sys.stderr,
        )
        return 2
    doc = json.loads(artifact.read_text())
    text = readme.read_text()
    failures = []
    for path, pattern, tol in CHECKS:
        want = _lookup(doc, path)
        m = re.search(pattern, text)
        if want is None and m is None:
            continue  # stage absent from artifact and unclaimed — fine
        if want is None:
            failures.append(
                f"README claims {pattern!r} but the artifact has no {path}"
            )
            continue
        if m is None:
            failures.append(
                f"artifact has {path}={want} but README has no matching "
                f"claim ({pattern!r})"
            )
            continue
        got = float(m.group(1).replace(",", ""))
        ref = max(abs(float(want)), 1e-9)
        if abs(got - float(want)) / ref > tol:
            failures.append(
                f"{path}: README quotes {got}, artifact says {want} "
                f"(> {tol:.1%} apart) — sync the README to the artifact"
            )
    if failures:
        print("README ↔ bench artifact drift:", file=sys.stderr)
        for f in failures:
            print(f"  - {f}", file=sys.stderr)
        return 1
    print(f"README in sync with docs/bench_latest.json "
          f"({sum(1 for *_ , _t in CHECKS)} checks)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
