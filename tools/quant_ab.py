"""Golden A/B dumps for quant determinism (reference pql/quant_ab.rs:1-25).

Runs the explain-plan query suite in BOTH arms (exact and int8-quant) over
a seeded synthetic corpus and writes full result dumps to a directory —
one JSON file per (query, arm). Re-run after a change and ``diff -r`` the
directories: any drift in membership, order, or distances is a regression
in the codec, the scorer, or the fusion math.

Usage:
  python tools/quant_ab.py --out /tmp/ab_before
  # ... change code ...
  python tools/quant_ab.py --out /tmp/ab_after
  diff -r /tmp/ab_before /tmp/ab_after
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Honor an explicit JAX_PLATFORMS via the live config: a PJRT plugin
# sitecustomize freezes the platform choice before this script runs, and
# with a dead accelerator transport the backend init then hangs forever
# (see docs/operations.md "hung accelerator runbook").
import os

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--items", type=int, default=10_000)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--page-size", type=int, default=50)
    args = parser.parse_args()

    from tools.explain_plan import build_synthetic, query_suite

    from panoptikon_tpu.pql import model as pql
    from panoptikon_tpu.pql.executor import Executor

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    with tempfile.TemporaryDirectory() as tmp:
        db, writer, index, vecs = build_synthetic(
            Path(tmp), args.items, args.dim
        )
        ex = Executor(db, index, manager=None)
        wrote = 0
        for name, payload in query_suite(vecs):
            payload = dict(payload, page_size=args.page_size)
            for arm in ("exact", "quant"):
                body = json.loads(json.dumps(payload))
                # Rewrite every vector filter's index mode to this arm.
                def rewrite(node):
                    if isinstance(node, dict):
                        for key in ("image_embeddings", "text_embeddings",
                                    "similar_to"):
                            if key in node and isinstance(node[key], dict):
                                node[key]["index"] = arm
                        for v in node.values():
                            rewrite(v)
                    elif isinstance(node, list):
                        for v in node:
                            rewrite(v)

                rewrite(body)
                res = ex.execute(pql.PqlQuery.from_json(body))
                dump = {
                    "query": name,
                    "arm": arm,
                    "count": res.count,
                    "results": [
                        {
                            "file_id": r["file_id"],
                            "item_id": r["item_id"],
                            "extra": r.get("extra"),
                        }
                        for r in res.results
                    ],
                }
                path = out_dir / f"{name}.{arm}.json"
                path.write_text(json.dumps(dump, indent=1, sort_keys=True))
                wrote += 1
        writer.close()
    print(f"wrote {wrote} golden dumps to {out_dir}")


if __name__ == "__main__":
    main()
