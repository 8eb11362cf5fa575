"""Worked example: build an index from a media folder, then search it.

Run against a live server (start one with
``panoptikon-tpu serve --config config/server/default.toml``)::

    python examples/build_and_search.py /path/to/media \
        --server http://127.0.0.1:6342 --model clip/vit-b-32

The same flow as the reference's quick-start, through the Python client:
register folders → scan → extract embeddings → quant reconcile happens
inline → semantic + hybrid + filtered searches via the typed builder.
"""

from __future__ import annotations

import argparse
import json

from panoptikon_tpu import PanoptikonClient, Q


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("media", help="folder of images/videos/documents")
    ap.add_argument("--server", default="http://127.0.0.1:6342")
    ap.add_argument("--model", default="clip/vit-b-32",
                    help="embedding inference id")
    ap.add_argument("--query", default="a red bicycle")
    args = ap.parse_args()

    c = PanoptikonClient(args.server)
    print("server:", c.health())

    # 1. Register the folder; scan it (hash, mime, thumbnails, metadata).
    c.jobs.set_folders(included=[args.media], rescan=False)
    scan = c.jobs.rescan_folders()
    print("scan:", c.jobs.wait(scan["job_id"], timeout=3600)["state"])

    # 2. Extract embeddings (the index build; int8 quant reconciles
    #    inline at the job boundary).
    job = c.jobs.enqueue_extraction(args.model)
    print("extract:", c.jobs.wait(job["job_id"], timeout=86400)["state"])
    print("quant coverage:", json.dumps(c.jobs.quants()))

    # 3. Semantic search with a metadata filter, via the typed builder.
    body = Q.body(
        Q.image(args.query, model=args.model)
        & Q.match(type__startswith="image/"),
        page_size=5,
    )
    page = c.search.pql(body)
    print(f"\n'{args.query}' → {page['count']} results "
          f"(engine path: {page['metrics']['path']})")
    for r in page["results"]:
        print("  ", r["path"])

    # 4. The response carries per-query engine telemetry; the server-wide
    #    coalescer amortization is on the stats endpoint.
    print("\nsearch stats:", json.dumps(c.search.stats()["coalescer"]))


if __name__ == "__main__":
    main()
