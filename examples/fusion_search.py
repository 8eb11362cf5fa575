"""Worked example: multi-model rank fusion and hybrid FTS × embedding.

Assumes an already-built index (see ``build_and_search.py``) with at
least one CLIP space and, for the hybrid query, extracted text (OCR /
captions / transcripts) plus a text-embedding space::

    python examples/fusion_search.py --server http://127.0.0.1:6342 \
        --clip clip/vit-b-32 --text-embed textembed/minilm-l6 \
        --query "sunset over water"
"""

from __future__ import annotations

import argparse

from panoptikon_tpu import PanoptikonClient, Q


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--server", default="http://127.0.0.1:6342")
    ap.add_argument("--clip", default="clip/vit-b-32")
    ap.add_argument("--text-embed", default=None,
                    help="text-embedding space for the hybrid examples")
    ap.add_argument("--query", default="sunset over water")
    args = ap.parse_args()

    c = PanoptikonClient(args.server)

    # Two-model RRF: the image space and (cross-modally) the text side of
    # the same query, fused Σ w/(k+rank) on the device rank join.
    filters = [Q.image(args.query, model=args.clip)]
    if args.text_embed:
        filters.append(Q.text_embed(args.query, model=args.text_embed))
        fused = Q.rrf(*filters, k=60, weights=(1.0, 0.5))
    else:
        # Single-space fallback keeps the example runnable anywhere.
        fused = filters[0]
    page = c.search.pql(Q.body(fused, page_size=10))
    print(f"fusion: {page['count']} results, "
          f"path={page['metrics']['path']}")
    for r in page["results"][:5]:
        print("  ", r["path"])

    # Hybrid: FTS5 keyword rank fused with the semantic rank — the shape
    # the reference calls match_text + embeddings composition.
    if args.text_embed:
        hybrid = Q.rrf(
            Q.text(args.query.split()[0]),
            Q.text_embed(args.query, model=args.text_embed),
            k=60,
        )
        page = c.search.pql(Q.body(hybrid, page_size=10, entity="text"))
        print(f"hybrid FTS×embedding: {page['count']} results")


if __name__ == "__main__":
    main()
