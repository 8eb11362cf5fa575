#!/usr/bin/env python
"""BASELINE config #3's BUILD PATH, end-to-end on the chip.

"ViT-L/14 batch-embed 1M images + quantize + insert, measuring embeds/sec
and build time" (BASELINE.json configs[2]). The kernel-level 1,298 img/s
is the jit path in isolation; THIS rig runs the production pipeline over
≥50k real (generated) JPEGs:

    scan (hash + mime + thumbnail) → decode → embed (static-int8 ViT-L/14)
    → insert (per-item DB rows + device index append) → quantize (inline
    reconcile)

and reports sustained img/s with per-phase timings, the host-decode
saturation point (measured: serial decode-in-predict vs the
`decoded_image` loader-thread handler with one-chunk prefetch lookahead,
jobs/extraction.py), and total build time extrapolated to 1M images.

Reference anchor: the reference's loader semaphores
/root/reference/panoptikon/src/jobs/extraction.rs:462-478 — its loader
slots + KiB budget exist precisely because serial decode starves the
accelerator; SURVEY §7 hard part 6 predicted the same boundary here.

Usage: python tools/build_bench.py [--n 50000] [--quick]
       (import: run() for bench.py)
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

ARCH = "ViT-L-14"  # --quick swaps in test-tiny (32px) for CPU smoke


def _write_image(args) -> None:
    path, i, side = args
    from PIL import Image

    # Unique, decodably-real content per file: seeded smooth noise (pure
    # noise JPEG-encodes pathologically slowly; smooth fields encode and
    # decode at realistic photo-like rates).
    rng = np.random.default_rng(i)
    small = rng.integers(0, 255, (side // 8, side // 8, 3), dtype=np.uint8)
    im = Image.fromarray(small).resize((side, side), Image.BILINEAR)
    im.save(path, "JPEG", quality=80)


def generate_corpus(root: Path, n: int, side: int = 256,
                    threads: int = 8) -> float:
    root.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    jobs = [(root / f"img_{i:07d}.jpg", i, side) for i in range(n)]
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(_write_image, jobs, chunksize=64))
    return time.perf_counter() - t0


def _registry_dir(tmp: Path, arch: str) -> Path:
    reg = tmp / "reg"
    reg.mkdir(exist_ok=True)
    (reg / "00.toml").write_text(f"""
[group.clip]
config.impl_class = "clip"
config.model_arch = "{arch}"
config.precision = "int8"
config.batch_cap = 256
[group.clip.metadata]
output_type = "clip"
input_mime_types = ["image/"]
[group.clip.inference_ids.bench]
""")
    return reg


def _decode_microbench(sample: Path, threads: int, size: int) -> dict:
    """The host decoder's own ceiling: ms/img serial, img/s at N threads."""
    from panoptikon_tpu.models.impls import decode_image

    payload = sample.read_bytes()
    t0 = time.perf_counter()
    reps = 64
    for _ in range(reps):
        decode_image(payload, size)
    serial_ms = (time.perf_counter() - t0) / reps * 1e3

    def work(_):
        for _ in range(16):
            decode_image(payload, size)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(work, range(threads * 4)))
    par_rate = threads * 4 * 16 / (time.perf_counter() - t0)
    return {"decode_serial_ms": round(serial_ms, 2),
            f"decode_{threads}thread_img_s": round(par_rate, 1)}


def _run_build(tmp: Path, media: Path, *, db_name: str, handler,
               loader_concurrency: int, batch_size: int, manager,
               size: int, log) -> dict:
    from panoptikon_tpu.db import store
    from panoptikon_tpu.db.connection import Database
    from panoptikon_tpu.db.writer import IndexWriter
    from panoptikon_tpu.index.vector_index import VectorIndex
    from panoptikon_tpu.jobs import extraction, reconcile, scan

    db = Database(tmp / "data", db_name)
    writer = IndexWriter(db)
    index = VectorIndex(chunk_rows=8192)
    out: dict = {}
    try:
        writer.call(lambda c: store.add_folder(c, str(media)))
        t0 = time.perf_counter()
        counters = scan.rescan_folders(
            db, writer, worker_count=8, detect_outros=False
        )
        out["scan_s"] = round(time.perf_counter() - t0, 1)
        out["scanned"] = counters.new_items
        out["scan_phase_s"] = {
            "hashing": round(counters.hashing_time, 1),
            "metadata": round(counters.metadata_time, 1),
            "thumbnails": round(counters.thumbgen_time, 1),
            "blurhash": round(counters.blurhash_time, 1),
        }
        log(f"[build:{db_name}] scan: {counters.new_items} items in "
            f"{out['scan_s']}s "
            f"({counters.new_items / max(out['scan_s'], 1e-9):.0f} files/s)")

        # Time the inline quant reconcile separately (module attr is
        # resolved at call time inside run_extraction_job).
        orig_reconcile = reconcile.reconcile_space
        quant_t = [0.0]

        def timed_reconcile(*a, **k):
            q0 = time.perf_counter()
            try:
                return orig_reconcile(*a, **k)
            finally:
                quant_t[0] += time.perf_counter() - q0

        reconcile.reconcile_space = timed_reconcile
        try:
            t0 = time.perf_counter()
            report = extraction.run_extraction_job(
                db=db, writer=writer, index=index, manager=manager,
                inference_id="clip/bench", output_type="clip",
                batch_size=batch_size,
                input_handler=handler,
                input_handler_opts={"size": size} if handler else None,
                loader_concurrency=loader_concurrency,
            )
            wall = time.perf_counter() - t0
        finally:
            reconcile.reconcile_space = orig_reconcile
        assert report.processed == counters.new_items, (
            report.processed, counters.new_items, report.input_errors,
        )
        out.update({
            "processed": report.processed,
            "extract_wall_s": round(wall, 1),
            "img_per_s_sustained": round(report.processed / wall, 1),
            "load_stall_s": round(report.data_load_time, 1),
            "inference_s": round(report.inference_time, 1),
            "quant_reconcile_s": round(quant_t[0], 2),
            "db_index_writes_s": round(
                wall - report.data_load_time - report.inference_time
                - quant_t[0], 1),
        })
        log(f"[build:{db_name}] extract: {report.processed} imgs in "
            f"{wall:.1f}s = {out['img_per_s_sustained']} img/s "
            f"(load-stall {out['load_stall_s']}s, infer "
            f"{out['inference_s']}s, writes {out['db_index_writes_s']}s, "
            f"quant {out['quant_reconcile_s']}s)")
        snap = index.snapshot("clip/bench")
        assert snap.quant_ready and snap.size == report.processed
    finally:
        writer.close()
    return out


def run(n: int = 50_000, baseline_n: int = 4_096, threads: int = 16,
        arch: str = ARCH, log=print) -> dict:
    from panoptikon_tpu.models import clip
    from panoptikon_tpu.models.impls import IMPL_INDEX
    from panoptikon_tpu.models.manager import ModelManager
    from panoptikon_tpu.models.registry import Registry

    size = clip.CONFIGS[arch].image_size
    tmp = Path(tempfile.mkdtemp(prefix="build_bench_"))
    out: dict = {"n": n, "arch": arch, "precision": "static-int8"}
    try:
        media = tmp / "media"
        gen_s = generate_corpus(media, n, threads=threads)
        sub = tmp / "media_base"
        generate_corpus(sub, baseline_n, threads=threads)
        log(f"[build] generated {n}+{baseline_n} JPEGs in {gen_s:.0f}s")
        out["generate_s_excluded"] = round(gen_s, 1)
        out.update(_decode_microbench(media / "img_0000000.jpg", threads,
                                      size))

        manager = ModelManager(Registry(_registry_dir(tmp, arch)), IMPL_INDEX)
        try:
            # Warm the model + its jit cache once so neither run eats the
            # one-time compile (prod keeps models resident via prewarm).
            manager.load_model("clip/bench", prewarm=True)

            # Baseline: decode serially inside predict() (the pre-round-4
            # path) on a subset — the host-decode saturation measurement.
            out["baseline_decode_in_predict"] = _run_build(
                tmp, sub, db_name="base", handler=None,
                loader_concurrency=threads, batch_size=256,
                manager=manager, size=size, log=log,
            )
            # The shipped path: decoded_image handler (decode in loader
            # threads) + one-chunk prefetch lookahead.
            out["pipelined_decoded_image"] = _run_build(
                tmp, media, db_name="bulk", handler="decoded_image",
                loader_concurrency=threads, batch_size=256,
                manager=manager, size=size, log=log,
            )
        finally:
            manager.shutdown()

        pipe = out["pipelined_decoded_image"]
        rate = pipe["img_per_s_sustained"]
        scan_rate = pipe["scanned"] / max(pipe["scan_s"], 1e-9)
        out["build_time_1M_projection_s"] = round(
            1_000_000 / scan_rate + 1_000_000 / rate, 0
        )
        out["bottleneck"] = (
            "tpu_embed" if pipe["load_stall_s"] < pipe["inference_s"]
            else "host_decode"
        )
        log(f"[build] 1M projection: "
            f"{out['build_time_1M_projection_s'] / 3600:.2f} h "
            f"(scan {scan_rate:.0f} files/s + embed {rate:.0f} img/s; "
            f"bottleneck: {out['bottleneck']})")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        out = run(n=2_000, baseline_n=512, arch="test-tiny")
    else:
        out = run(n=args.n)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
