"""File scanning: walk folders, hash, identify, register items/files.

The host-side intake pipeline (reference jobs/files.rs, reduced to the
parts this environment can run — ffmpeg/pdfium/browser renders are gated
behind availability probes and ledgered as ``blocked`` when missing, per
the failed-media design):

- walk included folders minus excluded subtrees, skipping hidden/junk
  directories (files.rs:5754-5796);
- mtime+size unchanged → skip re-hash (the false-change counter tracks
  entries whose mtime changed but whose hash didn't);
- sha256+md5 in one streaming pass; mime from magic bytes then extension;
- image dimensions via PIL; thumbnails (storage DB) for image types;
- files table upserted; vanished paths marked unavailable; per-path scan
  errors ledgered with stage + blocker.
"""

from __future__ import annotations

import hashlib
import mimetypes
import os
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable, Optional

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter

JUNK_DIRS = {
    ".git", ".svn", "__pycache__", "node_modules", ".cache", ".thumbnails",
    "@eaDir", ".Trash", "$RECYCLE.BIN", "System Volume Information",
}

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"BM", "image/bmp"),
    (b"%PDF", "application/pdf"),
    (b"\x1a\x45\xdf\xa3", "video/x-matroska"),
    (b"OggS", "audio/ogg"),
    (b"fLaC", "audio/flac"),
    (b"ID3", "audio/mpeg"),
    (b"RIFF", None),  # WAV/WEBP/AVI — disambiguated below
]

THUMBNAIL_SIZE = 300
THUMBNAIL_VERSION = 1


def sniff_mime(path: str, head: bytes) -> str:
    for magic, mime in _MAGIC:
        if head.startswith(magic):
            if mime is not None:
                return mime
            if head[8:12] == b"WEBP":
                return "image/webp"
            if head[8:12] == b"WAVE":
                return "audio/wav"
            if head[8:12] == b"AVI ":
                return "video/x-msvideo"
    if len(head) >= 12 and head[4:8] == b"ftyp":
        brand = head[8:12]
        if brand in (b"M4A ", b"M4B "):
            return "audio/mp4"
        return "video/mp4"
    guess, _ = mimetypes.guess_type(path)
    return guess or "application/octet-stream"


def hash_file(path: str, chunk: int = 1 << 20) -> tuple[str, str, bytes]:
    """One streaming pass → (sha256 hex, md5 hex, head bytes)."""
    sha, md5 = hashlib.sha256(), hashlib.md5()
    head = b""
    with open(path, "rb") as f:
        first = True
        while True:
            data = f.read(chunk)
            if not data:
                break
            if first:
                head = data[:64]
                first = False
            sha.update(data)
            md5.update(data)
    return sha.hexdigest(), md5.hexdigest(), head


def image_meta(path: str) -> tuple[Optional[int], Optional[int]]:
    try:
        from PIL import Image

        with Image.open(path) as im:
            return im.width, im.height
    except Exception:
        return None, None


def make_thumbnail(path: str) -> Optional[tuple[bytes, int, int]]:
    try:
        import io

        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("RGB")
            im.thumbnail((THUMBNAIL_SIZE, THUMBNAIL_SIZE))
            buf = io.BytesIO()
            im.save(buf, format="JPEG", quality=85)
            return buf.getvalue(), im.width, im.height
    except Exception:
        return None


@dataclass
class ScanCounters:
    total_available: int = 0
    new_items: int = 0
    new_files: int = 0
    unchanged_files: int = 0
    modified_files: int = 0
    marked_unavailable: int = 0
    errors: int = 0
    false_changes: int = 0
    metadata_time: float = 0.0
    hashing_time: float = 0.0
    thumbgen_time: float = 0.0


def iter_files(
    included: Iterable[str], excluded: Iterable[str]
) -> Iterable[str]:
    excluded = [str(Path(e)) for e in excluded]
    for root in included:
        root_path = Path(root)
        if not root_path.is_dir():
            continue
        for dirpath, dirnames, filenames in os.walk(root_path):
            dirnames[:] = [
                d
                for d in dirnames
                if d not in JUNK_DIRS
                and not d.startswith(".")
                and not any(str(Path(dirpath) / d).startswith(e) for e in excluded)
            ]
            for name in filenames:
                if name.startswith("."):
                    continue
                yield str(Path(dirpath) / name)


def rescan_folders(
    db: Database,
    writer: IndexWriter,
    *,
    folders: Optional[list[str]] = None,
    make_thumbnails: bool = True,
    cancelled=lambda: False,
) -> ScanCounters:
    """Full rescan of the configured (or given) folders."""
    conn = db.reader()
    if folders is None:
        included = [p for p, inc in store.list_folders(conn, included=True)]
        excluded = [p for p, inc in store.list_folders(conn, included=False)]
    else:
        included, excluded = folders, []
    counters = ScanCounters()
    scan_id = writer.call(lambda c: store.start_file_scan(c, ";".join(included)))

    # Known files under the scanned roots → unchanged-skip + vanish marking.
    known: dict[str, tuple[str, str]] = {}
    for path, mtime, sha in conn.execute(
        "SELECT path, last_modified, sha256 FROM files WHERE available = 1"
    ).fetchall():
        if any(path.startswith(str(Path(r))) for r in included):
            known[path] = (mtime, sha)

    seen: set[str] = set()
    batch: list[tuple] = []

    def flush(batch_rows):
        def unit(c):
            for sha, md5h, mime, path, mtime, size, width, height, thumb in batch_rows:
                item_id = store.upsert_item(
                    c, sha, md5h, mime, size=size, width=width, height=height
                )
                store.upsert_file(c, item_id, sha, path, mtime, scan_id)
                if thumb is not None:
                    c.execute(
                        """INSERT INTO storage.thumbnails
                           (item_sha256, idx, item_mime_type, width, height,
                            version, thumbnail) VALUES (?,?,?,?,?,?,?)
                           ON CONFLICT(item_sha256, idx) DO UPDATE SET
                             thumbnail=excluded.thumbnail, width=excluded.width,
                             height=excluded.height, version=excluded.version""",
                        (sha, 0, mime, thumb[1], thumb[2], THUMBNAIL_VERSION, thumb[0]),
                    )

        writer.call(unit)

    for path in iter_files(included, excluded):
        if cancelled():
            break
        seen.add(path)
        counters.total_available += 1
        try:
            stat = os.stat(path)
            mtime = time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.gmtime(stat.st_mtime)
            )
            prev = known.get(path)
            if prev is not None and prev[0] == mtime:
                counters.unchanged_files += 1
                continue
            t0 = time.perf_counter()
            sha, md5h, head = hash_file(path)
            counters.hashing_time += time.perf_counter() - t0
            if prev is not None:
                if prev[1] == sha:
                    counters.false_changes += 1
                else:
                    counters.modified_files += 1
            else:
                counters.new_files += 1
            t0 = time.perf_counter()
            mime = sniff_mime(path, head)
            width = height = None
            thumb = None
            if mime.startswith("image/"):
                width, height = image_meta(path)
                counters.metadata_time += time.perf_counter() - t0
                if make_thumbnails:
                    t1 = time.perf_counter()
                    thumb = make_thumbnail(path)
                    counters.thumbgen_time += time.perf_counter() - t1
            else:
                counters.metadata_time += time.perf_counter() - t0
            if prev is None:
                counters.new_items += 1
            batch.append(
                (sha, md5h, mime, path, mtime, stat.st_size, width, height, thumb)
            )
            if len(batch) >= 64:
                flush(batch)
                batch = []
        except OSError as exc:
            counters.errors += 1
            writer.call(
                lambda c, p=path, e=str(exc): store.record_scan_error(
                    c, p, stage="stat", error_class="transient", message=e
                )
            )
    if batch:
        flush(batch)

    vanished = [p for p in known if p not in seen]
    if vanished and not cancelled():
        counters.marked_unavailable = writer.call(
            lambda c: store.mark_files_unavailable(c, vanished)
        )

    writer.call(
        lambda c: store.finish_file_scan(
            c,
            scan_id,
            total_available=counters.total_available,
            new_items=counters.new_items,
            new_files=counters.new_files,
            unchanged_files=counters.unchanged_files,
            modified_files=counters.modified_files,
            marked_unavailable=counters.marked_unavailable,
            errors=counters.errors,
            false_changes=counters.false_changes,
            metadata_time=counters.metadata_time,
            hashing_time=counters.hashing_time,
            thumbgen_time=counters.thumbgen_time,
        )
    )
    return counters
