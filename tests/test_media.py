"""Media intake pipeline: video frames, animated images, PDFs (gated),
audio PCM, blurhash, heal-blocked — and the end-to-end mp4 → frames →
CLIP-extraction integration VERDICT r1 #5 asked for.

Reference anchors: jobs/files.rs:5300 (video sampling), :4484 (PDF render),
:719 (heal_blocked_scan_errors), docs/failed-media-retry-design.md.
"""

import wave

import numpy as np
import pytest

from panoptikon_tpu.db import store
from panoptikon_tpu.db.connection import Database
from panoptikon_tpu.db.writer import IndexWriter
from panoptikon_tpu.index.vector_index import VectorIndex
from panoptikon_tpu.jobs import extraction, media, scan
from panoptikon_tpu.models.impls import IMPL_INDEX
from panoptikon_tpu.models.manager import ModelManager
from panoptikon_tpu.models.registry import Registry

cv2 = pytest.importorskip("cv2")

REG_TOML = """
[group.clip]
config.impl_class = "clip"
config.model_arch = "test-tiny"
[group.clip.metadata]
output_type = "clip"
input_mime_types = ["image/", "video/"]
input_spec.handler = "image_frames"
input_spec.opts.max_frames = 4
[group.clip.inference_ids.tiny]
"""


def make_mp4(path, *, frames=30, size=(64, 48), color=(200, 40, 40)):
    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, size
    )
    assert w.isOpened()
    img = np.zeros((size[1], size[0], 3), np.uint8)
    img[:] = color[::-1]  # BGR
    for i in range(frames):
        f = img.copy()
        f[:, : (i * size[0] // frames)] = 255  # moving wipe → distinct frames
        w.write(f)
    w.release()


def make_gif(path, n=6):
    from PIL import Image

    imgs = [
        Image.new("RGB", (32, 32), (i * 40 % 256, 0, 0)) for i in range(n)
    ]
    imgs[0].save(path, save_all=True, append_images=imgs[1:], duration=100)


def make_wav(path, seconds=0.5, rate=16000):
    t = np.arange(int(seconds * rate)) / rate
    pcm = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


@pytest.fixture
def env(tmp_path):
    mediadir = tmp_path / "media"
    mediadir.mkdir()
    make_mp4(mediadir / "clip.mp4")
    make_gif(mediadir / "anim.gif")
    make_wav(mediadir / "tone.wav")
    (mediadir / "doc.pdf").write_bytes(b"%PDF-1.4 fake body")
    from PIL import Image

    Image.new("RGB", (40, 40), (0, 200, 0)).save(mediadir / "still.png")

    db = Database(tmp_path / "data", "media")
    writer = IndexWriter(db)
    writer.call(lambda c: store.add_folder(c, str(mediadir)))
    yield {"db": db, "writer": writer, "media": mediadir, "tmp": tmp_path}
    writer.close()


class TestMediaPrimitives:
    def test_probe_and_sample_video(self, env):
        info = media.probe_video(str(env["media"] / "clip.mp4"))
        assert (info.width, info.height) == (64, 48)
        assert info.frame_count == 30 and info.duration == pytest.approx(3.0)
        frames = media.sample_video_frames(
            str(env["media"] / "clip.mp4"), max_frames=4
        )
        assert len(frames) == 4
        for blob, w, h in frames:
            assert blob[:3] == b"\xff\xd8\xff" and (w, h) == (64, 48)
        # Frames are distinct (the wipe moves).
        assert len({f[0] for f in frames}) == 4

    def test_animated_frames(self, env):
        payload = (env["media"] / "anim.gif").read_bytes()
        frames = media.sample_animated_frames(payload, max_frames=3)
        assert 1 < len(frames) <= 3

    def test_still_image_not_animated(self, env):
        payload = (env["media"] / "still.png").read_bytes()
        with pytest.raises(media.MediaError):
            media.sample_animated_frames(payload)

    def test_wav_pcm_and_duration(self, env):
        pcm, rate = media.extract_audio_pcm(
            str(env["media"] / "tone.wav"), "audio/wav"
        )
        assert rate == 16000 and pcm.dtype == np.float32
        assert abs(len(pcm) / rate - 0.5) < 0.01
        assert media.wav_duration(str(env["media"] / "tone.wav")) == pytest.approx(0.5)

    def test_pdf_blocked_without_renderer(self, env):
        if media.pdf_renderer_available():
            pytest.skip("pdf renderer present")
        with pytest.raises(media.MediaError) as ei:
            media.render_pdf_pages(str(env["media"] / "doc.pdf"))
        assert ei.value.blocker == "pdfium"

    def test_blurhash_format_and_stability(self):
        rgb = np.zeros((32, 32, 3), np.uint8)
        rgb[:, :16] = (255, 0, 0)
        h1 = media.blurhash_encode(rgb)
        h2 = media.blurhash_encode(rgb)
        assert h1 == h2
        # 4x3 components: 1 + 1 + 4 + (12-1)*2 = 28 chars
        assert len(h1) == 28
        assert all(c in media._B83 for c in h1)

    def test_blurhash_dc_encodes_average_color(self):
        flat = np.full((16, 16, 3), 128, np.uint8)
        h = media.blurhash_encode(flat)
        # DC (chars 2..6) is the base83-encoded sRGB average color.
        dc = 0
        for c in h[2:6]:
            dc = dc * 83 + media._B83.index(c)
        r, g, b = (dc >> 16) & 255, (dc >> 8) & 255, dc & 255
        assert abs(r - 128) <= 1 and abs(g - 128) <= 1 and abs(b - 128) <= 1


class TestScanIntake:
    def test_video_scan_stores_frames_and_metadata(self, env):
        counters = scan.rescan_folders(env["db"], env["writer"])
        assert counters.frames_written >= 4
        conn = env["db"].reader()
        n_frames = conn.execute(
            "SELECT COUNT(*) FROM storage.frames"
        ).fetchone()[0]
        assert n_frames >= 4 + 2  # video frames + gif frames
        dur, vtracks = conn.execute(
            "SELECT duration, video_tracks FROM items WHERE type='video/mp4'"
        ).fetchone()
        assert dur == pytest.approx(3.0) and vtracks == 1
        # Video gets a thumbnail from its first frame.
        sha = conn.execute(
            "SELECT sha256 FROM items WHERE type='video/mp4'"
        ).fetchone()[0]
        assert conn.execute(
            "SELECT COUNT(*) FROM storage.thumbnails WHERE item_sha256=?",
            (sha,),
        ).fetchone()[0] == 1
        # visual_attempts: ok for the video, blocked for the PDF.
        outcomes = dict(conn.execute(
            "SELECT item_sha256, outcome FROM storage.visual_attempts"
        ).fetchall())
        assert outcomes[sha] == "ok"
        pdf_sha = conn.execute(
            "SELECT sha256 FROM items WHERE type='application/pdf'"
        ).fetchone()[0]
        if not media.pdf_renderer_available():
            assert outcomes[pdf_sha] == "blocked"
            err = conn.execute(
                "SELECT blocker FROM scan_errors WHERE path LIKE '%doc.pdf'"
            ).fetchone()
            assert err and err[0] == "pdfium"
        # WAV duration + audio_tracks.
        dur_a = conn.execute(
            "SELECT duration, audio_tracks FROM items WHERE type='audio/wav'"
        ).fetchone()
        assert dur_a[0] == pytest.approx(0.5) and dur_a[1] == 1
        # Stills get a blurhash.
        bh = conn.execute(
            "SELECT blurhash FROM items WHERE type='image/png'"
        ).fetchone()[0]
        assert bh and len(bh) == 28

    def test_video_clip_extraction_end_to_end(self, env, tmp_path):
        """VERDICT #5 Done-criterion: mp4 scan → frames stored → CLIP
        extraction produces embeddings for the video item."""
        scan.rescan_folders(env["db"], env["writer"])
        reg_dir = tmp_path / "reg"
        reg_dir.mkdir()
        (reg_dir / "00.toml").write_text(REG_TOML)
        manager = ModelManager(Registry(reg_dir), IMPL_INDEX)
        index = VectorIndex(chunk_rows=64)
        try:
            report = extraction.run_extraction_job(
                db=env["db"], writer=env["writer"], index=index,
                manager=manager, inference_id="clip/tiny",
                setter_name="tiny", output_type="clip", batch_size=2,
                mime_prefixes=("video/", "image/"),
                input_handler="image_frames",
            )
            assert report.processed >= 3  # mp4 + gif + png
            conn = env["db"].reader()
            video_embeds = conn.execute(
                """SELECT COUNT(*) FROM embeddings e
                   JOIN item_data d ON d.id = e.id
                   JOIN items i ON i.id = d.item_id
                   WHERE i.type = 'video/mp4'"""
            ).fetchone()[0]
            # One embedding per sampled frame.
            assert video_embeds == 4
        finally:
            manager.shutdown()

    def test_heal_blocked_clears_resolved_ledgers(self, env):
        scan.rescan_folders(env["db"], env["writer"])
        conn = env["db"].reader()
        # Simulate a previously blocked video (as if cv2 had been missing):
        sha = conn.execute(
            "SELECT sha256 FROM items WHERE type='video/mp4'"
        ).fetchone()[0]
        path = conn.execute(
            "SELECT path FROM files WHERE sha256=?", (sha,)
        ).fetchone()[0]

        def unit(c):
            store.record_scan_error(
                c, path, stage="frames", error_class="input",
                blocker="video-decoder", message="no decoder",
            )
            c.execute(
                """INSERT INTO storage.visual_attempts
                   (item_sha256, kind, version, outcome, message, time)
                   VALUES (?,?,?,?,?,datetime('now'))
                   ON CONFLICT(item_sha256, kind) DO UPDATE SET
                     outcome=excluded.outcome""",
                (sha, "frames", 1, "blocked", "no decoder"),
            )
            c.execute("DELETE FROM storage.frames WHERE item_sha256=?", (sha,))

        env["writer"].call(unit)
        counters = scan.rescan_folders(env["db"], env["writer"])
        assert counters.healed >= 1
        conn = env["db"].reader()
        # Re-intake happened: frames back, attempt flipped to ok.
        assert conn.execute(
            "SELECT COUNT(*) FROM storage.frames WHERE item_sha256=?", (sha,)
        ).fetchone()[0] == 4
        assert conn.execute(
            "SELECT outcome FROM storage.visual_attempts WHERE item_sha256=?",
            (sha,),
        ).fetchone()[0] == "ok"
        assert conn.execute(
            "SELECT COUNT(*) FROM scan_errors WHERE blocker='video-decoder'"
        ).fetchone()[0] == 0


class TestScanRobustness:
    def test_decoder_crash_does_not_abort_scan(self, env, monkeypatch):
        """A corrupt video whose decoder RAISES (not MediaError) must fold
        into the ledger as a failed attempt, never abort the rescan
        (review finding r2: fut.result() used to re-raise)."""
        def boom(path, **kw):
            raise ValueError("codec exploded")

        monkeypatch.setattr(media, "sample_video_frames", boom)
        counters = scan.rescan_folders(env["db"], env["writer"])
        # The scan completed; the video ledgered as failed, others intact.
        assert counters.errors >= 1
        conn = env["db"].reader()
        sha = conn.execute(
            "SELECT sha256 FROM items WHERE type='video/mp4'"
        ).fetchone()[0]
        outcome = conn.execute(
            "SELECT outcome FROM storage.visual_attempts WHERE item_sha256=?",
            (sha,),
        ).fetchone()[0]
        assert outcome == "failed"
        # Still registered + scan finished (finish_file_scan ran).
        assert conn.execute(
            "SELECT COUNT(*) FROM file_scans WHERE end_time IS NOT NULL"
        ).fetchone()[0] >= 1


class TestBlockedAudioExtraction:
    def test_mp3_without_ffmpeg_ledgers_blocker_and_heals(self, env, tmp_path):
        if media.ffmpeg_available():
            pytest.skip("ffmpeg present")
        (env["media"] / "song.mp3").write_bytes(b"ID3" + b"\x00" * 64)
        scan.rescan_folders(env["db"], env["writer"])
        reg_dir = tmp_path / "regc"
        reg_dir.mkdir()
        (reg_dir / "00.toml").write_text("""
[group.clap]
config.impl_class = "clap"
config.model_arch = "test-tiny"
[group.clap.metadata]
output_type = "clip"
input_mime_types = ["audio/"]
input_spec.handler = "audio_tracks"
[group.clap.inference_ids.tiny-clap]
""")
        manager = ModelManager(Registry(reg_dir), IMPL_INDEX)
        index = VectorIndex(chunk_rows=64)
        try:
            report = extraction.run_extraction_job(
                db=env["db"], writer=env["writer"], index=index,
                manager=manager, inference_id="clap/tiny-clap",
                output_type="clip", batch_size=2,
                mime_prefixes=("audio/",), input_handler="audio_tracks",
            )
            conn = env["db"].reader()
            row = conn.execute(
                """SELECT error_class, blocker FROM extraction_errors
                   WHERE setter_name='clap/tiny-clap'
                     AND blocker IS NOT NULL"""
            ).fetchone()
            # The mp3 ledgered with its blocker; the WAV processed fine.
            assert row == ("input", "ffmpeg")
            assert report.processed >= 1  # tone.wav went through
            # Simulated heal: pretend ffmpeg appeared → ledger row clears.
            import panoptikon_tpu.jobs.media as _m

            orig = _m.capabilities
            _m.capabilities = lambda: {"ffmpeg": True}
            try:
                healed, _shas = scan.heal_blocked(env["db"], env["writer"])
            finally:
                _m.capabilities = orig
            left = conn.execute(
                "SELECT COUNT(*) FROM extraction_errors WHERE blocker='ffmpeg'"
            ).fetchone()[0]
            assert left == 0
        finally:
            manager.shutdown()


def _tiny_png() -> bytes:
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (8, 8), (200, 40, 40)).save(buf, format="PNG")
    return buf.getvalue()


def make_flac(path, title="Song", artist="Band", cover=None):
    """Minimal valid-enough FLAC: STREAMINFO + VORBIS_COMMENT (+ PICTURE)."""
    bits = (44100 << 44) | (1 << 41) | (15 << 36) | 441000  # 2ch, 10 s
    streaminfo = b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16
    comments = [f"TITLE={title}".encode(), f"ARTIST={artist}".encode()]
    vc = (0).to_bytes(4, "little") + len(comments).to_bytes(4, "little")
    for c in comments:
        vc += len(c).to_bytes(4, "little") + c
    blocks = [(0, streaminfo), (4, vc)]
    if cover:
        pic = (
            (3).to_bytes(4, "big")
            + (9).to_bytes(4, "big") + b"image/png"
            + (0).to_bytes(4, "big")
            + b"\x00" * 16
            + len(cover).to_bytes(4, "big") + cover
        )
        blocks.append((6, pic))
    out = b"fLaC"
    for i, (btype, body) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out += bytes([last | btype]) + len(body).to_bytes(3, "big") + body
    path.write_bytes(out)


def make_mp3(path, title="Hello"):
    """ID3v2.3 TIT2 tag + one MPEG1 Layer III frame with a Xing header
    declaring 1000 frames (≈26.12 s at 44100)."""
    payload = b"\x00" + title.encode("latin-1")
    tit2 = b"TIT2" + len(payload).to_bytes(4, "big") + b"\x00\x00" + payload
    body = tit2
    size = len(body)
    syncsafe = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                      (size >> 7) & 0x7F, size & 0x7F])
    id3 = b"ID3\x03\x00\x00" + syncsafe + body
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 32
    frame += b"Xing" + (1).to_bytes(4, "big") + (1000).to_bytes(4, "big")
    frame += b"\x00" * 300
    path.write_bytes(id3 + frame)


def make_ogg(path, title="Ogg Song"):
    ident = b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2]) \
        + (48000).to_bytes(4, "little") + b"\x00" * 16
    page1 = b"OggS" + b"\x00\x02" + b"\x00" * 8 + b"\x00" * 12 \
        + b"\x01" + bytes([len(ident)]) + ident
    comment = f"TITLE={title}".encode()
    vc = (0).to_bytes(4, "little") + (1).to_bytes(4, "little") \
        + len(comment).to_bytes(4, "little") + comment
    cpkt = b"\x03vorbis" + vc
    page2 = b"OggS" + b"\x00\x00" + b"\x00" * 8 + b"\x00" * 12 \
        + b"\x01" + bytes([len(cpkt)]) + cpkt
    last = b"OggS" + b"\x00\x04" + (480000).to_bytes(8, "little") \
        + b"\x00" * 12 + b"\x00"
    path.write_bytes(page1 + page2 + last)


class TestAudioInfo:
    """Pure-Python container metadata (the reference reads via lofty,
    files.rs:24): duration + tags + cover art for FLAC/MP3/OGG/WAV."""

    def test_flac(self, tmp_path):
        p = tmp_path / "a.flac"
        make_flac(p, title="Song", artist="Band", cover=_tiny_png())
        info = media.audio_info(str(p))
        assert info.sample_rate == 44100 and info.channels == 2
        assert info.duration == pytest.approx(10.0)
        assert info.title == "Song" and info.artist == "Band"
        assert info.cover == _tiny_png()

    def test_mp3_xing(self, tmp_path):
        p = tmp_path / "a.mp3"
        make_mp3(p, title="Hello")
        info = media.audio_info(str(p))
        assert info.sample_rate == 44100
        assert info.title == "Hello"
        assert info.duration == pytest.approx(1000 * 1152 / 44100)

    def test_ogg(self, tmp_path):
        p = tmp_path / "a.ogg"
        make_ogg(p, title="Ogg Song")
        info = media.audio_info(str(p))
        assert info.sample_rate == 48000 and info.channels == 2
        assert info.duration == pytest.approx(10.0)
        assert info.title == "Ogg Song"

    def test_garbage_never_raises(self, tmp_path):
        p = tmp_path / "x.mp3"
        p.write_bytes(b"\x00\x01garbage")
        info = media.audio_info(str(p))
        assert info.duration is None
        assert media.audio_info(str(tmp_path / "missing.mp3")).title == ""

    def test_thumbnail_cover_art(self, tmp_path):
        p = tmp_path / "a.flac"
        make_flac(p, cover=_tiny_png())
        jpeg, w, h = media.audio_thumbnail(str(p), "audio/flac")
        assert (w, h) == (8, 8) and jpeg[:2] == b"\xff\xd8"

    def test_thumbnail_placeholder(self, tmp_path):
        p = tmp_path / "a.mp3"
        make_mp3(p)
        jpeg, w, h = media.audio_thumbnail(str(p), "audio/mpeg")
        assert (w, h) == (media.AUDIO_THUMB_DIM, media.AUDIO_THUMB_DIM)
        assert jpeg[:2] == b"\xff\xd8"

    def test_scan_row_gets_duration_and_thumb(self, tmp_path):
        p = tmp_path / "a.flac"
        make_flac(p)
        row = scan.process_path(str(p), None, make_thumbnails=True)
        assert row.mime.startswith("audio/")
        assert row.duration == pytest.approx(10.0)
        assert row.thumb is not None and row.audio_tracks == 1


class TestHtmlIntake:
    """HTML → headless-browser screenshot (files.rs:4692), blocker-gated
    like pdfium: absent browser = 'blocked' ledger row that heals when one
    appears."""

    def test_blocked_without_browser(self, tmp_path, monkeypatch):
        monkeypatch.setattr(media, "html_renderer_path", lambda: None)
        p = tmp_path / "page.html"
        p.write_text("<html><body><h1>hi</h1></body></html>")
        row = scan.process_path(str(p), None, make_thumbnails=True)
        assert row.mime == "text/html"
        assert row.attempt[1] == "blocked"
        assert row.error[2] == "html-renderer"

    def test_capability_key_exists(self):
        assert "html-renderer" in media.capabilities()

    @pytest.mark.skipif(
        not media.html_renderer_available(), reason="no headless browser"
    )
    def test_renders_when_browser_present(self, tmp_path):
        p = tmp_path / "page.html"
        p.write_text("<html><body style='background:#f00'>x</body></html>")
        frames = media.render_html_screenshot(str(p))
        assert frames and frames[0][1] > 0


def test_mp3_id3v1_fallback(tmp_path):
    p = tmp_path / "old.mp3"
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 400
    tag = b"TAG" + b"Old Title".ljust(30, b"\x00") \
        + b"Old Artist".ljust(30, b"\x00") + b"Old Album".ljust(30, b"\x00") \
        + b"\x00" * 35
    p.write_bytes(frame + tag)
    info = media.audio_info(str(p))
    assert info.title == "Old Title" and info.artist == "Old Artist"
    assert info.album == "Old Album"


def test_m4a_mvhd_duration(tmp_path):
    p = tmp_path / "a.m4a"
    # ftyp box + moov/mvhd (version 0): timescale 600, duration 6000 → 10 s.
    ftyp = (16).to_bytes(4, "big") + b"ftypM4A " + b"\x00" * 4
    mvhd = b"mvhd" + b"\x00" * 12 + (600).to_bytes(4, "big") \
        + (6000).to_bytes(4, "big") + b"\x00" * 4
    moov = (8 + 4 + len(mvhd)).to_bytes(4, "big") + b"moov" \
        + (4 + len(mvhd)).to_bytes(4, "big") + mvhd
    p.write_bytes(ftyp + moov)
    info = media.audio_info(str(p), "audio/mp4")
    assert info.duration == pytest.approx(10.0)


def test_heal_clears_html_blocker(tmp_path, monkeypatch):
    """scan_errors rows blocked on html-renderer heal once a browser
    appears (the generic heal pass keyed on capabilities())."""
    from panoptikon_tpu.db.connection import Database
    from panoptikon_tpu.db.writer import IndexWriter

    db = Database(tmp_path / "data", "heal")
    writer = IndexWriter(db)
    try:
        monkeypatch.setattr(media, "html_renderer_path", lambda: None)
        page = tmp_path / "page.html"
        page.write_text("<html/>")
        scan.rescan_folders(db, writer, folders=[str(tmp_path)])
        n = db.reader().execute(
            "SELECT COUNT(*) FROM scan_errors WHERE blocker='html-renderer'"
        ).fetchone()[0]
        assert n == 1
        monkeypatch.setattr(media, "html_renderer_path", lambda: "/bin/true")
        healed, shas = scan.heal_blocked(db, writer)
        assert healed >= 1
        n = db.reader().execute(
            "SELECT COUNT(*) FROM scan_errors WHERE blocker='html-renderer'"
        ).fetchone()[0]
        assert n == 0
    finally:
        writer.close()
