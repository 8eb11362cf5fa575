"""Input handler tests: the aspect-ratio / pixel slicing contract
(reference image_frames.rs:252-400)."""

import io

import pytest
from PIL import Image

from panoptikon_tpu.jobs import input_handlers as ih


def png(w, h):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), (100, 150, 200)).save(buf, format="PNG")
    return buf.getvalue()


class TestRatioMath:
    def test_excessive_ratio_threshold(self):
        s = ih.SliceSettings()  # 16/9 * 2.0 = 3.556
        assert not ih.is_excessive_ratio(1600, 900, s)
        assert not ih.is_excessive_ratio(3200, 900, s)  # 3.556 not > 3.556
        assert ih.is_excessive_ratio(3300, 900, s)
        # Portrait symmetric.
        assert ih.is_excessive_ratio(900, 3300, s)

    def test_slices_needed(self):
        s = ih.SliceSettings()
        # ratio 10 → ceil(10 / (16/9*1.5)) = ceil(3.75) = 4
        assert ih.slices_needed(10_000, 1000, s) == 4
        assert ih.slices_needed(2000, 1000, s) == 1  # under max ratio

    def test_grid_for_pixels(self):
        s = ih.SliceSettings()
        assert ih.grid_for_pixels(5000, 1200, s) == (2, 5)


class TestSliceImage:
    def test_small_image_never_sliced(self):
        # Tall ratio but under minimum_size → untouched.
        out = ih.slice_image_bytes(png(100, 900), ih.SliceSettings())
        assert len(out) == 1

    def test_long_landscape_slices_along_width(self):
        s = ih.SliceSettings(minimum_size=100)
        payload = png(4000, 400)  # ratio 10 → 4 slices
        out = ih.slice_image_bytes(payload, s)
        assert len(out) == 4
        widths = [Image.open(io.BytesIO(b)).size[0] for b in out]
        assert sum(widths) == 4000
        heights = {Image.open(io.BytesIO(b)).size[1] for b in out}
        assert heights == {400}

    def test_long_portrait_slices_along_height(self):
        s = ih.SliceSettings(minimum_size=100)
        out = ih.slice_image_bytes(png(400, 4000), s)
        assert len(out) == 4
        heights = [Image.open(io.BytesIO(b)).size[1] for b in out]
        assert sum(heights) == 4000

    def test_pixels_mode_grids_large_images(self):
        s = ih.SliceSettings(mode="pixels", pixel_max_size=1000,
                             pixel_target_size=500)
        out = ih.slice_image_bytes(png(1200, 600), s)
        assert len(out) == 2 * 3  # rows=2 (600/500), cols=3 (1200/500)

    def test_pixels_mode_small_untouched(self):
        s = ih.SliceSettings(mode="pixels")
        assert len(ih.slice_image_bytes(png(800, 600), s)) == 1


class TestPrepareFrames:
    def test_stored_frames_preferred(self, tmp_path):
        from panoptikon_tpu.db.connection import Database

        db = Database(tmp_path, "frames")
        conn = db.write_connection()
        with conn:
            for i in range(6):
                conn.execute(
                    """INSERT INTO storage.frames
                       (item_sha256, idx, item_mime_type, width, height,
                        version, frame) VALUES (?,?,?,?,?,1,?)""",
                    ("s" * 64, i, "video/mp4", 10, 10, png(10, 10)),
                )
        out = ih.prepare_image_frames(
            conn, 1, "s" * 64, b"filebytes", max_frames=4
        )
        assert len(out) == 4  # capped at max_frames
        conn.close()

    def test_falls_back_to_payload(self, tmp_path):
        from panoptikon_tpu.db.connection import Database

        db = Database(tmp_path, "frames2")
        conn = db.write_connection()
        out = ih.prepare_image_frames(conn, 1, "x" * 64, png(20, 20))
        assert len(out) == 1
        conn.close()


class TestAudioTracks:
    def test_wav_passthrough(self, tmp_path):
        import wave as _wave

        import numpy as np

        from panoptikon_tpu.jobs.input_handlers import prepare_audio_tracks

        path = tmp_path / "t.wav"
        pcm = (np.sin(np.arange(1600) / 10) * 20000).astype(np.int16)
        with _wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        payload = path.read_bytes()
        out = prepare_audio_tracks(str(path), payload, "audio/wav")
        assert out == [payload]

    def test_non_wav_blocked_without_ffmpeg(self, tmp_path):
        import pytest as _pytest

        from panoptikon_tpu.jobs import media
        from panoptikon_tpu.jobs.input_handlers import prepare_audio_tracks

        if media.ffmpeg_available():
            _pytest.skip("ffmpeg present")
        path = tmp_path / "t.mp3"
        path.write_bytes(b"ID3 fake")
        with _pytest.raises(media.MediaError) as ei:
            prepare_audio_tracks(str(path), path.read_bytes(), "audio/mpeg")
        assert ei.value.blocker == "ffmpeg"
