"""Outro detector pixel-logic tests on synthetic buffers (the reference
tests the same half the same way — outro.rs test module)."""

import numpy as np

from panoptikon_tpu.jobs import outro

H, W = 26, outro.W  # 48 wide, arbitrary small height


def card_frame(ink_rows=3):
    """A near-empty card-colored frame with ink in a few central rows."""
    frame = np.tile(
        np.array(outro.CARD_BG, dtype=np.uint8), (H, W, 1)
    )
    mid = H // 2
    frame[mid : mid + ink_rows, 10:20] = [200, 200, 200]
    return frame


def content_frame():
    rng = np.random.default_rng(0)
    return rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)


class TestFrameScoring:
    def test_card_frame_is_card(self):
        assert outro.frame_is_card(card_frame())

    def test_content_frame_is_not(self):
        assert not outro.frame_is_card(content_frame())

    def test_dark_but_busy_frame_fails_bgfrac(self):
        # Median on the card color but >55% of pixels off-median.
        frame = np.tile(np.array(outro.CARD_BG, dtype=np.uint8), (H, W, 1))
        rng = np.random.default_rng(1)
        noise_mask = rng.random((H, W)) < 0.56
        frame[noise_mask] = [80, 80, 80]
        # Median still card-ish (44% majority... ensure median stays put)
        if outro.on_background(outro.frame_median(frame)):
            assert not outro.frame_is_card(frame)


class TestRules:
    def run_tail(self, lead_frames, run_frames, last=None):
        card = np.array([False] * lead_frames + [True] * run_frames)
        return outro.verdict_from_tail(card, last if last is not None else card_frame())

    def test_happy_path(self):
        v = self.run_tail(lead_frames=60, run_frames=120)
        assert v.kind == outro.KIND_TIKTOK_CARD
        assert v.outro_seconds == 4.0
        assert v.kind_string == "tiktok_card/1"

    def test_r0_run_floor(self):
        # 30 frames = exactly 1.0s: allowed; 29 rejected.
        assert self.run_tail(60, 30).kind == outro.KIND_TIKTOK_CARD
        v = self.run_tail(60, 29)
        assert v.reject_reason == "no_run"

    def test_r1_requires_boundary(self):
        v = self.run_tail(lead_frames=5, run_frames=120)  # lead 0.17s < 0.4
        assert v.reject_reason == "no_boundary"

    def test_r2_run_cap(self):
        assert self.run_tail(60, 150).kind == outro.KIND_TIKTOK_CARD  # 5.0s ok
        v = self.run_tail(60, 151)
        assert v.reject_reason == "too_long"

    def test_r3_ink_spread(self):
        busy = np.tile(np.array(outro.CARD_BG, dtype=np.uint8), (H, W, 1))
        busy[: int(H * 0.7), 10:20] = [200, 200, 200]  # ink on 70% of rows
        v = self.run_tail(60, 120, last=busy)
        assert v.reject_reason == "layout"

    def test_gap_tolerant_run(self):
        # The animated sweep: a short dip inside the terminal run bridges.
        card = np.array([False] * 60 + [True] * 50 + [False] * 3 + [True] * 67)
        v = outro.verdict_from_tail(card, card_frame())
        assert v.kind == outro.KIND_TIKTOK_CARD
        assert v.outro_seconds == 4.0  # run spans the dip


class TestTerminalRun:
    def test_no_cards(self):
        assert outro.terminal_run_start(np.zeros(100, bool)) == 100

    def test_pure_suffix(self):
        card = np.array([False] * 70 + [True] * 30)
        assert outro.terminal_run_start(card) == 70

    def test_isolated_early_card_not_joined(self):
        card = np.zeros(100, bool)
        card[10] = True
        card[80:] = True
        # 10 joining would make suffix mean (21/90) < 0.9 → start stays 80.
        assert outro.terminal_run_start(card) == 80
