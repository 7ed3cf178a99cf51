"""Tests for the classical VAD (dsp/vad.py) — the built-in substitute for
the reference's fsmn-vad (realtime) and whisper/silero (se_extractor)."""

import numpy as np

from seedvc_tpu.dsp.vad import (is_speech_block, split_segments,
                                vad_decisions)


def _tone(sr, secs, f=220.0, amp=0.3):
    t = np.arange(int(secs * sr)) / sr
    # harmonic-rich "voiced" signal (low spectral flatness)
    return (amp * (np.sin(2 * np.pi * f * t)
                   + 0.5 * np.sin(2 * np.pi * 2 * f * t)
                   + 0.25 * np.sin(2 * np.pi * 3 * f * t))).astype(np.float32)


def test_vad_detects_tone_vs_silence():
    sr = 16000
    wave = np.concatenate([np.zeros(sr, np.float32), _tone(sr, 2.0),
                           np.zeros(sr, np.float32)])
    v = vad_decisions(wave, sr)
    frame = int(0.05 * sr)
    mid = v[int(1.2 * sr) // frame: int(2.6 * sr) // frame]
    head = v[: int(0.8 * sr) // frame]
    assert mid.mean() > 0.9
    assert head.mean() < 0.2


def test_vad_rejects_broadband_noise_block():
    """A loud white-noise block passes an RMS gate but not the flatness
    check; a tone block passes both."""
    sr = 16000
    rng = np.random.default_rng(0)
    noise = (0.3 * rng.standard_normal(sr // 4)).astype(np.float32)
    tone = _tone(sr, 0.25)
    assert not is_speech_block(noise, sr, threshold_db=-60.0)
    assert is_speech_block(tone, sr, threshold_db=-60.0)
    assert not is_speech_block(np.zeros(sr // 4, np.float32), sr,
                               threshold_db=-60.0)


def test_split_segments_policy():
    sr = 16000
    wave = np.concatenate([np.zeros(sr, np.float32), _tone(sr, 2.0),
                           np.zeros(sr, np.float32), _tone(sr, 3.0, f=180)])
    segs = split_segments(wave, sr, min_sec=1.5)
    assert 1 <= len(segs) <= 3
    for s in segs:
        assert len(s) >= 1.5 * sr
    # all-silence falls back to the whole utterance
    assert len(split_segments(np.zeros(2 * sr, np.float32), sr)) == 1


def test_vad_bridges_short_gaps():
    sr = 16000
    a, b = _tone(sr, 1.0), _tone(sr, 1.0)
    gap = np.zeros(int(0.1 * sr), np.float32)  # 2 frames at 50 ms
    v = vad_decisions(np.concatenate([a, gap, b]), sr)
    # the 2-frame gap inside the tone is bridged
    frame = int(0.05 * sr)
    inner = v[3: (len(a) + len(gap) + len(b)) // frame - 3]
    assert inner.all()


def test_vad_passes_fricative_band_noise_block():
    """Band-limited broadband energy (a sustained /s/-like fricative) must
    NOT be gated as noise: flatness_max is loose (0.8) and only true
    white/pink noise (smoothed flatness ~0.9+) is rejected."""
    from scipy.signal import butter, lfilter

    sr = 16000
    rng = np.random.default_rng(0)
    b, a = butter(4, [4000 / (sr / 2), 7000 / (sr / 2)], btype="band")
    fric = lfilter(b, a, 0.3 * rng.standard_normal(sr // 4)).astype(np.float32)
    assert is_speech_block(fric, sr, threshold_db=-60.0)
