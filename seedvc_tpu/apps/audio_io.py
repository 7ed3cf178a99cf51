"""Minimal WAV read/write (scipy-backed; no librosa/soundfile dependency)."""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile


def load_wav(path: str) -> tuple[np.ndarray, int]:
    """Returns (float32 mono waveform in [-1, 1], sample_rate)."""
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wave = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wave = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wave = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wave = data.astype(np.float32)
    if wave.ndim == 2:
        wave = wave.mean(axis=1)
    return wave, sr


def save_wav(path: str, wave: np.ndarray, sr: int) -> None:
    wave = np.clip(wave, -1.0, 1.0)
    wavfile.write(path, sr, (wave * 32767.0).astype(np.int16))
