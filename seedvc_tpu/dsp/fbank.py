"""Kaldi-compatible log-mel filterbank features (input to CAMPPlus).

Implements the exact semantics of ``torchaudio.compliance.kaldi.fbank`` with
the parameters the reference uses at every call site
(``inference.py:425-429``): ``num_mel_bins=80, dither=0,
sample_frequency=16000`` and all other arguments at their Kaldi defaults:

- 25 ms / 10 ms frames (400/160 samples @16 kHz), snip_edges=True,
- per-frame DC offset removal, pre-emphasis 0.97 (first sample replicated),
- povey window ``(0.5 - 0.5 cos(2 pi n/(N-1)))**0.85``,
- zero-pad to 512 (next power of two), power spectrum,
- HTK-mel triangular bank computed in mel space, low 20 Hz, high = Nyquist,
- ``log(max(mel, eps_f32))``.

The caller subtracts the per-utterance mean (reference ``inference.py:427``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from seedvc_tpu.dsp.stft import frame_signal


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def povey_window(n: int) -> np.ndarray:
    i = np.arange(n)
    return ((0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))) ** 0.85).astype(np.float32)


def _mel(hz):
    return 1127.0 * np.log(1.0 + np.asarray(hz, np.float64) / 700.0)


@functools.lru_cache(maxsize=8)
def kaldi_mel_banks(num_bins: int, padded_window_size: int, sr: float,
                    low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """(num_bins, padded_window_size//2 + 1) triangular bank, mel-space slopes.

    high_freq <= 0 means Nyquist + high_freq.  The Nyquist column is zero
    (Kaldi computes bins only up to padded_window_size//2).
    """
    if high_freq <= 0.0:
        high_freq = sr / 2.0 + high_freq
    n_fft_bins = padded_window_size // 2
    fft_bin_width = sr / padded_window_size
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, n_fft_bins + 1), np.float64)
    mel_freqs = _mel(np.arange(n_fft_bins) * fft_bin_width)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        bins[b, :n_fft_bins] = np.clip(np.minimum(up, down), 0.0, None)
    return bins.astype(np.float32)


def kaldi_fbank(
    wave: jax.Array,
    num_mel_bins: int = 80,
    sr: int = 16000,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    subtract_mean: bool = False,
) -> jax.Array:
    """(B, T) or (T,) waveform (Kaldi convention: multiply by 32768 before
    calling if matching int16-scaled checkpoints — the reference feeds
    [-1, 1] floats directly) -> (B, n_frames, num_mel_bins) log-mel."""
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None]
    win = int(sr * frame_length_ms / 1000)
    hop = int(sr * frame_shift_ms / 1000)
    padded = _next_pow2(win)

    frames = frame_signal(wave, win, hop)  # (B, N, win)
    if remove_dc_offset:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if preemphasis != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(povey_window(win))
    frames = jnp.pad(frames, [(0, 0), (0, 0), (0, padded - win)])

    # Power spectrum via the matmul DFT (MXU path).
    from seedvc_tpu.dsp.stft import _dft_bases

    cos_b, sin_b = _dft_bases(padded)
    re = jnp.matmul(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im

    banks = jnp.asarray(kaldi_mel_banks(num_mel_bins, padded, float(sr)).T)
    mel = jnp.matmul(power, banks, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    mel = jnp.log(jnp.maximum(mel, float(np.finfo(np.float32).eps)))
    if subtract_mean:
        mel = mel - mel.mean(axis=1, keepdims=True)
    return mel[0] if squeeze else mel
