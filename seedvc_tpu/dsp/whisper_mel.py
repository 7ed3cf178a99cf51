"""Whisper log-mel frontend (HF WhisperFeatureExtractor semantics).

The reference feeds audio through ``AutoFeatureExtractor`` then the Whisper
encoder (``inference.py:188-193``).  Semantics reproduced here:

- pad/truncate audio to 30 s (480000 samples @16 kHz),
- STFT: n_fft 400, hop 160, periodic Hann, center=True reflect padding,
- power spectrum, Slaney mel bank (80 bins, 0..8000 Hz),
- ``log10(clip(mel, 1e-10))``, floored at global max - 8, then ``(x+4)/4``,
- drop the final frame -> exactly 3000 frames.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from seedvc_tpu.dsp.mel import hann_window, mel_filterbank
from seedvc_tpu.dsp.stft import _dft_bases, frame_signal

N_FFT = 400
HOP = 160
N_MELS = 80
SR = 16000
CHUNK = 30 * SR


@functools.partial(jax.jit, static_argnames=())
def whisper_log_mel(wave: jax.Array) -> jax.Array:
    """(B, T<=480000) -> (B, 3000, 80) whisper-normalised log-mel."""
    B, T = wave.shape
    wave = jnp.pad(wave, ((0, 0), (0, CHUNK - T)))
    # center=True: reflect-pad n_fft//2.
    y = jnp.pad(wave, ((0, 0), (N_FFT // 2, N_FFT // 2)), mode="reflect")
    window = jnp.asarray(hann_window(N_FFT))
    frames = frame_signal(y, N_FFT, HOP) * window
    cos_b, sin_b = _dft_bases(N_FFT)
    re = jnp.matmul(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    power = (re * re + im * im)[:, :-1, :]  # drop final frame
    mel = jnp.matmul(power, jnp.asarray(mel_filterbank(SR, N_FFT, N_MELS, 0.0, 8000.0).T),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           log_spec.max(axis=(1, 2), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0
