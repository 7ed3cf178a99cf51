"""Log-mel spectrogram frontend matching the reference formula bit-for-bit.

Reference semantics (``modules/audio.py:45-82``):
  1. reflect-pad the waveform by (n_fft - hop)//2 on both sides,
  2. STFT with a periodic Hann window, center=False,
  3. magnitude = sqrt(re^2 + im^2 + 1e-9),
  4. matmul with a librosa Slaney-normalised mel filterbank,
  5. log(clamp(x, min=1e-5)).

The filterbank is computed here from first principles (Slaney mel scale,
triangular filters, slaney area normalisation) since librosa is not a
dependency; parity is tested against ``transformers.audio_utils
.mel_filter_bank`` which implements the identical librosa algorithm.

Output layout is (B, n_frames, n_mels) — time-major, channels-last (the TPU
lane dimension) — unlike the reference's (B, n_mels, T).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from seedvc_tpu.core.config import SpectConfig
from seedvc_tpu.dsp.stft import stft_magnitude


def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = win_length if periodic else win_length - 1
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / n))).astype(
        np.float32
    )


def _hz_to_mel(hz, htk: bool = False):
    hz = np.asarray(hz, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + hz / 700.0)
    f_sp = 200.0 / 3
    mel = hz / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(hz >= min_log_hz, min_log_mel + np.log(np.maximum(hz, 1e-10) / min_log_hz) / logstep, mel)


def _mel_to_hz(mel, htk: bool = False):
    mel = np.asarray(mel, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    hz = mel * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mel >= min_log_mel, min_log_hz * np.exp(logstep * (mel - min_log_mel)), hz)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, n_fft//2 + 1).

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) defaults
    (Slaney scale + Slaney norm), the filterbank the reference caches at
    ``modules/audio.py:52-54``.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
        weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def log_mel_spectrogram(
    y: jax.Array,
    sr: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    method: str = "matmul",
) -> jax.Array:
    """(B, T) waveform in [-1, 1] -> (B, T//hop, n_mels) log-mel."""
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    window = hann_window(win_length)
    if win_length < n_fft:  # torch pads the window symmetrically to n_fft
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    mag = stft_magnitude(y, n_fft, hop_length, jnp.asarray(window), method=method)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T)
    mel = jnp.matmul(mag, basis, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, 1e-5))


class MelFrontend:
    """Config-bound mel closure (analogue of the reference's ``to_mel``
    partial, e.g. ``inference.py:314-327``), jitted once per input shape."""

    def __init__(self, sr: int, spect: SpectConfig, method: str = "matmul"):
        self.sr = sr
        self.spect = spect
        self._fn = jax.jit(
            functools.partial(
                log_mel_spectrogram,
                sr=sr,
                n_fft=spect.n_fft,
                hop_length=spect.hop_length,
                win_length=spect.win_length,
                n_mels=spect.n_mels,
                fmin=spect.fmin,
                fmax=spect.fmax,
                method=method,
            )
        )

    def __call__(self, y: jax.Array) -> jax.Array:
        return self._fn(y)

    def frames_for_samples(self, n_samples: int) -> int:
        return n_samples // self.spect.hop_length
