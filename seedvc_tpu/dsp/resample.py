"""Polyphase sinc resampling (torchaudio.functional.resample semantics).

The reference resamples with ``torchaudio.functional.resample``
(e.g. ``inference.py:380, :405``): windowed-sinc polyphase with
lowpass_filter_width=6, rolloff=0.99, hann window.  Implemented here as a
strided conv with one filter per output phase — MXU/VPU friendly, static
shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _resample_kernel(orig_freq: int, new_freq: int,
                     lowpass_filter_width: int = 6,
                     rolloff: float = 0.99) -> tuple[np.ndarray, int]:
    """Returns (kernels (new_freq, width*2 + orig_freq), width)."""
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64) / new_freq)[:, None] + idx[None, :]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq / orig_freq
    denom = np.where(t == 0, 1.0, np.pi * t)
    kernels = np.where(t == 0, 1.0, np.sin(np.pi * t) / denom)
    kernels = kernels * window * scale
    return kernels.astype(np.float32), width


def resample(wave: jax.Array, orig_sr: int, new_sr: int) -> jax.Array:
    """(B, T) or (T,) -> resampled along last axis."""
    if orig_sr == new_sr:
        return wave
    squeeze = wave.ndim == 1
    if squeeze:
        wave = wave[None]
    g = math.gcd(orig_sr, new_sr)
    orig, new = orig_sr // g, new_sr // g
    kernels, width = _resample_kernel(orig, new)

    T = wave.shape[-1]
    target_len = -(-new * T // orig)  # ceil
    x = jnp.pad(wave, ((0, 0), (width, width + orig)))
    # conv: out (B, T//orig + 1, new) -> interleave phases.
    k = jnp.asarray(kernels.T[:, None, :])  # (K, 1, new)
    y = jax.lax.conv_general_dilated(
        x[..., None], k, window_strides=(orig,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, frames, new)
    y = y.reshape(y.shape[0], -1)[:, :target_len]
    return y[0] if squeeze else y


def resample_host(wave, orig_sr: int, new_sr: int):
    """Host-side polyphase resampling (scipy) for pipeline pre-processing.

    Numerically equivalent class of kaiser-windowed polyphase filtering as
    :func:`resample`, but runs on the host CPU: shipping a 30 s waveform to
    the device and back just to decimate it costs more in transfers than the
    arithmetic (the device version remains the right choice INSIDE jitted
    programs, e.g. the fused streaming block).
    """
    import numpy as np
    from scipy.signal import resample_poly

    if orig_sr == new_sr:
        return np.asarray(wave, np.float32)
    g = math.gcd(orig_sr, new_sr)
    out = resample_poly(np.asarray(wave, np.float32), new_sr // g,
                        orig_sr // g, axis=-1)
    return out.astype(np.float32)


def warp_rate(wave: jax.Array, rate) -> jax.Array:
    """Fixed-shape random-rate time warp: ``out[i] = wave[i * rate]`` by
    linear interpolation, zero past the warped end.

    Augmentation-only resampler (NANSY-style formant/timbre perturbation in
    the trainer fallback path): ``rate`` is a TRACED scalar, so every rate
    reuses ONE compiled program — the polyphase :func:`resample` specialises
    per static ratio, which for per-step random rates means a multi-second
    XLA recompile every train step (observed ~5 s/step through the axon
    remote-compile tunnel).  Linear interpolation is plenty for
    augmentation; inference paths keep the windowed-sinc resampler.
    """
    T = wave.shape[-1]
    pos = jnp.arange(T, dtype=jnp.float32) * rate
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    frac = pos - i0.astype(jnp.float32)
    g0 = jnp.take(wave, i0, axis=-1)
    g1 = jnp.take(wave, jnp.clip(i0 + 1, 0, T - 1), axis=-1)
    out = g0 * (1.0 - frac) + g1 * frac
    return jnp.where(pos <= T - 1, out, 0.0)
