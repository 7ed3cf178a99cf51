"""Framing and STFT primitives, TPU-first.

Instead of cuFFT-style batched FFTs (the torch path in the reference,
``modules/audio.py:62-75``), the default implementation expresses the DFT as
two real matmuls against precomputed cos/sin bases — for speech-sized FFTs
(n_fft 1024–2048) this runs on the MXU, fuses with the downstream mel-basis
matmul, and avoids XLA's slower generic FFT path.  ``jnp.fft.rfft`` remains
available as a correctness reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def frame_signal(y: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Slice a signal (..., T) into overlapping frames (..., n_frames, frame_length).

    Static shapes only (jit-friendly): n_frames = 1 + (T - frame_length)//hop.
    """
    T = y.shape[-1]
    n_frames = 1 + (T - frame_length) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return y[..., idx]


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-input DFT bases: (n_fft, n_fft//2+1) cos and -sin matrices."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop: int,
    window: jax.Array,
    eps: float = 1e-9,
    method: str = "matmul",
) -> jax.Array:
    """|STFT| of (..., T) -> (..., n_frames, n_fft//2 + 1), center=False.

    Magnitude is ``sqrt(re^2 + im^2 + eps)`` — the reference's numerically
    safe magnitude (``modules/audio.py:77``).  The window must already be
    padded to n_fft length.
    """
    frames = frame_signal(y, n_fft, hop) * window
    if method == "matmul":
        cos_b, sin_b = _dft_bases(n_fft)
        # HIGHEST precision: the DFT needs full fp32 accuracy; the default TPU
        # matmul precision truncates inputs to bf16.
        re = jnp.matmul(frames, jnp.asarray(cos_b),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        im = jnp.matmul(frames, jnp.asarray(sin_b),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    else:
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
        re, im = spec.real, spec.imag
    return jnp.sqrt(re * re + im * im + eps)


def istft(
    spec_real: jax.Array,
    spec_imag: jax.Array,
    n_fft: int,
    hop: int,
    window: jax.Array,
    out_length: int | None = None,
) -> jax.Array:
    """Inverse STFT by overlap-add (center=True torch semantics).

    Inputs are (..., n_frames, n_fft//2+1).  Used by the HiFT/iSTFT-NSF
    vocoder (reference ``modules/hifigan/generator.py:393-398``).  The
    windowed frames are overlap-added and normalised by the summed squared
    window, then the n_fft//2 centre padding is trimmed.
    """
    cos_b, sin_b = _dft_bases(n_fft)
    # Inverse real DFT: x = (1/n) * (Re @ C^T * w_k + Im @ S^T * w_k) with
    # weight 2 for interior bins (conjugate symmetry), 1 for DC/Nyquist.
    n_bins = n_fft // 2 + 1
    w = np.full((n_bins,), 2.0, np.float32)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    inv_cos = (cos_b * w[None, :] / n_fft).astype(np.float32)  # (n_fft, bins)
    inv_sin = (sin_b * w[None, :] / n_fft).astype(np.float32)
    frames = (
        jnp.matmul(spec_real, jnp.asarray(inv_cos).T,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        + jnp.matmul(spec_imag, jnp.asarray(inv_sin).T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    )
    frames = frames * window

    n_frames = frames.shape[-2]
    total = n_fft + hop * (n_frames - 1)
    # Overlap-add via segment scatter.
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    flat_idx = jnp.asarray(idx.reshape(-1))
    batch_shape = frames.shape[:-2]
    flat_frames = frames.reshape(*batch_shape, -1)
    sig = jnp.zeros((*batch_shape, total), frames.dtype).at[..., flat_idx].add(flat_frames)
    wsq = jnp.zeros((total,), frames.dtype).at[flat_idx].add(
        jnp.tile(window * window, (n_frames,)))
    sig = sig / jnp.maximum(wsq, 1e-11)
    # Trim center padding.
    sig = sig[..., n_fft // 2: total - n_fft // 2]
    if out_length is not None:
        sig = sig[..., :out_length]
    return sig
