"""DSP frontend parity tests.

The mel pipeline is verified against two independent references:
- the Slaney filterbank against ``transformers.audio_utils.mel_filter_bank``
  (same algorithm as librosa.filters.mel, which the reference uses at
  ``modules/audio.py:53``);
- the full log-mel against an inline torch.stft implementation of the
  reference formula (``modules/audio.py:45-82``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.dsp.mel import hann_window, log_mel_spectrogram, mel_filterbank
from seedvc_tpu.dsp.stft import frame_signal, istft, stft_magnitude


def test_mel_filterbank_matches_librosa_algorithm():
    from transformers.audio_utils import mel_filter_bank

    for sr, n_fft, n_mels, fmin, fmax in [
        (22050, 1024, 80, 0.0, None),
        (22050, 1024, 80, 0.0, 8000.0),
        (44100, 2048, 128, 0.0, None),
    ]:
        ours = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
        theirs = mel_filter_bank(
            num_frequency_bins=n_fft // 2 + 1,
            num_mel_filters=n_mels,
            min_frequency=fmin,
            max_frequency=fmax if fmax is not None else sr / 2.0,
            sampling_rate=sr,
            norm="slaney",
            mel_scale="slaney",
        ).T
        np.testing.assert_allclose(ours, theirs, atol=2e-7)


def test_hann_window_matches_torch():
    import torch

    np.testing.assert_allclose(
        hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6
    )


def test_stft_matmul_matches_fft():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 4096)).astype(np.float32)
    win = jnp.asarray(hann_window(1024))
    a = stft_magnitude(jnp.asarray(y), 1024, 256, win, method="matmul")
    b = stft_magnitude(jnp.asarray(y), 1024, 256, win, method="fft")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-4)


def test_log_mel_matches_torch_reference():
    import torch

    sr, n_fft, hop, win, n_mels = 22050, 1024, 256, 1024, 80
    rng = np.random.default_rng(1)
    y = (rng.standard_normal((2, sr)).astype(np.float32) * 0.1).clip(-1, 1)

    # Inline torch implementation of the reference formula.
    yt = torch.from_numpy(y)
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    basis = torch.from_numpy(mel_filterbank(sr, n_fft, n_mels))
    ref = torch.log(torch.clamp(basis @ mag, min=1e-5)).transpose(1, 2).numpy()

    ours = np.asarray(
        log_mel_spectrogram(jnp.asarray(y), sr, n_fft, hop, win, n_mels)
    )
    assert ours.shape == ref.shape == (2, sr // hop, n_mels)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_frame_signal_shape():
    y = jnp.arange(1000.0)
    f = frame_signal(y, 100, 50)
    assert f.shape == (19, 100)
    np.testing.assert_allclose(np.asarray(f[1][:3]), [50.0, 51.0, 52.0])


def test_istft_roundtrip():
    """iSTFT(STFT(x)) == x for center=True torch-style OLA (interior)."""
    import torch

    n_fft, hop = 16, 4
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 256)).astype(np.float32)
    win = torch.hann_window(n_fft)
    spec = torch.stft(torch.from_numpy(x), n_fft, hop, window=win,
                      center=True, return_complex=True)
    out = istft(
        jnp.asarray(spec.real.numpy().transpose(0, 2, 1)),
        jnp.asarray(spec.imag.numpy().transpose(0, 2, 1)),
        n_fft, hop, jnp.asarray(hann_window(n_fft)), out_length=256,
    )
    ref = torch.istft(spec, n_fft, hop, window=win, length=256).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
