"""HiFT generator — NSF + iSTFT vocoder (CosyVoice ``hift.pt``), TPU-native.

Re-design of the reference HiFTGenerator
(``modules/hifigan/generator.py:284-454``) in channels-last layout:

- ConvRNNF0Predictor predicts F0 from mel (``f0_predictor.py:19-55``),
- F0 upsampled to sample rate; SineGen builds 9 harmonic sines with cumsum
  phase, voiced/unvoiced gating and noise (``generator.py:164-227``),
- SourceModuleHnNSF merges harmonics via linear+tanh (``:230-279``),
- the source's STFT (n_fft 16, hop 4) is fused into the mel upsampling
  branch via ``source_downs`` convs + ResBlocks,
- mel branch: conv_pre -> 2x [leaky_relu -> ConvTranspose up -> source
  fusion -> snake ResBlocks] -> reflection pad (1,0) at the last stage ->
  conv_post -> split magnitude (exp, clipped 1e2) / phase (sin) -> iSTFT ->
  clamp +-0.99.

Weight norm folded at conversion.  SineGen's random phase/noise take an
explicit PRNG key (the streaming pipeline carries it as state).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from seedvc_tpu.dsp.mel import hann_window
from seedvc_tpu.dsp.stft import istft


@dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 22050
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Sequence[int] = (8, 8)
    upsample_kernel_sizes: Sequence[int] = (16, 16)
    istft_n_fft: int = 16
    istft_hop: int = 4
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    source_resblock_kernel_sizes: Sequence[int] = (7, 11)
    source_resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 2
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99

    @property
    def total_upsample(self) -> int:
        r = self.istft_hop
        for u in self.upsample_rates:
            r *= u
        return r


class Snake1(nn.Module):
    """Plain snake (non-logscale, per-channel alpha) as used by HiFT ResBlocks."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,))
        s = jnp.sin(x * alpha)
        return x + (1.0 / (alpha + 1e-9)) * (s * s)


class HiFTResBlock(nn.Module):
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        from seedvc_tpu.nn.wavenet import DilatedConvAsMatmul

        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            h = Snake1(self.channels, name=f"act1_{i}")(x)
            # Shifted-matmul convs (MXU path; param pytree matches nn.Conv —
            # see models/bigvgan.py AMPBlock1 for the rationale/measurement).
            pad = (k - 1) // 2 * d
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            h = DilatedConvAsMatmul(self.channels, k, dilation=d,
                                    name=f"convs1_{i}")(h)
            h = Snake1(self.channels, name=f"act2_{i}")(h)
            pad = (k - 1) // 2
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            h = DilatedConvAsMatmul(self.channels, k, name=f"convs2_{i}")(h)
            x = x + h
        return x


class ConvRNNF0Predictor(nn.Module):
    cond_channels: int = 512

    @nn.compact
    def __call__(self, mel):
        """mel: (B, T, 80) -> f0 (B, T)."""
        h = mel
        for i in range(5):
            h = nn.Conv(self.cond_channels, (3,), padding=[(1, 1)],
                        name=f"condnet_{i}")(h)
            h = jax.nn.elu(h)
        return jnp.abs(nn.Dense(1, name="classifier")(h))[..., 0]


def sine_source(key: jax.Array, f0_up: jax.Array, cfg: HiFTConfig):
    """SineGen (``generator.py:164-227``). f0_up: (B, T_samples) Hz.

    Returns (sine_waves (B, T, H+1), uv (B, T, 1))."""
    B, T = f0_up.shape
    H = cfg.nb_harmonics + 1
    harmonics = jnp.arange(1, H + 1, dtype=jnp.float32)
    F_mat = f0_up[:, :, None] * harmonics[None, None, :] / cfg.sampling_rate
    theta = 2 * np.pi * (jnp.cumsum(F_mat, axis=1) % 1.0)
    k_phase, k_noise = jax.random.split(key)
    phase = jax.random.uniform(k_phase, (B, 1, H), minval=-np.pi, maxval=np.pi)
    phase = phase.at[:, :, 0].set(0.0)
    sine_waves = cfg.nsf_alpha * jnp.sin(theta + phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[..., None]
    noise_amp = uv * cfg.nsf_sigma + (1 - uv) * cfg.nsf_alpha / 3
    noise = noise_amp * jax.random.normal(k_noise, sine_waves.shape)
    return sine_waves * uv + noise, uv


def _stft_16(x: jax.Array, n_fft: int, hop: int):
    """torch.stft(center=True, win=n_fft) -> (real, imag) (B, frames, bins)."""
    y = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    window = jnp.asarray(hann_window(n_fft))
    from seedvc_tpu.dsp.stft import _dft_bases, frame_signal

    frames = frame_signal(y, n_fft, hop) * window
    cos_b, sin_b = _dft_bases(n_fft)
    re = jnp.matmul(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return re, im


class HiFTGenerator(nn.Module):
    cfg: HiFTConfig = HiFTConfig()

    @nn.compact
    def __call__(self, mel: jax.Array, key: jax.Array,
                 f0: Optional[jax.Array] = None) -> jax.Array:
        """mel: (B, T, 80) -> waveform (B, T * 256)."""
        c = self.cfg
        B, T, _ = mel.shape

        if f0 is None:
            f0 = ConvRNNF0Predictor(name="f0_predictor")(mel)
        # nearest upsample f0 to sample rate (torch.nn.Upsample default).
        up_factor = c.total_upsample
        f0_up = jnp.repeat(f0, up_factor, axis=1)

        sines, uv = sine_source(key, f0_up, c)
        sine_merge = jnp.tanh(nn.Dense(1, name="m_source_linear")(sines))
        s = sine_merge[..., 0]  # (B, T_samples)

        re, im = _stft_16(s, c.istft_n_fft, c.istft_hop)
        s_stft = jnp.concatenate([re, im], axis=-1)  # (B, frames, n_fft+2)

        x = nn.Conv(c.base_channels, (7,), padding=[(3, 3)], name="conv_pre")(mel)
        downsample_rates = [1] + list(c.upsample_rates[::-1][:-1])
        down_cum = np.cumprod(downsample_rates)[::-1]
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.base_channels // (2 ** (i + 1))
            x = nn.leaky_relu(x, c.lrelu_slope)
            x = _conv_transpose(x, ch, k, u, (k - u) // 2, f"ups_{i}", self)
            if i == len(c.upsample_rates) - 1:
                # reflection pad (1, 0) on time (``generator.py:414``).
                x = jnp.concatenate([x[:, 1:2], x], axis=1)

            du = int(down_cum[i])
            if du == 1:
                si = nn.Conv(ch, (1,), name=f"source_downs_{i}")(s_stft)
            else:
                si = nn.Conv(ch, (du * 2,), strides=(du,),
                             padding=[(du // 2, du // 2)],
                             name=f"source_downs_{i}")(s_stft)
            si = HiFTResBlock(ch, c.source_resblock_kernel_sizes[i],
                              tuple(c.source_resblock_dilation_sizes[i]),
                              name=f"source_resblocks_{i}")(si)
            x = x + si

            xs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                y = HiFTResBlock(ch, rk, tuple(rd),
                                 name=f"resblocks_{i}_{j}")(x)
                xs = y if xs is None else xs + y
            x = xs / len(c.resblock_kernel_sizes)

        x = nn.leaky_relu(x)  # default slope 0.01 (reference :429)
        x = nn.Conv(c.istft_n_fft + 2, (7,), padding=[(3, 3)], name="conv_post")(x)
        n_bins = c.istft_n_fft // 2 + 1
        magnitude = jnp.clip(jnp.exp(x[..., :n_bins]), None, 1e2)
        phase = jnp.sin(x[..., n_bins:])

        real = magnitude * jnp.cos(phase)
        imag = magnitude * jnp.sin(phase)
        wave = istft(real, imag, c.istft_n_fft, c.istft_hop,
                     jnp.asarray(hann_window(c.istft_n_fft)))
        return jnp.clip(wave, -c.audio_limit, c.audio_limit)


def _conv_transpose(x, out_ch, kernel, stride, pad, name, parent):
    from seedvc_tpu.models.bigvgan import _conv_transpose1d

    return _conv_transpose1d(x, out_ch, kernel, stride, pad, name, parent)
