"""OpenVoice ToneColorConverter (VITS flow-based timbre shifter).

Re-design of the reference training-time augmenter
(``modules/openvoice/models.py``; used by ``train.py:544-551, :770-801`` to
timbre-perturb source audio so content features become timbre-invariant):

- linear-spectrogram frontend (hann, center=False, reflect pad, eps 1e-6 —
  ``modules/openvoice/mel_processing.py:40``),
- ReferenceEncoder: 6x stride-2 conv2d over (time, freq) + GRU -> 256-d
  speaker embedding (``models.py:301-365``),
- PosteriorEncoder: 1x1 pre-conv -> zero-padded WN -> mean/log-std; sampled
  with temperature tau (``models.py:182-222``),
- ResidualCouplingBlock: 4x (mean-only affine coupling + channel flip)
  (``models.py:367-397``, ``modules.py:402-460``),
- HiFi-GAN decoder with leaky-ReLU ResBlock1 and global speaker conditioning
  (``models.py:224-298``),
- ``voice_conversion``: z = enc_q(spec, g_src) -> flow(g_src) ->
  flow^-1(g_tgt) -> dec(g_tgt) (``models.py:492-499``; the shipped converter
  uses zero_g=True — conditioning zeroed at enc_q/dec).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from seedvc_tpu.dsp.mel import hann_window
from seedvc_tpu.dsp.stft import stft_magnitude
from seedvc_tpu.nn.wavenet import WaveNet


@dataclass(frozen=True)
class OpenVoiceConfig:
    spec_channels: int = 513
    inter_channels: int = 192
    hidden_channels: int = 192
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4)
    gin_channels: int = 256
    zero_g: bool = True
    n_fft: int = 1024
    hop: int = 256


def linear_spectrogram(y: jax.Array, n_fft: int = 1024, hop: int = 256) -> jax.Array:
    """(B, T) -> (B, frames, n_fft//2+1); VITS spectrogram_torch semantics."""
    pad = (n_fft - hop) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    return stft_magnitude(y, n_fft, hop, jnp.asarray(hann_window(n_fft)),
                          eps=1e-6)


class ReferenceEncoder(nn.Module):
    cfg: OpenVoiceConfig

    @nn.compact
    def __call__(self, spec: jax.Array) -> jax.Array:
        """spec: (B, T, spec_channels) -> (B, gin_channels)."""
        h = spec[..., None]  # (B, T, F, 1)
        for i, ch in enumerate([32, 32, 64, 64, 128, 128]):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        name=f"convs_{i}")(h)
            h = nn.relu(h)
        B, T, F, C = h.shape
        # channel-major flatten matching the torch view (models.py:350-354)
        h = h.transpose(0, 1, 3, 2).reshape(B, T, C * F)
        # GRU (unidirectional, hidden 128); final hidden state.
        from seedvc_tpu.models.rmvpe import GRUCellParams

        ys = GRUCellParams(128, name="gru")(h)
        return nn.Dense(self.cfg.gin_channels, name="proj")(ys[:, -1])


class CouplingLayer(nn.Module):
    """Mean-only affine coupling (``modules.py:402-460``)."""

    channels: int
    hidden: int
    gin_channels: int

    @nn.compact
    def __call__(self, x, x_mask, g, reverse: bool):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Dense(self.hidden, name="pre")(x0) * x_mask
        h = WaveNet(self.hidden, kernel_size=5, dilation_rate=1, n_layers=4,
                    gin_channels=self.gin_channels, pad_mode="zero",
                    name="enc")(h, x_mask, g=g)
        m = nn.Dense(half, name="post",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(h) * x_mask
        x1 = (x1 - m) * x_mask if reverse else (m + x1) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class Flow(nn.Module):
    cfg: OpenVoiceConfig
    n_flows: int = 4

    @nn.compact
    def __call__(self, x, x_mask, g, reverse: bool = False):
        layers = [CouplingLayer(self.cfg.inter_channels,
                                self.cfg.hidden_channels,
                                self.cfg.gin_channels, name=f"flows_{i}")
                  for i in range(self.n_flows)]
        order = reversed(range(self.n_flows)) if reverse else range(self.n_flows)
        for i in order:
            if reverse:
                x = jnp.flip(x, axis=-1)  # undo the post-coupling flip
                x = layers[i](x, x_mask, g, reverse=True)
            else:
                x = layers[i](x, x_mask, g, reverse=False)
                x = jnp.flip(x, axis=-1)
        return x


class LeakyResBlock1(nn.Module):
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, 0.1)
            h = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=d,
                        padding=[((self.kernel_size - 1) // 2 * d,) * 2],
                        name=f"convs1_{i}")(h)
            h = nn.leaky_relu(h, 0.1)
            h = nn.Conv(self.channels, (self.kernel_size,),
                        padding=[((self.kernel_size - 1) // 2,) * 2],
                        name=f"convs2_{i}")(h)
            x = x + h
        return x


class OpenVoiceDecoder(nn.Module):
    cfg: OpenVoiceConfig

    @nn.compact
    def __call__(self, x, g):
        c = self.cfg
        h = nn.Conv(c.upsample_initial_channel, (7,), padding=[(3, 3)],
                    name="conv_pre")(x)
        if g is not None:
            h = h + nn.Dense(c.upsample_initial_channel, name="cond")(g)[:, None, :]
        from seedvc_tpu.models.bigvgan import _conv_transpose1d

        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            h = nn.leaky_relu(h, 0.1)
            h = _conv_transpose1d(h, ch, k, u, (k - u) // 2, f"ups_{i}", self)
            hs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                y = LeakyResBlock1(ch, rk, tuple(rd),
                                   name=f"resblocks_{i}_{j}")(h)
                hs = y if hs is None else hs + y
            h = hs / len(c.resblock_kernel_sizes)
        h = nn.leaky_relu(h, 0.01)
        h = nn.Conv(1, (7,), padding=[(3, 3)], use_bias=False,
                    name="conv_post")(h)
        return jnp.tanh(h)[..., 0]


class ToneColorConverter(nn.Module):
    """SynthesizerTrn subset used for voice conversion."""

    cfg: OpenVoiceConfig = OpenVoiceConfig()

    def setup(self):
        c = self.cfg
        self.ref_enc = ReferenceEncoder(c, name="ref_enc")
        self.pre = nn.Dense(c.hidden_channels, name="enc_q_pre")
        self.enc_wn = WaveNet(c.hidden_channels, kernel_size=5, dilation_rate=1,
                              n_layers=16, gin_channels=c.gin_channels,
                              pad_mode="zero", name="enc_q_wn")
        self.proj = nn.Dense(c.inter_channels * 2, name="enc_q_proj")
        self.flow = Flow(c, name="flow")
        self.dec = OpenVoiceDecoder(c, name="dec")

    def extract_se(self, spec):
        """(B, T, spec_channels) -> (B, gin) speaker embedding
        (``api.py:121-138``)."""
        return self.ref_enc(spec)

    def voice_conversion(self, spec, spec_lens, g_src, g_tgt, noise, tau=0.3):
        """spec: (B, T, spec_ch); noise: (B, T, inter) standard normal.

        Returns converted waveform (B, T*hop... upsample 256)."""
        c = self.cfg
        T = spec.shape[1]
        mask = (jnp.arange(T)[None, :] < spec_lens[:, None])[..., None].astype(
            spec.dtype)
        g_enc = jnp.zeros_like(g_src) if c.zero_g else g_src
        h = self.pre(spec) * mask
        h = self.enc_wn(h, mask, g=g_enc[:, None, :])
        stats = self.proj(h) * mask
        m, logs = jnp.split(stats, 2, axis=-1)
        z = (m + noise * tau * jnp.exp(logs)) * mask

        z_p = self.flow(z, mask, g_src[:, None, :], reverse=False)
        z_hat = self.flow(z_p, mask, g_tgt[:, None, :], reverse=True)
        g_dec = jnp.zeros_like(g_tgt) if c.zero_g else g_tgt
        return self.dec(z_hat * mask, g_dec)


# ---------------------------------------------------------------------------
# Speaker-embedding extraction over VAD segments (host-side utility).
# Reference: ``modules/openvoice/se_extractor.py`` — ``get_se`` splits the
# audio into voiced segments and averages the ReferenceEncoder embedding over
# them (``se_extractor.py``; called with vad=False by ``baselines/openvoice.py``).
# The reference's splitter uses whisper/silero models; the built-in
# equivalent here is an RMS-energy segmenter (same gating policy as the
# streaming pipeline's VAD substitute).
# ---------------------------------------------------------------------------

def split_segments_by_energy(wave: np.ndarray, sr: int, *,
                             frame_sec: float = 0.05,
                             threshold_db: float = -40.0,
                             min_sec: float = 1.5,
                             max_sec: float = 10.0) -> list[np.ndarray]:
    """Split a waveform into voiced segments by frame RMS energy.

    Returns a list of segments between ``min_sec`` and ``max_sec`` long;
    falls back to the whole utterance when nothing passes the gate.
    """
    frame = max(int(frame_sec * sr), 1)
    n_frames = len(wave) // frame
    if n_frames == 0:
        return [wave]
    frames = wave[: n_frames * frame].reshape(n_frames, frame)
    rms_db = 10.0 * np.log10(np.mean(frames ** 2, axis=1) + 1e-10)
    voiced = rms_db > threshold_db

    segments: list[np.ndarray] = []
    start = None
    for i, v in enumerate(np.concatenate([voiced, [False]])):
        if v and start is None:
            start = i
        elif not v and start is not None:
            seg = wave[start * frame: i * frame]
            start = None
            # split over-long runs, keep >= min_sec pieces
            max_len = int(max_sec * sr)
            for off in range(0, len(seg), max_len):
                piece = seg[off: off + max_len]
                if len(piece) >= min_sec * sr:
                    segments.append(piece)
    return segments or [wave]


def get_se(wave: np.ndarray, sr: int, extract_fn, *,
           spec_sr: int = 22050, vad: bool = True) -> np.ndarray:
    """Average speaker embedding over (optionally VAD-split) segments.

    ``extract_fn(spec)`` maps a (1, T, spec_ch) linear spectrogram to a
    (1, gin) embedding — typically a jitted ``ToneColorConverter.extract_se``
    apply.  Mirrors ``se_extractor.get_se`` semantics.
    """
    from seedvc_tpu.dsp.resample import resample

    if sr != spec_sr:
        wave = np.asarray(resample(jnp.asarray(wave), sr, spec_sr))
        sr = spec_sr
    if vad:
        # Dual-feature classical VAD (energy + spectral flatness with
        # hangover, dsp/vad.py) — substitute for the reference's whisper/
        # silero segmentation in se_extractor.py; falls back to the plain
        # energy segmenter below only via split_segments_by_energy.
        from seedvc_tpu.dsp.vad import split_segments

        segments = split_segments(wave, sr)
    else:
        segments = [wave]
    embs = []
    for seg in segments:
        spec = linear_spectrogram(jnp.asarray(seg[None]))
        embs.append(np.asarray(extract_fn(spec))[0])
    return np.mean(np.stack(embs), axis=0)
