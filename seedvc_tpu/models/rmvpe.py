"""RMVPE F0 extractor (deep U-Net + BiGRU salience model), TPU-native.

Re-design of ``modules/rmvpe.py``:

- mel frontend: 128-bin HTK-scale mel (slaney-normalised), 16 kHz, win 1024,
  hop 160, fmin 30, fmax 8000, center=True, log(clamp 1e-5)
  (``rmvpe.py:406-480``, ``:497-499``),
- E2E: BN -> 5 encoder stages (residual conv blocks + 2x2 avg-pool) ->
  4 intermediate blocks -> 5 decoder stages (transpose conv + skip concat)
  -> 3-channel conv -> BiGRU(384->2x256) -> linear -> sigmoid over 360 cents
  bins (``rmvpe.py:145-400``),
- decoding: local weighted average of cents over +-4 bins around the argmax,
  thresholded; ``f0 = 10 * 2^(cents/1200)`` (``rmvpe.py:613-637``) — cheap,
  done on host in numpy.

BatchNorms run frozen (eval) with converted running stats.  The BiGRU is a
``lax.scan`` over time in both directions.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from seedvc_tpu.dsp.mel import hann_window, mel_filterbank
from seedvc_tpu.dsp.stft import _dft_bases, frame_signal
from seedvc_tpu.models.campplus import EvalBatchNorm

N_MELS = 128
N_CLASS = 360


def rmvpe_mel(audio: jax.Array) -> jax.Array:
    """(B, T) 16 kHz -> (B, n_frames, 128) log-mel, center=True."""
    n_fft, hop, win = 1024, 160, 1024
    y = jnp.pad(audio, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    window = jnp.asarray(hann_window(win))
    frames = frame_signal(y, n_fft, hop) * window
    cos_b, sin_b = _dft_bases(n_fft)
    re = jnp.matmul(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, jnp.asarray(sin_b), preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    mag = jnp.sqrt(re * re + im * im)
    basis = jnp.asarray(
        mel_filterbank(16000, n_fft, N_MELS, 30.0, 8000.0, htk=True).T)
    mel = jnp.matmul(mag, basis, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, 1e-5))


class ConvBlockRes(nn.Module):
    out_channels: int
    has_shortcut: bool

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv0")(x)
        h = nn.relu(EvalBatchNorm(self.out_channels, name="bn0")(h))
        h = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv1")(h)
        h = nn.relu(EvalBatchNorm(self.out_channels, name="bn1")(h))
        if self.has_shortcut:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return h + x


class GRUCellParams(nn.Module):
    """One-direction GRU over (B, T, F) via lax.scan (torch cell semantics)."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, F = x.shape
        H = self.hidden
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (F, 3 * H))
        w_hh = self.param("w_hh", nn.initializers.lecun_normal(), (H, 3 * H))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * H,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (3 * H,))

        # precompute input contributions for all steps (one big matmul)
        xi = jnp.einsum("btf,fh->bth", x, w_ih) + b_ih

        def step(h, xi_t):
            gates_h = h @ w_hh + b_hh
            r = jax.nn.sigmoid(xi_t[..., :H] + gates_h[..., :H])
            z = jax.nn.sigmoid(xi_t[..., H:2*H] + gates_h[..., H:2*H])
            n = jnp.tanh(xi_t[..., 2*H:] + r * gates_h[..., 2*H:])
            h_new = (1 - z) * n + z * h
            return h_new, h_new

        xs = jnp.swapaxes(xi, 0, 1)  # (T, B, 3H)
        if self.reverse:
            xs = xs[::-1]
        h0 = jnp.zeros((B, H), x.dtype)
        _, ys = jax.lax.scan(step, h0, xs)
        if self.reverse:
            ys = ys[::-1]
        return jnp.swapaxes(ys, 0, 1)  # (B, T, H)


class RMVPE_E2E(nn.Module):
    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel: (B, T, 128), T multiple of 32 -> salience (B, T, 360)."""
        x = mel[..., None]  # (B, T, F, 1)
        x = EvalBatchNorm(1, name="encoder_bn")(x)

        # encoder
        skips = []
        in_ch, out_ch = 1, self.en_out_channels
        for i in range(self.en_de_layers):
            for b in range(self.n_blocks):
                ch_in = in_ch if b == 0 else out_ch
                x = ConvBlockRes(out_ch, has_shortcut=(ch_in != out_ch),
                                 name=f"enc_{i}_block_{b}")(x)
            skips.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            in_ch, out_ch = out_ch, out_ch * 2

        # intermediate: in = encoder.out_channel // 2 = current in_ch... the
        # reference's Intermediate takes (out_channel//2 -> out_channel)
        # where out_channel is the doubled value after the loop.
        inter_out = out_ch
        for j in range(self.inter_layers):
            for b in range(self.n_blocks):
                ch_in = in_ch if (j == 0 and b == 0) else inter_out
                x = ConvBlockRes(inter_out, has_shortcut=(ch_in != inter_out),
                                 name=f"inter_{j}_block_{b}")(x)

        # decoder
        ch = inter_out
        for i in range(self.en_de_layers):
            ch = ch // 2
            # ConvTranspose2d(3x3, stride 2, padding 1, output_padding 1)
            # == resize by zero-stuffing + conv; use lax dilated conv.
            x = _conv_transpose2d_s2(x, ch, name=f"dec_{i}_up", parent=self)
            x = nn.relu(EvalBatchNorm(ch, name=f"dec_{i}_bn")(x))
            x = jnp.concatenate([x, skips[-1 - i]], axis=-1)
            for b in range(self.n_blocks):
                ch_in = ch * 2 if b == 0 else ch
                x = ConvBlockRes(ch, has_shortcut=(ch_in != ch),
                                 name=f"dec_{i}_block_{b}")(x)

        # head: conv to 3 channels, flatten freq, BiGRU, linear, sigmoid
        x = nn.Conv(3, (3, 3), padding=[(1, 1), (1, 1)], name="cnn")(x)
        B, T, F, C = x.shape
        # torch: (B, 3, T, 128).transpose(1,2).flatten(-2) -> (B, T, 3*128)
        # channel-major flatten: index = c*128 + f.
        h = x.transpose(0, 1, 3, 2).reshape(B, T, C * F)
        fwd = GRUCellParams(256, reverse=False, name="gru_fwd")(h)
        bwd = GRUCellParams(256, reverse=True, name="gru_bwd")(h)
        h = jnp.concatenate([fwd, bwd], axis=-1)
        h = nn.Dense(N_CLASS, name="fc_linear")(h)
        return jax.nn.sigmoid(h)


def _conv_transpose2d_s2(x, out_ch, name, parent):
    """torch ConvTranspose2d(k=3, stride=2, pad=1, output_pad=1), no bias."""
    in_ch = x.shape[-1]
    kernel = parent.param(f"{name}_kernel", nn.initializers.lecun_normal(),
                          (3, 3, in_ch, out_ch))
    flipped = jnp.flip(kernel, axis=(0, 1))
    y = jax.lax.conv_general_dilated(
        x, flipped,
        window_strides=(1, 1),
        # out = (T-1)*2 + 3 - 2*1 + output_padding(1) = 2T
        padding=[(1, 2), (1, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y


CENTS_MAPPING = 20 * np.arange(360) + 1997.3794084376191


def decode_f0(salience: np.ndarray, thred: float = 0.03) -> np.ndarray:
    """(T, 360) salience -> (T,) F0 Hz (reference ``to_local_average_cents``)."""
    center = np.argmax(salience, axis=1) + 4
    sal = np.pad(salience, ((0, 0), (4, 4)))
    cents = np.pad(CENTS_MAPPING, (4, 4))
    idx = center[:, None] + np.arange(-4, 5)[None, :]
    todo_sal = np.take_along_axis(sal, idx, axis=1)
    todo_cents = cents[idx]
    with np.errstate(invalid="ignore", divide="ignore"):
        devided = (todo_sal * todo_cents).sum(1) / todo_sal.sum(1)
    maxx = sal.max(axis=1)
    devided[maxx <= thred] = 0  # also overwrites NaNs from all-zero rows
    f0 = 10 * 2 ** (devided / 1200)
    f0[f0 == 10] = 0
    return f0


class RMVPE:
    """Bundled mel + E2E + decode (reference RMVPE class, ``rmvpe.py:483``)."""

    def __init__(self, params):
        self.model = RMVPE_E2E()
        self.params = params
        self._fn = jax.jit(
            lambda p, mel: self.model.apply({"params": p}, mel))

    def infer_from_audio_batch(self, audio_16k, thred: float = 0.03) -> np.ndarray:
        mel = rmvpe_mel(jnp.asarray(audio_16k))
        n_frames = mel.shape[1]
        n_pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        if n_pad:
            mel = jnp.pad(mel, ((0, 0), (0, n_pad), (0, 0)))
        hidden = np.asarray(self._fn(self.params, mel))[:, :n_frames]
        return np.stack([decode_f0(h, thred) for h in hidden])
