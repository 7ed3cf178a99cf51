"""BigVGAN vocoder (NVIDIA bigvgan_v2 checkpoints), TPU-native.

Re-design of the reference generator (``modules/bigvgan/bigvgan.py:280-400``)
in channels-last layout:

  conv_pre(7) -> per stage [ConvTranspose upsample -> mean of AMP resblocks]
  -> anti-aliased snake post-activation -> conv_post(7) -> tanh.

AMPBlock1 (``bigvgan.py:31-147``): pairs of (anti-aliased snake ->
dilated conv, anti-aliased snake -> dilation-1 conv) with residual adds.

Weight norm is folded into plain conv weights at checkpoint conversion
(``seedvc_tpu/convert/torch_utils.py:fold_weight_norm``).  The shipped
checkpoints (nvidia/bigvgan_v2_*) use resblock "1", snakebeta with
log-scale, no bias at the final conv, and no final tanh (clamp instead).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedvc_tpu.nn.snake import SnakeAlias, snake, upsample2x, downsample2x
from seedvc_tpu.nn.wavenet import DilatedConvAsMatmul


@dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 80
    upsample_rates: Sequence[int] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_bias_at_final: bool = False
    use_tanh_at_final: bool = False
    use_pallas: bool = False
    # Run conv_pre + the first N upsample stages in bfloat16 (the wide,
    # FLOP-dominant stages), casting back to f32 for the remaining
    # high-resolution tail.  The anti-alias snake computes in f32
    # internally regardless (ops/pallas/anti_alias.py), so only the conv
    # matmuls quantise.  MEASURED AND REJECTED for the shipped presets:
    # even bf16_stages=1 yields 24.3 dB SNR vs f32 (2: 22.3, 3: 21.2;
    # full-bf16 in round 2: 23.7) — the snake sin^2 amplifies the very
    # first stage's quantisation, so there is no cheap-quality middle
    # ground.  Kept as an explicit opt-in knob only; every preset is f32.
    bf16_stages: int = 0

    @property
    def total_upsample(self) -> int:
        r = 1
        for u in self.upsample_rates:
            r *= u
        return r


BIGVGAN_22K_80 = BigVGANConfig()  # nvidia/bigvgan_v2_22khz_80band_256x
BIGVGAN_44K_128 = BigVGANConfig(  # nvidia/bigvgan_v2_44khz_128band_512x
    num_mels=128, upsample_rates=(8, 4, 2, 2, 2, 2),
    upsample_kernel_sizes=(16, 8, 4, 4, 4, 4))


class AMPBlock1(nn.Module):
    cfg: BigVGANConfig
    channels: int
    kernel_size: int
    dilations: Sequence[int]

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        sb = self.cfg.activation == "snakebeta"
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            h = SnakeAlias(self.channels, snake_beta=sb,
                           logscale=self.cfg.snake_logscale,
                           use_pallas=self.cfg.use_pallas,
                           name=f"act1_{i}")(x)
            # Convs as shifted matmuls: XLA's TPU conv emitter runs these
            # (T, C<=768, k 3/7/11) shapes well below MXU matmul rates; the
            # param pytree matches nn.Conv so converters are unaffected.
            pad = (k - 1) // 2 * d
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            h = DilatedConvAsMatmul(self.channels, k, dilation=d,
                                    name=f"convs1_{i}")(h)
            h = SnakeAlias(self.channels, snake_beta=sb,
                           logscale=self.cfg.snake_logscale,
                           use_pallas=self.cfg.use_pallas,
                           name=f"act2_{i}")(h)
            pad = (k - 1) // 2
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            h = DilatedConvAsMatmul(self.channels, k, name=f"convs2_{i}")(h)
            x = x + h
        return x


class BigVGAN(nn.Module):
    cfg: BigVGANConfig = field(default_factory=lambda: BIGVGAN_22K_80)

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel: (B, T, num_mels) log-mel -> (B, T * total_upsample) waveform."""
        c = self.cfg
        if c.bf16_stages > 0:
            mel = mel.astype(jnp.bfloat16)
        x = nn.Conv(c.upsample_initial_channel, (7,), padding=[(3, 3)],
                    name="conv_pre", dtype=mel.dtype)(mel)

        ch = c.upsample_initial_channel
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            if c.bf16_stages > 0 and i == c.bf16_stages:
                x = x.astype(jnp.float32)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            # torch ConvTranspose1d(k, stride=u, padding=(k-u)//2):
            # out = (T-1)*u + k - 2*((k-u)//2) = T*u for k = 2u or k = u.
            # Express as lhs-dilated conv with 'full'-minus-padding windows.
            pad = (k - u) // 2
            x = _conv_transpose1d(x, ch, k, u, pad, name=f"ups_{i}", parent=self)
            xs = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                y = AMPBlock1(c, ch, rk, tuple(rd),
                              name=f"resblocks_{i}_{j}")(x)
                xs = y if xs is None else xs + y
            x = xs / len(c.resblock_kernel_sizes)

        sb = c.activation == "snakebeta"
        x = x.astype(jnp.float32)  # post-activation + final conv stay f32
        x = SnakeAlias(ch, snake_beta=sb, logscale=c.snake_logscale,
                       use_pallas=c.use_pallas, name="activation_post")(x)
        x = nn.Conv(1, (7,), padding=[(3, 3)], use_bias=c.use_bias_at_final,
                    name="conv_post", dtype=x.dtype)(x)
        x = x[..., 0]
        if c.use_tanh_at_final:
            return jnp.tanh(x)
        return jnp.clip(x, -1.0, 1.0)


def _conv_transpose1d(x, out_ch, kernel, stride, pad, name, parent):
    """torch ConvTranspose1d semantics, channels-last.

    Implemented as ONE (T, Cin) x (Cin, taps*stride*Cout) matmul followed by
    an overlap-add of the ``taps = ceil(K/stride)`` phase blocks: writing the
    transpose-conv as out[t*u + s*u + r] += x[t] . W[s*u + r] puts all the
    FLOPs on the MXU (XLA lowers the lhs-dilated conv form far below matmul
    rates on TPU).  Kernel param shape mirrors flax ConvTranspose:
    (K, in, out); converters are unaffected.
    """
    in_ch = x.shape[-1]
    kernel_param = parent.param(f"{name}_kernel",
                                nn.initializers.lecun_normal(),
                                (kernel, in_ch, out_ch))
    bias = parent.param(f"{name}_bias", nn.initializers.zeros, (out_ch,))
    B, T = x.shape[0], x.shape[1]
    # the phase overlap-add + crop below hard-codes torch's output length
    # (T-1)*s + K - 2*pad == T*s; all shipped configs satisfy it (k = 2u or
    # k = u).  Fail loudly rather than silently mis-slice on new configs.
    assert kernel - 2 * pad == stride, (
        f"_conv_transpose1d requires K - 2*pad == stride "
        f"(got K={kernel}, pad={pad}, stride={stride})")
    taps = -(-kernel // stride)
    w = jnp.pad(kernel_param, ((0, taps * stride - kernel), (0, 0), (0, 0)))
    w = w.astype(x.dtype)
    # (B, T, taps*stride*Cout) — one big dot.  HIGHEST on bf16 inputs would
    # trigger multi-pass (~f32-quality, ~1/3-speed) matmuls and defeat the
    # bf16_stages speedup — bf16 stages use the native single-pass MXU path.
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    y = jnp.dot(x, w.transpose(1, 0, 2).reshape(in_ch, -1),
                precision=prec)
    y = y.reshape(B, T, taps, stride, out_ch)
    z = jnp.zeros((B, T + taps - 1, stride, out_ch), x.dtype)
    for s in range(taps):
        z = z.at[:, s: s + T].add(y[:, :, s])
    full = z.reshape(B, (T + taps - 1) * stride, out_ch)
    return full[:, pad: pad + T * stride] + bias.astype(x.dtype)
