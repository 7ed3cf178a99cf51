"""Snake activations and the anti-aliased activation wrapper.

Re-design of the reference BigVGAN pieces in channels-last layout:

- Snake/SnakeBeta (``modules/bigvgan/activations.py:9-120``):
  ``x + (1/(a|b + 1e-9)) * sin^2(a x)``; log-scale parameters are exp'd.
- Anti-aliased activation (``alias_free_activation/torch/``): kaiser-sinc
  2x upsample (replicate-padded fractionally-strided FIR) -> snake ->
  kaiser-sinc 2x low-pass downsample.  This is the composition the
  reference's fused CUDA kernel implements (``cuda/anti_alias_activation_
  cuda.cu``); the Pallas fused equivalent lives in
  ``seedvc_tpu/ops/pallas/anti_alias.py`` and is validated against this one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from seedvc_tpu.dsp.filters import kaiser_sinc_filter1d

NO_DIV_BY_ZERO = 1e-9


def snake(x: jax.Array, alpha: jax.Array, beta: jax.Array | None = None,
          logscale: bool = True) -> jax.Array:
    """x: (..., C); alpha/beta: (C,).  beta=None -> classic Snake (beta=alpha)."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta) if beta is not None else alpha
    elif beta is None:
        beta = alpha
    s = jnp.sin(x * alpha)
    return x + (1.0 / (beta + NO_DIV_BY_ZERO)) * (s * s)


def _depthwise_conv(x: jax.Array, filt: jax.Array, stride: int = 1,
                    lhs_dilation: int = 1, padding=(0, 0)) -> jax.Array:
    """Depthwise 1-D conv, channels-last: x (B, T, C), filt (K,)."""
    C = x.shape[-1]
    kernel = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, C))
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding=[padding],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )


def upsample2x(x: jax.Array, kernel_size: int = 12, ratio: int = 2) -> jax.Array:
    """Anti-aliased 2x upsample (reference UpSample1d, ``resample.py:10-38``).

    replicate-pad by pad, fractionally-strided FIR (ratio * filter), trim
    pad_left/pad_right.
    """
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))
    pad = kernel_size // ratio - 1
    pad_left = pad * ratio + (kernel_size - ratio) // 2
    pad_right = pad * ratio + (kernel_size - ratio + 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # conv_transpose(stride=r) == conv with lhs_dilation=r, full padding.
    # The filter is symmetric, so correlation == convolution.
    y = ratio * _depthwise_conv(x, filt, lhs_dilation=ratio,
                                padding=(kernel_size - 1, kernel_size - 1))
    return y[:, pad_left: y.shape[1] - pad_right, :]


def downsample2x(x: jax.Array, kernel_size: int = 12, ratio: int = 2) -> jax.Array:
    """Anti-aliased 2x downsample (reference DownSample1d/LowPassFilter1d)."""
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size))
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise_conv(x, filt, stride=ratio)


class SnakeAlias(nn.Module):
    """Activation1d: up2x -> snake/snakebeta -> down2x (``act.py:8-30``)."""

    channels: int
    snake_beta: bool = True
    logscale: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        init = nn.initializers.zeros if self.logscale else nn.initializers.ones
        alpha = self.param("alpha", init, (self.channels,))
        beta = self.param("beta", init, (self.channels,)) if self.snake_beta else None
        if self.use_pallas:
            from seedvc_tpu.ops.pallas.anti_alias import anti_alias_snake

            return anti_alias_snake(x, alpha,
                                    beta if beta is not None else alpha,
                                    logscale=self.logscale)
        # f32 internally like the Pallas kernel (bf16 trunk stages cast
        # back on return), so both paths keep the same activation accuracy
        in_dtype = x.dtype
        h = upsample2x(x.astype(jnp.float32))
        h = snake(h, alpha, beta, self.logscale)
        return downsample2x(h).astype(in_dtype)
