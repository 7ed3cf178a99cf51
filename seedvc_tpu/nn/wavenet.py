"""Non-causal WaveNet stack used as the DiT's final post-net.

Mirrors the reference WN (``modules/wavenet.py:103-174``): per layer a
dilated conv to 2*C channels, a global conditioning 1x1 conv over the time
embedding (one slice per layer), gated tanh*sigmoid activation
(``modules/commons.py:131-138``), and res/skip 1x1 convs (skip accumulated,
residual added to x).  The reference's weight-normed SConv1d wrappers
(``modules/encodec.py``) are a training parameterization only — here the
convs are plain; converted checkpoints have weight norm folded in.

Layout: (B, T, C) channels-last.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class DilatedConvAsMatmul(nn.Module):
    """1-D dilated conv expressed as a sum of k shifted matmuls.

    XLA's TPU conv emitter runs these shapes at ~80-120 TF/s while plain
    matmuls hit ~200 TF/s; summing k (T, C)x(C, F) dots over pre-shifted
    views keeps everything on the MXU's fast path.  Param pytree is
    identical to ``nn.Conv`` (kernel (k, C, F) + bias (F,)), so checkpoint
    converters are unaffected.  Input must already be padded; output length
    is T_pad - (k-1)*dilation.
    """

    features: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x_pad: jax.Array) -> jax.Array:
        C = x_pad.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, C, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = kernel.astype(x_pad.dtype)
        T = x_pad.shape[1] - (self.kernel_size - 1) * self.dilation
        out = bias.astype(x_pad.dtype)
        for j in range(self.kernel_size):
            tap = jax.lax.slice_in_dim(x_pad, j * self.dilation,
                                       j * self.dilation + T, axis=1)
            out = out + jnp.dot(tap, kernel[j])
        return out


class WaveNet(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    # "reflect": reference SConv1d behaviour (DiT post-net);
    # "zero": plain VITS WN (OpenVoice converter).
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: Optional[jax.Array],
        g: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """x: (B, T, C); x_mask: (B, T, 1) or None; g: (B, 1, gin)."""
        C = self.hidden_channels
        output = jnp.zeros_like(x)
        # x_mask=None statically skips the mask multiplies (all frames valid).

        if g is not None and self.gin_channels:
            # One 1x1 conv producing all layers' conditioning at once
            # (reference cond_layer, ``wavenet.py:120``).
            g_all = nn.Dense(2 * C * self.n_layers, name="cond_layer",
                             dtype=x.dtype)(g)
        else:
            g_all = None

        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            # The reference's SConv1d reflect-pads symmetrically and runs the
            # conv unpadded (modules/encodec.py:212-228); VITS WN zero-pads.
            pad = (self.kernel_size - 1) * dilation // 2
            mode = "reflect" if self.pad_mode == "reflect" else "constant"
            x_pad = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode=mode)
            x_in = DilatedConvAsMatmul(
                2 * C, self.kernel_size, dilation,
                name=f"in_layers_{i}",
            )(x_pad)
            if g_all is not None:
                g_l = g_all[..., i * 2 * C:(i + 1) * 2 * C]
                x_in = x_in + g_l
            t_act = jnp.tanh(x_in[..., :C])
            s_act = jax.nn.sigmoid(x_in[..., C:])
            acts = t_act * s_act
            if self.p_dropout > 0:
                acts = nn.Dropout(self.p_dropout, deterministic=deterministic)(acts)

            if i < self.n_layers - 1:
                res_skip = DilatedConvAsMatmul(
                    2 * C, 1, name=f"res_skip_layers_{i}")(acts)
                x = x + res_skip[..., :C]
                if x_mask is not None:
                    x = x * x_mask
                output = output + res_skip[..., C:]
            else:
                res_skip = DilatedConvAsMatmul(
                    C, 1, name=f"res_skip_layers_{i}")(acts)
                output = output + res_skip
        return output if x_mask is None else output * x_mask
