"""ConvNeXtV2 1-D stage (ASTRAL quantizer bottleneck encoder).

Re-design of ``modules/astral_quantization/convnext.py`` in channels-last
layout: blocks of depthwise-7 conv -> LayerNorm -> pointwise MLP with GELU and
GRN (global response normalisation, ``convnext.py:39-48``), with optional
down/up-sampling between blocks and input/output projections.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRN(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T, C).  Gx = ||x||_2 over time; Nx = Gx / mean_C(Gx)."""
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.dim))
        gx = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))  # (B, 1, C)
        nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtV2Block(nn.Module):
    dim: int
    intermediate_dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = (self.dilation * (7 - 1)) // 2
        h = nn.Conv(self.dim, (7,), kernel_dilation=self.dilation,
                    padding=[(pad, pad)], feature_group_count=self.dim,
                    name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(self.intermediate_dim, name="pwconv1")(h)
        h = nn.gelu(h, approximate=False)
        h = GRN(self.intermediate_dim, name="grn")(h)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        return x + h


class ConvNeXtV2Stage(nn.Module):
    dim: int = 512
    intermediate_dim: int = 2048
    num_blocks: int = 1
    dilation: int = 1
    input_dim: Optional[int] = None
    output_dim: Optional[int] = None
    downsample_layer_indices: Sequence[int] = ()
    downsample_factors: Sequence[int] = ()
    upsample_layer_indices: Sequence[int] = ()
    upsample_factors: Sequence[int] = ()

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T, C_in) -> (B, T', dim_out)."""
        if self.input_dim is not None and self.input_dim != self.dim:
            x = nn.Conv(self.dim, (1,), name="input_projection")(x)
        down = dict(zip(self.downsample_layer_indices, range(len(self.downsample_factors))))
        up = dict(zip(self.upsample_layer_indices, range(len(self.upsample_factors))))
        for i in range(self.num_blocks):
            if i in down:
                f = self.downsample_factors[down[i]]
                x = nn.LayerNorm(epsilon=1e-6, name=f"down_norm_{down[i]}")(x)
                x = nn.Conv(self.dim, (f,), strides=(f,), padding="VALID",
                            name=f"down_conv_{down[i]}")(x)
            if i in up:
                f = self.upsample_factors[up[i]]
                x = nn.LayerNorm(epsilon=1e-6, name=f"up_norm_{up[i]}")(x)
                x = nn.ConvTranspose(self.dim, (f,), strides=(f,),
                                     name=f"up_conv_{up[i]}")(x)
            x = ConvNeXtV2Block(self.dim, self.intermediate_dim, self.dilation,
                                name=f"blocks_{i}")(x)
        if self.output_dim is not None and self.output_dim != self.dim:
            x = nn.Conv(self.output_dim, (1,), name="output_projection")(x)
        return x
