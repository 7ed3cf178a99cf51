"""Length regulator: content features -> mel-rate conditioning.

Re-design of the reference InterpolateRegulator
(``modules/length_regulator.py:28-141``): embed content (codebook lookup for
discrete tokens / linear projection for continuous features), nearest-neighbour
interpolate along time to the target mel length, add a quantised-F0 embedding
(or a learned mask token when F0 conditioning is enabled but absent), then a
conv → GroupNorm(1) → Mish stack and a final 1x1 projection.

TPU-first: the output length is a static shape (padded chunk length); the
valid region is selected by ``ylens`` masks.  Nearest interpolation is a
gather with precomputable indices.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from seedvc_tpu.core.config import LengthRegulatorConfig
from seedvc_tpu.core.utils import sequence_mask

F0_MIN = 50.0
F0_MAX = 1100.0
F0_MEL_MIN = 1127.0 * np.log(1 + F0_MIN / 700.0)
F0_MEL_MAX = 1127.0 * np.log(1 + F0_MAX / 700.0)


def f0_to_coarse(f0: jax.Array, f0_bin: int) -> jax.Array:
    """Mel-scale coarse F0 bins (reference ``length_regulator.py:15-26``)."""
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    a = (f0_bin - 2) / (F0_MEL_MAX - F0_MEL_MIN)
    b = F0_MEL_MIN * a - 1.0
    f0_mel = jnp.where(f0_mel > 0, f0_mel * a - b, f0_mel)
    f0_coarse = jnp.round(f0_mel).astype(jnp.int32)
    f0_coarse = f0_coarse * (f0_coarse > 0)
    f0_coarse = f0_coarse + (f0_coarse < 1) * 1
    # Exact reference behaviour: bins >= f0_bin wrap to 0 (the subsequent
    # `+ (fc >= f0_bin)` term is always 0 after the zeroing multiply).
    f0_coarse = f0_coarse * (f0_coarse < f0_bin)
    return f0_coarse


def nearest_interpolate(x: jax.Array, target_len: int) -> jax.Array:
    """(B, T_in, C) -> (B, target_len, C), torch F.interpolate 'nearest'."""
    t_in = x.shape[1]
    idx = (np.arange(target_len) * t_in // target_len).astype(np.int32)
    return x[:, idx, :]


class InterpolateRegulator(nn.Module):
    cfg: LengthRegulatorConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                 # (B, T_in, C_in) continuous or (B, T_in) int tokens
        ylens: jax.Array,             # (B,) target mel lengths
        target_len: int,              # static padded output length
        f0: Optional[jax.Array] = None,  # (B, T_f0) Hz, optional
    ) -> tuple[jax.Array, jax.Array]:
        c = self.cfg
        if c.is_discrete:
            if x.ndim == 3:  # (B, n_q, T) multi-codebook
                emb = nn.Embed(c.content_codebook_size, c.channels, name="embedding")
                h = emb(x[:, 0])
                for i in range(1, c.n_codebooks):
                    h = h + nn.Embed(c.content_codebook_size, c.channels,
                                     name=f"extra_codebooks_{i-1}")(x[:, i])
            else:
                h = nn.Embed(c.content_codebook_size, c.channels, name="embedding")(x)
        else:
            h = nn.Dense(c.channels, name="content_in_proj")(x)

        h = nearest_interpolate(h, target_len)

        if c.f0_condition:
            # Declare both branches' params unconditionally so init/apply see
            # the same parameter tree regardless of whether f0 is provided.
            f0_mask = self.param("f0_mask", nn.initializers.zeros, (1, c.channels))
            f0_embed = nn.Embed(c.n_f0_bins, c.channels, name="f0_embedding")
            if f0 is None:
                h = h + f0_mask[None]
            else:
                q = jnp.clip(f0_to_coarse(f0, c.n_f0_bins), 0, c.n_f0_bins - 1)
                h = h + nearest_interpolate(f0_embed(q), target_len)

        for i in range(len(c.sampling_ratios)):
            h = nn.Conv(c.channels, (3,), padding="SAME", name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=1, name=f"norm_{i}")(h)
            h = h * jnp.tanh(jax.nn.softplus(h))  # Mish
        out = nn.Dense(c.channels, name="out_proj")(h)

        mask = sequence_mask(ylens, target_len)[..., None].astype(out.dtype)
        return out * mask, ylens
