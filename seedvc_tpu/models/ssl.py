"""wav2vec2 / XLS-R / HuBERT SSL encoders (content feature extractors).

The reference consumes HF ``Wav2Vec2Model`` (XLSR truncated to
``output_layer`` layers, ``inference.py:284``) and ``HubertModel``
(``inference.py:240-274``; v2's ASTRAL quantizers use hubert-large layer 18
with the final layer_norm removed, ``default_model.py:25-30``).  All are the
same architecture family, implemented here once:

- conv feature extractor (7 conv layers, 320x downsample), "layer" norm mode
  (per-layer LayerNorm + GELU, conv bias) as used by the large checkpoints,
- feature projection (LayerNorm -> Linear),
- grouped positional conv embedding (k=128, 16 groups, weight-normed -> fold),
- stable-layer-norm transformer layers (pre-LN), optional final LayerNorm
  (disabled when truncating, matching the reference's
  ``encoder.layer_norm = Identity()`` / layer slicing).

Input waveforms are zero-mean/unit-var normalised per utterance (the HF
feature extractor's ``do_normalize`` for these checkpoints).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class SSLConfig:
    conv_dim: int = 512
    conv_kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    d_model: int = 1024
    n_layers: int = 12          # after truncation (XLSR: output_layer 12)
    n_heads: int = 16
    ffn_dim: int = 4096
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    apply_final_norm: bool = False
    layer_norm_eps: float = 1e-5


XLSR_300M_L12 = SSLConfig()  # facebook/wav2vec2-xls-r-300m truncated @12
HUBERT_LARGE_L18 = SSLConfig(n_layers=18, apply_final_norm=False)


class SSLEncoderLayer(nn.Module):
    cfg: SSLConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, T, _ = x.shape
        hd = c.d_model // c.n_heads
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        q = nn.Dense(c.d_model, name="q_proj")(h) * (hd ** -0.5)
        k = nn.Dense(c.d_model, name="k_proj")(h)
        v = nn.Dense(c.d_model, name="v_proj")(h)
        q = q.reshape(B, T, c.n_heads, hd)
        k = k.reshape(B, T, c.n_heads, hd)
        v = v.reshape(B, T, c.n_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        attn = nn.Dense(c.d_model, name="out_proj")(attn.reshape(B, T, c.d_model))
        x = x + attn
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)
        h = nn.Dense(c.ffn_dim, name="intermediate_dense")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c.d_model, name="output_dense")(h)


class SSLEncoder(nn.Module):
    cfg: SSLConfig = XLSR_300M_L12

    @nn.compact
    def __call__(self, wave: jax.Array, normalize: bool = True) -> jax.Array:
        """wave: (B, T) 16 kHz -> (B, T//320, d_model) at 50 Hz."""
        c = self.cfg
        if normalize:
            mean = wave.mean(axis=-1, keepdims=True)
            var = wave.var(axis=-1, keepdims=True)
            wave = (wave - mean) / jnp.sqrt(var + 1e-7)

        h = wave[..., None]  # (B, T, 1)
        for i, (kk, s) in enumerate(zip(c.conv_kernels, c.conv_strides)):
            h = nn.Conv(c.conv_dim, (kk,), strides=(s,), padding="VALID",
                        name=f"conv_layers_{i}")(h)
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name=f"conv_ln_{i}")(h)
            h = nn.gelu(h, approximate=False)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(h)
        h = nn.Dense(c.d_model, name="fp_projection")(h)

        # positional conv embedding: torch pads 64/64 then drops the last
        # element (even kernel), i.e. effective padding (64, 63).
        pos = nn.Conv(c.d_model, (c.pos_conv_kernel,),
                      padding=[(c.pos_conv_kernel // 2,
                                c.pos_conv_kernel // 2 - 1)],
                      feature_group_count=c.pos_conv_groups,
                      name="pos_conv")(h)
        h = h + nn.gelu(pos, approximate=False)

        for i in range(c.n_layers):
            h = SSLEncoderLayer(c, name=f"layers_{i}")(h)
        if c.apply_final_norm:
            h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(h)
        return h
