"""Whisper encoder (content/semantic feature extractor), JAX-native.

The reference uses the HF ``WhisperModel`` encoder with the decoder deleted
(``inference.py:175``) and truncates the 50 Hz features to
``len_16k // 320 + 1`` frames (``inference.py:238``).  This is a from-scratch
flax implementation of the same architecture: two mel convs (k=3, second
stride 2) with GELU, fixed sinusoidal position embeddings (stored as a
parameter, as HF does), pre-LN transformer layers with biased attention
projections (k_proj bias-less) and GELU MLPs, and a final LayerNorm.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 80
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 1500


WHISPER_SMALL = WhisperEncoderConfig()
WHISPER_BASE = WhisperEncoderConfig(d_model=512, n_layers=6, n_heads=8,
                                    ffn_dim=2048)


class WhisperAttention(nn.Module):
    d_model: int
    n_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hd = self.d_model // self.n_heads
        B, T, _ = x.shape
        q = nn.Dense(self.d_model, name="q_proj", dtype=x.dtype)(x) * (hd ** -0.5)
        k = nn.Dense(self.d_model, use_bias=False, name="k_proj", dtype=x.dtype)(x)
        v = nn.Dense(self.d_model, name="v_proj", dtype=x.dtype)(x)
        q = q.reshape(B, T, self.n_heads, hd)
        k = k.reshape(B, T, self.n_heads, hd)
        v = v.reshape(B, T, self.n_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.Dense(self.d_model, name="out_proj",
                        dtype=x.dtype)(out.reshape(B, T, self.d_model))


class WhisperEncoderLayer(nn.Module):
    cfg: WhisperEncoderConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = self.cfg
        h = nn.LayerNorm(name="self_attn_layer_norm", dtype=x.dtype)(x)
        x = x + WhisperAttention(c.d_model, c.n_heads, name="self_attn")(h)
        h = nn.LayerNorm(name="final_layer_norm", dtype=x.dtype)(x)
        h = nn.Dense(c.ffn_dim, name="fc1", dtype=x.dtype)(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c.d_model, name="fc2", dtype=x.dtype)(h)


class WhisperEncoder(nn.Module):
    cfg: WhisperEncoderConfig = WHISPER_SMALL

    @nn.compact
    def __call__(self, mel: jax.Array) -> jax.Array:
        """mel: (B, 3000, n_mels) whisper log-mel -> (B, 1500, d_model)."""
        c = self.cfg
        h = nn.Conv(c.d_model, (3,), padding=[(1, 1)], name="conv1",
                    dtype=mel.dtype)(mel)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(c.d_model, (3,), strides=(2,), padding=[(1, 1)],
                    name="conv2", dtype=mel.dtype)(h)
        h = nn.gelu(h, approximate=False)
        pos = self.param("embed_positions", _sinusoid_init,
                         (c.max_positions, c.d_model))
        h = h + pos[None, : h.shape[1]].astype(h.dtype)
        for i in range(c.n_layers):
            h = WhisperEncoderLayer(c, name=f"layers_{i}")(h)
        return nn.LayerNorm(name="layer_norm", dtype=h.dtype)(h)


def _sinusoid_init(key, shape, dtype=jnp.float32):
    """Whisper's fixed sinusoid table (HF initialises then loads weights)."""
    length, channels = shape
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv_timescales = jnp.exp(-log_timescale * jnp.arange(channels // 2))
    scaled = jnp.arange(length)[:, None] * inv_timescales[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1).astype(dtype)


def truncate_semantic(features: jax.Array, n_samples_16k: int) -> jax.Array:
    """Reference truncation: keep len_16k // 320 + 1 frames
    (``inference.py:238``)."""
    return features[:, : n_samples_16k // 320 + 1]
