"""WavLM speaker-verification x-vector extractor (SECS scoring).

From-scratch JAX port of HF ``WavLMForXVector`` — the external SECS
extractor the reference eval harness uses (``eval.py:26``, ``:293-303``
loads ``microsoft/wavlm-base-plus-sv``).  Scoring conversions with the same
CAMPPlus encoder the model conditions on inflates SECS (self-grading); this
module provides the independent judge.

Architecture (transformers ``modeling_wavlm.py``):

- conv feature encoder in "group" norm mode: conv0 + GroupNorm(C groups) +
  GELU, then 6 norm-free convs (bias-free, base checkpoints),
- feature projection (LayerNorm -> Linear),
- WavLM post-LN transformer with GATED RELATIVE POSITION BIAS: a T5-style
  bucketed relative-position embedding (num_buckets=320, max_distance=800)
  computed once in layer 0 and shared, modulated per layer by a gate derived
  from the per-head hidden states (``modeling_wavlm.py:166-181``),
- x-vector head: softmax-weighted layer sum over all 13 hidden states,
  projector -> 5 TDNN layers (kernel 5/3/3/1/1, dilation 1/2/3/1/1) ->
  mean+std statistics pooling -> embedding Linear (512).

TPU-first: the bucket matrix is precomputed host-side per static length; the
whole forward is one fused program (matmuls dominate; the relative bias is a
single (H,T,T) gather added to the logits).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class WavLMSVConfig:
    conv_dim: int = 512
    conv_kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    num_buckets: int = 320
    max_distance: int = 800
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    tdnn_dims: Sequence[int] = (512, 512, 512, 512, 1500)
    tdnn_kernels: Sequence[int] = (5, 3, 3, 1, 1)
    tdnn_dilations: Sequence[int] = (1, 2, 3, 1, 1)
    xvector_dim: int = 512
    layer_norm_eps: float = 1e-5


WAVLM_BASE_PLUS_SV = WavLMSVConfig()  # microsoft/wavlm-base-plus-sv


def relative_position_buckets(T: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """T5-style bidirectional buckets (``modeling_wavlm.py:253-271``),
    computed host-side (T is static under jit)."""
    nb = num_buckets // 2
    ctx = np.arange(T)[:, None]
    mem = np.arange(T)[None, :]
    rel = mem - ctx
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    with np.errstate(divide="ignore"):
        large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / math.log(max_distance / max_exact) * (nb - max_exact)
    large = (max_exact + large).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


class WavLMAttention(nn.Module):
    """Self-attention with gated relative position bias
    (``modeling_wavlm.py:108-230``)."""

    cfg: WavLMSVConfig

    @nn.compact
    def __call__(self, x: jax.Array, position_bias: jax.Array,
                 key_bias: jax.Array | None = None) -> jax.Array:
        c = self.cfg
        B, T, _ = x.shape
        H = c.n_heads
        hd = c.d_model // H

        # gate from the raw per-head hidden states (NOT the q projection)
        gru_const = self.param("gru_rel_pos_const", nn.initializers.ones,
                               (1, H, 1, 1))
        g = x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)       # (B,H,T,hd)
        proj = nn.Dense(8, name="gru_rel_pos_linear")(g)
        proj = proj.reshape(B, H, T, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)
        gate = gate_a * (gate_b * gru_const - 1.0) + 2.0       # (B,H,T,1)
        gated_bias = gate * position_bias[None]                # (B,H,T,T)

        q = nn.Dense(c.d_model, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(c.d_model, name="k_proj")(x)
        v = nn.Dense(c.d_model, name="v_proj")(x)
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, H, hd)
        v = v.reshape(B, T, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + gated_bias.astype(logits.dtype)
        if key_bias is not None:  # (B, 1, 1, T) additive padding mask
            logits = logits + key_bias.astype(logits.dtype)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        return nn.Dense(c.d_model, name="out_proj")(
            attn.reshape(B, T, c.d_model))


class WavLMLayer(nn.Module):
    """Post-LN encoder layer (base checkpoints use
    ``do_stable_layer_norm=False``; ``modeling_wavlm.py:298-336``)."""

    cfg: WavLMSVConfig

    @nn.compact
    def __call__(self, x: jax.Array, position_bias: jax.Array,
                 key_bias: jax.Array | None = None) -> jax.Array:
        c = self.cfg
        x = x + WavLMAttention(c, name="attention")(x, position_bias, key_bias)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(x)
        h = nn.Dense(c.ffn_dim, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(c.d_model, name="output_dense")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_layer_norm")(x)


class WavLMSV(nn.Module):
    """WavLMForXVector: wave (B, T) 16 kHz -> x-vector embeddings (B, 512)."""

    cfg: WavLMSVConfig = WAVLM_BASE_PLUS_SV

    @nn.compact
    def __call__(self, wave: jax.Array, normalize: bool = True,
                 lengths: jax.Array | None = None) -> jax.Array:
        """``lengths`` (B,) int32: true sample counts when ``wave`` is
        zero-padded (HF ``attention_mask`` semantics — normalization,
        attention and stats pooling all ignore padding, so a padded-bucket
        forward matches the unpadded one; ``modeling_wavlm.py`` masked
        path).  None = all samples valid."""
        c = self.cfg
        smask = None
        if lengths is not None:
            smask = (jnp.arange(wave.shape[1])[None]
                     < lengths[:, None]).astype(wave.dtype)
        if normalize:  # HF Wav2Vec2FeatureExtractor do_normalize
            if smask is None:
                mean = wave.mean(axis=-1, keepdims=True)
                var = wave.var(axis=-1, keepdims=True)
                wave = (wave - mean) / jnp.sqrt(var + 1e-7)
            else:
                # normalize over the true length, pad region stays zero
                # (HF normalizes BEFORE padding)
                n = lengths.astype(wave.dtype)[:, None]
                mean = (wave * smask).sum(-1, keepdims=True) / n
                var = (((wave - mean) * smask) ** 2).sum(-1,
                                                         keepdims=True) / n
                wave = (wave - mean) / jnp.sqrt(var + 1e-7) * smask
        elif smask is not None:
            wave = wave * smask

        # conv feature encoder, "group" norm mode: GroupNorm(C, C) after
        # conv0 only, bias-free convs (modeling_wavlm.py:754-770)
        h = wave[..., None]
        for i, (kk, s) in enumerate(zip(c.conv_kernels, c.conv_strides)):
            h = nn.Conv(c.conv_dim, (kk,), strides=(s,), padding="VALID",
                        use_bias=False, name=f"conv_layers_{i}")(h)
            if i == 0:
                h = nn.GroupNorm(num_groups=c.conv_dim,
                                 epsilon=c.layer_norm_eps,
                                 name="conv_group_norm")(h)
            h = nn.gelu(h, approximate=False)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="fp_layer_norm")(h)
        h = nn.Dense(c.d_model, name="fp_projection")(h)

        feat_len = None
        fmask = None
        key_bias = None
        if lengths is not None:
            # conv feature-extractor output lengths
            # (HF _get_feat_extract_output_lengths)
            feat_len = lengths
            for kk, s in zip(c.conv_kernels, c.conv_strides):
                feat_len = (feat_len - kk) // s + 1
            fmask = (jnp.arange(h.shape[1])[None]
                     < feat_len[:, None])[..., None]
            # HF zeroes padded hidden states once, before pos_conv
            h = h * fmask.astype(h.dtype)
            key_bias = jnp.where(fmask, 0.0, -1e30).transpose(0, 2, 1)[:, :,
                                                                       None]

        # positional conv embedding (pad 64, drop-last via (64, 63))
        pos = nn.Conv(c.d_model, (c.pos_conv_kernel,),
                      padding=[(c.pos_conv_kernel // 2,
                                c.pos_conv_kernel // 2 - 1)],
                      feature_group_count=c.pos_conv_groups,
                      name="pos_conv")(h)
        h = h + nn.gelu(pos, approximate=False)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="encoder_layer_norm")(h)

        T = h.shape[1]
        buckets = jnp.asarray(relative_position_buckets(
            T, c.num_buckets, c.max_distance))
        rel_embed = self.param(
            "rel_attn_embed", nn.initializers.normal(0.02),
            (c.num_buckets, c.n_heads))
        position_bias = rel_embed[buckets].transpose(2, 0, 1)  # (H, T, T)

        hidden_states = [h]
        for i in range(c.n_layers):
            h = WavLMLayer(c, name=f"layers_{i}")(h, position_bias, key_bias)
            hidden_states.append(h)

        # x-vector head: softmax-weighted layer sum (use_weighted_layer_sum)
        layer_weights = self.param(
            "layer_weights",
            lambda k, s: jnp.full(s, 1.0 / s[0]), (c.n_layers + 1,))
        w = jax.nn.softmax(layer_weights)
        h = jnp.einsum("l,lbtd->btd", w, jnp.stack(hidden_states))

        h = nn.Dense(c.tdnn_dims[0], name="projector")(h)
        for i, (dim, kk, dil) in enumerate(zip(c.tdnn_dims, c.tdnn_kernels,
                                               c.tdnn_dilations)):
            h = nn.Conv(dim, (kk,), kernel_dilation=(dil,), padding="VALID",
                        name=f"tdnn_{i}")(h)
            h = nn.relu(h)

        # statistics pooling: mean + std (torch .std -> ddof=1); with
        # lengths, over the first tdnn_len valid frames only (HF
        # _get_tdnn_output_lengths masked pooling)
        if feat_len is None:
            mean = h.mean(axis=1)
            var = h.var(axis=1, ddof=1)
        else:
            tdnn_len = feat_len - sum(
                (kk - 1) * dil for kk, dil in zip(c.tdnn_kernels,
                                                  c.tdnn_dilations))
            tmask = (jnp.arange(h.shape[1])[None]
                     < tdnn_len[:, None])[..., None].astype(h.dtype)
            n = tdnn_len.astype(h.dtype)[:, None]
            mean = (h * tmask).sum(axis=1) / n
            var = (((h - mean[:, None]) * tmask) ** 2).sum(axis=1) / (n - 1.0)
        std = jnp.sqrt(var)
        stats = jnp.concatenate([mean, std], axis=-1)
        emb = nn.Dense(c.xvector_dim, name="feature_extractor")(stats)
        return emb
