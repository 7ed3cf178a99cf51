"""v2 DiT estimator with AdaLN-Zero modulation.

Re-design of ``modules/v2/dit_wrapper.py`` + ``modules/v2/dit_model.py``:

- merge [x ‖ prompt_x ‖ cond] via one linear (``dit_wrapper.py:131-136``);
  CFG dropout zeroes the prompt slice, and (50% of those times during
  training) also the content slice (``:115-120``),
- style always projected via ``style_in`` and prepended as a token, zeroed
  under dropout (``:138-143``); time prepended as a token,
- transformer blocks use 6-way AdaLN-Zero: shift/scale/gate for attention
  from an adaptive norm, plain RMSNorm + shift/scale for the MLP, gated
  residuals (``dit_model.py:20-36``, ``:123-144``), and an adaptive final
  norm with (scale, shift) chunk order (``:38-54``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedvc_tpu.core.utils import sequence_mask
from seedvc_tpu.models.dit import SplitDense
from seedvc_tpu.nn.layers import (
    Attention, FeedForward, RMSNorm, TimestepEmbedder, ffn_intermediate_size,
    rope_cache, rope_full_cache)


@dataclass(frozen=True)
class DiTV2Config:
    hidden_dim: int = 512
    depth: int = 13
    num_heads: int = 8
    in_channels: int = 80
    content_dim: int = 512
    style_encoder_dim: int = 192
    class_dropout_prob: float = 0.1
    time_as_token: bool = True
    style_as_token: bool = True
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    use_flash_attention: bool = True
    flash_block_q: int = 640


class AdaLNZeroBlock(nn.Module):
    cfg: DiTV2Config

    @nn.compact
    def __call__(self, x, c, freqs, mask, rope_full=None):
        d = self.cfg.hidden_dim
        mod = nn.Dense(6 * d, name="adaln_linear", dtype=x.dtype)(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        normed = RMSNorm(d, self.cfg.norm_eps, name="attention_norm")(x)
        normed = normed * (1 + scale_msa) + shift_msa
        attn = Attention(d, self.cfg.num_heads,
                         head_dim=d // self.cfg.num_heads,
                         use_flash=self.cfg.use_flash_attention,
                         flash_block_q=self.cfg.flash_block_q,
                         name="attention")(normed, freqs, mask,
                                           rope_full=rope_full)
        x = x + gate_msa * attn

        normed = RMSNorm(d, self.cfg.norm_eps, name="ffn_norm")(x)
        normed = normed * (1 + scale_mlp) + shift_mlp
        ff = FeedForward(d, ffn_intermediate_size(d), name="feed_forward")(normed)
        return x + gate_mlp * ff


class DiTV2(nn.Module):
    cfg: DiTV2Config

    @nn.compact
    def __call__(
        self,
        x: jax.Array,          # (B, T, C_mel)
        prompt_x: jax.Array,   # (B, T, C_mel)
        x_lens: Optional[jax.Array],  # (B,); None = all frames valid
        t: jax.Array,          # (B,)
        style: jax.Array,      # (B, S)
        cond: jax.Array,       # (B, T, content_dim)
        prompt_drop: Optional[jax.Array] = None,   # (B,) 1.0 = drop prompt+style
        content_drop: Optional[jax.Array] = None,  # (B,) 1.0 = drop content too
        return_static: bool = False,
        static_cond: Optional[dict] = None,
    ) -> jax.Array:
        """``return_static``/``static_cond``: step-invariant conditioning
        cache for the Euler sampler — same contract as v1 ``DiT.__call__``."""
        c = self.cfg
        B, T, C = x.shape
        keep_p = 1.0 if prompt_drop is None else (1.0 - prompt_drop)[:, None, None]
        keep_c = 1.0 if content_drop is None else (1.0 - content_drop)[:, None, None]

        merge = SplitDense(c.hidden_dim, C + C + c.hidden_dim, dtype=x.dtype,
                           name="cond_x_merge_linear")
        if static_cond is None:
            cond_p = nn.Dense(c.hidden_dim, name="cond_projection",
                              dtype=x.dtype)(cond)
            merged_static = merge(
                jnp.concatenate([prompt_x * keep_p, cond_p * keep_c], axis=-1),
                C, True)
            style_tok = nn.Dense(c.hidden_dim, name="style_in",
                                 dtype=x.dtype)(style)
            if prompt_drop is not None:
                style_tok = style_tok * (1.0 - prompt_drop)[:, None]
            if return_static:
                return {"merged": merged_static, "style_tok": style_tok}
        else:
            merged_static = static_cond["merged"]
            style_tok = static_cond["style_tok"]

        t1 = TimestepEmbedder(c.hidden_dim, name="t_embedder")(t)
        x_in = merge(x, 0, False) + merged_static
        n_prefix = 0
        if c.style_as_token:
            x_in = jnp.concatenate([style_tok[:, None, :], x_in], axis=1)
            n_prefix += 1
        if c.time_as_token:
            x_in = jnp.concatenate([t1[:, None, :].astype(x.dtype), x_in], axis=1)
            n_prefix += 1

        if x_lens is None:
            attn_mask = None
        else:
            key_mask = sequence_mask(x_lens + n_prefix, T + n_prefix)
            attn_mask = key_mask[:, None, None, :]
        hd = c.hidden_dim // c.num_heads
        freqs = jnp.asarray(rope_cache(T + n_prefix, hd, c.rope_base))
        rope_full = None
        if c.use_flash_attention:
            cosr, sinr = rope_full_cache(T + n_prefix, hd, c.rope_base)
            rope_full = (jnp.asarray(cosr), jnp.asarray(sinr))
        cc = t1[:, None, :]
        h = x_in
        for i in range(c.depth):
            h = AdaLNZeroBlock(c, name=f"layers_{i}")(h, cc, freqs, attn_mask,
                                                      rope_full)

        # final adaptive norm: (scale, shift) chunk order (dit_model.py:50-53).
        mod = nn.Dense(2 * c.hidden_dim, name="final_adaln_linear",
                       dtype=h.dtype)(nn.silu(cc))
        scale, shift = jnp.split(mod, 2, axis=-1)
        h = RMSNorm(c.hidden_dim, c.norm_eps, name="final_norm")(h)
        h = h * (1 + scale) + shift
        h = h[:, n_prefix:]

        h = nn.Dense(c.hidden_dim, name="final_mlp0", dtype=h.dtype)(h)
        return nn.Dense(c.in_channels, name="final_mlp2", dtype=h.dtype)(nn.silu(h))
