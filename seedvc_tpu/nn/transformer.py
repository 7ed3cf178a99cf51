"""U-ViT transformer trunk shared by the v1 DiT estimator.

Structure mirrors the reference Transformer/TransformerBlock
(``modules/diffusion_transformer.py:77-191``): per-block AdaptiveRMSNorm
conditioned on the time embedding, RoPE attention, SwiGLU FFN, and U-ViT skip
connections — blocks i < depth//2 emit their outputs onto a stack, blocks
i > depth//2 pop one and mix it in via ``skip_in_linear``.  The final norm is
adaptive as well (``:142``).

TPU-first notes: the block loop is a Python loop over depth (unrolled at
trace time — each layer has distinct weights), all shapes static, and the
attention mask is precomputed once per call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedvc_tpu.nn.layers import (
    AdaptiveRMSNorm,
    Attention,
    FeedForward,
    apply_rope,
    ffn_intermediate_size,
    rope_cache,
    rope_full_cache,
)


@dataclass(frozen=True)
class TransformerConfig:
    dim: int
    n_layer: int
    n_head: int
    n_local_heads: int | None = None
    head_dim: int | None = None
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    uvit_skip_connection: bool = False
    time_as_token: bool = False
    use_flash: bool = False
    flash_block_q: int = 1024
    flash_block_k: int = 512


class TransformerBlock(nn.Module):
    cfg: TransformerConfig
    receives_skip: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        c: Optional[jax.Array],
        freqs: jax.Array,
        mask: Optional[jax.Array],
        skip_in: Optional[jax.Array] = None,
        rope_full: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        cfg = self.cfg
        if self.receives_skip and skip_in is not None:
            x = nn.Dense(cfg.dim, name="skip_in_linear", dtype=x.dtype)(
                jnp.concatenate([x, skip_in], axis=-1))
        h = x + Attention(
            cfg.dim, cfg.n_head, cfg.n_local_heads, cfg.head_dim,
            use_flash=cfg.use_flash, flash_block_q=cfg.flash_block_q,
            flash_block_k=cfg.flash_block_k, name="attention",
        )(AdaptiveRMSNorm(cfg.dim, cfg.norm_eps, name="attention_norm")(x, c),
          freqs, mask, rope_full=rope_full)
        out = h + FeedForward(
            cfg.dim, ffn_intermediate_size(cfg.dim), name="feed_forward",
        )(AdaptiveRMSNorm(cfg.dim, cfg.norm_eps, name="ffn_norm")(h, c))
        return out


class Transformer(nn.Module):
    cfg: TransformerConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        c: Optional[jax.Array],
        mask: Optional[jax.Array],
    ) -> jax.Array:
        """x: (B, T, D); c: (B, 1, D) time embedding or None;
        mask: (B, 1, T, T) boolean or None."""
        cfg = self.cfg
        T = x.shape[1]
        head_dim = cfg.head_dim or cfg.dim // cfg.n_head
        freqs = jnp.asarray(rope_cache(T, head_dim, cfg.rope_base))
        rope_full = None
        if cfg.use_flash and (cfg.n_local_heads or cfg.n_head) == cfg.n_head:
            cos, sin = rope_full_cache(T, head_dim, cfg.rope_base)
            rope_full = (jnp.asarray(cos), jnp.asarray(sin))

        c_in = None if cfg.time_as_token else c

        # U-ViT routing: first half emits, strict second half receives (LIFO).
        if cfg.uvit_skip_connection:
            emit = [i for i in range(cfg.n_layer) if i < cfg.n_layer // 2]
            recv = [i for i in range(cfg.n_layer) if i > cfg.n_layer // 2]
        else:
            emit, recv = [], []

        skips: list[jax.Array] = []
        for i in range(cfg.n_layer):
            skip_in = skips.pop() if i in recv and skips else None
            x = TransformerBlock(cfg, receives_skip=(i in recv),
                                 name=f"layers_{i}")(x, c_in, freqs, mask,
                                                     skip_in, rope_full)
            if i in emit:
                skips.append(x)
        return AdaptiveRMSNorm(cfg.dim, cfg.norm_eps, name="norm")(x, c_in)
