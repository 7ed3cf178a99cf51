"""Core transformer building blocks (flax.linen, channels-last).

Semantics match the reference gpt-fast-style stack
(``modules/diffusion_transformer.py``): RMSNorm in fp32 (``:274-285``),
interleaved-pair RoPE (``:288-312``), fused-QKV attention with GQA plumbing
(``:194-260``), SwiGLU FFN (``:263-271``), 2-parameter adaptive layer norm
(``:30-48``), sinusoidal timestep embedder with scale 1000 (``:323-364``).
The implementation is TPU-first: einsum attention that XLA maps onto the MXU,
static shapes, no KV-cache objects (decode uses a separate scan path in
``models/ar.py``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn



def _best_block_q(T: int, preferred: int) -> int:
    """Largest usable query-block: the tuned size when it tiles T exactly,
    else the biggest power-of-two divisor of T in {512, 1024}."""
    if T % preferred == 0:
        return preferred
    for b in (1024, 512):
        if T % b == 0:
            return b
    return 512

class RMSNorm(nn.Module):
    """RMS norm computed in fp32 then cast back (reference ``:280-285``)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        return normed.astype(x.dtype) * weight


class AdaptiveRMSNorm(nn.Module):
    """weight/bias from a conditioning embedding (reference AdaptiveLayerNorm,
    ``:30-48``; despite its name it wraps RMSNorm).  When ``emb`` is None the
    plain norm is applied (time-as-token models)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, emb: Optional[jax.Array]) -> jax.Array:
        normed = RMSNorm(self.dim, self.eps, name="norm")(x)
        if emb is None:
            return normed
        wb = nn.Dense(2 * self.dim, name="project_layer", dtype=x.dtype)(emb)
        weight, bias = jnp.split(wb, 2, axis=-1)
        return weight * normed + bias


def rope_cache(seq_len: int, head_dim: int, base: float = 10000.0) -> np.ndarray:
    """(seq_len, head_dim//2, 2) cos/sin cache — reference
    ``precompute_freqs_cis`` (``:288-297``)."""
    freqs = 1.0 / (base ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim))
    t = np.arange(seq_len)
    ang = np.outer(t, freqs)
    return np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)


def rope_full_cache(seq_len: int, head_dim: int,
                    base: float = 10000.0) -> tuple[np.ndarray, np.ndarray]:
    """(T, head_dim) cos/sin caches for in-kernel RoPE.

    cos_full[:, 2i] = cos_full[:, 2i+1] = cos(t*f_i); sin_signed[:, 2i] =
    -sin(t*f_i), sin_signed[:, 2i+1] = +sin(t*f_i) — so that
    ``x*cos_full + pair_swap(x)*sin_signed`` equals interleaved-pair RoPE
    (see ``ops/pallas/attention.py::_rope``).
    """
    freqs = 1.0 / (base ** (np.arange(0, head_dim, 2)[: head_dim // 2] / head_dim))
    ang = np.outer(np.arange(seq_len), freqs)  # (T, d/2)
    cos_full = np.repeat(np.cos(ang), 2, axis=1)
    sin_signed = np.repeat(np.sin(ang), 2, axis=1)
    sin_signed[:, 0::2] *= -1.0
    return cos_full.astype(np.float32), sin_signed.astype(np.float32)


def apply_rope(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Rotate interleaved pairs. x: (B, T, H, D); freqs: (T, D//2, 2).

    Matches reference ``apply_rotary_emb`` (``:300-312``) — fp32 math, pairs
    are adjacent elements (..., 2i, 2i+1).
    """
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    cos = freqs[None, :, None, :, 0]
    sin = freqs[None, :, None, :, 1]
    out = jnp.stack(
        [xf[..., 0] * cos - xf[..., 1] * sin,
         xf[..., 1] * cos + xf[..., 0] * sin],
        axis=-1,
    )
    return out.reshape(x.shape).astype(x.dtype)


class Attention(nn.Module):
    """Fused-QKV multi-head attention with grouped KV heads.

    Mask is a boolean (B, 1, 1|Tq, Tk) (True = attend).  Softmax in fp32.
    With ``use_flash`` and TPU-friendly shapes (T % 512 == 0, key-padding
    mask), uses the Pallas flash-attention kernel — blockwise softmax, no
    materialised (T, T) logits in HBM.
    """

    dim: int
    n_head: int
    n_local_heads: int | None = None  # KV heads (GQA); defaults to n_head
    head_dim: int | None = None
    use_flash: bool = False
    flash_block_q: int = 1024
    flash_block_k: int = 512
    # "seedvc": custom bf16 Pallas kernel (ops/pallas/attention.py) — K/V
    # resident in VMEM, fp32 softmax, bf16 MXU. "pallas_flash": the stock
    # jax flash kernel (upcasts to f32).
    flash_impl: str = "seedvc"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        freqs: jax.Array,
        mask: Optional[jax.Array],
        rope_full: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        n_kv = self.n_local_heads or self.n_head
        hd = self.head_dim or self.dim // self.n_head
        B, T, _ = x.shape

        qkv = nn.Dense((self.n_head + 2 * n_kv) * hd, use_bias=False,
                       name="wqkv", dtype=x.dtype)(x)
        q, k, v = jnp.split(
            qkv, [self.n_head * hd, self.n_head * hd + n_kv * hd], axis=-1)

        if (self.use_flash and T % 512 == 0 and n_kv == self.n_head
                and rope_full is not None
                and jax.default_backend() == "tpu"
                and self.flash_impl == "seedvc"):
            # Fused path: RoPE applied in-kernel in fp32 — the out-of-kernel
            # fp32 stack/reshape RoPE relayouts never touch HBM.  The _diff
            # wrapper adds a recompute backward so the same path trains.
            from seedvc_tpu.ops.pallas.attention import dit_attention_fused_diff

            lens = (jnp.sum(mask[:, 0, -1, :].astype(jnp.int32), axis=-1)
                    if mask is not None else None)
            bq = _best_block_q(T, self.flash_block_q)
            cos, sin = rope_full
            out = dit_attention_fused_diff(
                q.reshape(B, T, self.n_head, hd).transpose(0, 2, 1, 3),
                k.reshape(B, T, self.n_head, hd).transpose(0, 2, 1, 3),
                v.reshape(B, T, self.n_head, hd).transpose(0, 2, 1, 3),
                cos, sin, lens, block_q=bq)
            out = out.transpose(0, 2, 1, 3).reshape(B, T, self.n_head * hd)
            return nn.Dense(self.dim, use_bias=False, name="wo",
                            dtype=x.dtype)(out)

        q = q.reshape(B, T, self.n_head, hd)
        k = k.reshape(B, T, n_kv, hd)
        v = v.reshape(B, T, n_kv, hd)

        q = apply_rope(q, freqs)
        k = apply_rope(k, freqs)

        if n_kv != self.n_head:
            rep = self.n_head // n_kv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        scale = 1.0 / math.sqrt(hd)

        if (self.use_flash and T % 512 == 0
                and jax.default_backend() == "tpu"
                and self.flash_impl == "seedvc"):
            from seedvc_tpu.ops.pallas.attention import dit_attention_diff

            if mask is not None:
                # prefix-valid key-padding mask -> per-sample lengths
                lens = jnp.sum(mask[:, 0, -1, :].astype(jnp.int32), axis=-1)
            else:
                lens = None
            # honor the tuned flash_block_q when it divides T (the custom
            # kernel requires exact tiling); otherwise the largest
            # power-of-two divisor (adaptive contexts use 1024/2048 windows).
            bq = _best_block_q(T, self.flash_block_q)
            out = dit_attention_diff(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), lens, block_q=bq)
            out = out.transpose(0, 2, 1, 3).astype(x.dtype)
        elif (self.use_flash and T % 512 == 0
                and jax.default_backend() == "tpu"):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes, SegmentIds, flash_attention)

            if mask is not None:
                # key-padding mask (B, 1, 1|T, T) -> per-token segment ids
                seg = mask[:, 0, -1, :].astype(jnp.int32)
                seg_ids = SegmentIds(q=seg, kv=seg)
            else:
                seg_ids = None
            bq = min(self.flash_block_q, T)
            bk = min(self.flash_block_k, T)
            bs = BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
                block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
                block_q_dq=bq)
            out = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), segment_ids=seg_ids,
                causal=False, sm_scale=scale, block_sizes=bs)
            out = out.transpose(0, 2, 1, 3).astype(x.dtype)
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) * scale
            if mask is not None:
                logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                             preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, T, self.n_head * hd)
        return nn.Dense(self.dim, use_bias=False, name="wo", dtype=x.dtype)(out)


class FeedForward(nn.Module):
    """SwiGLU: w2(silu(w1 x) * w3 x) — reference ``:263-271``."""

    dim: int
    intermediate: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h1 = nn.Dense(self.intermediate, use_bias=False, name="w1", dtype=x.dtype)(x)
        h3 = nn.Dense(self.intermediate, use_bias=False, name="w3", dtype=x.dtype)(x)
        return nn.Dense(self.dim, use_bias=False, name="w2", dtype=x.dtype)(
            nn.silu(h1) * h3)


def ffn_intermediate_size(dim: int) -> int:
    """gpt-fast default intermediate size (reference ``:71-74``)."""
    hidden = int(2 * (4 * dim) / 3)
    return -(-hidden // 256) * 256


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding (scale=1000) -> MLP(SiLU) — reference
    ``:323-364``."""

    hidden_size: int
    freq_embed_size: int = 256

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        half = self.freq_embed_size // 2
        freqs = jnp.exp(
            -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
        args = 1000.0 * t[:, None].astype(jnp.float32) * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = nn.Dense(self.hidden_size, name="mlp0")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.hidden_size, name="mlp2")(emb)
