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


class MaskedGroupNorm(nn.Module):
    """GroupNorm (num_groups=1) whose statistics span only the first
    ``out_len`` time positions of a padded static buffer — torch
    ``nn.GroupNorm(1, C)`` over a tensor that really ends at ``out_len``
    (the reference regulator's case).  Param tree matches ``nn.GroupNorm``
    ({scale, bias}) for checkpoint-converter compatibility; eps matches
    torch's 1e-5 (flax defaults to 1e-6)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, h: jax.Array, valid: jax.Array,
                 out_len: jax.Array) -> jax.Array:
        C = h.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        hm = (h * valid).astype(jnp.float32)
        n = jnp.maximum(out_len, 1).astype(jnp.float32) * C
        mean = hm.sum(axis=(1, 2), keepdims=True) / n
        var = (((h.astype(jnp.float32) - mean) ** 2) * valid).sum(
            axis=(1, 2), keepdims=True) / n
        normed = (h.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        return (normed * scale + bias).astype(h.dtype)


def nearest_interpolate_to(x: jax.Array, out_len: jax.Array,
                           target_len: int,
                           in_len: Optional[jax.Array] = None) -> jax.Array:
    """Nearest interpolation to a *traced* length inside a static buffer.

    The reference interpolates to ``ylens.max()`` then masks
    (``length_regulator.py:120``); the TPU analogue keeps the output buffer
    shape static (``target_len``) and computes the gather indices from the
    traced ``out_len``, so one compiled program serves every true length.
    Positions ``j >= out_len`` are garbage and must be masked by the caller.

    ``in_len`` (traced scalar) restricts the *input* to its first ``in_len``
    positions — the analogue of the reference cropping content features to
    ``len_16k // 320 + 1`` before regulating (``train.py:702``).  With it,
    one compiled program serves any true content length inside the static
    ``x`` buffer: padding frames beyond ``in_len`` are never gathered.
    """
    t_in = in_len if in_len is not None else x.shape[1]
    j = jnp.arange(target_len)
    # torch F.interpolate(mode='nearest') computes floor(j * float(in/out)):
    # at exact-multiple positions (j*t_in % out_len == 0) the FLOAT scale of
    # a non-dyadic ratio rounds below the rational value, selecting the
    # PREVIOUS source frame — integer division j*t_in//out_len picked the
    # next one and diverged from the reference every lcm-th frame (caught by
    # tests/test_cross_impl_pipeline.py).  Float32 reproduces the double
    # kernel's choice for all realistic lengths (error < t_in/2^24 frames).
    scale = (jnp.asarray(t_in, jnp.float32)
             / jnp.maximum(jnp.asarray(out_len, jnp.float32), 1.0))
    idx = jnp.floor(j.astype(jnp.float32) * scale).astype(jnp.int32)
    idx = jnp.minimum(idx, jnp.asarray(t_in, jnp.int32) - 1)
    return jnp.take(x, idx, axis=1)


class VectorQuantize(nn.Module):
    """DAC-style VQ bottleneck (reference ``length_regulator.py:88,136-139``
    builds ``dac.nn.quantize.VectorQuantize(channels, codebook_size, 8)``):
    project to a low-dim code space, L2-normalised nearest-neighbour lookup,
    straight-through estimator, commitment + codebook losses."""

    codebook_size: int
    codebook_dim: int = 8
    out_dim: int = 512

    @nn.compact
    def __call__(self, z: jax.Array):
        z_e = nn.Dense(self.codebook_dim, name="in_proj")(z)  # (B, T, d)
        codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim))

        e = z_e / (jnp.linalg.norm(z_e, axis=-1, keepdims=True) + 1e-8)
        cb = codebook / (jnp.linalg.norm(codebook, axis=-1, keepdims=True)
                         + 1e-8)
        # squared L2 over normalised vectors == 2 - 2 cos sim: argmax sim
        codes = jnp.argmax(jnp.einsum("btd,kd->btk", e, cb), axis=-1)
        z_q = codebook[codes]

        commitment_loss = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
        codebook_loss = jnp.mean((jax.lax.stop_gradient(z_e) - z_q) ** 2)
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # straight-through
        out_q = nn.Dense(self.out_dim, name="out_proj")(z_q)
        return out_q, commitment_loss, codebook_loss, codes


class InterpolateRegulator(nn.Module):
    cfg: LengthRegulatorConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                 # (B, T_in, C_in) continuous or (B, T_in) int tokens
        ylens: jax.Array,             # (B,) target mel lengths
        target_len: int,              # static padded output length
        f0: Optional[jax.Array] = None,  # (B, T_f0) Hz, optional
        n_quantizers: Optional[jax.Array] = None,  # (B,) active codebooks
        x_lens: Optional[jax.Array] = None,  # () traced true content length
        f0_lens: Optional[jax.Array] = None,  # () traced true f0 length
    ):
        c = self.cfg
        if c.is_discrete:
            if x.ndim == 3:  # (B, n_q, T) multi-codebook
                # Quantizer dropout (reference ``length_regulator.py:92-100``):
                # codebook i+1 contributes only for samples with
                # n_quantizers > i+1 (callers pass the per-sample random
                # counts during training; None = all codebooks active).
                if n_quantizers is None:
                    n_quantizers = jnp.full((x.shape[0],), c.n_codebooks)
                emb = nn.Embed(c.content_codebook_size, c.channels, name="embedding")
                h = emb(x[:, 0])
                for i in range(1, c.n_codebooks):
                    gate = (n_quantizers > i)[:, None, None].astype(h.dtype)
                    h = h + gate * nn.Embed(c.content_codebook_size, c.channels,
                                            name=f"extra_codebooks_{i-1}")(x[:, i])
            else:
                h = nn.Embed(c.content_codebook_size, c.channels, name="embedding")(x)
        else:
            h = nn.Dense(c.channels, name="content_in_proj")(x)

        # Reference semantics (``length_regulator.py:120``): interpolate to
        # ylens.max() (traced), NOT to the static padded buffer length — the
        # pad region is masked to zero below.  ``x_lens`` additionally crops
        # the input to the true content length (the reference crops features
        # to ``len_16k // 320 + 1`` before regulating, ``train.py:702``),
        # so padded content buffers never leak silence encodings into the
        # conditioning.
        out_len = jnp.max(ylens)
        h = nearest_interpolate_to(h, out_len, target_len, in_len=x_lens)

        if c.f0_condition:
            # Declare both branches' params unconditionally so init/apply see
            # the same parameter tree regardless of whether f0 is provided.
            f0_mask = self.param("f0_mask", nn.initializers.zeros, (1, c.channels))
            f0_embed = nn.Embed(c.n_f0_bins, c.channels, name="f0_embedding")
            if f0 is None:
                # Touch the table so flax materialises its params even on an
                # f0-less init (training feeds f0 later; param trees must
                # match).  The zero multiply keeps the output identical and
                # the gradient exactly zero.
                h = h + 0.0 * f0_embed(jnp.zeros((), jnp.int32))
                h = h + f0_mask[None]
            else:
                q = jnp.clip(f0_to_coarse(f0, c.n_f0_bins), 0, c.n_f0_bins - 1)
                h = h + nearest_interpolate_to(f0_embed(q), out_len,
                                               target_len, in_len=f0_lens)

        # Conv/norm over the STATIC buffer must behave as if the buffer
        # ended at ``out_len`` (= ylens.max()), exactly like the reference,
        # whose tensors really are out_len long (``length_regulator.py:120``):
        # - positions >= out_len are zeroed before every conv, so a conv at
        #   out_len-1 reads zeros — identical to torch's 'SAME' zero pad,
        # - GroupNorm statistics count ONLY the first out_len positions —
        #   unmasked stats over the padded bucket shifted EVERY output frame
        #   (caught by tests/test_cross_impl_pipeline.py).
        valid = (jnp.arange(target_len)[None, :, None]
                 < out_len).astype(h.dtype)
        h = h * valid
        for i in range(len(c.sampling_ratios)):
            h = nn.Conv(c.channels, (3,), padding="SAME", name=f"conv_{i}")(h)
            h = MaskedGroupNorm(name=f"norm_{i}")(h, valid, out_len)
            h = h * jnp.tanh(jax.nn.softplus(h))  # Mish
            h = h * valid
        out = nn.Dense(c.channels, name="out_proj")(h)

        # Stable 5-tuple return, exactly like the reference
        # (``length_regulator.py:136-141`` returns
        # ``(out, olens, codes, commitment_loss, codebook_loss)`` with None
        # losses when no VQ) — callers always unpack 5.
        mask = sequence_mask(ylens, target_len)[..., None].astype(out.dtype)
        if c.vector_quantize and not c.is_discrete:
            out_q, commit, cb_loss, codes = VectorQuantize(
                c.content_codebook_size, out_dim=c.channels, name="vq")(out)
            return out_q * mask, ylens, codes, commit, cb_loss
        return out * mask, ylens, None, None, None


def random_n_quantizers(key: jax.Array, batch: int, n_codebooks: int,
                        quantizer_dropout: float) -> jax.Array:
    """Training-time per-sample active-codebook counts
    (reference ``length_regulator.py:92-97``): a ``quantizer_dropout``
    fraction of the batch uses a random count in [1, n_codebooks]."""
    counts = jax.random.randint(key, (batch,), 1, n_codebooks + 1)
    n_drop = int(batch * quantizer_dropout)
    full = jnp.full((batch,), n_codebooks)
    return jnp.where(jnp.arange(batch) < n_drop, counts, full)
