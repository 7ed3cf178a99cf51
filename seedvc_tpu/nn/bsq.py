"""Binary Spherical Quantization (BSQ / lookup-free quantization).

Re-design of ``modules/astral_quantization/bsq.py`` (BinarySphericalQuantize):

- project_in: dim -> log2(codebook_size) bits,
- spherical: l2-normalise (scaled by codebook_scale) before and after
  quantization (``bsq.py:213``: ``l2norm(t) * codebook_scale``),
- quantize: sign -> +-codebook_scale (``bsq.py:362-369``),
- indices: big-endian bit packing (``bsq.py:371``: mask = 2^(D-1-i)),
- straight-through estimator for training (``bsq.py:380-383``),
- soft entropy aux loss with the codebook-usage statistics averaged across
  data-parallel devices — the reference's ``dist_nn.all_reduce``
  (``bsq.py:33-43``) becomes ``lax.pmean`` over the mesh's data axis.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def l2norm(t: jax.Array, eps: float = 1e-12) -> jax.Array:
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), eps)


def entropy(prob: jax.Array, eps: float = 1e-5) -> jax.Array:
    return (-prob * jnp.log(jnp.clip(prob, eps))).sum(axis=-1)


class BSQ(nn.Module):
    dim: int
    codebook_size: int
    codebook_scale: float = 1.0
    spherical: bool = True
    entropy_loss_weight: float = 0.1
    commitment_loss_weight: float = 0.0  # reference default (bsq.py:135)
    diversity_gamma: float = 1.0
    inv_temperature: float = 1.0  # tau in soft entropy
    pmean_axis: Optional[str] = None  # mesh axis for codebook stats

    @property
    def codebook_dim(self) -> int:
        return int(math.log2(self.codebook_size))

    def _maybe_l2norm(self, t):
        if self.spherical:
            return l2norm(t) * self.codebook_scale
        return t

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False):
        """x: (B, T, dim) -> (quantized (B, T, dim), indices (B, T), aux_loss)."""
        cd = self.codebook_dim
        h = nn.Dense(cd, name="project_in")(x)
        h = self._maybe_l2norm(h)

        codebook_value = jnp.full_like(h, self.codebook_scale)
        quantized = jnp.where(h > 0, codebook_value, -codebook_value)

        mask = jnp.asarray(2 ** np.arange(cd - 1, -1, -1), jnp.int32)
        indices = ((quantized > 0).astype(jnp.int32) * mask).sum(-1)

        q_out = self._maybe_l2norm(quantized)
        if training:
            # straight-through
            q_out = h + jax.lax.stop_gradient(q_out - h)

        aux_loss = jnp.zeros((), jnp.float32)
        if training:
            # reference total: entropy_aux * entropy_loss_weight
            # + commit * commitment_loss_weight (bsq.py:487)
            aux_loss = self.entropy_loss_weight * self._soft_entropy_loss(h)
            if self.commitment_loss_weight > 0:
                # commit loss: MSE(input, quantized.detach()) (bsq.py:448-457)
                commit = jnp.mean(
                    (h - jax.lax.stop_gradient(quantized)) ** 2)
                aux_loss = aux_loss + self.commitment_loss_weight * commit

        out = nn.Dense(self.dim, name="project_out")(q_out)
        return out, indices, aux_loss

    def _soft_entropy_loss(self, x: jax.Array) -> jax.Array:
        """Reference ``soft_entropy_loss`` (``bsq.py:94-124``) specialised to
        the BSQ codebook: per-bit Bernoulli entropies."""
        # distance to the 2^D codebook corners decomposes per bit for BSQ:
        # p(bit_i = 1) = sigmoid(2 * scale * x_i * inv_temperature)
        p = jax.nn.sigmoid(2 * self.codebook_scale * x * self.inv_temperature)
        p = jnp.stack([p, 1 - p], axis=-1)
        per_sample_entropy = entropy(p).sum(-1).mean()
        avg_prob = p.reshape(-1, p.shape[-2], 2).mean(axis=0)
        if self.pmean_axis is not None:
            avg_prob = jax.lax.pmean(avg_prob, self.pmean_axis)
        codebook_entropy = entropy(avg_prob).sum(-1).mean()
        return per_sample_entropy - self.diversity_gamma * codebook_entropy


class GroupedResidualBSQ(nn.Module):
    """Feature-dim-grouped BSQ (reference ``bsq.py:497-569``,
    GroupedResidualBSQ): split the feature dimension into ``groups`` equal
    chunks, quantize each with an independent BSQ, concat the quantized
    chunks and stack the per-group indices.

    Returns (quantized (B, T, dim), indices (groups, B, T),
    aux_loss (groups,))."""

    dim: int
    groups: int
    codebook_size: int
    codebook_scale: float = 1.0
    spherical: bool = True
    entropy_loss_weight: float = 0.1
    commitment_loss_weight: float = 0.0
    diversity_gamma: float = 1.0
    inv_temperature: float = 1.0
    pmean_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False):
        assert self.dim % self.groups == 0, "dim must divide into groups"
        chunks = jnp.split(x, self.groups, axis=-1)
        outs = []
        for i, chunk in enumerate(chunks):
            outs.append(BSQ(
                dim=self.dim // self.groups,
                codebook_size=self.codebook_size,
                codebook_scale=self.codebook_scale,
                spherical=self.spherical,
                entropy_loss_weight=self.entropy_loss_weight,
                commitment_loss_weight=self.commitment_loss_weight,
                diversity_gamma=self.diversity_gamma,
                inv_temperature=self.inv_temperature,
                pmean_axis=self.pmean_axis,
                name=f"rvqs_{i}")(chunk, training=training))
        quantized = jnp.concatenate([o[0] for o in outs], axis=-1)
        indices = jnp.stack([o[1] for o in outs])
        aux = jnp.stack([o[2] for o in outs])
        return quantized, indices, aux


def duration_reduction(tokens: np.ndarray) -> tuple[np.ndarray, int]:
    """Collapse consecutive identical tokens (host-side helper).

    Reference ``vc_wrapper.py:139-153`` (``_duration_reduction``): the AR
    source sequence uses deduplicated narrow tokens.
    """
    tokens = np.asarray(tokens)
    if tokens.size == 0:
        return tokens, 0
    keep = np.concatenate([[True], tokens[1:] != tokens[:-1]])
    out = tokens[keep]
    return out, len(out)
