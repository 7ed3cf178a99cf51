"""CAMPPlus (D-TDNN) speaker/style encoder.

Re-design of the reference CAMPPlus (``modules/campplus/DTDNN.py``,
``layers.py``) in channels-last layout:

- FCM 2-D residual conv front-end over (freq, time), frequency-only strides
  (``DTDNN.py:13-48``),
- TDNN stem (k=5, stride 2) then three CAM-Dense-TDNN blocks (12/24/16
  layers, growth 32, dilation 1/2/2) with context-aware masking
  (``layers.py:98-138``: local conv gated by a sigmoid of global-mean +
  segment-pooled context), transit layers halving channels,
- statistics pooling (mean ‖ unbiased std) and a dense layer to the
  192-d embedding (``DTDNN.py:104-105``).

The model is frozen everywhere in the system, so BatchNorm is implemented in
eval mode: a normalisation by stored running statistics.  Stats live in the
parameter tree (``mean``/``var``/``scale``/``bias``) and come from the
converted checkpoint.

Batched variable-length support: the reference training loop runs CAMPPlus
per sample at the TRUE length (``train.py:841-869``); running the padded
batch through instead biases the mean-subtraction, CAM context pooling and
stats pooling.  Passing ``lengths`` threads a time mask through every
time-mixing op (convs see zeros beyond the true length — exactly the 'SAME'
zero padding the per-sample path sees at its boundary — and all pooling is
restricted to valid frames), making the batched result equal the per-sample
result without B separate variable-shape programs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class EvalBatchNorm(nn.Module):
    """BatchNorm in inference mode: (x - mean) / sqrt(var + eps) * scale + bias."""

    features: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y


def _apply_mask(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Zero padded positions (mask broadcastable to x); None = no-op."""
    return x if mask is None else x * mask


class BasicResBlock(nn.Module):
    """2-D residual block; stride applies to the frequency axis only
    (``layers.py:261-296``)."""

    planes: int
    stride: int = 1
    in_planes: int = 32

    @nn.compact
    def __call__(self, x: jax.Array,
                 tmask: Optional[jax.Array] = None) -> jax.Array:
        # x: (B, F, T, C); tmask: (B, 1, T, 1) — zeroed before each conv
        # that mixes time, so valid frames see exactly the zeros a
        # per-sample 'SAME'-padded conv would see at its boundary.
        x = _apply_mask(x, tmask)
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, 1),
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        h = nn.relu(EvalBatchNorm(self.planes, name="bn1")(h))
        h = _apply_mask(h, tmask)
        h = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv2")(h)
        h = EvalBatchNorm(self.planes, name="bn2")(h)
        if self.stride != 1 or self.in_planes != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1),
                         use_bias=False, name="shortcut_conv")(x)
            sc = EvalBatchNorm(self.planes, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class FCM(nn.Module):
    """Front-end conv module: (B, T, F) fbank -> (B, T//1, C*(F//8))
    channel-stacked features (``DTDNN.py:13-48``)."""

    m_channels: int = 32
    feat_dim: int = 80

    @nn.compact
    def __call__(self, x: jax.Array,
                 tmask: Optional[jax.Array] = None) -> jax.Array:
        B, T, F = x.shape
        h = x.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
        tmask4 = None if tmask is None else tmask[:, None, :, None]
        h = _apply_mask(h, tmask4)
        h = nn.Conv(self.m_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    name="conv1")(h)
        h = nn.relu(EvalBatchNorm(self.m_channels, name="bn1")(h))
        for li, n_blocks in enumerate([2, 2]):
            for bi in range(n_blocks):
                h = BasicResBlock(self.m_channels, stride=2 if bi == 0 else 1,
                                  in_planes=self.m_channels,
                                  name=f"layer{li+1}_{bi}")(h, tmask4)
        h = _apply_mask(h, tmask4)
        h = nn.Conv(self.m_channels, (3, 3), strides=(2, 1), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(h)
        h = nn.relu(EvalBatchNorm(self.m_channels, name="bn2")(h))
        # (B, F/8, T, C) -> (B, T, C * F/8); channel-major stacking matches
        # the reference reshape (B, C*F', T) at DTDNN.py:46-47.
        B_, Fq, T_, C = h.shape
        return h.transpose(0, 2, 3, 1).reshape(B_, T_, C * Fq)


class CAMLayer(nn.Module):
    """Context-aware masked conv (``layers.py:98-138``).

    With ``lengths``/``tmask``, the global-mean and segment-pooled context
    are computed over valid frames only (the per-sample path pools over
    exactly the true length)."""

    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    reduction: int = 2
    seg_len: int = 100

    @nn.compact
    def __call__(self, x: jax.Array, tmask: Optional[jax.Array] = None,
                 lengths: Optional[jax.Array] = None) -> jax.Array:
        # x: (B, T, C); tmask: (B, T, 1); lengths: (B,)
        x = _apply_mask(x, tmask)
        y = nn.Conv(self.out_channels, (self.kernel_size,),
                    kernel_dilation=self.dilation, padding="SAME",
                    use_bias=False, name="linear_local")(x)
        # context: global mean + segment-average (ceil-mode pooling repeated
        # back to T).
        T = x.shape[1]
        n_seg = -(-T // self.seg_len)
        pad = n_seg * self.seg_len - T
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        seg_sum = xp.reshape(x.shape[0], n_seg, self.seg_len, -1).sum(axis=2)
        if lengths is None:
            g = x.mean(axis=1, keepdims=True)
            # ceil-mode avg_pool divides by the actual element count per segment.
            counts = jnp.minimum(
                (jnp.arange(n_seg) + 1) * self.seg_len, T
            ) - jnp.arange(n_seg) * self.seg_len
            seg = seg_sum / counts[None, :, None]
        else:
            g = x.sum(axis=1, keepdims=True) / jnp.maximum(
                lengths[:, None, None].astype(x.dtype), 1.0)
            # per-sample ceil-mode counts; fully-padded segments get count 0
            # (their repeated positions are all >= lengths and masked away) —
            # clamp to 1 to avoid NaNs that would poison valid frames via 0*NaN.
            counts = jnp.clip(lengths[:, None]
                              - jnp.arange(n_seg)[None, :] * self.seg_len,
                              0, self.seg_len)
            seg = seg_sum / jnp.maximum(counts, 1)[..., None].astype(x.dtype)
        seg = jnp.repeat(seg, self.seg_len, axis=1)[:, :T]
        context = g + seg
        m = nn.relu(nn.Conv(self.bn_channels // self.reduction, (1,),
                            name="linear1")(context))
        m = jax.nn.sigmoid(nn.Conv(self.out_channels, (1,), name="linear2")(m))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    in_channels: int
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x: jax.Array, tmask: Optional[jax.Array] = None,
                 lengths: Optional[jax.Array] = None) -> jax.Array:
        h = nn.relu(EvalBatchNorm(self.in_channels, name="nonlinear1_bn")(x))
        h = nn.Conv(self.bn_channels, (1,), use_bias=False, name="linear1")(h)
        h = nn.relu(EvalBatchNorm(self.bn_channels, name="nonlinear2_bn")(h))
        return CAMLayer(self.bn_channels, self.out_channels, self.kernel_size,
                        self.dilation, name="cam_layer")(h, tmask, lengths)


class CAMPPlus(nn.Module):
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128

    @nn.compact
    def __call__(self, x: jax.Array,
                 lengths: Optional[jax.Array] = None) -> jax.Array:
        """x: (B, T, feat_dim) mean-subtracted kaldi fbank -> (B, emb).

        ``lengths`` (B,): true frame counts inside a zero-padded batch; the
        output then equals running each sample at its true length (the
        reference's per-sample loop, ``train.py:841-869``)."""
        tmask = None
        if lengths is not None:
            tmask = (jnp.arange(x.shape[1])[None, :]
                     < lengths[:, None]).astype(x.dtype)[..., None]  # (B,T,1)
        h = FCM(feat_dim=self.feat_dim, name="head")(
            x, None if tmask is None else tmask[..., 0])
        channels = 32 * (self.feat_dim // 8)

        # TDNN stem, k=5 stride 2 'SAME'-ish: torch pad=2 with stride 2 gives
        # ceil(T/2) frames; flax 'SAME' matches for odd kernels.
        h = _apply_mask(h, tmask)
        h = nn.Conv(self.init_channels, (5,), strides=(2,), padding=[(2, 2)],
                    use_bias=False, name="tdnn_conv")(h)
        h = nn.relu(EvalBatchNorm(self.init_channels, name="tdnn_bn")(h))
        channels = self.init_channels

        # lengths after the stride-2 stem: ceil(len/2)
        lengths2 = None
        tmask2 = None
        if lengths is not None:
            lengths2 = (lengths + 1) // 2
            tmask2 = (jnp.arange(h.shape[1])[None, :]
                      < lengths2[:, None]).astype(h.dtype)[..., None]

        for bi, (num_layers, ksz, dil) in enumerate(
                zip((12, 24, 16), (3, 3, 3), (1, 2, 2))):
            for li in range(num_layers):
                y = CAMDenseTDNNLayer(
                    in_channels=channels + li * self.growth_rate,
                    out_channels=self.growth_rate,
                    bn_channels=self.bn_size * self.growth_rate,
                    kernel_size=ksz, dilation=dil,
                    name=f"block{bi+1}_tdnnd{li+1}")(h, tmask2, lengths2)
                h = jnp.concatenate([h, y], axis=-1)
            channels += num_layers * self.growth_rate
            h = nn.relu(EvalBatchNorm(channels, name=f"transit{bi+1}_bn")(h))
            h = nn.Conv(channels // 2, (1,), use_bias=False,
                        name=f"transit{bi+1}_linear")(h)
            channels //= 2

        h = nn.relu(EvalBatchNorm(channels, name="out_nonlinear_bn")(h))

        # Stats pooling: mean ‖ unbiased std over time (``layers.py:26-32``);
        # restricted to valid frames when lengths are given.
        if lengths2 is None:
            mean = h.mean(axis=1)
            T = h.shape[1]
            var = ((h - mean[:, None, :]) ** 2).sum(axis=1) / jnp.maximum(T - 1, 1)
        else:
            cnt = jnp.maximum(lengths2.astype(h.dtype), 1.0)[:, None]
            mean = (h * tmask2).sum(axis=1) / cnt
            var = (((h - mean[:, None, :]) ** 2) * tmask2).sum(axis=1) \
                / jnp.maximum(cnt - 1.0, 1.0)
        std = jnp.sqrt(var)
        stats = jnp.concatenate([mean, std], axis=-1)

        emb = nn.Dense(self.embedding_size, use_bias=False, name="dense_linear")(stats)
        return EvalBatchNorm(self.embedding_size, affine=False,
                             name="dense_bn")(emb)
