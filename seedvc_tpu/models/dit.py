"""v1 DiT estimator — the CFM vector-field network.

Re-design of the reference DiT (``modules/diffusion_transformer.py:407-536``)
in channels-last (B, T, C) layout:

- inputs [x ‖ prompt_x ‖ projected cond ‖ repeated style] are merged by one
  linear (``cond_x_merge_linear``, reference ``:505-510``),
- classifier-free-guidance dropout zeroes every merged feature except x
  itself; here it is a per-sample ``cond_drop`` mask (the reference flips one
  coin for the whole batch, ``:487-491`` — per-sample is the standard DiT
  formulation and lets inference run cond/uncond in one stacked batch),
- optional style/time prepended as tokens (``:512-517``),
- U-ViT transformer trunk conditioned on the timestep embedding,
- long skip connection from the network input (``:524-525``),
- head: MLP (``:464-468``) or WaveNet post-net with adaLN final layer
  (``:446-462``, ``:526-533``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedvc_tpu.core.config import ModelParams
from seedvc_tpu.core.utils import sequence_mask
from seedvc_tpu.nn.layers import TimestepEmbedder
from seedvc_tpu.nn.transformer import Transformer, TransformerConfig
from seedvc_tpu.nn.wavenet import WaveNet


class SplitDense(nn.Module):
    """A Dense whose input is applied in two slices sharing ONE (in, out)
    kernel — so the static slice (prompt/cond/style, invariant across
    diffusion steps) can be computed once outside the sampler scan while the
    dynamic slice (the noisy mel x) is applied per step.  Param pytree is
    identical to ``nn.Dense`` (kernel (total_in, features) + bias), keeping
    checkpoint-converter compatibility for ``cond_x_merge_linear``.
    """

    features: int
    total_in: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, start: int,
                 with_bias: bool) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.total_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = jax.lax.slice_in_dim(kernel, start, start + x.shape[-1], axis=0)
        out = jnp.dot(x, w.astype(self.dtype))
        if with_bias:
            out = out + bias.astype(self.dtype)
        return out


class FinalLayer(nn.Module):
    """LayerNorm (no affine) + adaLN shift/scale + linear (reference
    ``:388-405``)."""

    hidden_size: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        mod = nn.Dense(2 * self.hidden_size, name="adaLN_modulation")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         name="norm_final")(x)
        x = x * (1 + scale[:, None, :]) + shift[:, None, :]
        return nn.Dense(self.out_channels, name="linear")(x)


class DiT(nn.Module):
    params_cfg: ModelParams

    @nn.compact
    def __call__(
        self,
        x: jax.Array,          # (B, T, C_mel) noisy mel
        prompt_x: jax.Array,   # (B, T, C_mel) reference prompt (zero elsewhere)
        x_lens: Optional[jax.Array],  # (B,) int; None = every frame valid
                               # (statically skips all masking passes)
        t: jax.Array,          # (B,) diffusion time in [0, 1]
        style: jax.Array,      # (B, style_dim)
        cond: jax.Array,       # (B, T, content_dim) length-regulated content
        cond_drop: Optional[jax.Array] = None,  # (B,) 1.0 = null/CFG branch
        deterministic: bool = True,
        return_static: bool = False,
        static_cond: Optional[dict] = None,
    ) -> jax.Array:
        """``return_static=True`` computes only the step-invariant
        conditioning (projected cond, static half of the merge linear, style
        token) and returns it as a dict; passing that dict back as
        ``static_cond`` skips recomputing it — the Euler sampler hoists ~7
        GFLOP/step of invariant matmuls out of its 25-step scan this way.
        """
        mp = self.params_cfg
        dc = mp.DiT
        B, T, C = x.shape
        keep = 1.0 if cond_drop is None else (1.0 - cond_drop)[:, None, None].astype(x.dtype)

        static_in = C + C + dc.hidden_dim
        if dc.style_condition and not dc.style_as_token:
            static_in += mp.style_encoder.dim
        merge = SplitDense(dc.hidden_dim, static_in, dtype=x.dtype,
                           name="cond_x_merge_linear")

        if static_cond is None:
            cond_p = nn.Dense(dc.hidden_dim, name="cond_projection",
                              dtype=x.dtype)(cond)
            parts = [prompt_x * keep, cond_p * keep]
            if dc.style_condition and not dc.style_as_token:
                style_rep = jnp.broadcast_to(style[:, None, :],
                                             (B, T, style.shape[-1]))
                parts.append(style_rep * keep)
            merged_static = merge(jnp.concatenate(parts, axis=-1), C, True)
            style_tok = None
            if dc.style_as_token:
                style_tok = nn.Dense(dc.hidden_dim, name="style_in",
                                     dtype=x.dtype)(style) \
                    * (keep[:, 0] if cond_drop is not None else 1.0)
            if return_static:
                return {"merged": merged_static, "style_tok": style_tok}
        else:
            merged_static = static_cond["merged"]
            style_tok = static_cond["style_tok"]

        t1 = TimestepEmbedder(dc.hidden_dim, name="t_embedder")(t)
        x_in = merge(x, 0, False) + merged_static

        n_prefix = 0
        if dc.style_as_token:
            x_in = jnp.concatenate([style_tok[:, None, :], x_in], axis=1)
            n_prefix += 1
        if dc.time_as_token:
            x_in = jnp.concatenate([t1[:, None, :].astype(x.dtype), x_in], axis=1)
            n_prefix += 1

        # Key-side padding mask (reference ``:518-520``): queries may attend
        # only to valid positions (prefix tokens always valid).  With
        # x_lens=None the mask is statically absent — the attention kernel
        # skips its bias pass entirely (full-window sampling, e.g. bench.py).
        if x_lens is None:
            attn_mask = None
        else:
            key_mask = sequence_mask(x_lens + n_prefix, T + n_prefix)
            attn_mask = key_mask[:, None, None, :]  # broadcast heads, queries

        trunk = Transformer(
            TransformerConfig(
                dim=dc.hidden_dim,
                n_layer=dc.depth,
                n_head=dc.num_heads,
                head_dim=dc.hidden_dim // dc.num_heads,
                rope_base=dc.rope_base,
                norm_eps=dc.norm_eps,
                uvit_skip_connection=dc.uvit_skip_connection,
                time_as_token=dc.time_as_token,
                use_flash=dc.use_flash_attention,
                flash_block_q=dc.flash_block_q,
                flash_block_k=dc.flash_block_k,
            ),
            name="transformer",
        )
        x_res = trunk(x_in, t1[:, None, :], attn_mask)
        x_res = x_res[:, n_prefix:]

        if dc.long_skip_connection:
            x_res = nn.Dense(dc.hidden_dim, name="skip_linear", dtype=x.dtype)(
                jnp.concatenate([x_res, x], axis=-1))

        if dc.final_layer_type == "wavenet":
            wn = mp.wavenet
            h = nn.Dense(wn.hidden_dim, name="conv1", dtype=x.dtype)(x_res)
            t2 = TimestepEmbedder(wn.hidden_dim, name="t_embedder2")(t)
            mask = (None if x_lens is None
                    else sequence_mask(x_lens, T)[..., None].astype(x.dtype))
            h = WaveNet(
                hidden_channels=wn.hidden_dim,
                kernel_size=wn.kernel_size,
                dilation_rate=wn.dilation_rate,
                n_layers=wn.num_layers,
                gin_channels=wn.hidden_dim,
                p_dropout=wn.p_dropout,
                name="wavenet",
            )(h, mask, g=t2[:, None, :].astype(x.dtype), deterministic=deterministic)
            h = h + nn.Dense(wn.hidden_dim, name="res_projection", dtype=x.dtype)(x_res)
            h = FinalLayer(wn.hidden_dim, wn.hidden_dim, name="final_layer")(h, t1)
            out = nn.Dense(dc.in_channels, name="conv2", dtype=x.dtype)(h)
        else:
            h = nn.Dense(dc.hidden_dim, name="final_mlp0", dtype=x.dtype)(x_res)
            out = nn.Dense(dc.in_channels, name="final_mlp2", dtype=x.dtype)(nn.silu(h))
        return out
