"""ASTRAL content quantizer: SSL features -> ConvNeXtV2 -> BSQ tokens.

Re-design of ``modules/astral_quantization/default_model.py``: the HuBERT
SSL model runs separately (``seedvc_tpu/models/ssl.py`` — shared between the
narrow and wide quantizers like the reference's ``skip_ssl``), and this
module maps its hidden states through the bottleneck encoder and the binary
spherical quantizer.  "narrow" = codebook 32 (AR source), "wide" = codebook
2048 (CFM condition) (``configs/v2/vc_wrapper.yaml:66-103``).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedvc_tpu.nn.bsq import BSQ
from seedvc_tpu.nn.convnext import ConvNeXtV2Stage


@dataclass(frozen=True)
class AstralConfig:
    dim: int = 512
    intermediate_dim: int = 1536
    num_blocks: int = 12
    input_dim: int = 1024
    codebook_size: int = 2048


ASTRAL_NARROW = AstralConfig(codebook_size=32)
ASTRAL_WIDE = AstralConfig(codebook_size=2048)


class AstralQuantizer(nn.Module):
    cfg: AstralConfig = ASTRAL_WIDE

    @nn.compact
    def __call__(self, ssl_features: jax.Array, training: bool = False):
        """ssl_features: (B, T, input_dim) -> (quantized (B,T,dim),
        indices (B,T), aux_loss)."""
        c = self.cfg
        h = ConvNeXtV2Stage(
            dim=c.dim, intermediate_dim=c.intermediate_dim,
            num_blocks=c.num_blocks, input_dim=c.input_dim,
            name="encoder")(ssl_features)
        return BSQ(dim=c.dim, codebook_size=c.codebook_size,
                   name="quantizer")(h, training=training)
