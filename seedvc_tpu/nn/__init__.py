from seedvc_tpu.nn.layers import (  # noqa: F401
    AdaptiveRMSNorm,
    Attention,
    FeedForward,
    RMSNorm,
    TimestepEmbedder,
    apply_rope,
    rope_cache,
)
from seedvc_tpu.nn.transformer import Transformer, TransformerConfig  # noqa: F401
from seedvc_tpu.nn.wavenet import WaveNet  # noqa: F401
