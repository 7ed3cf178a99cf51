"""v2 pipeline end-to-end (tiny random models)."""

import numpy as np
import pytest

from seedvc_tpu.models.ar import ARConfig
from seedvc_tpu.models.astral import AstralConfig
from seedvc_tpu.models.dit_v2 import DiTV2Config
from seedvc_tpu.models.ssl import SSLConfig
from seedvc_tpu.pipelines.convert_v2 import V2Config, VoiceConverterV2


def tiny_v2() -> V2Config:
    return V2Config(
        dit=DiTV2Config(hidden_dim=32, depth=2, num_heads=4, in_channels=80,
                        content_dim=32, style_encoder_dim=24),
        ar=ARConfig(dim=32, n_layer=2, n_head=4, n_local_heads=2, head_dim=8,
                    intermediate_size=64, vocab_size=33, max_seq_len=1024),
        ssl=SSLConfig(conv_dim=16, d_model=32, n_layers=1, n_heads=4,
                      ffn_dim=64),
        narrow=AstralConfig(dim=24, intermediate_dim=48, num_blocks=1,
                            input_dim=32, codebook_size=8),
        wide=AstralConfig(dim=24, intermediate_dim=48, num_blocks=1,
                          input_dim=32, codebook_size=32),
        prompt_cap_frames=48, context_frames=144,
    )


@pytest.fixture(scope="module")
def v2():
    cfg = tiny_v2()
    # wide codebook must match AR vocab - 1
    assert cfg.ar.vocab_size == cfg.wide.codebook_size + 1
    return VoiceConverterV2(cfg)


@pytest.mark.slow
def test_convert_timbre(v2):
    rng = np.random.default_rng(0)
    src = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(11025) * 0.1).astype(np.float32)
    sr, wave, stats = v2.convert_timbre(src, 22050, ref, 22050,
                                        diffusion_steps=2)
    assert sr == 22050
    assert np.isfinite(wave).all()
    assert len(wave) > 0


@pytest.mark.slow
def test_convert_voice_with_ar(v2):
    rng = np.random.default_rng(1)
    src = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(11025) * 0.1).astype(np.float32)
    sr, wave, stats = v2.convert_voice(src, 22050, ref, 22050,
                                       diffusion_steps=2)
    assert np.isfinite(wave).all()
    assert stats["wide_tokens"] >= 1


@pytest.mark.slow
def test_convert_anonymize(v2):
    rng = np.random.default_rng(2)
    src = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(11025) * 0.1).astype(np.float32)
    sr, wave, stats = v2.convert_voice(src, 22050, ref, 22050,
                                       anonymization_only=True,
                                       diffusion_steps=2)
    assert np.isfinite(wave).all()
