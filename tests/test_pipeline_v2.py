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


@pytest.mark.slow
def test_streaming_generator_matches_convert(v2):
    """convert_voice == concatenation of convert_voice_with_streaming chunks
    (reference vc_wrapper.py:526 streams; inference_v2.py:96-160 drains)."""
    rng = np.random.default_rng(3)
    # > one CFM window so at least 2 chunks stream out
    src = (rng.standard_normal(3 * 22050) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(11025) * 0.1).astype(np.float32)
    kw = dict(convert_style=False, diffusion_steps=2, seed=7)
    pieces = []
    for sr, chunk, stats in v2.convert_voice_with_streaming(
            src, 22050, ref, 22050, **kw):
        pieces.append(chunk)
    assert len(pieces) >= 2
    streamed = np.concatenate(pieces)
    sr2, full, _ = v2.convert_voice(src, 22050, ref, 22050, **kw)
    assert sr2 == sr
    np.testing.assert_allclose(streamed, full, atol=1e-6)
