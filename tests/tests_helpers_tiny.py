"""Shared tiny-model builders for pipeline-level tests."""

from seedvc_tpu.core.config import (
    DiTConfig, LengthRegulatorConfig, ModelParams, PreprocessConfig,
    SeedVCConfig, SpectConfig, WavenetConfig)
from seedvc_tpu.models.whisper import WhisperEncoderConfig
from seedvc_tpu.pipelines.convert import VoiceConverter


def tiny_cfg() -> SeedVCConfig:
    return SeedVCConfig(
        preprocess_params=PreprocessConfig(
            sr=22050,
            spect_params=SpectConfig(n_fft=1024, win_length=1024,
                                     hop_length=256, n_mels=80)),
        model_params=ModelParams(
            length_regulator=LengthRegulatorConfig(
                channels=32, is_discrete=False, in_channels=48,
                sampling_ratios=(1,)),
            DiT=DiTConfig(hidden_dim=32, num_heads=4, depth=2, in_channels=80,
                          final_layer_type="mlp", content_dim=32,
                          long_skip_connection=False,
                          uvit_skip_connection=False),
            wavenet=WavenetConfig(hidden_dim=32, num_layers=1),
        ),
    )


def tiny_converter(**kw) -> VoiceConverter:
    wcfg = WhisperEncoderConfig(d_model=48, n_layers=1, n_heads=4, ffn_dim=96)
    defaults = dict(whisper_cfg=wcfg, prompt_cap_frames=64, context_frames=192)
    defaults.update(kw)
    return VoiceConverter(tiny_cfg(), **defaults)
