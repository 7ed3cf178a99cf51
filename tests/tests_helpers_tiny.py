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


def tiny_f0_cfg() -> SeedVCConfig:
    """Tiny config with the SVC/F0 conditioning path enabled (the
    whisper_base_f0_44k preset's semantics at test scale: RMVPE F0 ->
    f0_to_coarse -> regulator pitch embedding)."""
    import dataclasses

    cfg = tiny_cfg()
    return dataclasses.replace(cfg, model_params=dataclasses.replace(
        cfg.model_params,
        length_regulator=dataclasses.replace(
            cfg.model_params.length_regulator,
            f0_condition=True, n_f0_bins=64),
        DiT=dataclasses.replace(cfg.model_params.DiT,
                                f0_condition=True, n_f0_bins=64)))


def tiny_f0_converter(**kw) -> VoiceConverter:
    wcfg = WhisperEncoderConfig(d_model=48, n_layers=1, n_heads=4, ffn_dim=96)
    defaults = dict(whisper_cfg=wcfg, prompt_cap_frames=64, context_frames=192)
    defaults.update(kw)
    return VoiceConverter(tiny_f0_cfg(), **defaults)


def tiny_hift_converter(**kw) -> VoiceConverter:
    """Tiny DiT with the HiFT/NSF-iSTFT vocoder (the realtime/streaming
    production vocoder — xlsr_tiny preset pairing)."""
    import dataclasses

    from seedvc_tpu.core.config import VocoderConfig

    cfg = tiny_cfg()
    cfg = dataclasses.replace(cfg, model_params=dataclasses.replace(
        cfg.model_params, vocoder=VocoderConfig(type="hifigan", name="")))
    wcfg = WhisperEncoderConfig(d_model=48, n_layers=1, n_heads=4, ffn_dim=96)
    defaults = dict(whisper_cfg=wcfg, prompt_cap_frames=64, context_frames=192)
    defaults.update(kw)
    return VoiceConverter(cfg, **defaults)
