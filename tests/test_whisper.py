"""Whisper encoder + frontend parity vs HF transformers (random-init,
config-only — no downloads in this environment)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.dsp.whisper_mel import whisper_log_mel
from seedvc_tpu.models.whisper import (
    WhisperEncoder, WhisperEncoderConfig, truncate_semantic)


def test_whisper_mel_matches_hf_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()  # default: 80 mel bins, 16 kHz
    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(32000).astype(np.float32) * 0.1)

    ref = fe([wave], return_tensors="np", sampling_rate=16000).input_features[0]
    ours = np.asarray(whisper_log_mel(jnp.asarray(wave[None])))[0]
    assert ours.shape == (3000, 80)
    np.testing.assert_allclose(ours, ref.T, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_whisper_encoder_parity():
    import torch
    from transformers import WhisperConfig, WhisperModel

    hf_cfg = WhisperConfig(
        num_mel_bins=80, d_model=64, encoder_layers=2, encoder_attention_heads=4,
        encoder_ffn_dim=128, max_source_positions=1500,
        decoder_layers=1, decoder_attention_heads=4, decoder_ffn_dim=128)
    torch.manual_seed(0)
    tm = WhisperModel(hf_cfg).eval()

    from seedvc_tpu.convert.whisper import convert_whisper_encoder

    params = convert_whisper_encoder(tm.encoder.state_dict(), n_layers=2)
    cfg = WhisperEncoderConfig(d_model=64, n_layers=2, n_heads=4, ffn_dim=128)
    model = WhisperEncoder(cfg)

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 80, 3000)).astype(np.float32)
    with torch.no_grad():
        ref = tm.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(mel.transpose(0, 2, 1))))
    assert ours.shape == ref.shape == (1, 1500, 64)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_whisper_encoder_bf16_close_to_f32():
    """The pipeline runs the frozen encoder in compute_dtype on TPU
    (reference default is fp16 — ``inference.py:145-236``); bf16 features
    must stay close to the f32 ones (guards dtype-cast bugs like double
    pos-embed casts or bf16 LayerNorm blowups)."""
    cfg = WhisperEncoderConfig(d_model=64, n_layers=2, n_heads=4, ffn_dim=128)
    model = WhisperEncoder(cfg)
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 3000, 80)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mel)["params"]

    ref = np.asarray(model.apply({"params": params}, mel), np.float32)
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    out = np.asarray(model.apply({"params": p16},
                                 mel.astype(jnp.bfloat16)), np.float32)
    snr = 10 * np.log10(np.mean(ref ** 2) / np.mean((ref - out) ** 2))
    assert snr > 25.0, f"bf16 whisper SNR {snr:.1f} dB"


def test_truncate_semantic():
    f = jnp.zeros((1, 1500, 8))
    out = truncate_semantic(f, 16000)
    assert out.shape == (1, 16000 // 320 + 1, 8)
