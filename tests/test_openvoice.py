"""OpenVoice ToneColorConverter parity vs reference torch implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.models.openvoice import (
    OpenVoiceConfig, ToneColorConverter, linear_spectrogram)


def _tiny_cfg():
    return OpenVoiceConfig(
        spec_channels=513, inter_channels=8, hidden_channels=16,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        upsample_rates=(4, 4), upsample_initial_channel=32,
        upsample_kernel_sizes=(8, 8), gin_channels=12, zero_g=True)


def _build_ref(cfg):
    from conftest import import_reference

    models = import_reference("modules.openvoice.models")
    return models.SynthesizerTrn(
        n_vocab=0, spec_channels=cfg.spec_channels,
        inter_channels=cfg.inter_channels, hidden_channels=cfg.hidden_channels,
        filter_channels=0, n_heads=2, n_layers=1, kernel_size=3, p_dropout=0.0,
        resblock="1",
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[list(d) for d in cfg.resblock_dilation_sizes],
        upsample_rates=list(cfg.upsample_rates),
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        n_speakers=0, gin_channels=cfg.gin_channels, zero_g=cfg.zero_g)


def test_linear_spectrogram_matches_torch():
    import torch

    from conftest import import_reference

    melp = import_reference("modules.openvoice.mel_processing")
    y = (np.random.default_rng(0).standard_normal((1, 8000)) * 0.2).astype(np.float32)
    with torch.no_grad():
        ref = melp.spectrogram_torch(torch.from_numpy(y), 1024, 22050, 256,
                                     1024, center=False).numpy()
    ours = np.asarray(linear_spectrogram(jnp.asarray(y)))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=2e-3,
                               rtol=1e-3)


@pytest.mark.slow
def test_tone_color_converter_parity(monkeypatch):
    import torch

    cfg = _tiny_cfg()
    torch.manual_seed(0)
    tm = _build_ref(cfg).eval()

    from seedvc_tpu.convert.openvoice import convert_openvoice

    params = convert_openvoice(tm.state_dict())
    model = ToneColorConverter(cfg)

    rng = np.random.default_rng(1)
    T = 20
    spec = np.abs(rng.standard_normal((1, 513, T))).astype(np.float32)
    lens = torch.LongTensor([T])

    g_src = rng.standard_normal((1, cfg.gin_channels, 1)).astype(np.float32)
    g_tgt = rng.standard_normal((1, cfg.gin_channels, 1)).astype(np.float32)
    noise = rng.standard_normal((1, cfg.inter_channels, T)).astype(np.float32)

    monkeypatch.setattr(torch, "randn_like",
                        lambda x: torch.from_numpy(noise))
    with torch.no_grad():
        ref, *_ = tm.voice_conversion(torch.from_numpy(spec), lens,
                                      torch.from_numpy(g_src),
                                      torch.from_numpy(g_tgt), tau=0.3)

    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(spec.transpose(0, 2, 1)),
        jnp.array([T]), jnp.asarray(g_src[:, :, 0]), jnp.asarray(g_tgt[:, :, 0]),
        jnp.asarray(noise.transpose(0, 2, 1)), 0.3,
        method=model.voice_conversion))
    assert ours.shape == ref[:, 0, :].shape
    np.testing.assert_allclose(ours, ref[:, 0, :].numpy(), atol=2e-4, rtol=1e-2)


@pytest.mark.slow
def test_extract_se_parity():
    import torch

    cfg = _tiny_cfg()
    torch.manual_seed(1)
    tm = _build_ref(cfg).eval()

    from seedvc_tpu.convert.openvoice import convert_openvoice

    params = convert_openvoice(tm.state_dict())
    model = ToneColorConverter(cfg)

    spec = np.abs(np.random.default_rng(2).standard_normal((1, 513, 40))).astype(np.float32)
    with torch.no_grad():
        ref = tm.ref_enc(torch.from_numpy(spec).transpose(1, 2)).numpy()
    ours = np.asarray(model.apply({"params": params},
                                  jnp.asarray(spec.transpose(0, 2, 1)),
                                  method=model.extract_se))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-2)


def test_split_segments_by_energy():
    import numpy as np

    from seedvc_tpu.models.openvoice import split_segments_by_energy

    sr = 16000
    rng = np.random.default_rng(0)
    loud = (rng.standard_normal(2 * sr) * 0.3).astype(np.float32)
    silence = np.zeros(sr, np.float32)
    wave = np.concatenate([silence, loud, silence, loud, silence])
    segs = split_segments_by_energy(wave, sr, min_sec=1.5)
    assert len(segs) == 2
    for seg in segs:
        assert len(seg) >= 1.5 * sr
    # all-silent input falls back to the whole utterance
    assert len(split_segments_by_energy(np.zeros(sr, np.float32), sr)) == 1


def test_get_se_averages_segments():
    import numpy as np

    from seedvc_tpu.models.openvoice import get_se

    calls = []

    def fake_extract(spec):
        calls.append(spec.shape)
        return np.full((1, 4), float(len(calls)), np.float32)

    sr = 22050
    t = np.arange(2 * sr) / sr
    # harmonic "voiced" bursts (the VAD's flatness check rejects white noise)
    loud = (0.3 * (np.sin(2 * np.pi * 220 * t)
                   + 0.5 * np.sin(2 * np.pi * 440 * t))).astype(np.float32)
    wave = np.concatenate([np.zeros(sr, np.float32), loud,
                           np.zeros(sr, np.float32), loud])
    emb = get_se(wave, sr, fake_extract)
    assert len(calls) == 2
    np.testing.assert_allclose(emb, np.full(4, 1.5))  # mean of 1 and 2
    # vad=False: one whole-utterance call
    calls.clear()
    get_se(wave, sr, fake_extract, vad=False)
    assert len(calls) == 1
