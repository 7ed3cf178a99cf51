"""End-to-end offline conversion pipeline test (tiny random models)."""

import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.core.config import (
    DiTConfig, LengthRegulatorConfig, ModelParams, PreprocessConfig,
    SeedVCConfig, SpectConfig, WavenetConfig)
from seedvc_tpu.dsp.resample import resample
from seedvc_tpu.models.whisper import WhisperEncoderConfig
from seedvc_tpu.pipelines.convert import VoiceConverter, cosine_crossfade


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


def test_resample_sine_preserved():
    sr1, sr2 = 22050, 16000
    t = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), sr1, sr2))
    assert abs(len(y) - sr2) <= 1
    # dominant frequency still 440 Hz
    spec = np.abs(np.fft.rfft(y[:sr2]))
    peak = np.argmax(spec)
    assert abs(peak - 440) <= 2
    # energy preserved within a few percent
    assert abs(np.std(y[100:-100]) - np.std(x)) < 0.05


def test_crossfade_endpoints():
    a = np.ones(100, np.float32)
    b = np.zeros(100, np.float32)
    out = cosine_crossfade(a, b, 20)
    assert out[0] == pytest.approx(1.0, abs=1e-6)
    assert out[19] == pytest.approx(0.0, abs=1e-3)
    assert (out[20:] == 0).all()


@pytest.mark.slow
def test_pipeline_end_to_end():
    cfg = tiny_cfg()
    wcfg = WhisperEncoderConfig(d_model=48, n_layers=1, n_heads=4, ffn_dim=96)
    converter = VoiceConverter(
        cfg, whisper_cfg=wcfg, prompt_cap_frames=64, context_frames=192)

    rng = np.random.default_rng(0)
    src = (rng.standard_normal(22050 * 2) * 0.1).astype(np.float32)  # 2 s
    ref = (rng.standard_normal(22050) * 0.1).astype(np.float32)      # 1 s

    sr, wave, stats = converter.convert(src, 22050, ref, 22050,
                                        diffusion_steps=2)
    assert sr == 22050
    assert np.isfinite(wave).all()
    # roughly the source duration (crossfade trims a bit)
    assert abs(len(wave) - len(src)) < 22050 * 0.5
    assert stats["chunks"] >= 1


def test_convert_with_streaming_matches_convert():
    """Streaming generator == drained convert (reference
    seed_vc_wrapper.py:201-286 streams the same chunks)."""
    import numpy as np

    from tests_helpers_tiny import tiny_converter

    vc = tiny_converter()
    rng = np.random.default_rng(5)
    # long enough for >= 2 chunks at context 192 / prompt_cap 64
    src = (rng.standard_normal(22050 * 4) * 0.1).astype(np.float32)
    ref = (rng.standard_normal(11025) * 0.1).astype(np.float32)
    kw = dict(diffusion_steps=2, seed=3)
    pieces = []
    for sr, piece, stats in vc.convert_with_streaming(src, 22050, ref, 22050,
                                                      **kw):
        pieces.append(piece)
    assert len(pieces) >= 2
    streamed = np.concatenate(pieces)
    sr2, full, stats2 = vc.convert(src, 22050, ref, 22050, **kw)
    np.testing.assert_allclose(streamed, full, atol=1e-6)
    assert stats2["chunks"] == len(pieces)


def test_seed_vc_wrapper_facade(monkeypatch):
    """SeedVCWrapper lazily builds one converter per f0 mode and streams
    through it (reference seed_vc_wrapper.py:447,468-475)."""
    import numpy as np

    import seedvc_tpu.pipelines.wrapper as W

    built = []

    class FakeConverter:
        sr = 22050

        def __init__(self, cfg, **params):
            built.append(cfg.model_params.DiT.f0_condition)

        def convert_with_streaming(self, *a, **kw):
            yield 22050, np.ones(100, np.float32), {"rtf": 0.1}
            yield 22050, np.ones(50, np.float32), {"rtf": 0.2}

    monkeypatch.setattr(W, "VoiceConverter", FakeConverter)
    wrap = W.SeedVCWrapper()
    chunks = list(wrap.convert_voice(np.zeros(10), 22050, np.zeros(10), 22050,
                                     f0_condition=False))
    assert len(chunks) == 2 and built == [False]
    # non-streaming mode concatenates
    (sr, out, stats), = wrap.convert_voice(
        np.zeros(10), 22050, np.zeros(10), 22050, f0_condition=False,
        stream_output=False)
    assert len(out) == 150
    # f0 mode builds the 44k converter lazily
    list(wrap.convert_voice(np.zeros(10), 22050, np.zeros(10), 22050,
                            f0_condition=True))
    assert built == [False, True]


@pytest.mark.slow
def test_warm_precompiles_buckets():
    """Serving warmup (VERDICT r3 next #5): after ``warm()`` with the
    expected conversion shapes, a matching conversion triggers ZERO new
    XLA compiles — pinned via the jit caches of every per-conversion
    program, so the first short utterance after a long one can't stall on
    a mid-request compile."""
    from seedvc_tpu.models.bigvgan import BigVGANConfig
    from tests_helpers_tiny import tiny_converter

    # context > 512 so plan_chunks actually produces distinct buckets;
    # small vocoder so the two per-bucket compiles stay fast on CPU
    vc = tiny_converter(
        context_frames=1024, prompt_cap_frames=256,
        vocoder_cfg=BigVGANConfig(upsample_initial_channel=128,
                                  resblock_kernel_sizes=(3,),
                                  resblock_dilation_sizes=((1, 3),)))
    specs = [(10.0, 1.0), (2.0, 1.0)]  # long then short: different plans
    warmed = vc.warm(specs, diffusion_steps=2, verbose=False)
    assert len(warmed) == 2 and warmed[0] != warmed[1]

    fns = [vc._sample_vocode_fn, vc._regulate_fn, vc._whisper_fn,
           vc._style_fn, vc._chunk_fn]
    sizes = [f._cache_size() for f in fns]
    rng = np.random.default_rng(0)
    for secs in (2.0, 10.0):
        src = (rng.standard_normal(int(secs * 22050)) * 0.1).astype(np.float32)
        ref = (rng.standard_normal(22050) * 0.1).astype(np.float32)
        sr, out, _ = vc.convert(src, 22050, ref, 22050, diffusion_steps=2)
        assert out.size > 0
    assert [f._cache_size() for f in fns] == sizes, \
        "conversion after warm() compiled a new program variant"


def test_plan_chunks_buckets():
    """Adaptive context planning: smallest flash-friendly (512-multiple)
    context per conversion; tiny configs (<=512) keep the static window."""
    from tests_helpers_tiny import tiny_converter

    vc = tiny_converter()  # context 192 <= 512: unchanged plan
    assert vc.plan_chunks(1000, 50) == (vc.prompt_cap, 192,
                                        192 - vc.prompt_cap)

    # flagship geometry: context 2560, prompt_cap 768
    vc.context, vc.prompt_cap, vc.source_window = 2560, 768, 2560 - 768
    # 30 s source (2583 frames) + 5 s reference (430 frames): two 2048-frame
    # programs instead of two 2560-frame ones
    cap, ctx, W = vc.plan_chunks(2583, 430)
    assert (cap, ctx, W) == (512, 2048, 1536)
    # chunk coverage with 16-frame overlaps still spans the source in 2
    n = 2
    assert n * W - (n - 1) * 16 >= 2583
    # short utterance: one small program
    cap, ctx, W = vc.plan_chunks(400, 430)
    assert (cap, ctx) == (512, 1024) and W >= 400
    # full-length prompt caps at the configured prompt_cap
    cap, ctx, W = vc.plan_chunks(5000, 768)
    assert cap == 768 and ctx == 2560 and W == 1792
    # prompt always fits its bucket
    for p in (1, 255, 256, 257, 700, 768):
        cap, ctx, W = vc.plan_chunks(2583, p)
        assert cap >= p and ctx <= 2560 and ctx % 512 == 0 and W == ctx - cap
