"""Pipeline-level golden regression tests (change detectors).

Per-module parity tests cannot catch conditioning-semantics drift: a
refactor that, say, stops cropping semantic features or reorders the
prompt splice still produces finite audio and green unit tests.  These
goldens freeze a seeded tiny-config FULL conversion — fixed synthetic
inputs through the real v1, v2 and realtime-streaming pipelines — and pin
the final waveform against a committed artifact.

Regenerating (only after verifying an intentional change):
    SEEDVC_REGEN_GOLDENS=1 python -m pytest tests/test_goldens.py
A missing golden file is created on first run (and the test passes); a
mismatch against an existing file is a real regression.

All weights are deterministic random inits (jax threefry, fixed seeds);
inputs are seeded harmonic+noise mixtures so the pipelines see voiced-ish
content.  Tolerance is loose enough for cross-machine FMA differences and
~1000x tighter than any conditioning bug observed so far.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("SEEDVC_REGEN_GOLDENS") == "1"


def _signal(seconds: float, sr: int, seed: int, f0: float = 160.0):
    """Deterministic voiced-ish test signal: 3 harmonics + vibrato + noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
    x = sum((0.3 / h) * np.sin(2 * np.pi * f0 * h * vib * t)
            for h in (1, 2, 3))
    x = x * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t))  # slow AM envelope
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def _check(name: str, wave: np.ndarray, sr: int):
    """Compare against (or create) the committed golden."""
    assert np.isfinite(wave).all()
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, wave=wave.astype(np.float32), sr=sr)
        if not REGEN:
            pytest.skip(f"golden {name} created; commit it and re-run")
        return
    g = np.load(path)
    assert int(g["sr"]) == sr
    golden = g["wave"]
    assert wave.shape == golden.shape, (
        f"{name}: waveform length changed {golden.shape} -> {wave.shape}")
    scale = max(float(np.abs(golden).max()), 1e-6)
    err = float(np.abs(wave - golden).max()) / scale
    assert err < 5e-3, f"{name}: max rel deviation {err:.2e} vs golden"
    denom = float(np.linalg.norm(wave) * np.linalg.norm(golden))
    if denom > 0:
        corr = float(np.dot(wave, golden)) / denom
        assert corr > 0.9999, f"{name}: correlation {corr} vs golden"


@pytest.mark.slow
def test_golden_v1_conversion():
    from tests_helpers_tiny import tiny_converter

    vc = tiny_converter()
    src = _signal(3.0, 22050, seed=11, f0=150.0)
    ref = _signal(1.0, 22050, seed=12, f0=220.0)
    sr, wave, stats = vc.convert(src, 22050, ref, 22050,
                                 diffusion_steps=4, seed=7)
    assert stats["chunks"] >= 2  # multi-chunk: crossfade path exercised
    _check("v1_conversion", wave, sr)


@pytest.mark.slow
def test_golden_svc_f0_conversion():
    """F0-conditioned (SVC) conversion through the REAL ``extract_f0`` ->
    ``f0_to_coarse`` -> regulator pitch-embedding path (reference semantics
    ``inference.py:432-459``), with auto-F0 median matching and a +2
    semitone shift engaged.  The default-path goldens never touch this
    conditioning; this one fails on any drift in RMVPE decode, F0
    post-processing, or the regulator's F0 branch."""
    from tests_helpers_tiny import tiny_f0_converter

    vc = tiny_f0_converter()
    assert vc.f0_condition and vc.rmvpe is not None
    src = _signal(3.0, 22050, seed=41, f0=150.0)
    ref = _signal(1.0, 22050, seed=42, f0=220.0)
    sr, wave, stats = vc.convert(src, 22050, ref, 22050, diffusion_steps=4,
                                 seed=7, pitch_shift=2.0)
    assert "f0" in stats["stages"]  # the F0 stage actually ran
    _check("svc_f0_conversion", wave, sr)


@pytest.mark.slow
def test_golden_hift_conversion():
    """Conversion vocoded by HiFT (NSF-iSTFT — the streaming/realtime
    production vocoder, reference ``modules/hifigan/generator.py:393-435``).
    The other goldens all use the BigVGAN default; this pins the
    F0-predictor -> SineGen harmonic source -> iSTFT synthesis path
    end-to-end."""
    from tests_helpers_tiny import tiny_hift_converter

    vc = tiny_hift_converter()
    assert vc.vocoder_type == "hifigan"
    src = _signal(2.0, 22050, seed=51, f0=160.0)
    ref = _signal(1.0, 22050, seed=52, f0=210.0)
    sr, wave, stats = vc.convert(src, 22050, ref, 22050,
                                 diffusion_steps=4, seed=7)
    assert stats["chunks"] >= 1
    _check("hift_conversion", wave, sr)


@pytest.mark.slow
def test_golden_v2_conversion():
    import tests.test_pipeline_v2 as tp2

    v2 = tp2.VoiceConverterV2(tp2.tiny_v2())
    src = _signal(1.5, 22050, seed=21, f0=140.0)
    ref = _signal(0.8, 22050, seed=22, f0=200.0)
    sr, wave, stats = v2.convert_voice(src, 22050, ref, 22050,
                                       diffusion_steps=4, seed=7)
    assert stats["wide_tokens"] >= 1
    _check("v2_conversion", wave, sr)


@pytest.mark.slow
def test_golden_streaming():
    from tests_helpers_tiny import tiny_converter

    from seedvc_tpu.pipelines.streaming import StreamConfig, StreamingConverter

    conv = tiny_converter()
    scfg = StreamConfig(block_time=0.1, crossfade_time=0.02,
                        sola_search_time=0.01, extra_time_ce=0.3,
                        extra_time_dit=0.2, extra_time_right=0.02,
                        diffusion_steps=4, max_prompt_time=0.5)
    stream = StreamingConverter(conv, scfg)
    stream.set_reference(_signal(1.0, 22050, seed=31, f0=210.0), 22050)
    src = _signal(4 * stream.block / 22050 + 0.1, 22050, seed=32, f0=150.0)
    outs = [stream.process_block(src[i * stream.block:(i + 1) * stream.block])
            for i in range(4)]
    _check("streaming", np.concatenate(outs), 22050)
