"""FULL-PIPELINE cross-implementation parity (VERDICT r4 next #4).

The strongest no-egress quality gate: build tiny torch models from the
REFERENCE's own modules (``modules/diffusion_transformer.py``,
``modules/flow_matching.py``, ``modules/length_regulator.py``,
``modules/campplus/DTDNN.py``, ``modules/bigvgan/bigvgan.py``, HF whisper),
convert their weights with ``seedvc_tpu/convert/``, then run

- the reference's OWN chunked conversion loop (``inference.py:440-528``
  semantics: whisper semantic -> mel/fbank style -> regulate -> per-chunk
  ``cfm.inference`` Euler loop ``flow_matching.py:31-117`` -> vocoder ->
  cosine crossfade), re-driven here line-for-line from reference modules,
- the repo's ``VoiceConverter.convert`` on identical inputs,

with IDENTICAL initial noise on both sides (position-indexed buffer patched
into ``torch.randn`` / ``jax.random.normal``), and assert the output
waveforms agree.  This catches composition drift — prompt splicing,
crossfade geometry, chunk scheduling, CFG stacking — that component-level
parity and self-pinned goldens structurally cannot.

Both 16 kHz streams come from the repo resampler (resampler parity is
covered separately in ``tests/test_dsp.py``; feeding both sides the same
16 kHz audio keeps this a composition test, not a resampler test).
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.core.config import (
    DiTConfig, LengthRegulatorConfig, ModelParams, PreprocessConfig,
    SeedVCConfig, SpectConfig, WavenetConfig)
from seedvc_tpu.models.bigvgan import BigVGANConfig
from seedvc_tpu.models.whisper import WhisperEncoderConfig
from seedvc_tpu.pipelines.convert import VoiceConverter

SR, HOP, N_MELS = 22050, 256, 80
CONTEXT, PROMPT_CAP = 192, 64  # -> W = 128, the reference max_source_window
D_CONTENT = 48                 # whisper d_model == regulator in_channels
STYLE_DIM = 192
STEPS = 6
CFG_RATE = 0.7


N_F0_BINS = 64


def _cfg(f0: bool = False) -> SeedVCConfig:
    return SeedVCConfig(
        preprocess_params=PreprocessConfig(
            sr=SR, spect_params=SpectConfig(n_fft=1024, win_length=1024,
                                            hop_length=HOP, n_mels=N_MELS)),
        model_params=ModelParams(
            length_regulator=LengthRegulatorConfig(
                channels=32, is_discrete=False, in_channels=D_CONTENT,
                sampling_ratios=(1,), f0_condition=f0, n_f0_bins=N_F0_BINS),
            DiT=DiTConfig(hidden_dim=32, num_heads=4, depth=2,
                          in_channels=N_MELS, final_layer_type="mlp",
                          content_dim=32, long_skip_connection=False,
                          uvit_skip_connection=False,
                          f0_condition=f0, n_f0_bins=N_F0_BINS),
            wavenet=WavenetConfig(hidden_dim=32, num_layers=1),
        ),
    )


def _ref_dit_args():
    """Reference args namespace mirroring _cfg() (same fields the YAML
    configs carry; see tests/test_convert_dit.py)."""
    return SimpleNamespace(
        DiT=SimpleNamespace(
            hidden_dim=32, num_heads=4, depth=2, class_dropout_prob=0.1,
            block_size=1024, in_channels=N_MELS, style_condition=True,
            final_layer_type="mlp", target="mel", content_dim=32,
            content_codebook_size=32, content_type="continuous",
            f0_condition=False, n_f0_bins=32, content_codebooks=1,
            is_causal=False, long_skip_connection=False,
            zero_prompt_speech_token=False, time_as_token=False,
            style_as_token=False, uvit_skip_connection=False,
            add_resblock_in_transformer=False),
        wavenet=SimpleNamespace(hidden_dim=32, num_layers=1, kernel_size=5,
                                dilation_rate=1, p_dropout=0.0,
                                style_condition=True),
        style_encoder=SimpleNamespace(dim=STYLE_DIM),
        reg_loss_type="l1",
        dit_type="DiT",
    )


VOC_CFG = BigVGANConfig(upsample_initial_channel=128,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),))


def _ref_bigvgan_h(AttrDict):
    return AttrDict(
        num_mels=N_MELS,
        upsample_rates=list(VOC_CFG.upsample_rates),
        upsample_kernel_sizes=list(VOC_CFG.upsample_kernel_sizes),
        upsample_initial_channel=VOC_CFG.upsample_initial_channel,
        resblock="1",
        resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3]],
        activation="snakebeta",
        snake_logscale=True,
        use_cuda_kernel=False,
        # match BigVGANConfig defaults (the nvidia v2 checkpoints ship
        # without final bias/tanh — bigvgan.py config.json)
        use_bias_at_final=False,
        use_tanh_at_final=False,
    )


def _build_both(f0: bool = False):
    """Tiny torch reference stack + the repo converter sharing its weights."""
    import torch
    from transformers import WhisperConfig, WhisperModel

    from conftest import import_reference

    torch.manual_seed(0)

    # --- reference torch modules ---
    ref_fm = import_reference("modules.flow_matching")
    ref_lr = import_reference("modules.length_regulator")
    ref_cp = import_reference("modules.campplus.DTDNN")
    ref_bv = import_reference("modules.bigvgan.bigvgan")
    from modules.bigvgan.env import AttrDict

    args = _ref_dit_args()
    t_cfm = ref_fm.CFM(args).eval()
    t_cfm.estimator.setup_caches(2, CONTEXT)  # CFG-stacked batch

    t_reg = ref_lr.InterpolateRegulator(
        channels=32, sampling_ratios=(1,), is_discrete=False,
        in_channels=D_CONTENT, vector_quantize=False,
        f0_condition=f0, n_f0_bins=N_F0_BINS).eval()

    t_camp = ref_cp.CAMPPlus(feat_dim=80, embedding_size=STYLE_DIM).eval()

    t_voc = ref_bv.BigVGAN(_ref_bigvgan_h(AttrDict)).eval()
    # keep weight_norm: convert_bigvgan folds weight_g/weight_v itself;
    # torch folds it lazily at forward time, so outputs agree either way

    hf_cfg = WhisperConfig(
        num_mel_bins=80, d_model=D_CONTENT, encoder_layers=1,
        encoder_attention_heads=4, encoder_ffn_dim=96,
        max_source_positions=1500, decoder_layers=1,
        decoder_attention_heads=4, decoder_ffn_dim=96)
    t_whisper = WhisperModel(hf_cfg).eval()

    # --- convert to repo params ---
    from seedvc_tpu.convert.bigvgan import convert_bigvgan
    from seedvc_tpu.convert.campplus import convert_campplus
    from seedvc_tpu.convert.dit import convert_vc_checkpoint
    from seedvc_tpu.convert.whisper import convert_whisper_encoder

    vc_params = convert_vc_checkpoint(
        {"net": {"cfm": t_cfm.state_dict(),
                 "length_regulator": t_reg.state_dict()}},
        _cfg(f0).model_params)
    vc = VoiceConverter(
        _cfg(f0),
        whisper_cfg=WhisperEncoderConfig(d_model=D_CONTENT, n_layers=1,
                                         n_heads=4, ffn_dim=96),
        vc_params=vc_params,
        whisper_params=convert_whisper_encoder(
            t_whisper.encoder.state_dict(), n_layers=1),
        campplus_params=convert_campplus(t_camp.state_dict()),
        vocoder_params=convert_bigvgan(t_voc.state_dict(), VOC_CFG),
        vocoder_cfg=VOC_CFG,
        prompt_cap_frames=PROMPT_CAP, context_frames=CONTEXT,
        compute_dtype=jnp.float32)
    ref = SimpleNamespace(cfm=t_cfm, reg=t_reg, camp=t_camp, voc=t_voc,
                          whisper=t_whisper)
    return ref, vc


def _noise_buffer(max_t: int) -> np.ndarray:
    return np.random.default_rng(1234).standard_normal(
        (max_t, N_MELS)).astype(np.float32)


def _run_reference(ref, src: np.ndarray, tgt: np.ndarray,
                   src16: np.ndarray, tgt16: np.ndarray,
                   noise: np.ndarray, monkeypatch,
                   f0_pair=None, auto_f0_adjust: bool = True,
                   pitch_shift: float = 0.0, collect=None) -> np.ndarray:
    """The reference conversion, re-driven from its own modules with the
    exact ``inference.py:440-528`` semantics (smaller context window — the
    window is a size knob there, ``max_context_window = sr//hop*30``)."""
    import torch
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()

    def semantic_fn(wave16: torch.Tensor) -> torch.Tensor:
        # inference.py:187-228: HF extractor (zero-pads to 30 s) -> encoder
        # -> crop to true token count
        feats = fe([wave16.squeeze(0).numpy()], return_tensors="pt",
                   sampling_rate=16000).input_features
        S = ref.whisper.encoder(feats).last_hidden_state
        return S[:, : wave16.size(-1) // 320 + 1]

    from conftest import import_reference

    ref_audio_mod = import_reference("modules.audio")

    def mel_fn(wave: torch.Tensor) -> torch.Tensor:
        return ref_audio_mod.mel_spectrogram(wave, 1024, N_MELS, SR, HOP,
                                             1024, 0, None)

    with torch.no_grad():
        S_alt = semantic_fn(torch.from_numpy(src16)[None])
        S_ori = semantic_fn(torch.from_numpy(tgt16)[None])
        mel2 = mel_fn(torch.from_numpy(tgt)[None])

        # style: kaldi fbank + mean-sub + campplus (inference.py:417-430).
        # torchaudio is absent in this image; the repo fbank substitutes —
        # it is pinned against an independent numpy kaldi implementation in
        # tests/test_campplus.py, so this stays a cross-impl test of the
        # mean-sub + CAMPPlus composition.
        from seedvc_tpu.dsp.fbank import kaldi_fbank

        feat2 = torch.from_numpy(np.asarray(
            kaldi_fbank(jnp.asarray(tgt16[None]))))[0]
        feat2 = feat2 - feat2.mean(dim=0, keepdim=True)
        style2 = ref.camp(feat2.unsqueeze(0))

        # F0 post-processing: inference.py:432-455 VERBATIM torch semantics
        # (incl. torch.median's lower-middle convention for even counts and
        # the +1e-5 inside the log) on the INJECTED rmvpe tracks.
        shifted_f0_alt = F0_ori = None
        if f0_pair is not None:
            f0_alt_np, f0_ori_np = f0_pair
            F0_ori = torch.from_numpy(f0_ori_np).float()[None]
            F0_alt = torch.from_numpy(f0_alt_np).float()[None]
            voiced_F0_ori = F0_ori[F0_ori > 1]
            voiced_F0_alt = F0_alt[F0_alt > 1]
            log_f0_alt = torch.log(F0_alt + 1e-5)
            voiced_log_f0_ori = torch.log(voiced_F0_ori + 1e-5)
            voiced_log_f0_alt = torch.log(voiced_F0_alt + 1e-5)
            median_log_f0_ori = torch.median(voiced_log_f0_ori)
            median_log_f0_alt = torch.median(voiced_log_f0_alt)
            shifted_log_f0_alt = log_f0_alt.clone()
            if auto_f0_adjust:
                shifted_log_f0_alt[F0_alt > 1] = (
                    log_f0_alt[F0_alt > 1] - median_log_f0_alt
                    + median_log_f0_ori)
            shifted_f0_alt = torch.exp(shifted_log_f0_alt)
            if pitch_shift != 0:
                shifted_f0_alt[F0_alt > 1] = (
                    shifted_f0_alt[F0_alt > 1] * 2 ** (pitch_shift / 12))

        target_lengths = torch.LongTensor([mel_fn(
            torch.from_numpy(src)[None]).size(2)])
        target2_lengths = torch.LongTensor([mel2.size(2)])
        cond, *_ = ref.reg(S_alt, ylens=target_lengths, n_quantizers=3,
                           f0=shifted_f0_alt)
        prompt_condition, *_ = ref.reg(S_ori, ylens=target2_lengths,
                                       n_quantizers=3, f0=F0_ori)
        if collect is not None:
            collect["cond"] = cond.numpy()
            collect["prompt_condition"] = prompt_condition.numpy()
            if shifted_f0_alt is not None:
                collect["shifted_f0_alt"] = shifted_f0_alt[0].numpy()

        # chunk loop (inference.py:470-528) with the test-scale window
        max_source_window = CONTEXT - mel2.size(2)
        overlap_frame_len = 16
        overlap_wave_len = overlap_frame_len * HOP

        real_randn = torch.randn

        def fake_randn(shape, device=None, **kw):
            # position-indexed noise: (B, n_mels, T) channel-last buffer
            assert list(shape)[1] == N_MELS
            return torch.from_numpy(
                noise[: shape[2]].T.copy())[None].to(dtype=torch.float32)

        monkeypatch.setattr(torch, "randn", fake_randn)
        try:
            processed_frames = 0
            chunks_out = []
            previous_chunk = None
            while processed_frames < cond.size(1):
                chunk_cond = cond[
                    :, processed_frames: processed_frames + max_source_window]
                is_last = (processed_frames + max_source_window
                           >= cond.size(1))
                cat_condition = torch.cat([prompt_condition, chunk_cond],
                                          dim=1)
                vc_target = ref.cfm.inference(
                    cat_condition,
                    torch.LongTensor([cat_condition.size(1)]),
                    mel2, style2, None, STEPS,
                    inference_cfg_rate=CFG_RATE)
                vc_target = vc_target[:, :, mel2.size(-1):]
                vc_wave = ref.voc(vc_target.float()).squeeze()[None, :]
                if processed_frames == 0:
                    if is_last:
                        chunks_out.append(vc_wave[0].numpy())
                        break
                    chunks_out.append(vc_wave[0, :-overlap_wave_len].numpy())
                    previous_chunk = vc_wave[0, -overlap_wave_len:]
                    processed_frames += vc_target.size(2) - overlap_frame_len
                elif is_last:
                    chunks_out.append(_crossfade(
                        previous_chunk.numpy(), vc_wave[0].numpy().copy(),
                        overlap_wave_len))
                    break
                else:
                    chunks_out.append(_crossfade(
                        previous_chunk.numpy(),
                        vc_wave[0, :-overlap_wave_len].numpy().copy(),
                        overlap_wave_len))
                    previous_chunk = vc_wave[0, -overlap_wave_len:]
                    processed_frames += vc_target.size(2) - overlap_frame_len
        finally:
            monkeypatch.setattr(torch, "randn", real_randn)
    return np.concatenate(chunks_out)


def _crossfade(chunk1, chunk2, overlap):
    # inference.py:343-350 (verbatim semantics)
    fade_out = np.cos(np.linspace(0, np.pi / 2, overlap)) ** 2
    fade_in = np.cos(np.linspace(np.pi / 2, 0, overlap)) ** 2
    chunk2[:overlap] = chunk2[:overlap] * fade_in + chunk1[-overlap:] * fade_out
    return chunk2


def _run_ours(vc, src, tgt, noise, monkeypatch, f0_pair=None,
              auto_f0_adjust: bool = True,
              pitch_shift: float = 0.0) -> np.ndarray:
    real_normal = jax.random.normal

    def fake_normal(key, shape=None, dtype=jnp.float32, *a, **kw):
        if shape is not None and len(shape) == 3 and shape[-1] == N_MELS:
            return jnp.asarray(noise[: shape[1]][None]).astype(dtype)
        return real_normal(key, shape, dtype, *a, **kw)

    kw = {}
    if f0_pair is not None:
        # Inject the SAME rmvpe tracks the reference side got: rmvpe
        # component parity is covered by tests/test_rmvpe.py, so replacing
        # it keeps this a test of the F0 COMPOSITION (median-log matching,
        # semitone shift, f0_to_coarse, regulator pitch embedding).
        f0_alt_np, f0_ori_np = f0_pair

        class _FakeRMVPE:
            def infer_from_audio_batch(self, waves, thred=0.03):
                n = waves.shape[-1] // 160
                track = (f0_alt_np if abs(len(f0_alt_np) - n)
                         <= abs(len(f0_ori_np) - n) else f0_ori_np)
                return track[None].copy()

        monkeypatch.setattr(vc, "rmvpe", _FakeRMVPE())
        kw = dict(auto_f0_adjust=auto_f0_adjust, pitch_shift=pitch_shift)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        _, wave, _ = vc.convert(src, SR, tgt, SR, diffusion_steps=STEPS,
                                cfg_rate=CFG_RATE, **kw)
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)
    return wave


def _snr_db(ref, out):
    n = min(len(ref), len(out))
    ref, out = ref[:n], out[:n]
    return 10 * np.log10(np.mean(ref ** 2)
                         / max(np.mean((ref - out) ** 2), 1e-20))


@pytest.mark.slow
def test_full_pipeline_matches_reference_chunked_conversion(monkeypatch):
    """Two FULL W-frame chunks (240-frame source, W=128, overlap 16):
    chunk scheduling, prompt splicing, CFG stacking, Euler integration,
    vocoding and the crossfade all match the reference end-to-end."""
    ref, vc = _build_both()

    rng = np.random.default_rng(7)
    t = np.arange(240 * HOP) / SR
    src = (0.3 * np.sin(2 * np.pi * 150 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    t2 = np.arange(PROMPT_CAP * HOP) / SR
    tgt = (0.3 * np.sin(2 * np.pi * 220 * t2)
           + 0.05 * rng.standard_normal(len(t2))).astype(np.float32)

    from seedvc_tpu.dsp.resample import resample_host

    src16 = resample_host(src, SR, 16000)
    tgt16 = resample_host(tgt, SR, 16000)

    noise = _noise_buffer(CONTEXT)
    ref_wave = _run_reference(ref, src, tgt, src16, tgt16, noise, monkeypatch)
    our_wave = _run_ours(vc, src, tgt, noise, monkeypatch)

    assert our_wave.shape == ref_wave.shape, (
        f"composed waveform length {our_wave.shape} != reference "
        f"{ref_wave.shape}")
    snr = _snr_db(ref_wave, our_wave)
    assert snr > 30.0, f"cross-impl full-pipeline SNR {snr:.1f} dB"
    corr = (np.dot(ref_wave, our_wave)
            / (np.linalg.norm(ref_wave) * np.linalg.norm(our_wave) + 1e-12))
    assert corr > 0.999, f"cross-impl correlation {corr}"


@pytest.mark.slow
def test_full_pipeline_partial_last_chunk(monkeypatch):
    """200-frame source: the last chunk is PARTIAL (w=88 < W=128).  The
    repo vocodes the fixed W-frame buffer and trims (one compiled program
    per (context, W), not per source length), so the final
    receptive-field-sized tail may deviate from the reference's exact-w
    vocoding; everything before it must still match."""
    ref, vc = _build_both()

    rng = np.random.default_rng(8)
    t = np.arange(200 * HOP) / SR
    src = (0.3 * np.sin(2 * np.pi * 180 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    t2 = np.arange(PROMPT_CAP * HOP) / SR
    tgt = (0.3 * np.sin(2 * np.pi * 130 * t2)
           + 0.05 * rng.standard_normal(len(t2))).astype(np.float32)

    from seedvc_tpu.dsp.resample import resample_host

    src16 = resample_host(src, SR, 16000)
    tgt16 = resample_host(tgt, SR, 16000)

    noise = _noise_buffer(CONTEXT)
    ref_wave = _run_reference(ref, src, tgt, src16, tgt16, noise, monkeypatch)
    our_wave = _run_ours(vc, src, tgt, noise, monkeypatch)

    assert our_wave.shape == ref_wave.shape
    tail = 24 * HOP  # > vocoder receptive field at the trim boundary
    snr = _snr_db(ref_wave[:-tail], our_wave[:-tail])
    assert snr > 30.0, f"cross-impl partial-chunk SNR {snr:.1f} dB"
    # the tail itself stays bounded and correlated (same audio content)
    tail_corr = (np.dot(ref_wave[-tail:], our_wave[-tail:])
                 / (np.linalg.norm(ref_wave[-tail:])
                    * np.linalg.norm(our_wave[-tail:]) + 1e-12))
    assert tail_corr > 0.9, f"tail correlation {tail_corr}"


def _synth_f0(n: int, seed: int, lo: float, hi: float) -> np.ndarray:
    """Synthetic rmvpe-style F0 track (100 Hz frames): voiced runs split
    into two WIDE clusters (lo / hi) with an EVEN voiced count, so the two
    middle log-F0 values straddle the cluster gap — torch.median (lower
    middle) and np.median (average of middles) then differ by
    ~log(hi/lo)/2, which the coarse-bin quantisation cannot hide.  Pins
    the exact reference median convention in the auto-F0 matching."""
    rng = np.random.default_rng(seed)
    f0 = np.zeros(n, np.float32)
    voiced = np.zeros(n, bool)
    i = 4  # leading unvoiced gap
    while i + 8 < n - 4:
        run = int(rng.integers(6, 12))
        voiced[i: i + run] = True
        i += run + int(rng.integers(3, 6))  # unvoiced gap
    idx = np.flatnonzero(voiced)
    if len(idx) % 2 == 1:
        idx = idx[:-1]
    # EXACTLY half the voiced frames in each cluster, scattered over the
    # voiced slots: the sorted voiced values' two middles then straddle the
    # lo/hi gap, so the median conventions differ by ~log(hi/lo)/2.
    half = len(idx) // 2
    vals = np.concatenate([
        lo * (1.0 + 0.04 * rng.standard_normal(half)),
        hi * (1.0 + 0.04 * rng.standard_normal(len(idx) - half))])
    f0[rng.permutation(idx)] = np.maximum(vals, 2.0).astype(np.float32)
    return f0


@pytest.mark.slow
def test_full_pipeline_f0_svc_matches_reference(monkeypatch):
    """SVC/F0-conditioned conversion (``--f0-condition``): the injected
    rmvpe tracks flow through median-log auto-F0 matching + a +2 st shift
    (``inference.py:432-455``) into the regulator's ``f0_to_coarse`` pitch
    embedding on BOTH the source cond and the reference prompt cond
    (``inference.py:462-468``), then through the usual chunked CFM loop.
    The v1/v2 cross-impl tests run f0-less; the SVC golden is self-pinned —
    this is the only gate on the F0 COMPOSITION order."""
    ref, vc = _build_both(f0=True)

    rng = np.random.default_rng(9)
    t = np.arange(240 * HOP) / SR
    src = (0.3 * np.sin(2 * np.pi * 150 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    t2 = np.arange(PROMPT_CAP * HOP) / SR
    tgt = (0.3 * np.sin(2 * np.pi * 220 * t2)
           + 0.05 * rng.standard_normal(len(t2))).astype(np.float32)

    from seedvc_tpu.dsp.resample import resample_host

    src16 = resample_host(src, SR, 16000)
    tgt16 = resample_host(tgt, SR, 16000)

    f0_alt = _synth_f0(len(src16) // 160, seed=21, lo=110.0, hi=440.0)
    f0_ori = _synth_f0(len(tgt16) // 160, seed=22, lo=160.0, hi=330.0)
    assert (f0_alt > 1).sum() % 2 == 0 and (f0_ori > 1).sum() % 2 == 0

    noise = _noise_buffer(CONTEXT)
    kw = dict(f0_pair=(f0_alt, f0_ori), auto_f0_adjust=True, pitch_shift=2.0)
    collect: dict = {}
    ref_wave = _run_reference(ref, src, tgt, src16, tgt16, noise,
                              monkeypatch, collect=collect, **kw)
    our_wave = _run_ours(vc, src, tgt, noise, monkeypatch, **kw)

    assert our_wave.shape == ref_wave.shape
    snr = _snr_db(ref_wave, our_wave)
    assert snr > 30.0, f"cross-impl SVC/F0 SNR {snr:.1f} dB"

    # The tiny random-weight DiT attenuates conditioning differences ~16 dB
    # (a fully wrong F0 track still cleared 30 dB SNR when measured), so the
    # waveform alone cannot pin the F0 path — compare the CONDITIONING
    # tensors exactly.  vc.rmvpe is still the injected stub here
    # (monkeypatch lives until test teardown).
    shifted_ours, f0_ori_ours = vc.extract_f0(
        src16, tgt16, auto_f0_adjust=True, pitch_shift=2.0)
    # 1) F0 post-processing matches torch verbatim (median convention,
    #    voiced-only shift, semitone factor)
    np.testing.assert_allclose(shifted_ours, collect["shifted_f0_alt"],
                               rtol=1e-4, atol=1e-3)
    # 2) regulated cond and prompt cond match the reference regulator's
    #    output (f0_to_coarse -> pitch embedding -> nearest interp -> convs)
    s_alt = vc.semantic_features(src16)
    s_ori = vc.semantic_features(tgt16)
    cond_ours = np.asarray(vc._regulate_bucketed(
        jnp.asarray(s_alt), 240, jnp.asarray(shifted_ours[None])))
    prompt_ours = np.asarray(vc._regulate_bucketed(
        jnp.asarray(s_ori), PROMPT_CAP, jnp.asarray(f0_ori_ours[None])))
    for ours, theirs, name in [(cond_ours, collect["cond"], "cond"),
                               (prompt_ours, collect["prompt_condition"],
                                "prompt_condition")]:
        scale = max(np.abs(theirs).max(), 1e-6)
        err = np.abs(ours - theirs).max() / scale
        assert err < 1e-3, f"F0-conditioned {name} max rel err {err:.2e}"


# ----------------------------------------------------------------------
# v2 timbre-only path (VERDICT r4 next #4, second half): the chunked
# timbre branch of ``modules/v2/vc_wrapper.py:716-765`` — regulate wide
# tokens -> per-chunk multi-cond CFG CFM (``modules/v2/cfm.py:31-133``) ->
# vocoder -> crossfade — against VoiceConverterV2.convert_timbre on the
# SAME wide tokens, style audio, initial noise and ASYMMETRIC CFG rates
# (0.4 intelligibility / 0.8 similarity), which pins the
# (intelligibility, similarity) -> (uncond, text-only) weight mapping.
# Content extraction (hubert + ASTRAL) is injected as a fixed token
# sequence on both sides: its conversion parity is covered component-wise
# (tests/test_ssl.py, tests/test_v2_stack.py), and injecting tokens keeps
# this a test of the v2 COMPOSITION.

V2_STYLE_DIM = 24
V2_CONTENT_DIM = 24
V2_CODEBOOK = 32
INTEL_RATE, SIM_RATE = 0.4, 0.8


def _build_both_v2(with_ar: bool = False):
    import torch

    from conftest import import_reference

    from seedvc_tpu.models.ar import ARConfig
    from seedvc_tpu.models.astral import AstralConfig
    from seedvc_tpu.models.dit_v2 import DiTV2Config
    from seedvc_tpu.models.ssl import SSLConfig
    from seedvc_tpu.pipelines.convert_v2 import V2Config, VoiceConverterV2

    torch.manual_seed(0)

    ref_dit_mod = import_reference("modules.v2.dit_wrapper")
    ref_cfm_mod = import_reference("modules.v2.cfm")
    ref_lr_mod = import_reference("modules.v2.length_regulator")
    ref_cp = import_reference("modules.campplus.DTDNN")
    ref_bv = import_reference("modules.bigvgan.bigvgan")
    ref_ar_mod = import_reference("modules.v2.ar")
    from modules.bigvgan.env import AttrDict

    dit_cfg = DiTV2Config(hidden_dim=32, depth=2, num_heads=4,
                          in_channels=N_MELS, content_dim=V2_CONTENT_DIM,
                          style_encoder_dim=V2_STYLE_DIM,
                          use_flash_attention=False)
    t_dit = ref_dit_mod.DiT(
        time_as_token=True, style_as_token=True, uvit_skip_connection=False,
        block_size=512, depth=dit_cfg.depth, num_heads=dit_cfg.num_heads,
        hidden_dim=dit_cfg.hidden_dim, in_channels=dit_cfg.in_channels,
        content_dim=dit_cfg.content_dim,
        style_encoder_dim=dit_cfg.style_encoder_dim,
        class_dropout_prob=0.1, dropout_rate=0.0, attn_dropout_rate=0.0,
    ).eval()
    t_cfm = ref_cfm_mod.CFM(t_dit).eval()

    # the repo pipeline hard-codes sampling_ratios=(1,1,1,1) for cfm_reg
    t_reg = ref_lr_mod.InterpolateRegulator(
        channels=V2_CONTENT_DIM, sampling_ratios=(1, 1, 1, 1),
        is_discrete=True, codebook_size=V2_CODEBOOK).eval()

    t_camp = ref_cp.CAMPPlus(feat_dim=80, embedding_size=V2_STYLE_DIM).eval()
    t_voc = ref_bv.BigVGAN(_ref_bigvgan_h(AttrDict)).eval()

    from seedvc_tpu.convert.bigvgan import convert_bigvgan
    from seedvc_tpu.convert.campplus import convert_campplus
    from seedvc_tpu.convert.dit_v2 import convert_dit_v2, convert_regulator_v2
    from seedvc_tpu.core.config import LengthRegulatorConfig

    vcfg = V2Config(
        dit=dit_cfg,
        ar=ARConfig(dim=32, n_layer=1, n_head=4, n_local_heads=2, head_dim=8,
                    intermediate_size=64, vocab_size=33, max_seq_len=512),
        ssl=SSLConfig(conv_dim=16, d_model=32, n_layers=1, n_heads=4,
                      ffn_dim=64),
        narrow=AstralConfig(dim=24, intermediate_dim=48, num_blocks=1,
                            input_dim=32, codebook_size=8),
        wide=AstralConfig(dim=24, intermediate_dim=48, num_blocks=1,
                          input_dim=32, codebook_size=V2_CODEBOOK),
        prompt_cap_frames=PROMPT_CAP, context_frames=CONTEXT)
    params = {
        "dit": convert_dit_v2(t_dit.state_dict(), dit_cfg),
        "cfm_reg": convert_regulator_v2(
            t_reg.state_dict(),
            LengthRegulatorConfig(channels=V2_CONTENT_DIM, is_discrete=True,
                                  content_codebook_size=V2_CODEBOOK,
                                  sampling_ratios=(1, 1, 1, 1))),
        "campplus": convert_campplus(t_camp.state_dict()),
        "vocoder": convert_bigvgan(t_voc.state_dict(), VOC_CFG),
    }

    t_ar = t_ar_reg = None
    if with_ar:
        from seedvc_tpu.convert.ar import convert_ar

        t_ar_cfg = ref_ar_mod.NaiveModelArgs(
            dim=32, n_layer=1, n_head=4, n_local_heads=2,
            intermediate_size=64, vocab_size=33, max_seq_len=512)
        t_ar = ref_ar_mod.NaiveWrapper(
            ref_ar_mod.NaiveTransformer(t_ar_cfg)).eval()
        t_ar.setup_caches(1, 512, dtype=torch.float32, device="cpu")
        # ar_length_regulator: narrow-codebook embedding + 1x1 conv,
        # sampling_ratios [] (vc_wrapper.yaml:54-60)
        t_ar_reg = ref_lr_mod.InterpolateRegulator(
            channels=32, sampling_ratios=(), is_discrete=True,
            codebook_size=8).eval()
        params["ar"] = convert_ar(t_ar.state_dict(), n_layers=1)
        params["ar_reg"] = convert_regulator_v2(
            t_ar_reg.state_dict(),
            LengthRegulatorConfig(channels=32, is_discrete=True,
                                  content_codebook_size=8,
                                  sampling_ratios=()))

    v2 = VoiceConverterV2(vcfg, params=params)
    # the repo vocoder must be the tiny config too (V2Config defaults to the
    # full 22k BigVGAN): rebuild with the converted params + tiny cfg
    from seedvc_tpu.models.bigvgan import BigVGAN

    v2.vocoder = BigVGAN(VOC_CFG)
    from types import SimpleNamespace as NS

    ref = NS(cfm=t_cfm, reg=t_reg, camp=t_camp, voc=t_voc,
             ar=t_ar, ar_reg=t_ar_reg, ar_mod=ref_ar_mod)
    return ref, v2


@pytest.mark.slow
def test_v2_timbre_only_matches_reference(monkeypatch):
    import torch

    ref, v2 = _build_both_v2()
    sr, hop = v2.cfg.sr, v2.cfg.hop

    rng = np.random.default_rng(11)
    t = np.arange(240 * hop) / sr
    src = (0.3 * np.sin(2 * np.pi * 160 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    t2 = np.arange(PROMPT_CAP * hop) / sr
    tgt = (0.3 * np.sin(2 * np.pi * 210 * t2)
           + 0.05 * rng.standard_normal(len(t2))).astype(np.float32)

    from seedvc_tpu.dsp.resample import resample

    src16 = np.asarray(resample(jnp.asarray(src), sr, 16000))
    # crop exactly as the pipeline does after its prompt cap
    tgt16 = np.asarray(resample(jnp.asarray(tgt), sr, 16000))
    tgt16 = tgt16[: int(len(tgt) / sr * 16000)]

    # injected wide tokens (both sides)
    tok_src = rng.integers(0, V2_CODEBOOK, (1, len(src16) // 320))
    tok_tgt = rng.integers(0, V2_CODEBOOK, (1, len(tgt16) // 320))

    def fake_content_tokens(wave16):
        toks = tok_src if len(wave16) == len(src16) else tok_tgt
        return toks.copy(), toks.copy()

    monkeypatch.setattr(v2, "content_tokens", fake_content_tokens)

    noise = _noise_buffer(CONTEXT)

    # ---- reference side: vc_wrapper.py:716-765 loop from its modules ----
    from seedvc_tpu.dsp.fbank import kaldi_fbank

    from conftest import import_reference

    ref_audio_mod = import_reference("modules.audio")

    with torch.no_grad():
        mel2 = ref_audio_mod.mel_spectrogram(
            torch.from_numpy(tgt)[None], 1024, N_MELS, sr, hop, 1024, 0,
            None)  # (B, C, T)
        target_mel_len = mel2.size(2)
        src_mel_len = len(src) // hop

        feat2 = torch.from_numpy(np.asarray(
            kaldi_fbank(jnp.asarray(tgt16[None]))))[0]
        feat2 = feat2 - feat2.mean(dim=0, keepdim=True)
        style2 = ref.camp(feat2.unsqueeze(0))

        cond, _ = ref.reg(torch.from_numpy(tok_src),
                          ylens=torch.LongTensor([src_mel_len]))
        prompt_condition, _ = ref.reg(torch.from_numpy(tok_tgt),
                                      ylens=torch.LongTensor([target_mel_len]))

        real_randn = torch.randn

        def fake_randn(shape, device=None, **kw):
            assert list(shape)[1] == N_MELS
            return torch.from_numpy(
                noise[: shape[2]].T.copy())[None].to(dtype=torch.float32)

        monkeypatch.setattr(torch, "randn", fake_randn)
        try:
            max_source_window = CONTEXT - target_mel_len
            overlap_wave_len = 16 * hop
            processed = 0
            chunks_out = []
            previous_chunk = None
            while processed < cond.size(1):
                chunk_cond = cond[:, processed: processed + max_source_window]
                is_last = processed + max_source_window >= cond.size(1)
                cat_condition = torch.cat([prompt_condition, chunk_cond],
                                          dim=1)
                original_len = cat_condition.size(1)
                vc_mel = ref.cfm.inference(
                    cat_condition, torch.LongTensor([original_len]),
                    mel2, style2, STEPS,
                    inference_cfg_rate=[INTEL_RATE, SIM_RATE])
                vc_mel = vc_mel[:, :, target_mel_len:original_len]
                vc_wave = ref.voc(vc_mel.float()).squeeze()[None, :]
                if processed == 0:
                    if is_last:
                        chunks_out.append(vc_wave[0].numpy())
                        break
                    chunks_out.append(vc_wave[0, :-overlap_wave_len].numpy())
                    previous_chunk = vc_wave[0, -overlap_wave_len:]
                    processed += vc_mel.size(2) - 16
                elif is_last:
                    chunks_out.append(_crossfade(
                        previous_chunk.numpy(), vc_wave[0].numpy().copy(),
                        overlap_wave_len))
                    break
                else:
                    chunks_out.append(_crossfade(
                        previous_chunk.numpy(),
                        vc_wave[0, :-overlap_wave_len].numpy().copy(),
                        overlap_wave_len))
                    previous_chunk = vc_wave[0, -overlap_wave_len:]
                    processed += vc_mel.size(2) - 16
        finally:
            monkeypatch.setattr(torch, "randn", real_randn)
    ref_wave = np.concatenate(chunks_out)

    # ---- repo side ----
    real_normal = jax.random.normal

    def fake_normal(key, shape=None, dtype=jnp.float32, *a, **kw):
        if shape is not None and len(shape) == 3 and shape[-1] == N_MELS:
            return jnp.asarray(noise[: shape[1]][None]).astype(dtype)
        return real_normal(key, shape, dtype, *a, **kw)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        _, our_wave, _ = v2.convert_timbre(
            src, sr, tgt, sr, diffusion_steps=STEPS,
            intelligibility_cfg_rate=INTEL_RATE,
            similarity_cfg_rate=SIM_RATE)
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)

    assert our_wave.shape == ref_wave.shape, (
        f"v2 timbre waveform length {our_wave.shape} != {ref_wave.shape}")
    snr = _snr_db(ref_wave, our_wave)
    assert snr > 30.0, f"v2 timbre cross-impl SNR {snr:.1f} dB"


@pytest.mark.slow
def test_v2_convert_voice_ar_matches_reference(monkeypatch):
    """FULL v2 accent conversion (``convert_style=True``): injected narrow
    tokens -> duration reduction (``vc_wrapper.py:139-153``) -> AR cond
    assembly ``[tgt_reduced ‖ chunk]`` through the ar_length_regulator ->
    GREEDY AR decode with the target wide-token prompt -> the AR-ratio
    ylens formula (``vc_wrapper.py:650-651``) -> cfm regulate -> 3-way CFG
    CFM -> vocoder, against the reference's own chunk loop
    (``vc_wrapper.py:628-680``) re-driven from its modules.  Pins the whole
    AR->CFM glue: identical token streams, identical output length (the
    duration follows the AR), waveform agreement."""
    import itertools

    import torch

    from test_cross_impl_ar import _greedy_patches

    ref, v2 = _build_both_v2(with_ar=True)
    _greedy_patches(monkeypatch)
    sr, hop = v2.cfg.sr, v2.cfg.hop
    MAX_NEW = 48
    NARROW_CB = 8

    # cap the repo decode identically to the reference's bounded loop
    from seedvc_tpu.models.ar import make_generate_fn

    v2._generate = jax.jit(make_generate_fn(v2.ar, max_new_tokens=MAX_NEW))
    monkeypatch.setattr(ref.ar_mod, "tqdm",
                        lambda it: itertools.islice(it, MAX_NEW - 1))

    rng = np.random.default_rng(13)
    t = np.arange(150 * hop) / sr
    src = (0.3 * np.sin(2 * np.pi * 170 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    t2 = np.arange(PROMPT_CAP * hop) / sr
    tgt = (0.3 * np.sin(2 * np.pi * 240 * t2)
           + 0.05 * rng.standard_normal(len(t2))).astype(np.float32)

    from seedvc_tpu.dsp.resample import resample

    src16 = np.asarray(resample(jnp.asarray(src), sr, 16000))
    tgt16 = np.asarray(resample(jnp.asarray(tgt), sr, 16000))
    tgt16 = tgt16[: int(len(tgt) / sr * 16000)]

    def runs(n, seed):
        # narrow tokens with 1-4x repeats so duration reduction REDUCES
        r = np.random.default_rng(seed)
        out = []
        while len(out) < n:
            out.extend([int(r.integers(0, NARROW_CB))]
                       * int(r.integers(1, 5)))
        return np.asarray(out[:n])[None]

    tok_src_n, tok_tgt_n = runs(len(src16) // 320, 31), runs(
        len(tgt16) // 320, 32)
    tok_src_w = rng.integers(0, V2_CODEBOOK, (1, len(src16) // 320))
    tok_tgt_w = rng.integers(0, V2_CODEBOOK, (1, len(tgt16) // 320))

    def fake_content_tokens(wave16):
        if len(wave16) == len(src16):
            return tok_src_n.copy(), tok_src_w.copy()
        return tok_tgt_n.copy(), tok_tgt_w.copy()

    monkeypatch.setattr(v2, "content_tokens", fake_content_tokens)

    noise = _noise_buffer(CONTEXT)

    # ---- reference side: vc_wrapper.py:626-680 from its modules ----
    from seedvc_tpu.dsp.fbank import kaldi_fbank

    from conftest import import_reference

    ref_audio_mod = import_reference("modules.audio")

    with torch.no_grad():
        mel2 = ref_audio_mod.mel_spectrogram(
            torch.from_numpy(tgt)[None], 1024, N_MELS, sr, hop, 1024, 0,
            None)
        target_mel_len = mel2.size(2)
        src_mel_len = ref_audio_mod.mel_spectrogram(
            torch.from_numpy(src)[None], 1024, N_MELS, sr, hop, 1024, 0,
            None).size(2)

        feat2 = torch.from_numpy(np.asarray(
            kaldi_fbank(jnp.asarray(tgt16[None]))))[0]
        feat2 = feat2 - feat2.mean(dim=0, keepdim=True)
        style2 = ref.camp(feat2.unsqueeze(0))

        prompt_condition, _ = ref.reg(
            torch.from_numpy(tok_tgt_w),
            ylens=torch.LongTensor([target_mel_len]))

        def dr(token_seq, n_gram=1):
            # vc_wrapper.py:139-153 VERBATIM (the module itself imports
            # torchaudio, absent here, so the 6-line static method is
            # inlined)
            n_gram_seq = token_seq.unfold(0, n_gram, 1)
            mask = torch.all(n_gram_seq[1:] != n_gram_seq[:-1], dim=1)
            reduced = torch.cat((n_gram_seq[0, :n_gram],
                                 n_gram_seq[1:, -1][mask]))
            return reduced, len(reduced)

        src_red, _ = dr(torch.from_numpy(tok_src_n[0]), 1)
        tgt_red, tgt_red_len = dr(torch.from_numpy(tok_tgt_n[0]), 1)
        max_chunk = 1500 - int(tgt_red_len)
        assert len(src_red) <= max_chunk  # single-chunk test by design

        chunk_ar_cond = ref.ar_reg(
            torch.cat([tgt_red, src_red], dim=0)[None])[0]
        chunk_ar_out = ref.ar.generate(
            chunk_ar_cond, torch.from_numpy(tok_tgt_w),
            temperature=0.7, top_p=0.7, repetition_penalty=1.5)
        n_ar_ref = chunk_ar_out.size(-1)

        ylens = int(src_mel_len / tok_src_w.shape[1] * n_ar_ref * 1.0)
        chunk_cond, _ = ref.reg(chunk_ar_out,
                                ylens=torch.LongTensor([ylens]))
        cat_condition = torch.cat([prompt_condition, chunk_cond], dim=1)
        original_len = cat_condition.size(1)

        real_randn = torch.randn

        def fake_randn(shape, device=None, **kw):
            assert list(shape)[1] == N_MELS
            return torch.from_numpy(
                noise[: shape[2]].T.copy())[None].to(dtype=torch.float32)

        monkeypatch.setattr(torch, "randn", fake_randn)
        try:
            vc_mel = ref.cfm.inference(
                cat_condition, torch.LongTensor([original_len]),
                mel2, style2, STEPS,
                inference_cfg_rate=[INTEL_RATE, SIM_RATE])
        finally:
            monkeypatch.setattr(torch, "randn", real_randn)
        vc_mel = vc_mel[:, :, target_mel_len:original_len]
        ref_wave = ref.voc(vc_mel.float()).squeeze().numpy()

    # ---- repo side ----
    real_normal = jax.random.normal

    def fake_normal(key, shape=None, dtype=jnp.float32, *a, **kw):
        if shape is not None and len(shape) == 3 and shape[-1] == N_MELS:
            return jnp.asarray(noise[: shape[1]][None]).astype(dtype)
        return real_normal(key, shape, dtype, *a, **kw)

    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        _, our_wave, stats = v2.convert_voice(
            src, sr, tgt, sr, diffusion_steps=STEPS, convert_style=True,
            intelligibility_cfg_rate=INTEL_RATE,
            similarity_cfg_rate=SIM_RATE, seed=0)
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)

    # identical greedy wide-token streams => identical AR-ratio duration
    assert stats["wide_tokens"] == n_ar_ref, (
        f"wide token count {stats['wide_tokens']} != reference {n_ar_ref}")
    assert our_wave.shape == ref_wave.shape, (
        f"AR-driven output length {our_wave.shape} != {ref_wave.shape}")
    # repo vocodes the padded W-frame buffer and trims; exclude the
    # receptive-field tail (same caveat as the v1 partial-chunk test)
    tail = 24 * hop
    snr = _snr_db(ref_wave[:-tail], our_wave[:-tail])
    assert snr > 30.0, f"v2 convert_voice cross-impl SNR {snr:.1f} dB"


# ----------------------------------------------------------------------
# Realtime streaming block path vs the reference's ``custom_infer``
# (``real-time-gui.py:44-152``): the LAST cross-impl residual.  The repo's
# fused one-dispatch block program (``pipelines/streaming.py``) must
# reproduce the reference's conditioning geometry exactly: CE/DiT context
# difference dropped as 50 Hz frames (``:117-118``), regulate to the
# DiT-window mel length (``:119-122``), [cached prompt ‖ cond] CFM with the
# reference mel prompt (``:123-146``), vocode, and emit
# ``wave[-ret-tail : -tail]`` (``:147-152``).  SOLA/VAD/fades are host-side
# post-steps tested separately (tests/test_streaming.py) — this drives the
# device program directly.

@pytest.mark.slow
def test_streaming_block_matches_reference_custom_infer(monkeypatch):
    import torch

    ref, vc = _build_both()
    from seedvc_tpu.pipelines.streaming import (StreamConfig,
                                                StreamingConverter)

    scfg = StreamConfig(block_time=0.3, crossfade_time=0.046,
                        sola_search_time=0.012, extra_time_ce=0.5,
                        extra_time_dit=0.25, extra_time_right=0.02,
                        diffusion_steps=STEPS, cfg_rate=CFG_RATE,
                        max_prompt_time=PROMPT_CAP * HOP / SR,
                        vad_threshold_db=-10000.0)
    stream = StreamingConverter(vc, scfg)

    rng = np.random.default_rng(17)
    t2 = np.arange(PROMPT_CAP * HOP) / SR
    tgt = (0.3 * np.sin(2 * np.pi * 220 * t2)
           + 0.05 * rng.standard_normal(len(t2))).astype(np.float32)

    noise = _noise_buffer(CONTEXT)
    real_normal = jax.random.normal

    def fake_normal(key, shape=None, dtype=jnp.float32, *a, **kw):
        if shape is not None and len(shape) == 3 and shape[-1] == N_MELS:
            return jnp.asarray(noise[: shape[1]][None]).astype(dtype)
        return real_normal(key, shape, dtype, *a, **kw)

    # patch BEFORE set_reference: the fused program traces (and warms) there
    monkeypatch.setattr(jax.random, "normal", fake_normal)
    try:
        stream.set_reference(tgt, SR)

        tb = np.arange(stream.block) / SR
        block = (0.3 * np.sin(2 * np.pi * 160 * tb) + 0.05
                 * rng.standard_normal(stream.block)).astype(np.float32)

        # drive the device program directly on a zero ring + this block
        r, r16, k, out_dev = stream._fused(
            jnp.zeros(stream.window, jnp.float32),
            jnp.zeros(stream.window_16k, jnp.float32),
            jnp.asarray(block), stream._prompt_cond_dev,
            stream._prompt_mel_pad, stream._style, jax.random.PRNGKey(5),
            vc.whisper_params, vc.vc_params, vc.vocoder_params)
        out = np.asarray(out_dev)
    finally:
        monkeypatch.setattr(jax.random, "normal", real_normal)

    # ---- reference custom_infer re-driven from its modules ----
    from transformers import WhisperFeatureExtractor

    from seedvc_tpu.dsp.fbank import kaldi_fbank
    from seedvc_tpu.dsp.resample import resample

    fe = WhisperFeatureExtractor()

    def semantic_fn(wave16):
        feats = fe([wave16.squeeze(0).numpy()], return_tensors="pt",
                   sampling_rate=16000).input_features
        S = ref.whisper.encoder(feats).last_hidden_state
        return S[:, : wave16.size(-1) // 320 + 1]

    from conftest import import_reference

    ref_audio_mod = import_reference("modules.audio")

    with torch.no_grad():
        # reference caching block (real-time-gui.py:74-94)
        tgt16 = np.asarray(resample(jnp.asarray(tgt), SR, 16000))
        S_ori = semantic_fn(torch.from_numpy(tgt16)[None])
        feat2 = torch.from_numpy(np.asarray(
            kaldi_fbank(jnp.asarray(tgt16[None]))))[0]
        feat2 = feat2 - feat2.mean(dim=0, keepdim=True)
        style2 = ref.camp(feat2.unsqueeze(0))
        mel2 = ref_audio_mod.mel_spectrogram(
            torch.from_numpy(tgt)[None], 1024, N_MELS, SR, HOP, 1024, 0,
            None)
        prompt_condition, *_ = ref.reg(
            S_ori, ylens=torch.LongTensor([mel2.size(2)]), n_quantizers=3,
            f0=None)

        # per-block path (real-time-gui.py:107-152); ring after one shift =
        # [zeros ‖ block] at both rates, 16 k via the same repo resampler
        block16 = np.asarray(resample(jnp.asarray(block), SR, 16000))
        ring16 = np.zeros(stream.window_16k, np.float32)
        ring16[-len(block16):] = block16

        S_alt = semantic_fn(torch.from_numpy(ring16)[None])
        drop = int((stream.extra_ce - stream.extra_dit) / SR * 50)
        S_alt = S_alt[:, drop:]
        cond, *_ = ref.reg(S_alt,
                           ylens=torch.LongTensor([stream.dit_frames]),
                           n_quantizers=3, f0=None)
        cat_condition = torch.cat([prompt_condition, cond], dim=1)

        real_randn = torch.randn

        def fake_randn(shape, device=None, **kw):
            assert list(shape)[1] == N_MELS
            return torch.from_numpy(
                noise[: shape[2]].T.copy())[None].to(dtype=torch.float32)

        monkeypatch.setattr(torch, "randn", fake_randn)
        try:
            vc_target = ref.cfm.inference(
                cat_condition,
                torch.LongTensor([cat_condition.size(1)]),
                mel2, style2, None, STEPS, inference_cfg_rate=CFG_RATE)
        finally:
            monkeypatch.setattr(torch, "randn", real_randn)
        vc_target = vc_target[:, :, mel2.size(-1):]
        vc_wave = ref.voc(vc_target.float()).squeeze().numpy()

    ret, tail = stream.return_samples, stream.extra_right
    out_ref = vc_wave[-ret - tail: -tail]

    assert out.shape == out_ref.shape
    snr = _snr_db(out_ref, out)
    assert snr > 30.0, f"streaming block cross-impl SNR {snr:.1f} dB"
