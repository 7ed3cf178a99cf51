"""Offline voice-conversion pipeline (v1).

Re-design of the reference CLI path (``inference.py:352-533``), built around
a small number of fixed-shape jitted programs so the TPU never recompiles
during a conversion:

1. resample source/reference to model sr and 16 kHz,
2. Whisper semantic features in 30 s windows (5 s overlap, 250 overlapped
   frames dropped on concat — ``inference.py:382-403``),
3. mel frontends, CAMPPlus style from kaldi fbank (``inference.py:425-430``),
4. length-regulate source/reference content,
5. chunked CFM generation: per chunk, condition = [reference prompt ‖ source
   chunk] padded to ONE static context length; prompt length is a traced
   scalar (masked), so every chunk reuses the same compiled sampler,
6. BigVGAN vocoding per chunk, 16-frame cosine^2 crossfade joins
   (``inference.py:470-528``, ``crossfade`` at ``:343-350``).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seedvc_tpu.core.config import SeedVCConfig, get_preset
from seedvc_tpu.dsp.fbank import kaldi_fbank
from seedvc_tpu.dsp.mel import MelFrontend
from seedvc_tpu.dsp.resample import resample, resample_host  # noqa: F401
from seedvc_tpu.dsp.whisper_mel import whisper_log_mel
from seedvc_tpu.models.bigvgan import BIGVGAN_22K_80, BIGVGAN_44K_128, BigVGAN
from seedvc_tpu.models.campplus import CAMPPlus
from seedvc_tpu.models.cfm import euler_solve
from seedvc_tpu.models.vc import VCModel
from seedvc_tpu.models.whisper import (
    WHISPER_SMALL, WhisperEncoder, WhisperEncoderConfig)

OVERLAP_FRAMES = 16  # reference overlap_frame_len (seed_vc_wrapper.py:52)


def plan_chunks(target_len: int, p_len: int, max_context: int,
                prompt_cap: int, align_offset: int = 0) -> tuple[int, int, int]:
    """Pick ``(prompt_cap_b, context, W)`` for one conversion.

    The reference always samples a full 30 s context window even when the
    tail chunk carries a few seconds of real audio
    (``inference.py:470-528``).  Sampler+vocoder cost scales with the
    static context, so instead: bucket the real prompt length to 256
    frames, take the minimal chunk count at the max window, spread the
    source evenly across those chunks, and round the needed context up to
    the next flash-friendly 512 multiple.  A 30 s source with a 5 s
    reference then runs two 2048-frame programs instead of two 2560-frame
    ones (~25% less sampler+vocoder work); short utterances compile a
    single small fast program.

    Each (context, W) variant is a separate XLA compile (cached per
    process) — serving setups should warm their expected buckets.
    Contexts <= 512 keep the configured static window (tiny-config tests;
    the flash path needs 512 multiples anyway).

    ``align_offset``: extra attention positions the model prepends (the v2
    DiT carries style+time prefix tokens), so flash-friendly contexts are
    ``512k - align_offset``.
    """
    if max_context <= 512:
        return prompt_cap, max_context, max_context - prompt_cap
    cap = min(-(-max(p_len, 1) // 256) * 256, prompt_cap)
    W_max = max_context - cap
    n = max(1, -(-target_len // W_max))
    span = target_len + (n - 1) * OVERLAP_FRAMES
    w = -(-span // n)
    context = min(
        -(-(cap + w + align_offset) // 512) * 512 - align_offset,
        max_context)
    return cap, context, context - cap


def cosine_crossfade(chunk1: np.ndarray, chunk2: np.ndarray, overlap: int) -> np.ndarray:
    """Reference ``crossfade`` (``inference.py:343-350``)."""
    fade_out = np.cos(np.linspace(0, np.pi / 2, overlap)) ** 2
    fade_in = np.cos(np.linspace(np.pi / 2, 0, overlap)) ** 2
    out = chunk2.copy()
    n = min(len(chunk2), overlap)
    out[:n] = chunk2[:n] * fade_in[:n] + (chunk1[-overlap:] * fade_out)[:n]
    return out


class VoiceConverter:
    """Bundles frozen encoders + generative core + vocoder.

    Parameters default to random initialisation (for tests/benchmarks);
    production use loads converted checkpoints via the ``*_params`` args.
    """

    def __init__(
        self,
        cfg: Optional[SeedVCConfig] = None,
        *,
        whisper_cfg: WhisperEncoderConfig = WHISPER_SMALL,
        vc_params=None,
        whisper_params=None,
        campplus_params=None,
        vocoder_params=None,
        rmvpe_params=None,
        prompt_cap_frames: int = 768,
        context_frames: Optional[int] = None,
        compute_dtype=None,
        seed: int = 0,
        cfg_shard_axis: Optional[str] = None,
        seq_shard_axis: Optional[str] = None,
        vocoder_cfg=None,
    ):
        # cfg_shard_axis: mesh axis to split the CFG-stacked (2x) sampler
        # batch over (run convert() inside ``jax.set_mesh(mesh)``); None =
        # single-device sampling.
        # seq_shard_axis: mesh axis to shard the sampler's TIME axis over
        # (sequence parallelism; needs the non-Pallas attention path — set
        # use_flash_attention=False in the preset when using it).
        # The reference defaults to fp16 inference on GPU (inference.py
        # ``--fp16`` default True); the TPU analogue is bfloat16 for the
        # DiT/CFM compute path and the frozen content encoder (vocoder and
        # style encoder stay fp32).  Pass jnp.float32 explicitly for
        # full-precision end-to-end.
        if compute_dtype is None:
            compute_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                             else jnp.float32)
        self.cfg_shard_axis = cfg_shard_axis
        self.seq_shard_axis = seq_shard_axis
        self.cfg = cfg or get_preset("whisper_small_wavenet")
        sp = self.cfg.preprocess_params.spect_params
        self.sr = self.cfg.preprocess_params.sr
        self.hop = sp.hop_length
        self.mel_fn = MelFrontend(self.sr, sp)
        self.n_mels = sp.n_mels
        self.prompt_cap = prompt_cap_frames
        if context_frames is None:
            # ~30 s of mel frames, rounded DOWN to a multiple of 512 so the
            # flash-attention path applies (falls back to einsum otherwise).
            context_frames = max(int(self.sr // self.hop * 30) // 512, 1) * 512
        self.context = context_frames
        self.source_window = self.context - self.prompt_cap
        self.compute_dtype = compute_dtype

        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)

        # NOTE: inits are jitted — unjitted flax init dispatches one tiny
        # device op per parameter, which is pathological through the axon
        # remote-dispatch tunnel (hundreds of round-trips).
        self.tokenizer_type = self.cfg.model_params.speech_tokenizer.type
        if self.tokenizer_type in ("xlsr", "cnhubert"):
            from seedvc_tpu.models.ssl import SSLEncoder, XLSR_300M_L12

            ssl_cfg = whisper_cfg if hasattr(whisper_cfg, "conv_kernels") else XLSR_300M_L12
            self.whisper = SSLEncoder(ssl_cfg)
            if whisper_params is None:
                whisper_params = jax.jit(self.whisper.init)(
                    k1, jnp.zeros((1, 16000)))["params"]
        else:
            self.whisper = WhisperEncoder(whisper_cfg)
            if whisper_params is None:
                whisper_params = jax.jit(self.whisper.init)(
                    k1, jnp.zeros((1, 3000, whisper_cfg.n_mels)))["params"]
        self.whisper_params = whisper_params

        self.campplus = CAMPPlus(feat_dim=80, embedding_size=self.cfg.model_params.style_encoder.dim)
        if campplus_params is None:
            campplus_params = jax.jit(self.campplus.init)(
                k2, jnp.zeros((1, 300, 80)))["params"]
        self.campplus_params = campplus_params

        self.vc = VCModel(self.cfg.model_params)
        if vc_params is None:
            T0 = 32
            dummy = {
                "s_alt": jnp.zeros((1, T0, self.cfg.model_params.length_regulator.in_channels)),
                "s_ori": jnp.zeros((1, T0, self.cfg.model_params.length_regulator.in_channels)),
                "mels": jnp.zeros((1, T0, self.n_mels)),
                "mel_lens": jnp.full((1,), T0, jnp.int32),
                "style": jnp.zeros((1, self.cfg.model_params.style_encoder.dim)),
            }
            vc_params = jax.jit(partial(
                self.vc.init, deterministic=True))(
                k3, dummy["s_alt"], dummy["s_ori"], dummy["mels"],
                dummy["mel_lens"], dummy["style"],
                rngs_dict={"prompt": k3, "t": k3, "noise": k3, "drop": k3},
            )["params"]
        self.vc_params = vc_params

        self.f0_condition = self.cfg.model_params.DiT.f0_condition
        self.rmvpe = None
        if self.f0_condition:
            from seedvc_tpu.models.rmvpe import RMVPE, RMVPE_E2E

            if rmvpe_params is None:
                rmvpe_params = jax.jit(RMVPE_E2E().init)(
                    jax.random.split(key, 5)[-1], jnp.zeros((1, 32, 128)))["params"]
            self.rmvpe = RMVPE(rmvpe_params)

        # vocoder_cfg: optional HiFTConfig/BigVGANConfig override (custom
        # checkpoint geometries; tests use small ones to bound compile time)
        self.vocoder_type = self.cfg.model_params.vocoder.type
        if self.vocoder_type == "hifigan":
            from seedvc_tpu.models.hifigan import HiFTConfig, HiFTGenerator

            self.vocoder = HiFTGenerator(
                vocoder_cfg or HiFTConfig(sampling_rate=self.sr))
            if vocoder_params is None:
                vocoder_params = jax.jit(self.vocoder.init)(
                    k4, jnp.zeros((1, 16, self.n_mels)), jax.random.PRNGKey(0))["params"]
        else:
            voc_cfg = vocoder_cfg or (
                BIGVGAN_44K_128 if self.n_mels == 128 else BIGVGAN_22K_80)
            if jax.default_backend() == "tpu":
                # fused Pallas anti-alias-snake kernel: 1.27x faster vocoding
                # and ~2x faster compile (interpret mode on CPU is left off).
                voc_cfg = dataclasses.replace(voc_cfg, use_pallas=True)
            self.vocoder = BigVGAN(voc_cfg)
            if vocoder_params is None:
                vocoder_params = jax.jit(self.vocoder.init)(
                    k4, jnp.zeros((1, 16, self.n_mels)))["params"]
        self.vocoder_params = vocoder_params

        self._build_jit_fns()

    # ------------------------------------------------------------------
    def _build_jit_fns(self):
        whisper = self.whisper
        campplus = self.campplus
        vc = self.vc
        vocoder = self.vocoder
        n_mels = self.n_mels
        context = self.context
        source_window = self.source_window

        # The frozen content encoder runs in compute_dtype (the reference
        # defaults Whisper/XLSR to fp16 on GPU — ``inference.py:145-236``;
        # bf16 is the TPU analogue, with MORE exponent range).  Features are
        # returned as f32 for the regulator; softmax inside the encoder is
        # f32 regardless (``models/whisper.py:53``).
        ecd = self.compute_dtype

        def _enc_cast(params, x):
            if ecd == jnp.float32:
                return params, x
            params = jax.tree_util.tree_map(
                lambda a: a.astype(ecd) if a.dtype == jnp.float32 else a,
                params)
            return params, x.astype(ecd)

        if self.tokenizer_type in ("xlsr", "cnhubert"):
            @jax.jit
            def whisper_fn(params, wave_16k):
                params, wave_16k = _enc_cast(params, wave_16k)
                return whisper.apply(
                    {"params": params}, wave_16k).astype(jnp.float32)
        else:
            @jax.jit
            def whisper_fn(params, wave_16k):
                # zero-pad to the 30 s window ON DEVICE (the host ships the
                # 1 s-bucketed true wave: ~5x less tunnel traffic; the HF
                # extractor zero-pads identically)
                wave_16k = jnp.pad(
                    wave_16k, ((0, 0), (0, 30 * 16000 - wave_16k.shape[1])))
                mel = whisper_log_mel(wave_16k)
                params, mel = _enc_cast(params, mel)
                return whisper.apply(
                    {"params": params}, mel).astype(jnp.float32)

        @jax.jit
        def style_fn(params, wave_16k, frame_lens):
            # kaldi fbank + true-length mean-sub + masked CAMPPlus in one
            # program (fbank eager would cost several extra device
            # dispatches per conversion).  The wave arrives PADDED to a 1 s
            # bucket with the valid kaldi frame count as a traced scalar:
            # raw reference lengths would compile a new style program per
            # distinct length (each a multi-second tunnel compile), and the
            # masked computation equals the unpadded one
            # (tests/test_trainer_features.py pins the equivalence).
            fb = kaldi_fbank(wave_16k)
            fmask = (jnp.arange(fb.shape[1])[None, :]
                     < frame_lens[:, None]).astype(fb.dtype)[..., None]
            mean = (fb * fmask).sum(axis=1, keepdims=True) / jnp.maximum(
                frame_lens[:, None, None].astype(fb.dtype), 1.0)
            fb = (fb - mean) * fmask
            return campplus.apply({"params": params}, fb, frame_lens)

        @partial(jax.jit, static_argnames=("target_len",))
        def regulate_fn(params, s, ylens, target_len, f0=None, x_lens=None,
                        f0_lens=None):
            return vc.apply({"params": params}, s, ylens, target_len, f0,
                            x_lens=x_lens, f0_lens=f0_lens,
                            method=vc.regulate)[0]

        n_mels_ = n_mels
        cd = self.compute_dtype

        @partial(jax.jit, static_argnames=("n_steps", "cfg_rate", "context"))
        def sample_vocode_fn(params, voc_params, key, chunk, prompt_cond,
                             total_len, prompt_mel, prompt_len, style,
                             n_steps, cfg_rate, context):
            """CFM sampling + generated-region slice + vocoder as ONE
            program: halves the per-chunk device dispatches (each dispatch
            costs ~10-25 ms through the axon tunnel).  Sampling runs in
            ``compute_dtype`` (params cast once inside the program — XLA
            hoists the casts out of the scan); the vocoder stays fp32.
            ``prompt_len`` is a TRACED scalar (``lax.dynamic_slice`` takes
            traced starts), so every distinct reference length reuses the
            same compiled program.

            The ``[prompt ‖ source chunk]`` context is assembled HERE, on
            device, from the fixed-shape prompt buffers (padded to
            ``prompt_cap``) and the W-frame chunk: the host never touches
            the conditioning after regulation, so the per-chunk
            host->device traffic is a few scalars instead of ~10 MB of f32
            context through the tunnel."""
            if cd != jnp.float32:
                params = jax.tree_util.tree_map(
                    lambda a: a.astype(cd) if a.dtype == jnp.float32 else a,
                    params)
                chunk = chunk.astype(cd)
                prompt_cond = prompt_cond.astype(cd)
                prompt_mel = prompt_mel.astype(cd)
                style = style.astype(cd)
            # context assembly: prompt (<= prompt_cap, zero tail) then the
            # chunk at the traced prompt offset (overwrites the zero tail)
            cond_cat = jnp.zeros((1, context, chunk.shape[-1]), chunk.dtype)
            cond_cat = jax.lax.dynamic_update_slice(cond_cat, prompt_cond,
                                                    (0, 0, 0))
            cond_cat = jax.lax.dynamic_update_slice(cond_cat, chunk,
                                                    (0, prompt_len, 0))
            pm = jnp.zeros((1, context, n_mels_), prompt_mel.dtype)
            prompt_mel = jax.lax.dynamic_update_slice(pm, prompt_mel,
                                                      (0, 0, 0))

            def estimate(x, p, l, t, s, m, sc=None):
                return vc.apply({"params": params}, x, p, l, t, s, m,
                                static_cond=sc, method=vc.estimate)

            def precompute(x, p, l, s, m):
                return vc.apply({"params": params}, x, p, l, s, m,
                                method=vc.precompute_cond)

            mel_out = euler_solve(
                estimate, key, cond_cat, total_len, prompt_mel, prompt_len,
                style, n_mels=n_mels_, n_timesteps=n_steps, cfg_rate=cfg_rate,
                shard_axis=self.cfg_shard_axis,
                seq_shard_axis=self.seq_shard_axis,
                precompute_fn=precompute)
            gen = jax.lax.dynamic_slice(
                mel_out, (0, prompt_len, 0),
                (1, chunk.shape[1], n_mels_)).astype(jnp.float32)
            if self.vocoder_type == "hifigan":
                wav = vocoder.apply({"params": voc_params}, gen,
                                    jax.random.PRNGKey(0))
            else:
                wav = vocoder.apply({"params": voc_params}, gen)
            # fetch as f16: halves the chunk's device->host transfer over
            # the ~50 MB/s tunnel (0.15-0.4 s/conversion measured); f16
            # quantisation is ~-66 dB, comparable to the 16-bit wav the
            # frontends emit, and within the goldens' tolerance.  The
            # vocoder itself computes f32.
            return wav.astype(jnp.float16)

        @partial(jax.jit, static_argnames=("W",))
        def chunk_fn(buf, start, W):
            # tiny per-source-length program; the big sampler program above
            # compiles per (context, W) VARIANT, not per source length
            return jax.lax.dynamic_slice(buf, (0, start, 0),
                                         (1, W, buf.shape[-1]))

        self._whisper_fn = whisper_fn
        self._style_fn = style_fn
        self._regulate_fn = regulate_fn
        self._chunk_fn = chunk_fn
        self._sample_vocode_fn = sample_vocode_fn

    # ------------------------------------------------------------------
    def semantic_features(self, wave_16k: np.ndarray) -> jax.Array:
        """Whisper features at 50 Hz with 30 s chunking (5 s overlap).

        Every window is zero-padded to the full 30 s before the jitted
        encoder call, so the whisper program compiles exactly once
        (zero-padding is what the HF feature extractor does anyway)."""
        chunk = 30 * 16000
        overlap = 5 * 16000
        T = wave_16k.shape[-1]

        if self.tokenizer_type in ("xlsr", "cnhubert"):
            # SSL encoders have no fixed window: pad to 5 s buckets.
            def encode(piece: np.ndarray) -> jax.Array:
                bucket = 5 * 16000
                padded_len = -(-max(len(piece), 8000) // bucket) * bucket
                padded = np.zeros(padded_len, np.float32)
                padded[: len(piece)] = piece
                feats = self._whisper_fn(self.whisper_params,
                                         jnp.asarray(padded[None]))
                return feats[:, : len(piece) // 320]
        else:
            def encode(piece: np.ndarray) -> jax.Array:
                # 1 s host buckets; the jitted encoder pads to 30 s on device
                n = min(len(piece), chunk)
                T_b = min(-(-max(n, 1) // 16000) * 16000, chunk)
                padded = np.zeros(T_b, np.float32)
                padded[:n] = piece[:n]
                feats = self._whisper_fn(self.whisper_params,
                                         jnp.asarray(padded[None]))
                return feats[:, : len(piece) // 320 + 1]

        if T <= chunk:
            return encode(wave_16k)
        outs = []
        start = 0
        while start < T:
            piece = wave_16k[start: start + chunk]
            feats = encode(piece)
            if start == 0:
                outs.append(feats)
            else:
                outs.append(feats[:, 50 * 5:])  # drop overlapped 250 frames
            if start + chunk >= T:
                break
            start += chunk - overlap
        return jnp.concatenate(outs, axis=1)

    def _mel_bucketed(self, wave: np.ndarray) -> jax.Array:
        """Mel with the waveform padded to 5 s buckets -> few compiles.

        The bucket tail is REFLECT-continued (n_fft samples) before the
        zero fill: the reference computes mel over the exact-length wave
        with reflect STFT padding (``modules/audio.py:57-59``), so frames
        near the true end read reflected audio — zero-padding there skewed
        the last ~2 prompt-mel frames (caught by
        tests/test_cross_impl_pipeline.py).  Frames past ``n_frames`` are
        sliced off, so only the first n_fft pad samples matter."""
        bucket = 5 * self.sr
        n_frames = len(wave) // self.hop
        padded_len = -(-len(wave) // bucket) * bucket
        padded = np.zeros(padded_len, np.float32)
        padded[: len(wave)] = wave
        n_fft = self.cfg.preprocess_params.spect_params.n_fft
        r = min(padded_len - len(wave), n_fft, len(wave) - 1)
        if r > 0:
            padded[len(wave): len(wave) + r] = wave[-2: -2 - r: -1]
        mel = self.mel_fn(jnp.asarray(padded[None]))
        return mel[:, :n_frames]

    def _regulate_bucketed(self, s: jax.Array, true_len: int,
                           f0=None) -> jax.Array:
        """Length-regulate with every data-dependent length bucketed:
        target length to 256-frame buckets (masked by ylens), content
        tokens to 64-token buckets and F0 to 256-frame buckets with traced
        true lengths (``x_lens``/``f0_lens`` input-crop) — raw lengths
        would compile a new regulate program per distinct source/reference
        duration (multi-second tunnel compiles; breaks ``warm()``)."""
        bucket_len = -(-true_len // 256) * 256
        s_T = s.shape[1]
        s_b = -(-max(s_T, 1) // 64) * 64
        s = jnp.pad(s, ((0, 0), (0, s_b - s_T), (0, 0)))
        f0_lens = None
        if f0 is not None:
            f_T = f0.shape[1]
            f_b = -(-max(f_T, 1) // 256) * 256
            f0 = jnp.pad(f0, ((0, 0), (0, f_b - f_T)))
            f0_lens = jnp.asarray(f_T, jnp.int32)
        out = self._regulate_fn(self.vc_params, s, jnp.array([true_len]),
                                bucket_len, f0,
                                jnp.asarray(s_T, jnp.int32), f0_lens)
        return out[:, :true_len]

    def plan_chunks(self, target_len: int, p_len: int) -> tuple[int, int, int]:
        return plan_chunks(target_len, p_len, self.context, self.prompt_cap)

    def warm(self, specs, *, diffusion_steps: int = 25,
             cfg_rate: float = 0.7, verbose: bool = True) -> list:
        """Precompile the per-bucket fused sampler+vocoder programs.

        Each distinct ``(context, W)`` pair chosen by :func:`plan_chunks`
        is a separate XLA compile (2-6 min through the axon tunnel for the
        flagship model): without warming, the first short utterance after a
        long one stalls a serving request on a mid-request compile.  Run
        this at startup with the conversion shapes you expect.

        ``specs``: iterable of ``(source_seconds, ref_seconds)`` pairs.
        Runs one full silent conversion per distinct plan — which also
        warms the whisper/mel/style/regulate programs on the real path.
        ``diffusion_steps``/``cfg_rate`` must match production values (both
        are static compile keys).  Returns the warmed plans, deduplicated.
        """
        warmed = []
        seen = set()
        for src_s, ref_s in specs:
            target_len = max(int(src_s * self.sr) // self.hop, 1)
            p_len = min(max(int(ref_s * self.sr) // self.hop, 1),
                        self.prompt_cap)
            plan = self.plan_chunks(target_len, p_len)
            if plan in seen:
                continue
            seen.add(plan)
            t0 = time.time()
            src = np.zeros(target_len * self.hop, np.float32)
            ref = np.zeros(p_len * self.hop, np.float32)
            self.convert(src, self.sr, ref, self.sr,
                         diffusion_steps=diffusion_steps, cfg_rate=cfg_rate)
            warmed.append(plan)
            if verbose:
                print(f"warmed (prompt_cap,context,W)={plan} "
                      f"in {time.time() - t0:.1f}s")
        return warmed

    def extract_f0(self, src_16k: np.ndarray, ref_16k: np.ndarray, *,
                   auto_f0_adjust: bool = True, pitch_shift: float = 0.0):
        """RMVPE F0 + median-log matching + semitone shift
        (reference ``inference.py:432-455``)."""
        f0_ori = self.rmvpe.infer_from_audio_batch(ref_16k[None])[0]
        f0_alt = self.rmvpe.infer_from_audio_batch(src_16k[None])[0]
        voiced_alt = f0_alt > 1
        voiced_ori = f0_ori > 1
        shifted = f0_alt.copy()

        def median_low(x):
            # torch.median convention (lower of the two middle values for
            # even counts) — np.median averages them, which shifts every
            # voiced frame by up to half the middle gap; pinned by
            # tests/test_cross_impl_pipeline.py::test_full_pipeline_f0_svc…
            return np.sort(x)[(len(x) - 1) // 2]

        if auto_f0_adjust and voiced_alt.any() and voiced_ori.any():
            log_alt = np.log(f0_alt + 1e-5)
            med_ori = median_low(np.log(f0_ori[voiced_ori] + 1e-5))
            med_alt = median_low(np.log(f0_alt[voiced_alt] + 1e-5))
            shifted_log = log_alt.copy()
            shifted_log[voiced_alt] = log_alt[voiced_alt] - med_alt + med_ori
            shifted = np.exp(shifted_log)
            shifted[~voiced_alt] = f0_alt[~voiced_alt]
        if pitch_shift != 0:
            shifted = shifted.copy()
            shifted[voiced_alt] = shifted[voiced_alt] * 2 ** (pitch_shift / 12)
        return shifted.astype(np.float32), f0_ori.astype(np.float32)

    def compute_style(self, wave_16k: np.ndarray) -> jax.Array:
        # pad to a 1 s bucket (few program shapes) + traced true frame count
        n = len(wave_16k)
        bucket = -(-max(n, 1600) // 16000) * 16000
        padded = np.zeros(bucket, np.float32)
        padded[:n] = wave_16k
        frame_lens = jnp.asarray([max((n - 400) // 160 + 1, 1)], jnp.int32)
        return self._style_fn(self.campplus_params, jnp.asarray(padded[None]),
                              frame_lens)

    # ------------------------------------------------------------------
    def convert(self, source, source_sr, reference, reference_sr,
                **kwargs) -> tuple[int, np.ndarray, dict]:
        """Full conversion; drains :meth:`convert_with_streaming`.

        Returns (sr, waveform, stats).  With ``profile=True`` each stage
        blocks on device completion via a constant-cost probe
        (:func:`seedvc_tpu.core.profiling.probe_ready` — one element
        fetched, buffers stay device-resident) before the clock stops, so
        ``stats['stages']`` attributes per-stage time to within the probe
        round-trip (~10-25 ms/stage through the axon tunnel) and stage
        totals track the unprofiled wall time
        (``tests/test_profiling.py`` pins this).
        """
        chunks = []
        stats: dict = {"rtf": 0.0, "audio_seconds": 0.0, "wall_seconds": 0.0,
                       "chunks": 0, "stages": {}}
        sr = self.sr
        for sr, piece, stats in self.convert_with_streaming(
                source, source_sr, reference, reference_sr, **kwargs):
            chunks.append(piece)
        out = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        return sr, out, stats

    def convert_with_streaming(
        self,
        source: np.ndarray,
        source_sr: int,
        reference: np.ndarray,
        reference_sr: int,
        *,
        diffusion_steps: int = 25,
        length_adjust: float = 1.0,
        cfg_rate: float = 0.7,
        auto_f0_adjust: bool = True,
        pitch_shift: float = 0.0,
        seed: int = 0,
        profile: bool = False,
    ):
        """Generator yielding ``(sr, wave_chunk, stats)`` per crossfaded
        chunk — the reference v1 wrapper streams chunks the same way
        (``seed_vc_wrapper.py:201-286``)."""
        from seedvc_tpu.core.profiling import StageTimer, probe_ready

        timer = StageTimer()
        sync = probe_ready if profile else (lambda x: x)
        t_start = time.time()
        with timer("resample"):
            # host-side: decimating 30 s of audio costs less than shipping
            # it through the device tunnel twice (see dsp.resample_host)
            src = resample_host(source, source_sr, self.sr)
            ref = resample_host(reference, reference_sr, self.sr)
            src_16k = resample_host(source, source_sr, 16000)
            ref_16k = resample_host(reference, reference_sr, 16000)

        # Cap the reference prompt (prompt_cap frames of mel).
        max_ref = self.prompt_cap * self.hop
        ref = ref[:max_ref]
        ref_16k = ref_16k[: int(len(ref) / self.sr * 16000)]

        with timer("semantic"):
            s_alt = sync(self.semantic_features(src_16k))
            s_ori = sync(self.semantic_features(ref_16k))

        with timer("mel+style"):
            mel2 = self._mel_bucketed(ref)  # (1, P, n_mels)
            style = sync(self.compute_style(ref_16k))
            mel2 = jnp.asarray(sync(mel2))
        p_len = mel2.shape[1]
        src_mel_len = len(src) // self.hop
        target_len = int(src_mel_len * length_adjust)

        f0_alt = f0_ori = None
        if self.f0_condition:
            with timer("f0"):
                shifted_f0, f0_ori_np = self.extract_f0(
                    src_16k, ref_16k, auto_f0_adjust=auto_f0_adjust,
                    pitch_shift=pitch_shift)
                f0_alt = jnp.asarray(shifted_f0[None])
                f0_ori = jnp.asarray(f0_ori_np[None])

        with timer("regulate"):
            cond = sync(self._regulate_bucketed(jnp.asarray(s_alt),
                                                target_len, f0_alt))
            prompt_cond = sync(self._regulate_bucketed(jnp.asarray(s_ori),
                                                       p_len, f0_ori))

        # Fixed-shape device-resident conditioning: prompt buffers padded to
        # the bucketed prompt cap, source conditioning padded to a whole
        # number of W-frame chunks (plus one spare so the last dynamic_slice
        # never clamps).  All padding runs on device — the host never
        # re-ships the conditioning per chunk.  plan_chunks picks the
        # smallest flash-friendly (context, W) for THIS conversion.
        cap_b, context, W = self.plan_chunks(target_len, p_len)
        prompt_cond_pad = jnp.pad(
            prompt_cond, ((0, 0), (0, cap_b - p_len), (0, 0)))
        prompt_mel_cap = jnp.pad(
            mel2, ((0, 0), (0, cap_b - p_len), (0, 0)))
        L = (-(-target_len // W) + 1) * W
        cond_buf = jnp.pad(cond, ((0, 0), (0, L - target_len), (0, 0)))

        prev_tail: Optional[np.ndarray] = None
        overlap_wave = OVERLAP_FRAMES * self.hop
        processed = 0
        n_chunks = 0
        emitted = 0
        key = jax.random.PRNGKey(seed)

        def _stats():
            dt = time.time() - t_start
            return {
                "rtf": dt / max(emitted / self.sr, 1e-9),
                "audio_seconds": emitted / self.sr,
                "wall_seconds": dt,
                "chunks": n_chunks,
                "stages": timer.report(),
            }

        # Dispatch ALL chunk programs up-front (async dispatch): the device
        # queue serializes the sampler+vocoder compute while each finished
        # chunk's ~2 MB waveform fetch (a ~50 MB/s tunnel link) overlaps the
        # NEXT chunk's sampling instead of sitting on the critical path.
        # With profile=True each dispatch is probe-synced so the
        # "sample+vocode" stage stays per-chunk accurate and the transfer
        # cost shows up separately under "fetch".
        dispatched = []
        while processed < target_len:
            w = min(W, target_len - processed)
            is_last = processed + W >= target_len
            key, sub = jax.random.split(key)
            with timer("sample+vocode"):
                chunk = self._chunk_fn(cond_buf, jnp.asarray(processed), W)
                dev_wave = sync(self._sample_vocode_fn(
                    self.vc_params, self.vocoder_params, sub, chunk,
                    prompt_cond_pad, jnp.array([p_len + w]),
                    prompt_mel_cap, jnp.asarray(p_len), style,
                    diffusion_steps, cfg_rate, context))
            dispatched.append((w, is_last, dev_wave))
            processed += w if is_last else (w - OVERLAP_FRAMES)

        for w, is_last, dev_wave in dispatched:
            with timer("fetch"):
                wave = np.asarray(dev_wave)[0].astype(np.float32)
            wave = wave[: w * self.hop]

            n_chunks += 1
            if prev_tail is None:
                if is_last:
                    piece = wave
                else:
                    piece = wave[:-overlap_wave]
                    prev_tail = wave[-overlap_wave:]
            elif is_last:
                piece = cosine_crossfade(prev_tail, wave, overlap_wave)
            else:
                piece = cosine_crossfade(prev_tail, wave[:-overlap_wave],
                                         overlap_wave)
                prev_tail = wave[-overlap_wave:]
            emitted += len(piece)
            yield self.sr, piece, _stats()
