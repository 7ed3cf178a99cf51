"""v2 voice/accent conversion pipeline (AR + CFM over BSQ tokens).

Re-design of the reference ``modules/v2/vc_wrapper.py`` composition root:

- content: HuBERT-large features -> ASTRAL quantizers — "narrow" (codebook
  32, AR source) and "wide" (codebook 2048, CFM condition) sharing one SSL
  forward (``vc_wrapper.py:94``),
- ``convert_timbre``: wide tokens -> cfm regulator -> multi-cond CFG CFM ->
  vocoder (``vc_wrapper.py:364-419``),
- ``convert_voice``: duration-reduced narrow tokens through the AR
  (chunks sized so prefix+chunk <= 1500 tokens with the target prefix
  re-prepended, ``vc_wrapper.py:628-649``) -> predicted wide tokens -> CFM
  (``vc_wrapper.py:421-491``); the output mel length follows the AR's
  token-expansion ratio (``vc_wrapper.py:650-651``) so accent conversion
  can stretch/shrink durations,
- anonymisation via ``random_voice`` CFG mode; intelligibility/similarity
  CFG rates (``convert_voice_with_streaming`` semantics).

All stages are fixed-shape jitted programs; the AR decode is one compiled
while-loop (``seedvc_tpu/models/ar.py``).
"""

from __future__ import annotations

import time
import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from seedvc_tpu.core.config import LengthRegulatorConfig, SpectConfig
from seedvc_tpu.dsp.fbank import kaldi_fbank
from seedvc_tpu.dsp.mel import MelFrontend
from seedvc_tpu.dsp.resample import resample
from seedvc_tpu.models.ar import ARConfig, ARTransformer, make_generate_fn
from seedvc_tpu.models.astral import ASTRAL_NARROW, ASTRAL_WIDE, AstralConfig, AstralQuantizer
from seedvc_tpu.models.bigvgan import BIGVGAN_22K_80, BigVGAN
from seedvc_tpu.models.campplus import CAMPPlus
from seedvc_tpu.models.cfm_v2 import euler_solve_multicfg
from seedvc_tpu.models.dit_v2 import DiTV2, DiTV2Config
from seedvc_tpu.models.regulator import InterpolateRegulator
from seedvc_tpu.models.ssl import HUBERT_LARGE_L18, SSLConfig, SSLEncoder
from seedvc_tpu.nn.bsq import duration_reduction
from seedvc_tpu.pipelines.convert import OVERLAP_FRAMES, cosine_crossfade

AR_MAX_CONTENT_LEN = 1500  # reference vc_wrapper.py:52


@dataclass
class V2Config:
    sr: int = 22050
    hop: int = 256
    n_mels: int = 80
    dit: DiTV2Config = field(default_factory=DiTV2Config)
    ar: ARConfig = field(default_factory=ARConfig)
    ssl: SSLConfig = field(default_factory=lambda: HUBERT_LARGE_L18)
    narrow: AstralConfig = field(default_factory=lambda: ASTRAL_NARROW)
    wide: AstralConfig = field(default_factory=lambda: ASTRAL_WIDE)
    prompt_cap_frames: int = 768
    # 2558 = 5*512 - 2: with the style+time prefix tokens the DiT attends
    # over exactly 2560 positions, a 512 multiple, so the fused Pallas
    # attention kernel engages (was 2583 = the reference's literal 30 s;
    # the window is an implementation bucket, not a semantic constant).
    context_frames: int = 2558
    max_ref_sec: float = 25.0  # reference clips target to 25 s (:565-578)


class VoiceConverterV2:
    # pkl names understood by ``params=`` (one converted tree per module);
    # shared by the infer_v2 CLI and the web UI checkpoint loaders.
    PARAM_NAMES = ("ssl", "narrow", "wide", "campplus", "cfm_reg", "ar_reg",
                   "dit", "ar", "vocoder")

    def __init__(self, cfg: V2Config = V2Config(), *, params: dict | None = None,
                 seed: int = 0, cfg_shard_axis: str | None = None,
                 seq_shard_axis: str | None = None):
        # cfg_shard_axis: mesh axis to split the multi-CFG-stacked sampler
        # batch over (run convert inside ``jax.set_mesh(mesh)``); None =
        # single-device sampling.  Mirrors v1 VoiceConverter.
        # seq_shard_axis: shard the sampler's TIME axis (sequence
        # parallelism; needs use_flash_attention=False in the DiT config).
        self.cfg_shard_axis = cfg_shard_axis
        self.seq_shard_axis = seq_shard_axis
        self.cfg = cfg
        self.mel_fn = MelFrontend(cfg.sr, SpectConfig(n_mels=cfg.n_mels))
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, 8)
        params = params or {}

        self.ssl = SSLEncoder(cfg.ssl)
        self.p_ssl = params.get("ssl") or jax.jit(self.ssl.init)(
            ks[0], jnp.zeros((1, 16000)))["params"]

        self.narrow = AstralQuantizer(cfg.narrow)
        self.p_narrow = params.get("narrow") or jax.jit(self.narrow.init)(
            ks[1], jnp.zeros((1, 50, cfg.ssl.d_model)))["params"]
        self.wide = AstralQuantizer(cfg.wide)
        self.p_wide = params.get("wide") or jax.jit(self.wide.init)(
            ks[2], jnp.zeros((1, 50, cfg.ssl.d_model)))["params"]

        self.campplus = CAMPPlus(feat_dim=80, embedding_size=cfg.dit.style_encoder_dim)
        self.p_campplus = params.get("campplus") or jax.jit(self.campplus.init)(
            ks[3], jnp.zeros((1, 300, 80)))["params"]

        self.cfm_reg = InterpolateRegulator(LengthRegulatorConfig(
            channels=cfg.dit.content_dim, is_discrete=True,
            content_codebook_size=cfg.wide.codebook_size,
            sampling_ratios=(1, 1, 1, 1)))
        self.p_cfm_reg = params.get("cfm_reg") or jax.jit(
            partial(self.cfm_reg.init, target_len=16))(
            ks[4], jnp.zeros((1, 8), jnp.int32), jnp.array([16]))["params"]

        self.ar_reg = InterpolateRegulator(LengthRegulatorConfig(
            channels=cfg.ar.dim, is_discrete=True,
            content_codebook_size=cfg.narrow.codebook_size,
            sampling_ratios=()))
        self.p_ar_reg = params.get("ar_reg") or jax.jit(
            partial(self.ar_reg.init, target_len=8))(
            ks[5], jnp.zeros((1, 8), jnp.int32), jnp.array([8]))["params"]

        self.dit = DiTV2(cfg.dit)
        self.p_dit = params.get("dit") or jax.jit(self.dit.init)(
            ks[6], jnp.zeros((1, 16, cfg.n_mels)), jnp.zeros((1, 16, cfg.n_mels)),
            jnp.array([16]), jnp.zeros((1,)),
            jnp.zeros((1, cfg.dit.style_encoder_dim)),
            jnp.zeros((1, 16, cfg.dit.content_dim)))["params"]

        self.ar = ARTransformer(cfg.ar)
        self.p_ar = params.get("ar") or jax.jit(
            partial(self.ar.init, method=self.ar.init_all))(
            ks[7], jnp.zeros((1, 4), jnp.int32), jnp.arange(4)[None],
            jnp.tril(jnp.ones((4, 4), bool))[None, None])["params"]

        voc_cfg = BIGVGAN_22K_80
        if jax.default_backend() == "tpu":
            # fused Pallas anti-alias-snake kernel (same gating as the v1
            # pipeline, pipelines/convert.py).
            voc_cfg = dataclasses.replace(voc_cfg, use_pallas=True)
        self.vocoder = BigVGAN(voc_cfg)
        self.p_vocoder = params.get("vocoder") or jax.jit(self.vocoder.init)(
            jax.random.PRNGKey(seed + 1), jnp.zeros((1, 16, cfg.n_mels)))["params"]

        self._build_fns()

    # ------------------------------------------------------------------
    def _build_fns(self):
        cfg = self.cfg
        # Frozen-encoder compute dtype: the reference runs the HuBERT-large
        # SSL trunk in fp16 by default (``inference_v2.py``/``train_v2.py``
        # fp16 ladders); bf16 is the TPU analogue.  BSQ sign-quantization is
        # threshold-based, so borderline bit flips match the reference's
        # fp16 behaviour.  Indices are integral either way.
        ecd = (jnp.bfloat16 if jax.default_backend() == "tpu"
               else jnp.float32)

        def _enc_cast(tree):
            if ecd == jnp.float32:
                return tree
            return jax.tree_util.tree_map(
                lambda a: a.astype(ecd) if a.dtype == jnp.float32 else a,
                tree)

        @jax.jit
        def content_fn(p_ssl, p_n, p_w, wave16):
            # SSL + both quantizers in ONE dispatch (the narrow/wide
            # extractors share the SSL forward, vc_wrapper.py:94)
            feats = self.ssl.apply({"params": _enc_cast(p_ssl)},
                                   wave16.astype(ecd))
            _, idx_n, _ = self.narrow.apply({"params": _enc_cast(p_n)}, feats)
            _, idx_w, _ = self.wide.apply({"params": _enc_cast(p_w)}, feats)
            return idx_n, idx_w

        @jax.jit
        def style_fn(p, wave16, frame_lens):
            # kaldi fbank + true-length mean-sub + masked CAMPPlus in one
            # program; the wave is padded to a 1 s bucket (raw reference
            # lengths would compile a new program per distinct length)
            fb = kaldi_fbank(wave16)
            fmask = (jnp.arange(fb.shape[1])[None, :]
                     < frame_lens[:, None]).astype(fb.dtype)[..., None]
            mean = (fb * fmask).sum(axis=1, keepdims=True) / jnp.maximum(
                frame_lens[:, None, None].astype(fb.dtype), 1.0)
            fb = (fb - mean) * fmask
            return self.campplus.apply({"params": p}, fb, frame_lens)

        @partial(jax.jit, static_argnames=("target_len",))
        def cfm_reg_fn(p, tokens, ylens, target_len, x_lens=None):
            return self.cfm_reg.apply({"params": p}, tokens, ylens,
                                      target_len, x_lens=x_lens)[0]

        @partial(jax.jit, static_argnames=("target_len",))
        def ar_reg_fn(p, tokens, ylens, target_len, x_lens=None):
            return self.ar_reg.apply({"params": p}, tokens, ylens,
                                     target_len, x_lens=x_lens)[0]

        cd = (jnp.bfloat16 if jax.default_backend() == "tpu"
              else jnp.float32)

        @partial(jax.jit, static_argnames=("n_steps", "r0",
                                           "r1", "random_voice", "context"))
        def sample_vocode_fn(p, p_voc, key, chunk, prompt_cond, total_len,
                             prompt_mel, prompt_len, style, n_steps, r0, r1,
                             random_voice, context):
            # (r0, r1) = (intelligibility, similarity): euler_solve_multicfg
            # weights the unconditional branch by -r0 and the text-only
            # branch by -r1, matching the reference's
            # ``inference_cfg_rate=[intelligibility, similarity]``
            # (``modules/v2/cfm.py:115-126``; pinned by the asymmetric-rate
            # cross-impl test in tests/test_cross_impl_pipeline.py).
            """Multi-cond CFG sampling + slice + vocoder as ONE dispatch
            (same fusion as the v1 pipeline); CFM in bf16 on TPU, vocoder
            fp32.  The ``[prompt ‖ chunk]`` context is assembled on device
            from the prompt_cap-padded prompt buffers and the W-frame chunk
            (the host never re-ships conditioning per chunk)."""
            if cd != jnp.float32:
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(cd) if a.dtype == jnp.float32 else a,
                    p)
                chunk = chunk.astype(cd)
                prompt_cond = prompt_cond.astype(cd)
                prompt_mel = prompt_mel.astype(cd)
                style = style.astype(cd)
            cond = jnp.zeros((1, context, chunk.shape[-1]), chunk.dtype)
            cond = jax.lax.dynamic_update_slice(cond, prompt_cond, (0, 0, 0))
            cond = jax.lax.dynamic_update_slice(cond, chunk,
                                                (0, prompt_len, 0))
            pm = jnp.zeros((1, context, cfg.n_mels), prompt_mel.dtype)
            prompt_mel = jax.lax.dynamic_update_slice(pm, prompt_mel,
                                                      (0, 0, 0))

            def estimate(x, px, l, t, s, m, sc=None):
                return self.dit.apply({"params": p}, x, px, l, t, s, m,
                                      static_cond=sc)

            def precompute(x, px, l, s, m):
                return self.dit.apply({"params": p}, x, px, l,
                                      jnp.zeros((x.shape[0],)), s, m,
                                      return_static=True)

            mel_out = euler_solve_multicfg(
                estimate, key, cond, total_len, prompt_mel, prompt_len, style,
                n_mels=cfg.n_mels, n_timesteps=n_steps, cfg_rates=(r0, r1),
                random_voice=random_voice, shard_axis=self.cfg_shard_axis,
                seq_shard_axis=self.seq_shard_axis,
                precompute_fn=precompute)
            gen = jax.lax.dynamic_slice(
                mel_out, (0, prompt_len, 0),
                (1, chunk.shape[1], cfg.n_mels)).astype(jnp.float32)
            # f16 fetch: halves the device->host waveform transfer; ~-66 dB
            # quantisation (vocoder computes f32; see v1 pipeline note)
            return self.vocoder.apply({"params": p_voc},
                                      gen).astype(jnp.float16)

        @partial(jax.jit, static_argnames=("W",))
        def chunk_fn(buf, start, W):
            # tiny per-source-length program; the sampler program compiles
            # per (context, W) variant, not per source length
            return jax.lax.dynamic_slice(buf, (0, start, 0),
                                         (1, W, buf.shape[-1]))

        self._chunk_fn = chunk_fn
        self._sample_vocode_fn = sample_vocode_fn
        self._content_fn = content_fn
        self._style_fn = style_fn
        self._cfm_reg_fn = cfm_reg_fn
        self._ar_reg_fn = ar_reg_fn
        self._generate = jax.jit(make_generate_fn(self.ar, max_new_tokens=2048))

    # ------------------------------------------------------------------
    def content_tokens(self, wave_16k: np.ndarray):
        """SSL (padded to 5 s buckets) -> (narrow_idx, wide_idx) (1, T50)."""
        T = len(wave_16k)
        bucket = 5 * 16000
        padded_len = -(-max(T, 8000) // bucket) * bucket
        padded = np.zeros(padded_len, np.float32)
        padded[:T] = wave_16k
        n = T // 320
        idx_n, idx_w = self._content_fn(self.p_ssl, self.p_narrow,
                                        self.p_wide, jnp.asarray(padded[None]))
        return np.asarray(idx_n)[:, :n], np.asarray(idx_w)[:, :n]

    def compute_style(self, wave_16k: np.ndarray):
        # pad to a 1 s bucket (few program shapes) + traced true frame count
        n = len(wave_16k)
        bucket = -(-max(n, 1600) // 16000) * 16000
        padded = np.zeros(bucket, np.float32)
        padded[:n] = wave_16k
        frame_lens = jnp.asarray([max((n - 400) // 160 + 1, 1)], jnp.int32)
        return self._style_fn(self.p_campplus, jnp.asarray(padded[None]),
                              frame_lens)

    def _regulate_tokens(self, reg_fn, p, tokens: np.ndarray, mel_len: int):
        """Regulate with both data-dependent lengths bucketed: the mel
        target to 256 frames (masked by ylens) and the token row to 64
        tokens with the true length traced (``x_lens`` input-crop) — raw
        token lengths would compile a new program per distinct duration."""
        bucket = -(-mel_len // 256) * 256
        T = tokens.shape[1]
        T_b = -(-max(T, 1) // 64) * 64
        tok = np.zeros((tokens.shape[0], T_b), np.asarray(tokens).dtype)
        tok[:, :T] = tokens
        out = reg_fn(p, jnp.asarray(tok), jnp.array([mel_len]), bucket,
                     jnp.asarray(T, jnp.int32))
        return out[:, :mel_len]

    # ------------------------------------------------------------------
    def convert_voice(
        self,
        source: np.ndarray, source_sr: int,
        reference: np.ndarray, reference_sr: int,
        **kwargs,
    ) -> tuple[int, np.ndarray, dict]:
        """Full conversion; drains :meth:`convert_voice_with_streaming`
        (the reference CLI does the same, ``inference_v2.py:96-160``)."""
        chunks = []
        stats: dict = {"rtf": 0.0, "wall_seconds": 0.0, "wide_tokens": 0}
        sr = self.cfg.sr
        for sr, chunk, stats in self.convert_voice_with_streaming(
                source, source_sr, reference, reference_sr, **kwargs):
            chunks.append(chunk)
        out = (np.concatenate(chunks) if chunks else np.zeros(0, np.float32))
        return sr, out, stats

    def convert_voice_with_streaming(
        self,
        source: np.ndarray, source_sr: int,
        reference: np.ndarray, reference_sr: int,
        *,
        convert_style: bool = True,
        anonymization_only: bool = False,
        diffusion_steps: int = 30,
        length_adjust: float = 1.0,
        intelligibility_cfg_rate: float = 0.7,
        similarity_cfg_rate: float = 0.7,
        top_p: float = 0.7,
        temperature: float = 0.7,
        repetition_penalty: float = 1.5,
        seed: int = 0,
    ):
        """Generator yielding ``(sr, wave_chunk, stats)`` as each crossfaded
        chunk is vocoded (reference ``vc_wrapper.py:526-715`` streams mp3
        chunks the same way; the final ``stats`` carries RTF and totals)."""
        cfg = self.cfg
        t_start = time.time()
        ref_cap = int(cfg.max_ref_sec * reference_sr)
        reference = reference[:ref_cap]

        src = np.asarray(resample(jnp.asarray(source), source_sr, cfg.sr))
        ref = np.asarray(resample(jnp.asarray(reference), reference_sr, cfg.sr))
        src16 = np.asarray(resample(jnp.asarray(source), source_sr, 16000))
        ref16 = np.asarray(resample(jnp.asarray(reference), reference_sr, 16000))
        ref = ref[: cfg.prompt_cap_frames * cfg.hop]
        ref16 = ref16[: int(len(ref) / cfg.sr * 16000)]

        src_n, src_w = self.content_tokens(src16)
        tgt_n, tgt_w = self.content_tokens(ref16)

        mel2 = self.mel_fn(jnp.asarray(ref[None]))
        p_len = mel2.shape[1]
        style = self.compute_style(ref16)

        prompt_cond = self._regulate_tokens(
            self._cfm_reg_fn, self.p_cfm_reg, tgt_w, p_len)

        if convert_style or anonymization_only:
            # AR path: duration-reduced narrow tokens -> wide tokens.  The
            # chunks of one utterance are independent given the shared
            # target prefix (reference loops them one by one,
            # vc_wrapper.py:628-649) — here ALL chunks decode as ONE batched
            # generate call (models/ar.py left-padded batched decode), so a
            # long utterance costs ~one chunk's wall time.
            tgt_red, _ = duration_reduction(np.asarray(tgt_n)[0])
            src_red, _ = duration_reduction(np.asarray(src_n)[0])
            if anonymization_only:
                # reference drops the target context entirely: AR cond is
                # the bare chunk and the wide-token prompt is EMPTY
                # (vc_wrapper.py:639-643 `torch.zeros([1, 0])`)
                prefix = src_red[:0]
                prompt_w = src_w[:, :0]
            else:
                prefix = tgt_red
                prompt_w = tgt_w
            # chunk size leaves room for the prefix so each AR cond row is
            # <= ar_max_content_len narrow tokens (vc_wrapper.py:629)
            max_chunk = max(AR_MAX_CONTENT_LEN - len(prefix), 1)
            chunks = [src_red[s: s + max_chunk]
                      for s in range(0, max(len(src_red), 1), max_chunk)]
            B = len(chunks)
            cond_lens = np.array([len(prefix) + len(c) for c in chunks],
                                 np.int32)
            C_max = int(-(-cond_lens.max() // 256) * 256)
            ar_src = np.zeros((B, C_max), np.int64)
            for b, c in enumerate(chunks):
                ar_src[b, : len(prefix)] = prefix
                ar_src[b, len(prefix): len(prefix) + len(c)] = c
            # identity regulation per row: x_lens == out_len == max row len
            cond_emb = self._ar_reg_fn(
                self.p_ar_reg, jnp.asarray(ar_src), jnp.asarray(cond_lens),
                C_max, jnp.asarray(int(cond_lens.max())))
            P_max = -(-max(prompt_w.shape[1], 8) // 64) * 64
            prompt_tok = np.zeros((B, P_max), np.int64)
            prompt_tok[:, : prompt_w.shape[1]] = prompt_w
            # sampling knobs are TRACED args (models/ar.py): every
            # temperature/top_p/penalty setting shares one compiled program
            tokens, n_tok = self._generate(
                {"params": self.p_ar}, cond_emb, jnp.asarray(cond_lens),
                jnp.asarray(prompt_tok),
                jnp.asarray(np.full(B, prompt_w.shape[1], np.int32)),
                jax.random.PRNGKey(seed), jnp.float32(temperature),
                jnp.float32(top_p), jnp.float32(repetition_penalty))
            tokens, n_tok = np.asarray(tokens), np.asarray(n_tok)
            wide_tokens = np.concatenate(
                [tokens[b, : int(n_tok[b])] for b in range(B)])[None]
            ar_batch = B
        else:
            wide_tokens = src_w
            ar_batch = 0

        src_mel_len = len(src) // cfg.hop
        if ar_batch:
            # The output DURATION follows the AR: the reference sizes each
            # chunk's mel as src_mel_len * (chunk_ar_tokens / src_wide
            # _tokens) * length_adjust (vc_wrapper.py:650-651), so accent
            # conversion may stretch/shrink the utterance.  We regulate the
            # merged stream once with the same global ratio (differs from
            # the reference's per-chunk int() rounding by < ar_batch
            # frames).
            target_len = max(int(src_mel_len / max(src_w.shape[1], 1)
                                 * wide_tokens.shape[1] * length_adjust), 1)
        else:
            target_len = int(src_mel_len * length_adjust)
        cond = self._regulate_tokens(self._cfm_reg_fn, self.p_cfm_reg,
                                     wide_tokens, target_len)

        # chunked CFM like v1; conditioning stays on device and plan_chunks
        # picks the smallest flash-friendly (context, W) for this conversion
        from seedvc_tpu.pipelines.convert import plan_chunks
        cap, context, W = plan_chunks(target_len, p_len, cfg.context_frames,
                                      cfg.prompt_cap_frames, align_offset=2)
        prompt_mel_cap = jnp.pad(mel2, ((0, 0), (0, cap - p_len), (0, 0)))
        prompt_cond_pad = jnp.pad(jnp.asarray(prompt_cond),
                                  ((0, 0), (0, cap - p_len), (0, 0)))
        L = (-(-target_len // W) + 1) * W
        cond_buf = jnp.pad(jnp.asarray(cond),
                           ((0, 0), (0, L - target_len), (0, 0)))
        prev_tail = None
        emitted = 0
        overlap_wave = OVERLAP_FRAMES * cfg.hop
        processed = 0
        key = jax.random.PRNGKey(seed)

        def _stats():
            dt = time.time() - t_start
            return {"rtf": dt / max(emitted / cfg.sr, 1e-9),
                    "wall_seconds": dt,
                    "wide_tokens": int(wide_tokens.shape[1]),
                    # rows of the single batched AR generate call (the
                    # reference loops these chunks sequentially)
                    "ar_batch": ar_batch}
        while processed < target_len:
            w = min(W, target_len - processed)
            is_last = processed + W >= target_len
            key, sub = jax.random.split(key)
            chunk = self._chunk_fn(cond_buf, jnp.asarray(processed), W)
            wave = np.asarray(self._sample_vocode_fn(
                self.p_dit, self.p_vocoder, sub, chunk, prompt_cond_pad,
                jnp.array([p_len + w]), prompt_mel_cap, jnp.asarray(p_len),
                style, diffusion_steps, float(intelligibility_cfg_rate),
                float(similarity_cfg_rate),
                bool(anonymization_only), context))[0].astype(np.float32)
            wave = wave[: w * cfg.hop]
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
            processed += w if is_last else (w - OVERLAP_FRAMES)
            emitted += len(piece)
            yield cfg.sr, piece, _stats()

    def convert_timbre(self, source, source_sr, reference, reference_sr, **kw):
        """Timbre-only conversion (no AR; ``vc_wrapper.py:364-419``)."""
        kw["convert_style"] = False
        return self.convert_voice(source, source_sr, reference, reference_sr, **kw)

    def warm(self, specs, *, diffusion_steps: int = 30,
             intelligibility_cfg_rate: float = 0.7,
             similarity_cfg_rate: float = 0.7, warm_ar: bool = False,
             verbose: bool = True) -> list:
        """Precompile per-bucket sampler+vocoder programs (v1-equivalent of
        :meth:`seedvc_tpu.pipelines.convert.VoiceConverter.warm`).

        ``specs``: iterable of ``(source_seconds, ref_seconds)`` pairs.
        Runs one silent timbre-only conversion per distinct
        ``plan_chunks`` bucket; CFG rates and step count must match
        production values (static compile keys).  ``warm_ar=True`` also
        runs one style conversion to compile the batched AR decode (the
        biggest single compile; its shape buckets are utterance-length
        dependent, so warm with a spec near your longest expected source).
        """
        from seedvc_tpu.pipelines.convert import plan_chunks

        cfg = self.cfg
        warmed = []
        seen = set()
        kw = dict(diffusion_steps=diffusion_steps,
                  intelligibility_cfg_rate=intelligibility_cfg_rate,
                  similarity_cfg_rate=similarity_cfg_rate)
        for i, (src_s, ref_s) in enumerate(specs):
            target_len = max(int(src_s * cfg.sr) // cfg.hop, 1)
            p_len = min(max(int(ref_s * cfg.sr) // cfg.hop, 1),
                        cfg.prompt_cap_frames)
            plan = plan_chunks(target_len, p_len, cfg.context_frames,
                               cfg.prompt_cap_frames, align_offset=2)
            if plan in seen:
                continue
            seen.add(plan)
            t0 = time.time()
            src = np.zeros(target_len * cfg.hop, np.float32)
            ref = np.zeros(p_len * cfg.hop, np.float32)
            if warm_ar and i == 0:
                self.convert_voice(src, cfg.sr, ref, cfg.sr,
                                   convert_style=True, **kw)
            else:
                self.convert_timbre(src, cfg.sr, ref, cfg.sr, **kw)
            warmed.append(plan)
            if verbose:
                print(f"warmed v2 (prompt_cap,context,W)={plan} "
                      f"in {time.time() - t0:.1f}s")
        return warmed


V2_PARAM_NAMES = VoiceConverterV2.PARAM_NAMES
