"""v1 fine-tuning trainer.

Re-design of the reference Trainer (``train.py:762-1234``) around the
sharded SPMD train step (``train/step.py``):

- frozen encoders (Whisper semantic, CAMPPlus style) run as fixed-shape
  jitted programs; the trainable unit is VCModel (regulator + CFM),
- timbre perturbation: with ``openvoice_params``, the OpenVoice VITS
  converter re-voices each batch exactly like the reference
  (``train.py:544-551``, ``:770-801``; SEs from a ``se_db`` bank or the
  shuffled batch).  Without it, a NANSY-style random-resampling fallback
  (rate 0.85-1.15) provides the same timbre-invariance pressure.
- optional output-level distillation vs a frozen teacher
  (``teacher_params``; reference ``train.py:871-887``),
- EMA-smoothed loss logging (0.99), plateau-based LR halving with early-stop
  patience (``train.py:1093-1141``), warmup schedule,
- Orbax checkpointing (params/opt_state/step), keep newest 2, auto-resume
  (``train.py:1143-1175``, ``modules/commons.py:412-479``).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from seedvc_tpu.core.config import SeedVCConfig
from seedvc_tpu.dsp.fbank import kaldi_fbank
from seedvc_tpu.dsp.mel import MelFrontend
from seedvc_tpu.dsp.resample import resample
from seedvc_tpu.dsp.whisper_mel import whisper_log_mel
from seedvc_tpu.models.campplus import CAMPPlus
from seedvc_tpu.models.vc import VCModel
from seedvc_tpu.models.whisper import WhisperEncoder, WhisperEncoderConfig, WHISPER_SMALL
from seedvc_tpu.parallel.mesh import make_mesh
from seedvc_tpu.train.dataset import Batch, FTDataset
from seedvc_tpu.train.optim import make_optimizer, warmup_cosine
from seedvc_tpu.train.step import TrainState, init_state, make_sharded_train_step, shard_state


@dataclass
class TrainerConfig:
    data_path: str = ""
    run_dir: str = "./runs/run1"
    batch_size: int = 2
    epochs: int = 10
    max_steps: int = 1000
    base_lr: float = 1e-4
    warmup_steps: int = 100
    grad_clip: float = 10.0
    log_interval: int = 10
    save_interval: int = 500
    mel_bucket: int = 128        # mel frames rounded up to this multiple
    ema_decay: float = 0.99      # loss EMA for logging/plateau logic
    lr_halve_patience: int = 4   # plateau validations before halving LR
    validation_interval: int = 0  # steps between validate() (0 = off)
    weight_ema_decay: float = 0.0  # param EMA (reference ships _ema.pth)
    # "single": one AdamW with global grad clip; "multi": per-module AdamW
    # with per-module clipping (exact reference MultiOptimizer semantics,
    # optimizers.py:11-96 + train.py:889-894)
    optimizer_kind: str = "single"
    val_batches: int = 4          # batches averaged per validation
    early_stop_patience: int = 10  # validations w/o improvement -> stop
    # "bfloat16": bf16 model compute with f32 master weights (the TPU
    # analogue of the reference's fp16 autocast, train_v2.py:700)
    compute_dtype: str = "float32"
    # Frozen-encoder (whisper/SSL) compute dtype.  None = auto: bfloat16 on
    # TPU (the reference runs the frozen encoder under fp16 autocast,
    # train.py:800; f32 whisper was the dominant per-step cost on-the-fly),
    # float32 elsewhere (CPU parity tests).  Features return f32 either way.
    encoder_dtype: Optional[str] = None
    # Device-resident cache of perturb-INVARIANT per-clip features (clean
    # s_ori whisper features + CAMPPlus style): after the first epoch only
    # the perturbed branch needs a whisper forward, roughly halving the
    # frozen-encoder device time per step.  0 disables (e.g. datasets too
    # large for HBM; ~4.6 MB/clip at whisper-small).
    feat_cache_bytes: int = 2 << 30
    # ZeRO-3/FSDP analogue: scatter params + AdamW moments + EMA over the
    # data axis (parallel/sharding.py::_add_fsdp_axis); XLA all-gathers
    # weights at use and reduce-scatters gradients.  Composes with TP.
    fsdp: bool = False
    perturb_min: float = 0.85
    perturb_max: float = 1.15
    # Batches prepared ahead on a worker thread so feature extraction
    # (whisper/OpenVoice/fbank/RMVPE) overlaps the device step instead of
    # serializing with it like the reference (train.py:762-894).  0 = off.
    prefetch: int = 2
    seed: int = 1234


class Trainer:
    def __init__(self, cfg: SeedVCConfig, tcfg: TrainerConfig,
                 whisper_cfg: WhisperEncoderConfig = WHISPER_SMALL,
                 whisper_params=None, campplus_params=None, vc_params=None,
                 openvoice_params=None, se_db: Optional[np.ndarray] = None,
                 teacher_params=None, rmvpe_params=None, n_model: int = 1):
        self.cfg = cfg
        self.tcfg = tcfg
        sp = cfg.preprocess_params.spect_params
        self.sr = cfg.preprocess_params.sr
        self.hop = sp.hop_length
        self.n_mels = sp.n_mels
        self.mel_fn = MelFrontend(self.sr, sp)

        key = jax.random.PRNGKey(tcfg.seed)
        k1, k2, k3 = jax.random.split(key, 3)

        self.whisper = WhisperEncoder(whisper_cfg)
        self.whisper_params = whisper_params or jax.jit(self.whisper.init)(
            k1, jnp.zeros((1, 3000, whisper_cfg.n_mels)))["params"]
        self.campplus = CAMPPlus(
            feat_dim=80, embedding_size=cfg.model_params.style_encoder.dim)
        self.campplus_params = campplus_params or jax.jit(self.campplus.init)(
            k2, jnp.zeros((1, 300, 80)))["params"]

        # RMVPE for f0_condition presets: the reference extracts batch F0
        # every train step and feeds it to the length regulator
        # (train.py:803-814) — without it the f0_embedding table never
        # trains and SVC fine-tuning is unfaithful.
        self.f0_condition = bool(cfg.model_params.DiT.f0_condition)
        self.rmvpe = None
        if self.f0_condition:
            from seedvc_tpu.models.rmvpe import RMVPE, RMVPE_E2E

            if rmvpe_params is None:
                rmvpe_params = jax.jit(RMVPE_E2E().init)(
                    jax.random.split(key, 7)[-1],
                    jnp.zeros((1, 32, 128)))["params"]
            self.rmvpe = RMVPE(rmvpe_params)

        self.model = VCModel(cfg.model_params)
        n_devices = len(jax.devices())
        n_data = n_devices // n_model
        if tcfg.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {tcfg.batch_size} must be divisible by the data "
                f"axis size {n_data} (= {n_devices} devices / n_model {n_model})")
        self.mesh = make_mesh(n_data=n_data, n_model=n_model)
        # Host->device transfers of batch-leading feature-prep inputs are
        # sharded over the data axis (see _put): on a multi-chip mesh the
        # frozen-encoder programs (whisper/warp/mel/fbank+CAMPPlus) then
        # compile as SPMD over `data`, spreading the per-step feature
        # compute that bounds single-chip on-the-fly training (PARITY r4
        # ablation: the ~150 ms/step encoder share is the ceiling) across
        # the same chips that run the train step.
        self._n_data = n_data
        self._data_sharding = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec("data"))

        schedule = warmup_cosine(tcfg.base_lr, tcfg.warmup_steps,
                                 tcfg.max_steps)
        # Plateau LR halving (reference train.py:1122-1141): the multiplier
        # lives IN opt_state (train/optim.py:LRScaleState) so the jitted step
        # sees every halving — a Python-float closure would be baked in at
        # trace time and never change.
        from seedvc_tpu.train.optim import with_lr_scale

        if tcfg.optimizer_kind == "multi":
            from seedvc_tpu.train.optim import make_multi_optimizer

            base_opt = make_multi_optimizer(schedule,
                                            grad_clip=tcfg.grad_clip)
        else:
            base_opt = make_optimizer(schedule, grad_clip=tcfg.grad_clip)
        self.optimizer = with_lr_scale(base_opt)

        in_ch = cfg.model_params.length_regulator.in_channels
        example = {
            "s_alt": jnp.zeros((tcfg.batch_size, 8, in_ch)),
            "s_ori": jnp.zeros((tcfg.batch_size, 8, in_ch)),
            "mels": jnp.zeros((tcfg.batch_size, 16, self.n_mels)),
            "mel_lens": jnp.full((tcfg.batch_size,), 16, jnp.int32),
            "style": jnp.zeros((tcfg.batch_size,
                                cfg.model_params.style_encoder.dim)),
        }
        if vc_params is not None:
            state = TrainState(vc_params, self.optimizer.init(vc_params),
                               jnp.zeros((), jnp.int32))
        else:
            state = init_state(self.model, self.optimizer, k3, example)
        if tcfg.weight_ema_decay > 0:
            # explicit copies: params and ema_params must not alias (both
            # are donated by the jitted step)
            state = state._replace(ema_params=jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), state.params))
        self.state = shard_state(state, self.mesh, fsdp=tcfg.fsdp)
        self.step_fn = make_sharded_train_step(
            self.model, self.optimizer, self.mesh,
            teacher_params=teacher_params,
            weight_ema_decay=tcfg.weight_ema_decay,
            compute_dtype=(jnp.bfloat16
                           if tcfg.compute_dtype == "bfloat16" else None))
        from seedvc_tpu.train.step import make_sharded_eval_step

        self.eval_fn = make_sharded_eval_step(self.model, self.mesh)

        # Frozen semantic encoder dtype: explicit override, else bf16 when
        # training in bf16 OR on TPU (the reference runs the frozen encoder
        # under fp16 autocast, train.py:800; a f32 whisper forward was the
        # dominant on-the-fly per-step cost — 2 windows/step).  Features
        # return as f32 either way.  Style encoder stays f32.
        if tcfg.encoder_dtype is not None:
            enc_dtype = (jnp.bfloat16 if tcfg.encoder_dtype == "bfloat16"
                         else jnp.float32)
        else:
            enc_dtype = (jnp.bfloat16
                         if (tcfg.compute_dtype == "bfloat16"
                             or jax.default_backend() == "tpu")
                         else jnp.float32)

        def _whisper_fwd(p, w):
            # pad to the 30 s whisper window ON DEVICE: the host ships only
            # the (1 s-bucketed) true waves — ~5x less host->device traffic
            # than shipping the zero-padded window
            w = jnp.pad(w, ((0, 0), (0, 30 * 16000 - w.shape[1])))
            mel = whisper_log_mel(w)
            if enc_dtype != jnp.float32:
                p = jax.tree_util.tree_map(
                    lambda a: a.astype(enc_dtype)
                    if a.dtype == jnp.float32 else a, p)
                mel = mel.astype(enc_dtype)
            return self.whisper.apply({"params": p}, mel).astype(jnp.float32)

        self._jit_whisper = jax.jit(_whisper_fwd)

        from seedvc_tpu.dsp.resample import warp_rate

        self._jit_warp = jax.jit(warp_rate)

        # Fused per-step feature program for the warp-perturbation path:
        # random-rate warp -> [original ; perturbed] stacked -> ONE whisper
        # forward at 2B.  One device dispatch instead of three (each costs
        # ~10-25 ms through the axon tunnel) and the 2B batch fills the MXU
        # better than two B-sized calls.
        def _semantic_pair_fwd(p, w16b, rate):
            alt = warp_rate(w16b, rate)
            s = _whisper_fwd(p, jnp.concatenate([w16b, alt], axis=0))
            return s[: w16b.shape[0]], s[w16b.shape[0]:]

        self._jit_semantic_pair = jax.jit(_semantic_pair_fwd)

        # perturbed-branch-only variant for feature-cache hits (s_ori
        # comes from the cache; see prepare_batch)
        def _semantic_alt_fwd(p, w16b, rate):
            return _whisper_fwd(p, warp_rate(w16b, rate))

        self._jit_semantic_alt = jax.jit(_semantic_alt_fwd)

        # cache-hit fast path: restack the cached per-clip rows AND run the
        # perturbed whisper branch in ONE dispatch (each dispatch costs
        # ~10-25 ms through the axon tunnel; 3 -> 1 per step here)
        def _cached_prep_fwd(p, w16b, rate, *rows):
            B = w16b.shape[0]
            s_ori = jnp.stack(rows[:B])
            style = jnp.stack(rows[B:])
            return s_ori, _semantic_alt_fwd(p, w16b, rate), style

        self._jit_cached_prep = jax.jit(_cached_prep_fwd)
        # id -> (s_ori_row (T50, D) f32, style_row (S,)) device arrays
        self._feat_cache: dict = {}
        self._feat_cache_used = 0

        # mel + pad-mask on device (reference collate pads mels with -10,
        # ft_dataset.py:218-243): keeps the mels device-resident instead of
        # a host round-trip through the ~50 MB/s tunnel every step
        def _mel_fwd(waves, mel_lens):
            mels = self.mel_fn(waves)
            pos = jnp.arange(mels.shape[1])[None, :]
            return jnp.where((pos < mel_lens[:, None])[..., None],
                             mels, -10.0)

        self._jit_mel = jax.jit(_mel_fwd)

        # True-length style extraction (reference loops per sample with true
        # lengths, train.py:841-869): fbank over the padded batch, per-sample
        # valid-frame mean subtraction, masked CAMPPlus — equals the
        # per-sample computation (tests/test_trainer_features.py).
        def _style_fwd(p, waves_16k, frame_lens):
            fb = kaldi_fbank(waves_16k)
            fmask = (jnp.arange(fb.shape[1])[None, :]
                     < frame_lens[:, None]).astype(fb.dtype)[..., None]
            mean = (fb * fmask).sum(axis=1, keepdims=True) / jnp.maximum(
                frame_lens[:, None, None].astype(fb.dtype), 1.0)
            fb = (fb - mean) * fmask
            return self.campplus.apply({"params": p}, fb, frame_lens)

        self._jit_style = jax.jit(_style_fwd)

        # Faithful timbre perturbation: the OpenVoice VITS converter
        # (reference train.py:544-551, :770-801), used when its converted
        # checkpoint is provided; otherwise the resample-based fallback.
        self.openvoice_params = openvoice_params
        self.se_db = se_db
        if openvoice_params is not None:
            from seedvc_tpu.models.openvoice import (
                OpenVoiceConfig, ToneColorConverter, linear_spectrogram)

            self._ov = ToneColorConverter(OpenVoiceConfig())

            @jax.jit
            def ov_convert(p, waves, spec_lens, se_tgt, noise):
                spec = linear_spectrogram(waves)
                se_src = self._ov.apply({"params": p}, spec,
                                        method=self._ov.extract_se)
                return self._ov.apply({"params": p}, spec, spec_lens, se_src,
                                      se_tgt, noise, 0.3,
                                      method=self._ov.voice_conversion)

            self._ov_convert = ov_convert

        self.ema_loss: Optional[float] = None
        self._ema_dev = None  # device-resident loss EMA (synced lazily)
        d = tcfg.ema_decay
        self._jit_ema = jax.jit(lambda e, l: d * e + (1 - d) * l)
        self.best_ema: float = float("inf")
        self.plateau_count = 0
        self.best_val_loss = float("inf")
        self.val_patience = 0

        self._ckpt_mgr = None
        if tcfg.run_dir:
            import orbax.checkpoint as ocp

            os.makedirs(tcfg.run_dir, exist_ok=True)
            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(tcfg.run_dir),
                options=ocp.CheckpointManagerOptions(max_to_keep=2))

    # ------------------------------------------------------------------
    def _put(self, x):
        """Batch array -> device, sharded over the data axis.

        Falls back to an ordinary (replicated) transfer when the leading
        dim doesn't divide the data axis (e.g. a validation tail batch);
        jitted consumers accept either layout — GSPMD re-shards as needed.
        """
        if (self._n_data > 1 and getattr(x, "ndim", 0) >= 1
                and x.shape[0] % self._n_data == 0):
            return jax.device_put(x, self._data_sharding)
        return jnp.asarray(x)

    def _semantic(self, waves_16k: np.ndarray, lens_16k: np.ndarray) -> jnp.ndarray:
        """Whisper features for a batch (30 s window, padded on device).

        The host ships the waves bucketed to 1 s so only a few program
        shapes compile; the zero-pad to 30 s happens inside the jit."""
        B = waves_16k.shape[0]
        chunk = 30 * 16000
        bucket = 16000
        if (isinstance(waves_16k, jax.Array)
                and waves_16k.shape[1] % bucket == 0
                and waves_16k.shape[1] <= chunk):
            # already device-resident and bucketed (perturbed path): no
            # host round-trip
            return self._jit_whisper(self.whisper_params, waves_16k)
        n = min(waves_16k.shape[1], chunk)
        T = min(-(-n // bucket) * bucket, chunk)
        padded = np.zeros((B, T), np.float32)
        padded[:, :n] = np.asarray(waves_16k[:, :n])
        return self._jit_whisper(self.whisper_params, self._put(padded))

    def _perturb(self, waves_16k: np.ndarray, rng: np.random.Generator,
                 waves_sr: Optional[np.ndarray] = None,
                 step: int = 0) -> jnp.ndarray:
        """Timbre perturbation of the semantic-encoder input."""
        if self.openvoice_params is not None and waves_sr is not None:
            return self._perturb_openvoice(waves_sr, rng, step)
        # fallback: random-rate time warp (formant shift).  The rate is
        # TRACED (dsp.resample.warp_rate): one compiled program for every
        # rate — a per-step static resample ratio would recompile through
        # the axon tunnel every step (measured ~5 s/step).
        # The reference resamples 16000 -> 16000*rate (stretch by ``rate``);
        # warp_rate's out[i] = wave[i*r] compresses by r, so pass 1/rate to
        # keep the reference's perturb_min/max semantics.  Linear interp
        # applies no anti-alias lowpass for rates > 1 — acceptable for an
        # augmentation-only fallback (mild extra HF noise).
        rate = rng.uniform(self.tcfg.perturb_min, self.tcfg.perturb_max)
        return self._jit_warp(self._put(waves_16k), jnp.float32(1.0 / rate))

    def _perturb_openvoice(self, waves_sr: np.ndarray,
                           rng: np.random.Generator, step: int) -> np.ndarray:
        """OpenVoice conversion to a deterministic reference SE
        (reference se_db pick, train.py:779-783); output resampled to 16k."""
        B, Tw = waves_sr.shape
        spec_len = Tw // 256
        from seedvc_tpu.models.openvoice import OpenVoiceConfig

        cfg = OpenVoiceConfig()
        if self.se_db is not None:
            idx = (step * B + np.arange(B)) % len(self.se_db)
            se_tgt = jnp.asarray(self.se_db[idx])
        else:
            # no SE bank: use a shuffled batch as targets
            perm = rng.permutation(B)
            from seedvc_tpu.models.openvoice import linear_spectrogram

            spec = linear_spectrogram(jnp.asarray(waves_sr))
            se_tgt = self._ov.apply({"params": self.openvoice_params}, spec,
                                    method=self._ov.extract_se)[perm]
        noise = jnp.asarray(
            rng.standard_normal((B, spec_len, cfg.inter_channels))
            .astype(np.float32))
        converted = self._ov_convert(
            self.openvoice_params, jnp.asarray(waves_sr[:, : spec_len * 256]),
            jnp.full((B,), spec_len, jnp.int32), se_tgt, noise)
        return np.asarray(resample(converted, self.sr, 16000))

    def prepare_batch(self, batch: Batch, rng: np.random.Generator,
                      step: Optional[int] = None) -> dict:
        tb = self.tcfg
        B = batch.waves.shape[0]
        if step is None:
            step = int(self.state.step)

        mel_lens = batch.wave_lengths // self.hop
        max_len = int(mel_lens.max())
        bucket = -(-max_len // tb.mel_bucket) * tb.mel_bucket
        wav_bucket = bucket * self.hop
        waves = np.zeros((B, wav_bucket), np.float32)
        n = min(wav_bucket, batch.waves.shape[1])
        waves[:, :n] = batch.waves[:, :n]
        # mel + pad-to--10 mask stay ON DEVICE (_jit_mel): the old host
        # round-trip of the mel batch cost a mid-prep sync + 2 transfers
        mels = self._jit_mel(self._put(waves),
                             self._put(mel_lens.astype(np.int32)))

        # One 1 s-bucketed 16 kHz batch reused by every consumer (semantic,
        # perturb, style, RMVPE): raw batch widths vary per batch and would
        # compile a new style/warp program per width through the tunnel.
        w16_T = min(-(-batch.waves_16k.shape[1] // 16000) * 16000, 30 * 16000)
        w16b = np.zeros((B, w16_T), np.float32)
        nb = min(w16_T, batch.waves_16k.shape[1])
        w16b[:, :nb] = batch.waves_16k[:, :nb]
        # True 16 kHz lengths CLAMPED to the truncated window: FTDataset
        # filters clips to 1-30 s so the clamp is normally a no-op, but
        # style/F0/semantic lengths must never exceed the frames actually
        # present in w16b (a >30 s clip would otherwise mask past the end).
        eff_16k = np.minimum(batch.wave_16k_lengths, w16_T)

        # style from true lengths: valid kaldi frame counts (snip_edges)
        frame_lens = np.maximum(
            (eff_16k - 400) // 160 + 1, 1).astype(np.int32)

        # Perturb-invariant per-clip features (clean s_ori + style) are
        # cached on device across epochs: the whisper program zero-pads to
        # the full 30 s window inside the jit, so a cached row is
        # bit-identical to recomputing it in any batch composition.  The
        # perturbed branch recompiles as a B-batch alt-only program on
        # hits (vs the 2B fused pair program) — same math, float-epsilon
        # program noise (~5e-7; pinned by tests/test_feat_cache.py).
        ids = batch.ids if tb.feat_cache_bytes > 0 else None
        cached = (ids is not None
                  and all(int(i) in self._feat_cache for i in ids))
        if cached:
            rows = [self._feat_cache[int(i)] for i in ids]
            if self.openvoice_params is not None:
                # _put: on a multi-device mesh the restacked rows get the
                # same data sharding as the rest of the prep (ADVICE r4 —
                # a replicated stack here would leave the OpenVoice
                # cache-hit branch outside the SPMD prep spreading)
                s_ori = self._put(jnp.stack([r[0] for r in rows]))
                style = self._put(jnp.stack([r[1] for r in rows]))
                s_alt = self._semantic(
                    self._perturb(w16b, rng, waves_sr=waves, step=step),
                    eff_16k)
            else:
                rate = rng.uniform(tb.perturb_min, tb.perturb_max)
                s_ori, s_alt, style = self._jit_cached_prep(
                    self.whisper_params, self._put(w16b),
                    jnp.float32(1.0 / rate),
                    *[r[0] for r in rows], *[r[1] for r in rows])
        else:
            if self.openvoice_params is not None:
                s_ori = self._semantic(w16b, eff_16k)
                s_alt = self._semantic(
                    self._perturb(w16b, rng, waves_sr=waves, step=step),
                    eff_16k)
            else:
                # fused fallback path: warp + both whisper passes in ONE
                # dispatch (_semantic_pair_fwd; 1/rate per _perturb note)
                rate = rng.uniform(tb.perturb_min, tb.perturb_max)
                s_ori, s_alt = self._jit_semantic_pair(
                    self.whisper_params, self._put(w16b),
                    jnp.float32(1.0 / rate))
            style = self._jit_style(self.campplus_params, self._put(w16b),
                                    self._put(frame_lens))
            if ids is not None:
                for b, i in enumerate(ids):
                    i = int(i)
                    if i in self._feat_cache:
                        continue
                    row = (s_ori[b], style[b])
                    size = sum(int(np.prod(r.shape)) * r.dtype.itemsize
                               for r in row)
                    if self._feat_cache_used + size > tb.feat_cache_bytes:
                        break
                    self._feat_cache[i] = row
                    self._feat_cache_used += size
        # Crop semantic features to the batch-true token count (the
        # reference crops to len_16k//320+1, train.py:702; the repo's
        # inference path crops too, pipelines/convert.py) — WITHOUT the
        # crop the regulator interpolates mostly-silence 30 s encodings
        # onto the mel positions and training-time alignment diverges from
        # inference.  Static shapes stay bucketed (64 tokens ≈ 1.28 s);
        # the exact true length rides along as a traced scalar (s_lens)
        # for the regulator's input-crop gather.
        max16 = int(eff_16k.max())
        s_true = max16 // 320 + 1
        s_bucket = min(-(-s_true // 64) * 64,
                       min(s_ori.shape[1], s_alt.shape[1]))
        s_true = min(s_true, s_bucket)

        feats = {
            "s_alt": s_alt[:, :s_bucket],
            "s_ori": s_ori[:, :s_bucket],
            "s_lens": jnp.asarray(s_true, jnp.int32),
            "mels": jnp.asarray(mels),
            "mel_lens": jnp.asarray(mel_lens.astype(np.int32)),
            "style": style,
        }

        if self.f0_condition:
            # Batch RMVPE F0 fed to the regulator (train.py:803-814);
            # reuses the 1 s-bucketed batch.
            f0 = self.rmvpe.infer_from_audio_batch(w16b)  # (B, T16//160+1)
            f0_true = max16 // 160 + 1
            feats["f0"] = self._put(f0.astype(np.float32))
            feats["f0_lens"] = jnp.asarray(min(f0_true, f0.shape[1]),
                                           jnp.int32)
        return feats

    # ------------------------------------------------------------------
    @property
    def lr_scale(self) -> float:
        from seedvc_tpu.train.optim import get_lr_scale

        return get_lr_scale(self.state.opt_state)

    def halve_lr(self):
        """Halve the runtime LR multiplier carried in opt_state (reference
        plateau halving, ``train.py:1122-1141``)."""
        from seedvc_tpu.train.optim import set_lr_scale

        scale = self.lr_scale * 0.5
        self.state = self.state._replace(
            opt_state=set_lr_scale(self.state.opt_state, scale))
        print(f"plateau: halving LR (scale {scale})")

    # ------------------------------------------------------------------
    def save(self, step: int):
        if self._ckpt_mgr is None:
            return
        if self._ckpt_mgr.latest_step() == step:
            return  # already saved this step (e.g. save_interval hit at
            # max_steps — Orbax raises StepAlreadyExists on a re-save)
        import orbax.checkpoint as ocp

        tree = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        if self.state.ema_params is not None:
            tree["ema_params"] = self.state.ema_params
        self._ckpt_mgr.save(step, args=ocp.args.PyTreeSave(tree))
        self._ckpt_mgr.wait_until_finished()

    def export_serving(self, out_dir: Optional[str] = None,
                       use_ema: bool = True) -> str:
        """Write the trained weights as a serving tree (``vc.pkl``) that
        ``VoiceConverter`` / ``apps.infer --checkpoint-dir`` load directly —
        the analogue of the reference's final ``ft_model.pth``
        (``train.py:1217-1234``; EMA weights preferred like the shipped
        ``_ema.pth`` checkpoints, ``modules/commons.py:423-432``)."""
        import pickle

        out_dir = out_dir or os.path.join(self.tcfg.run_dir, "ft_model")
        os.makedirs(out_dir, exist_ok=True)
        tree = self.state.params
        if use_ema and self.state.ema_params is not None:
            tree = self.state.ema_params
        tree = jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
        path = os.path.join(out_dir, "vc.pkl")
        with open(path, "wb") as f:
            pickle.dump(tree, f)
        return path

    def restore_latest(self) -> bool:
        if self._ckpt_mgr is None or self._ckpt_mgr.latest_step() is None:
            return False
        import orbax.checkpoint as ocp

        latest = self._ckpt_mgr.latest_step()
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        want_ema = self.state.ema_params is not None
        # Only ask Orbax for 'ema_params' if the checkpoint actually has it:
        # restoring a pre-EMA checkpoint into an EMA-enabled run must not
        # fail, and must not silently disable EMA either.
        has_ema = self._ckpt_has_key(latest, "ema_params")
        if want_ema and has_ema:
            template["ema_params"] = self.state.ema_params
        restored = self._ckpt_mgr.restore(
            latest, args=ocp.args.PyTreeRestore(template))
        ema = restored.get("ema_params")
        if want_ema and ema is None:
            # re-seed EMA from the restored params (fresh copy: both trees
            # are donated by the jitted step)
            ema = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                         restored["params"])
        self.state = TrainState(restored["params"], restored["opt_state"],
                                restored["step"], ema)
        return True

    def _ckpt_has_key(self, step: int, key: str) -> bool:
        import orbax.checkpoint as ocp

        # read the on-disk pytree metadata directly: a fresh
        # CheckpointManager (resume path) has no handler registered yet and
        # its item_metadata() returns None
        for read in (
            lambda: ocp.PyTreeCheckpointer().metadata(
                os.path.join(str(self._ckpt_mgr.directory), str(step),
                             "default")).item_metadata,
            lambda: self._ckpt_mgr.item_metadata(step),
        ):
            try:
                tree = read()
                if hasattr(tree, "tree"):
                    tree = tree.tree
                if isinstance(tree, dict):
                    return key in tree
            except Exception:
                continue
        # metadata unavailable: assume the key matches the current run so
        # old behaviour (restore what we saved) is preserved
        return self.state.ema_params is not None

    # ------------------------------------------------------------------
    def validate(self, val_dataset: FTDataset) -> float:
        """Mean CFM loss over a few validation batches (reference
        ``validate()``, ``train.py:1034-1056``)."""
        tb = self.tcfg
        rng = np.random.default_rng(tb.seed + 1)
        losses = []
        for i, batch in enumerate(val_dataset.batches(shuffle=False,
                                                      epoch=0)):
            if i >= tb.val_batches:
                break
            feats = self.prepare_batch(batch, rng)
            losses.append(float(self.eval_fn(
                self.state.params, feats, jax.random.PRNGKey(tb.seed + i))))
        return float(np.mean(losses)) if losses else float("nan")

    def train(self, dataset: FTDataset, val_dataset: FTDataset = None):
        from seedvc_tpu.train.prefetch import prefetched

        tb = self.tcfg
        key = jax.random.PRNGKey(tb.seed)
        step = int(self.state.step)
        t0 = time.time()
        for epoch in range(tb.epochs):
            # Feature prep runs on a worker thread one batch ahead
            # (train/prefetch.py).  Each batch derives its numpy RNG from
            # (seed, step): the augmentation stream is then a function of
            # the step index alone, so prefetched batches abandoned by a
            # mid-epoch stop (max_steps/early-stop) cannot shift the stream
            # — resumed runs are bit-reproducible against the synchronous
            # prefetch=0 schedule.
            prep_step = iter(range(step, step + 10 ** 9))

            def _prep(batch, _steps=prep_step):
                s = next(_steps)
                return self.prepare_batch(
                    batch, np.random.default_rng((tb.seed, s)), step=s)

            for feats in prefetched(dataset.batches(shuffle=True,
                                                    epoch=epoch),
                                    _prep, depth=tb.prefetch):
                key, sub = jax.random.split(key)
                self.state, metrics = self.step_fn(self.state, feats, sub)
                step += 1
                # Loss EMA accumulates ON DEVICE (one tiny async dispatch);
                # a float() here would pay a tunnel round-trip EVERY step
                # and drain the device queue — the host only materialises
                # the EMA at log/validation points.  The queue depth is
                # bounded by the log_interval sync.
                self._ema_dev = (metrics["loss"] if self._ema_dev is None
                                 else self._jit_ema(self._ema_dev,
                                                    metrics["loss"]))
                if step % tb.log_interval == 0:
                    loss = float(metrics["loss"])
                    self.ema_loss = float(self._ema_dev)
                    print(f"step {step} loss {loss:.4f} ema {self.ema_loss:.4f} "
                          f"gnorm {float(metrics['grad_norm']):.3f} "
                          f"({(time.time()-t0)/tb.log_interval:.2f}s/step)")
                    t0 = time.time()
                    # plateau-based LR halving (reference train.py:1122-1141)
                    if self.ema_loss < self.best_ema - 1e-4:
                        self.best_ema = self.ema_loss
                        self.plateau_count = 0
                    else:
                        self.plateau_count += 1
                        if self.plateau_count >= tb.lr_halve_patience:
                            self.halve_lr()
                            self.plateau_count = 0
                if (val_dataset is not None and tb.validation_interval
                        and step % tb.validation_interval == 0):
                    val_loss = self.validate(val_dataset)
                    # val-loss early stopping + patience (train.py:1101-1141)
                    if val_loss < self.best_val_loss - 1e-4:
                        self.best_val_loss = val_loss
                        self.val_patience = 0
                    else:
                        self.val_patience += 1
                    print(f"step {step} val_loss {val_loss:.4f} "
                          f"(best {self.best_val_loss:.4f}, "
                          f"patience {self.val_patience})")
                    if self.val_patience >= tb.early_stop_patience:
                        print("early stop: validation plateau")
                        return self._finish(step)
                if step % tb.save_interval == 0:
                    self.save(step)
                if step >= tb.max_steps:
                    return self._finish(step)
        return self._finish(step)

    def _finish(self, step: int) -> int:
        # materialise the device-resident loss EMA (one sync) and save
        if self._ema_dev is not None:
            self.ema_loss = float(self._ema_dev)
        self.save(step)
        return step
