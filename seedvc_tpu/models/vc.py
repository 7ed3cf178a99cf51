"""Composed v1 voice-conversion model: length regulator + CFM(DiT).

This is the trainable unit of the v1 system — the analogue of the reference's
``build_model(...)-> {cfm, length_regulator}`` pair (``modules/commons.py:387``)
and the training-step composition in ``train.py:762-894``:

- regulate both the original and the timbre-perturbed semantic features to
  mel rate,
- pick a random prompt length per sample (10% zero), splice the *original*
  content into the prompt region (``train.py:821-831``),
- CFM loss on the masked region.

Frozen encoders (Whisper/XLSR, CAMPPlus) run outside this module; the batch
carries their outputs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedvc_tpu.core.config import ModelParams
from seedvc_tpu.models.cfm import CFM
from seedvc_tpu.models.regulator import InterpolateRegulator


class VCModel(nn.Module):
    params_cfg: ModelParams

    def setup(self):
        self.length_regulator = InterpolateRegulator(
            self.params_cfg.length_regulator, name="length_regulator")
        self.cfm = CFM(self.params_cfg, name="cfm")

    def regulate(self, features, ylens, target_len, f0=None, x_lens=None,
                 f0_lens=None):
        return self.length_regulator(features, ylens, target_len, f0,
                                     x_lens=x_lens, f0_lens=f0_lens)

    def estimate(self, x, prompt_x, x_lens, t, style, cond, cond_drop=None,
                 static_cond=None):
        return self.cfm.estimate(x, prompt_x, x_lens, t, style, cond,
                                 cond_drop=cond_drop, static_cond=static_cond)

    def precompute_cond(self, x, prompt_x, x_lens, style, cond):
        return self.cfm.precompute_cond(x, prompt_x, x_lens, style, cond)

    def __call__(self, s_alt, s_ori, mels, mel_lens, style, *,
                 rngs_dict, f0=None, s_lens=None, f0_lens=None,
                 deterministic: bool = False):
        """Training loss.

        s_alt/s_ori: (B, T_s, D) semantic features (perturbed / original);
        mels: (B, T, C); mel_lens: (B,); style: (B, S);
        f0: (B, T_f0) Hz RMVPE pitch for f0_condition presets
        (reference ``train.py:803-814`` feeds batch RMVPE F0 to the
        regulator every step); s_lens/f0_lens: traced true content/f0
        lengths inside the static buffers (the reference crops features to
        ``len_16k // 320 + 1``, ``train.py:702``).
        """
        B, T, _ = mels.shape
        alt_cond, _, _, alt_commit, alt_cb = self.length_regulator(
            s_alt, mel_lens, T, f0, x_lens=s_lens, f0_lens=f0_lens)
        ori_cond, _, _, ori_commit, ori_cb = self.length_regulator(
            s_ori, mel_lens, T, f0, x_lens=s_lens, f0_lens=f0_lens)

        # Random prompt length ~ U(0, len*0.3..0.9-ish): the reference draws
        # U(0, mel_len-1) then zeroes 10% of them (train.py:823-826).
        key_len, key_zero = jax.random.split(rngs_dict["prompt"])
        frac = jax.random.uniform(key_len, (B,))
        prompt_lens = (frac * (mel_lens - 1).astype(jnp.float32)).astype(jnp.int32)
        zero_mask = jax.random.bernoulli(key_zero, 0.1, (B,))
        prompt_lens = jnp.where(zero_mask, 0, prompt_lens)

        # Splice original-content condition into the prompt region so the
        # prompt region's content matches the prompt mel (train.py:829-831).
        pos = jnp.arange(T)[None, :, None]
        in_prompt = pos < prompt_lens[:, None, None]
        cond = jnp.where(in_prompt, ori_cond, alt_cond)

        loss, out = self.cfm(
            mels, mel_lens, prompt_lens, cond, style,
            rng_t=rngs_dict["t"], rng_noise=rngs_dict["noise"],
            rng_drop=rngs_dict.get("drop"), deterministic=deterministic)
        # VQ commitment/codebook losses (reference ``train.py:883-885``:
        # loss + 0.05*(alt+ori commitment) + 0.15*(alt+ori codebook)).
        if alt_commit is not None:
            loss = (loss
                    + (alt_commit + ori_commit) * 0.05
                    + (alt_cb + ori_cb) * 0.15)
        return loss, out
