"""SeedVCWrapper: one facade over both v1 model sets.

TPU-native analogue of the reference ``seed_vc_wrapper.py`` (622 LoC), which
loads BOTH the 22.05 kHz whisper-small-wavenet model and the 44.1 kHz
whisper-base-f0 model plus their vocoders/RMVPE up front
(``seed_vc_wrapper.py:55-182``) and dispatches on ``f0_condition`` inside
``convert_voice`` (``:468-475``).  Here each model set is built lazily on
first use (loading two full stacks eagerly wastes HBM when only one is
needed) and conversion streams crossfaded chunks like the reference's
generator (``:201-286``).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

from seedvc_tpu.core.config import get_preset
from seedvc_tpu.pipelines.convert import VoiceConverter

PRESET_BY_F0 = {False: "whisper_small_wavenet", True: "whisper_base_f0_44k"}


def load_params_dir(checkpoint_dir: Optional[str]) -> dict:
    """Load converted .pkl parameter trees from a directory (missing files
    fall back to random init inside VoiceConverter)."""
    params: dict = {}
    if checkpoint_dir:
        for name in ("vc", "whisper", "campplus", "vocoder", "rmvpe"):
            path = os.path.join(checkpoint_dir, f"{name}.pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    params[f"{name}_params"] = pickle.load(f)
    return params


class SeedVCWrapper:
    def __init__(self, checkpoint_dir: Optional[str] = None,
                 checkpoint_dir_f0: Optional[str] = None):
        self._dirs = {False: checkpoint_dir, True: checkpoint_dir_f0}
        self._converters: dict[bool, VoiceConverter] = {}

    def converter(self, f0_condition: bool) -> VoiceConverter:
        if f0_condition not in self._converters:
            cfg = get_preset(PRESET_BY_F0[f0_condition])
            self._converters[f0_condition] = VoiceConverter(
                cfg, **load_params_dir(self._dirs[f0_condition]))
        return self._converters[f0_condition]

    # ------------------------------------------------------------------
    def convert_voice(
        self,
        source, source_sr, target, target_sr,
        *,
        f0_condition: bool = False,
        diffusion_steps: int = 25,
        length_adjust: float = 1.0,
        inference_cfg_rate: float = 0.7,
        auto_f0_adjust: bool = True,
        pitch_shift: float = 0.0,
        seed: int = 0,
        stream_output: bool = True,
    ):
        """Generator over ``(sr, wave_chunk, stats)`` — same surface as the
        reference ``SeedVCWrapper.convert_voice`` (``seed_vc_wrapper.py:447``
        selects the model set by ``f0_condition`` and streams chunks).

        With ``stream_output=False`` yields one final complete waveform.
        """
        conv = self.converter(f0_condition)
        gen = conv.convert_with_streaming(
            source, source_sr, target, target_sr,
            diffusion_steps=diffusion_steps,
            length_adjust=length_adjust,
            cfg_rate=inference_cfg_rate,
            auto_f0_adjust=auto_f0_adjust,
            pitch_shift=pitch_shift,
            seed=seed)
        if stream_output:
            yield from gen
            return
        import numpy as np

        chunks, stats, sr = [], {}, conv.sr
        for sr, piece, stats in gen:
            chunks.append(piece)
        out = np.concatenate(chunks) if chunks else np.zeros(0, np.float32)
        yield sr, out, stats
