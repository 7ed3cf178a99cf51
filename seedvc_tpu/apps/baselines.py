"""Baseline voice-conversion adapters for the eval harness.

Equivalent of the reference ``baselines/{openvoice,cosyvoice}.py`` (SURVEY
§2.8), which shell into sibling repo checkouts and expose one interface:
``convert(source_path, reference_path, output_path)``.

Two adapter kinds here:
- :class:`OpenVoiceBaseline` runs the framework's own JAX ToneColorConverter
  (``seedvc_tpu/models/openvoice.py``) from a converted checkpoint — no
  sibling checkout needed.
- :class:`CommandBaseline` wraps ANY external converter as a subprocess with
  a ``{source} {reference} {output}`` command template (the general form of
  the reference's sibling-checkout pattern, e.g. CosyVoice).
"""

from __future__ import annotations

import pickle
import shlex
import subprocess


class OpenVoiceBaseline:
    """Timbre-only conversion with the in-framework OpenVoice VITS flow."""

    def __init__(self, checkpoint_pkl: str, tau: float = 0.3):
        import jax
        import jax.numpy as jnp

        from seedvc_tpu.models.openvoice import (
            OpenVoiceConfig, ToneColorConverter, linear_spectrogram)

        with open(checkpoint_pkl, "rb") as f:
            self.params = pickle.load(f)
        self.cfg = OpenVoiceConfig()
        self.model = ToneColorConverter(self.cfg)
        self.spec_fn = linear_spectrogram
        self.tau = tau

        @jax.jit
        def extract_se(params, spec):
            return self.model.apply({"params": params}, spec,
                                    method=self.model.extract_se)

        @jax.jit
        def vc(params, spec, lens, g_src, g_tgt, noise):
            return self.model.apply({"params": params}, spec, lens, g_src,
                                    g_tgt, noise, tau,
                                    method=self.model.voice_conversion)

        self._extract_se = extract_se
        self._vc = vc
        self._jnp = jnp

    def convert(self, source_path: str, reference_path: str,
                output_path: str):
        import jax
        import numpy as np

        from seedvc_tpu.apps.audio_io import load_wav, save_wav
        from seedvc_tpu.dsp.resample import resample

        jnp = self._jnp
        sr = 22050
        src, s_sr = load_wav(source_path)
        ref, r_sr = load_wav(reference_path)
        src = np.asarray(resample(jnp.asarray(src), s_sr, sr))
        ref = np.asarray(resample(jnp.asarray(ref), r_sr, sr))

        spec_src = self.spec_fn(jnp.asarray(src[None]))
        spec_ref = self.spec_fn(jnp.asarray(ref[None]))
        g_src = self._extract_se(self.params, spec_src)
        g_tgt = self._extract_se(self.params, spec_ref)
        lens = jnp.array([spec_src.shape[1]])
        noise = jax.random.normal(
            jax.random.PRNGKey(0),
            (1, spec_src.shape[1], self.cfg.inter_channels))
        out = np.asarray(self._vc(self.params, spec_src, lens, g_src, g_tgt,
                                  noise))[0]
        save_wav(output_path, out, sr)
        return output_path


class CosyVoiceBaseline:
    """CosyVoice-300M-25Hz VC baseline via a sibling checkout, mirroring the
    reference adapter (``baselines/cosyvoice.py:5-13``: sys.path-append
    ``../CosyVoice`` + Matcha-TTS, ``CosyVoice(...).inference_vc``).

    Gated: raises a clear error if the checkout/package is absent (this
    build environment has no CosyVoice install; the adapter exists so a
    deployment WITH one scores the same baseline the reference does).
    """

    def __init__(self, repo_dir: str = "../CosyVoice",
                 model_dir: str = "pretrained_models/CosyVoice-300M-25Hz"):
        import os
        import sys

        sys.path.append(repo_dir)
        sys.path.append(os.path.join(repo_dir, "third_party", "Matcha-TTS"))
        try:
            from cosyvoice.cli.cosyvoice import CosyVoice
        except ImportError as e:
            raise RuntimeError(
                f"CosyVoice baseline needs a checkout at {repo_dir!r} "
                "(github.com/FunAudioLLM/CosyVoice) with the "
                "CosyVoice-300M-25Hz model downloaded") from e
        self._cosyvoice = CosyVoice(model_dir)

    def convert(self, source_path: str, reference_path: str,
                output_path: str):
        import numpy as np

        from seedvc_tpu.apps.audio_io import load_wav, save_wav

        import torch

        src, s_sr = load_wav(source_path)
        ref, r_sr = load_wav(reference_path)
        import jax.numpy as jnp

        from seedvc_tpu.dsp.resample import resample

        src16 = np.asarray(resample(jnp.asarray(src), s_sr, 16000))
        ref16 = np.asarray(resample(jnp.asarray(ref), r_sr, 16000))
        out = None
        for piece in self._cosyvoice.inference_vc(
                torch.from_numpy(src16[None]), torch.from_numpy(ref16[None]),
                stream=False):
            out = piece["tts_speech"]
        save_wav(output_path, out.numpy().ravel(), 22050)
        return output_path


class CommandBaseline:
    """External converter via a command template.

    Example::

        CommandBaseline("python ../CosyVoice/vc.py --src {source} "
                        "--ref {reference} --out {output}")
    """

    def __init__(self, template: str, timeout_s: float = 600.0):
        for field in ("{source}", "{reference}", "{output}"):
            if field not in template:
                raise ValueError(f"command template must contain {field}")
        self.template = template
        self.timeout_s = timeout_s

    def convert(self, source_path: str, reference_path: str,
                output_path: str):
        cmd = self.template.format(source=shlex.quote(source_path),
                                   reference=shlex.quote(reference_path),
                                   output=shlex.quote(output_path))
        subprocess.run(cmd, shell=True, check=True, timeout=self.timeout_s)
        return output_path


def get_baseline(name: str, **kwargs):
    if name == "openvoice":
        return OpenVoiceBaseline(kwargs["checkpoint_pkl"],
                                 tau=kwargs.get("tau", 0.3))
    if name == "cosyvoice":
        return CosyVoiceBaseline(
            repo_dir=kwargs.get("repo_dir") or "../CosyVoice",
            model_dir=kwargs.get("model_dir")
            or "pretrained_models/CosyVoice-300M-25Hz")
    if name == "command":
        return CommandBaseline(kwargs["template"],
                               timeout_s=kwargs.get("timeout_s", 600.0))
    raise KeyError(
        f"unknown baseline {name!r}; known: openvoice, cosyvoice, command")
