"""Objective evaluation metrics.

Equivalents of the reference eval stack (``eval.py:291-…``, SURVEY §2.8):
- WER/CER: the reference uses jiwer + hubert-large-ls960-ft ASR; jiwer is
  not installed here, so the edit-distance math is implemented directly
  (pure Python, testable) and the ASR transcriber is a gated adapter over a
  *local* HF CTC checkpoint (no network egress in this environment).
- DNSMOS: the reference scores with onnxruntime models
  (``baselines/dnsmos/dnsmos_computor.py:27-45``); gated adapter below.
- SECS lives in ``seedvc_tpu.apps.eval`` (CAMPPlus cosine similarity).
"""

from __future__ import annotations

import re
from typing import Sequence


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Levenshtein distance over tokens (words or characters)."""
    if not ref:
        return len(hyp)
    if not hyp:
        return len(ref)
    prev = list(range(len(hyp) + 1))
    for i, r in enumerate(ref, 1):
        cur = [i] + [0] * len(hyp)
        for j, h in enumerate(hyp, 1):
            cur[j] = min(prev[j] + 1,          # deletion
                         cur[j - 1] + 1,       # insertion
                         prev[j - 1] + (r != h))  # substitution
        prev = cur
    return prev[-1]


def normalize_text(text: str) -> str:
    """Uppercase, strip punctuation, collapse whitespace (jiwer-style)."""
    text = re.sub(r"[^\w\s']", " ", text.upper())
    return " ".join(text.split())


def wer(ref_text: str, hyp_text: str) -> float:
    """Word error rate between a reference transcript and a hypothesis."""
    ref = normalize_text(ref_text).split()
    hyp = normalize_text(hyp_text).split()
    return edit_distance(ref, hyp) / max(len(ref), 1)


def cer(ref_text: str, hyp_text: str) -> float:
    """Character error rate (spaces excluded, as jiwer's cer does not
    collapse them — we compare the normalized strings with spaces kept)."""
    ref = normalize_text(ref_text)
    hyp = normalize_text(hyp_text)
    return edit_distance(ref, hyp) / max(len(ref), 1)


class CTCTranscriber:
    """ASR adapter over a local HF CTC checkpoint (hubert/wav2vec2 family).

    Mirrors the reference's hubert-large-ls960-ft usage (``eval.py``);
    requires a local model directory — raises a clear error otherwise.
    """

    def __init__(self, model_dir: str):
        import torch  # cpu build is baked in
        from transformers import AutoModelForCTC, AutoProcessor

        self.torch = torch
        self.processor = AutoProcessor.from_pretrained(model_dir)
        self.model = AutoModelForCTC.from_pretrained(model_dir).eval()

    def transcribe(self, wave_16k) -> str:
        inputs = self.processor(wave_16k, sampling_rate=16000,
                                return_tensors="pt")
        with self.torch.no_grad():
            logits = self.model(inputs.input_values).logits
        ids = logits.argmax(-1)[0]
        return self.processor.decode(ids)


def p808_melspec(audio_16k) -> "np.ndarray":
    """Mel features for the DNSMOS P.808 model (reference
    ``baselines/dnsmos/dnsmos_computor.py:39-57``): torchaudio
    MelSpectrogram(sr=16000, n_fft=321, hop=160, n_mels=120,
    mel_scale='slaney', norm=None, power=2, center/reflect), then
    ``(librosa.power_to_db(ref=max) + 40) / 40``, transposed to (T, 120).
    Implemented in numpy (torchaudio is not installed here)."""
    import numpy as np

    from seedvc_tpu.dsp.mel import hann_window, mel_filterbank

    n_fft, hop, n_mels = 321, 160, 120
    audio = np.asarray(audio_16k, np.float32)
    pad = n_fft // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    # torch.stft frame count with center padding (odd n_fft: 2*pad = n_fft-1)
    n_frames = 1 + (len(padded) - n_fft) // hop
    win = hann_window(n_fft, periodic=True).astype(np.float32)
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = padded[idx] * win[None, :]
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=-1)) ** 2  # (T, 161)
    fb = mel_filterbank(16000, n_fft, n_mels, fmin=0.0, fmax=8000.0,
                        norm=None)  # (120, 161)
    mel = spec @ fb.T  # (T, 120)
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    db = db - 10.0 * np.log10(np.maximum(mel.max(), 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    return ((db + 40.0) / 40.0).astype(np.float32)


class DNSMOS:
    """DNSMOS scorer over the published ONNX models.

    Gated on onnxruntime (not installed in this build environment); point
    ``model_dir`` at a directory containing ``sig_bak_ovr.onnx`` (P.835
    SIG/BAK/OVRL) — the same file the reference ships under
    ``baselines/dnsmos/`` — and optionally ``model_v8.onnx`` for the P.808
    MOS column (``dnsmos_computor.py:27-45``, ``:104-106``).
    """

    INPUT_LENGTH_S = 9.01

    def __init__(self, model_dir: str):
        import os

        try:
            import onnxruntime as ort
        except ImportError as e:
            raise RuntimeError(
                "DNSMOS scoring requires the optional 'onnxruntime' package"
            ) from e
        self.sess = ort.InferenceSession(
            os.path.join(model_dir, "sig_bak_ovr.onnx"),
            providers=["CPUExecutionProvider"])
        self.p808_sess = None
        p808_path = os.path.join(model_dir, "model_v8.onnx")
        if os.path.exists(p808_path):
            self.p808_sess = ort.InferenceSession(
                p808_path, providers=["CPUExecutionProvider"])

    @staticmethod
    def _poly_fit(sig, bak, ovr):
        # published polynomial mapping from raw to MOS scores
        # (baselines/dnsmos/dnsmos_computor.py)
        p_sig = (-0.08397278, 1.22083953, 0.0052439)
        p_bak = (-0.13166888, 1.60915514, -0.39604546)
        p_ovr = (-0.06766283, 1.11546468, 0.04602535)

        def poly(p, x):
            return p[0] * x ** 2 + p[1] * x + p[2]

        return poly(p_sig, sig), poly(p_bak, bak), poly(p_ovr, ovr)

    def score(self, wave_16k) -> dict:
        import numpy as np

        fs = 16000
        need = int(self.INPUT_LENGTH_S * fs)
        wave = np.asarray(wave_16k, np.float32)
        if len(wave) == 0:
            raise ValueError("DNSMOS.score: empty waveform")
        while len(wave) < need:
            wave = np.concatenate([wave, wave])
        hop = fs  # 1 s hops over 9.01 s windows, as the reference scorer
        sigs, baks, ovrs, p808s = [], [], [], []
        for start in range(0, len(wave) - need + 1, hop):
            seg = wave[start: start + need]
            raw = self.sess.run(None, {"input_1": seg[None]})[0][0]
            s, b, o = self._poly_fit(*raw)
            sigs.append(s)
            baks.append(b)
            ovrs.append(o)
            if self.p808_sess is not None:
                # the reference feeds audio_seg[:-160] (dnsmos_computor:101)
                feats = p808_melspec(seg[:-160])[None]
                p808s.append(float(
                    self.p808_sess.run(None, {"input_1": feats})[0][0][0]))
        out = {"sig": float(np.mean(sigs)), "bak": float(np.mean(baks)),
               "ovrl": float(np.mean(ovrs))}
        if p808s:
            out["p808"] = float(np.mean(p808s))
        return out


def f0_metrics(f0_ref, f0_hyp) -> dict:
    """F0CORR / F0RMSE over jointly-voiced frames (the reference publishes
    these for SVC, EVAL.md:62-70; RMSE in cents, corr is Pearson on Hz).

    Both inputs are per-frame F0 in Hz (0/<=1 = unvoiced); lengths are
    aligned to the shorter sequence.
    """
    import numpy as np

    a = np.asarray(f0_ref, np.float64)
    b = np.asarray(f0_hyp, np.float64)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    voiced = (a > 1) & (b > 1)
    if voiced.sum() < 2:
        return {"f0_corr": float("nan"), "f0_rmse_cents": float("nan"),
                "voiced_frames": int(voiced.sum())}
    av, bv = a[voiced], b[voiced]
    corr = float(np.corrcoef(av, bv)[0, 1])
    cents = 1200.0 * np.log2(bv / av)
    rmse = float(np.sqrt(np.mean(cents ** 2)))
    return {"f0_corr": corr, "f0_rmse_cents": rmse,
            "voiced_frames": int(voiced.sum())}
