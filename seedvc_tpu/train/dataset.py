"""Fine-tuning dataset: directory of audio -> padded training batches.

Re-design of ``data/ft_dataset.py``:

- recursive scan for audio files (``:49-74``; wav via scipy always, other
  formats if a decoder is available),
- duration filter 1-30 s (``:12-15``, ``:188``), deterministic md5-hash
  replacement of bad files (``:137-156``),
- resample to model sr + 16 kHz (for the frozen encoders),
- collate zero-pads waves; mels are computed in the *pipeline* (not the
  dataset — SURVEY §7.4) and padded with -10 there.

Plain numpy iterator (the torch DataLoader machinery is unnecessary: the
heavy features run jitted on TPU).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from seedvc_tpu.apps.audio_io import load_wav

AUDIO_EXTS = (".wav", ".mp3", ".flac", ".ogg", ".m4a", ".opus")
MIN_SEC, MAX_SEC = 1.0, 30.0


def scan_audio_files(data_path: str) -> list[str]:
    out = []
    for root, _, files in os.walk(data_path):
        for f in files:
            if f.lower().endswith(AUDIO_EXTS):
                out.append(os.path.join(root, f))
    out.sort()
    if not out:
        raise AssertionError(f"No audio files found under {data_path}")
    return out


@dataclass
class Batch:
    waves: np.ndarray        # (B, T) at model sr, zero-padded
    waves_16k: np.ndarray    # (B, T16) at 16 kHz, zero-padded
    wave_lengths: np.ndarray
    wave_16k_lengths: np.ndarray
    # dataset item indices (perturb-invariant feature caching keys in the
    # trainer); None for ad-hoc batches built outside FTDataset
    ids: np.ndarray | None = None


class FTDataset:
    def __init__(self, data_path: str, sr: int, batch_size: int,
                 max_samples_sec: float = MAX_SEC, seed: int = 1234,
                 cache_bytes: int = 2 << 30):
        self.files = scan_audio_files(data_path)
        while len(self.files) < batch_size:
            self.files = self.files + self.files
        self.sr = sr
        self.batch_size = batch_size
        self.max_sec = max_samples_sec
        self.seed = seed
        self.cache_bytes = cache_bytes
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._cache_used = 0

    def __len__(self):
        return len(self.files)

    def _deterministic_replacement(self, idx: int, path: str) -> int:
        h = hashlib.md5(f"{idx}_{len(self)}_{path}".encode()).hexdigest()
        j = int(h, 16) % len(self)
        return j if j != idx else (idx + 1) % len(self)

    def load_item(self, idx: int, _depth: int = 0) -> tuple[np.ndarray, int]:
        path = self.files[idx]
        try:
            wave, orig_sr = load_wav(path)
        except Exception:
            wave = None
            orig_sr = 0
        bad = (
            wave is None
            or not np.isfinite(wave).all()
            or len(wave) < orig_sr * MIN_SEC
            or len(wave) > orig_sr * self.max_sec
        )
        if bad:
            if _depth > 10:
                raise RuntimeError(f"too many bad files around index {idx}")
            return self.load_item(self._deterministic_replacement(idx, path),
                                  _depth + 1)
        return wave, orig_sr

    def _load_resampled(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """(wave_sr, wave_16k) for one item, HOST-side and cached.

        Two lessons measured on the axon tunnel (round 4): the device
        resampler here cost ~2 tunnel round-trips per item per batch and
        serialized with the train step on the single device queue
        (~0.8 s/batch — the dominant on-the-fly training cost), and
        re-decoding+resampling every epoch re-paid it forever.  Fine-tune
        sets are small and reiterated every epoch, so resampled waves are
        cached up to ``cache_bytes`` (~2 GiB default ≈ 3.5 h of audio);
        past the bound items are recomputed per epoch."""
        hit = self._cache.get(idx)
        if hit is not None:
            return hit
        from seedvc_tpu.dsp.resample import resample_host

        w, osr = self.load_item(idx)
        item = (resample_host(w, osr, self.sr),
                resample_host(w, osr, 16000))
        size = item[0].nbytes + item[1].nbytes
        if self._cache_used + size <= self.cache_bytes:
            self._cache[idx] = item
            self._cache_used += size
        return item

    def batches(self, shuffle: bool = True, epoch: int = 0) -> Iterator[Batch]:
        order = np.arange(len(self.files))
        if shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
            idxs = order[start: start + self.batch_size]
            waves, waves16 = [], []
            for i in idxs:
                w_sr, w_16 = self._load_resampled(int(i))
                waves.append(w_sr)
                waves16.append(w_16)
            maxw = max(len(w) for w in waves)
            maxw16 = max(len(w) for w in waves16)
            B = len(waves)
            out_w = np.zeros((B, maxw), np.float32)
            out_w16 = np.zeros((B, maxw16), np.float32)
            lens = np.zeros(B, np.int32)
            lens16 = np.zeros(B, np.int32)
            for b, (w, w16) in enumerate(zip(waves, waves16)):
                out_w[b, : len(w)] = w
                out_w16[b, : len(w16)] = w16
                lens[b] = len(w)
                lens16[b] = len(w16)
            yield Batch(out_w, out_w16, lens, lens16,
                        ids=np.asarray(idxs, np.int64))
