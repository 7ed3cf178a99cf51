"""Objective evaluation harness (SECS / conversion-quality metrics).

TPU-native analogue of the reference ``eval.py`` (SURVEY §2.8): converts a
directory of source utterances against a directory of reference voices and
scores them.

Metrics:
- SECS (speaker-embedding cosine similarity).  ``--xvector-extractor wavlm``
  scores with the WavLM x-vector port (``models/wavlm_sv.py``; the reference
  default, ``eval.py:293-303`` loads microsoft/wavlm-base-plus-sv — convert
  it with ``seedvc_tpu.convert.wavlm_sv`` and pass ``--xvector-checkpoint``).
  CAMPPlus — the encoder the model conditions on — is reported as a
  secondary ``secs_campplus`` column (primary scoring with it would be
  self-grading).
- WER/CER via a *local* HF CTC ASR checkpoint (``--asr-model``; the
  reference uses hubert-large-ls960-ft + jiwer — edit distances are
  computed natively in ``seedvc_tpu.apps.metrics``). Ground-truth
  transcripts come from ``--transcripts`` (TSV: filename<TAB>text, the
  reference's index.tsv format, ``eval.py:334-338``); without them the
  source's own ASR transcript is the reference text.
- DNSMOS SIG/BAK/OVRL via ``--dnsmos-dir`` pointing at the published ONNX
  models (gated on onnxruntime).
- ``--baseline openvoice --baseline-checkpoint ov.pkl`` or
  ``--baseline-cmd '... {source} {reference} {output}'`` score a baseline
  system instead of the framework (reference ``baselines/*.py``).

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
    ap.add_argument("--xvector-extractor", default="campplus",
                    choices=["campplus", "wavlm"],
                    help="speaker embedding for SECS (reference eval.py:26 "
                         "defaults to wavlm-base-plus-sv)")
    ap.add_argument("--xvector-checkpoint", default=None,
                    help="wavlm extractor: pkl of converted WavLMSV params "
                         "(random init without it — scores meaningless)")
    ap.add_argument("--asr-model", default=None,
                    help="local HF CTC ASR model dir for WER/CER (optional)")
    ap.add_argument("--transcripts", default=None,
                    help="TSV of filename<TAB>ground-truth text")
    ap.add_argument("--dnsmos-dir", default=None,
                    help="dir with sig_bak_ovr.onnx (needs onnxruntime)")
    ap.add_argument("--f0-metrics", action="store_true",
                    help="F0CORR/F0RMSE source vs converted via RMVPE "
                         "(SVC presets; reference EVAL.md:62-70)")
    ap.add_argument("--baseline", default=None,
                    choices=["openvoice", "cosyvoice", "command"],
                    help="score a baseline system instead of the framework")
    ap.add_argument("--baseline-checkpoint", default=None,
                    help="openvoice baseline: converted openvoice.pkl")
    ap.add_argument("--baseline-cmd", default=None,
                    help="command baseline template with {source} "
                         "{reference} {output}")
    ap.add_argument("--cosyvoice-dir", default="../CosyVoice",
                    help="cosyvoice baseline: sibling checkout path "
                         "(reference baselines/cosyvoice.py:5-7)")
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

    # speaker-embedding extractor for the primary SECS score
    if args.xvector_extractor == "wavlm":
        import jax

        from seedvc_tpu.models.wavlm_sv import WAVLM_BASE_PLUS_SV, WavLMSV

        wavlm = WavLMSV(WAVLM_BASE_PLUS_SV)
        if args.xvector_checkpoint:
            with open(args.xvector_checkpoint, "rb") as f:
                wavlm_params = pickle.load(f)
        else:
            print("WARNING: --xvector-extractor wavlm without "
                  "--xvector-checkpoint: random weights, SECS meaningless")
            wavlm_params = jax.jit(wavlm.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 16000)))["params"]
        _wavlm_fn = jax.jit(
            lambda p, w, l: wavlm.apply({"params": p}, w, lengths=l))

        def embed(wave_16k):
            # 5 s buckets -> few compiles; the true length flows in as a
            # traced arg so padding is masked out of normalization,
            # attention and stats pooling (HF attention_mask semantics) —
            # embeddings match the unpadded forward.
            bucket = 5 * 16000
            n = -(-max(len(wave_16k), 8000) // bucket) * bucket
            padded = np.zeros(n, np.float32)
            padded[: len(wave_16k)] = wave_16k
            return _wavlm_fn(wavlm_params, jnp.asarray(padded[None]),
                             jnp.asarray([len(wave_16k)], jnp.int32))
    else:
        def embed(wave_16k):
            return converter.compute_style(wave_16k)

    baseline = None
    if args.baseline:
        from seedvc_tpu.apps.baselines import get_baseline

        baseline = get_baseline(
            args.baseline, checkpoint_pkl=args.baseline_checkpoint,
            template=args.baseline_cmd, repo_dir=args.cosyvoice_dir)

    transcripts = {}
    if args.transcripts:
        with open(args.transcripts) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 2:
                    transcripts[os.path.splitext(parts[0])[0]] = parts[1]

    transcriber = None
    if args.asr_model:
        from seedvc_tpu.apps.metrics import CTCTranscriber

        transcriber = CTCTranscriber(args.asr_model)

    dnsmos = None
    if args.dnsmos_dir:
        from seedvc_tpu.apps.metrics import DNSMOS

        dnsmos = DNSMOS(args.dnsmos_dir)

    sources = scan_audio_files(args.source_dir)[: args.max_samples]
    targets = scan_audio_files(args.target_dir)

    os.makedirs(args.output, exist_ok=True)
    results = []
    for ti, tgt_path in enumerate(targets):
        ref, ref_sr = load_wav(tgt_path)
        ref_16k = np.asarray(resample(jnp.asarray(ref), ref_sr, 16000))
        ref_emb = embed(ref_16k)
        # secondary CAMPPlus SECS; with the campplus extractor embed() IS
        # compute_style — reuse it instead of a second device dispatch.
        ref_emb_cp = (ref_emb if args.xvector_extractor == "campplus"
                      else converter.compute_style(ref_16k))
        for si, src_path in enumerate(sources):
            src, src_sr = load_wav(src_path)
            out_name = (f"{os.path.basename(tgt_path).split('.')[0]}_"
                        f"{os.path.basename(src_path).split('.')[0]}.wav")
            out_path = os.path.join(args.output, out_name)
            if os.path.exists(out_path):  # cache + resume (eval.py:361-368)
                wave, sr = load_wav(out_path)
            elif baseline is not None:
                baseline.convert(src_path, tgt_path, out_path)
                wave, sr = load_wav(out_path)
            else:
                sr, wave, _ = converter.convert(
                    src, src_sr, ref, ref_sr,
                    diffusion_steps=args.diffusion_steps,
                    cfg_rate=args.inference_cfg_rate)
                save_wav(out_path, wave, sr)
            conv_16k = np.asarray(resample(jnp.asarray(wave), sr, 16000))
            conv_emb = embed(conv_16k)
            row = {"source": src_path, "target": tgt_path,
                   "secs": secs(conv_emb, ref_emb)}
            if args.xvector_extractor != "campplus":
                # CAMPPlus similarity kept as a secondary column (it is the
                # conditioning encoder — self-grading if used as primary)
                row["secs_campplus"] = secs(
                    converter.compute_style(conv_16k), ref_emb_cp)

            if transcriber is not None:
                from seedvc_tpu.apps.metrics import cer, wer

                hyp = transcriber.transcribe(conv_16k)
                src_key = os.path.splitext(os.path.basename(src_path))[0]
                ref_text = transcripts.get(src_key)
                if ref_text is None:
                    src_16k = np.asarray(
                        resample(jnp.asarray(src), src_sr, 16000))
                    ref_text = transcriber.transcribe(src_16k)
                row["wer"] = wer(ref_text, hyp)
                row["cer"] = cer(ref_text, hyp)

            if dnsmos is not None:
                row.update({f"dnsmos_{k}": v
                            for k, v in dnsmos.score(conv_16k).items()})

            if args.f0_metrics and converter.rmvpe is not None:
                from seedvc_tpu.apps.metrics import f0_metrics

                src_16k = np.asarray(
                    resample(jnp.asarray(src), src_sr, 16000))
                f0_src = converter.rmvpe.infer_from_audio_batch(
                    src_16k[None])[0]
                f0_conv = converter.rmvpe.infer_from_audio_batch(
                    conv_16k[None])[0]
                row.update(f0_metrics(f0_src, f0_conv))

            results.append(row)
            print(f"[{ti}:{si}] SECS={row['secs']:.4f} {out_name}")

    summary = {"n": len(results)}
    for metric in ("secs", "secs_campplus", "wer", "cer", "dnsmos_sig",
                   "dnsmos_bak", "dnsmos_ovrl", "dnsmos_p808", "f0_corr",
                   "f0_rmse_cents"):
        vals = [r[metric] for r in results
                if metric in r and np.isfinite(r[metric])]
        if vals:
            summary[f"mean_{metric}"] = float(np.mean(vals))

    with open(os.path.join(args.output, "results.json"), "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
