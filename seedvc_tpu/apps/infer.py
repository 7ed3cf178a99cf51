"""Offline voice conversion CLI.

TPU-native analogue of the reference ``python inference.py`` entry point
(``inference.py:538-552``):

    python -m seedvc_tpu.apps.infer --source a.wav --target ref.wav \
        --output out/ --diffusion-steps 25 --inference-cfg-rate 0.7

Without converted checkpoints (``--checkpoint-dir``) the models run with
random weights — useful for latency/throughput smoke runs only.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

from seedvc_tpu.core.utils import str2bool


def main(argv=None):
    ap = argparse.ArgumentParser(description="seedvc_tpu offline VC")
    ap.add_argument("--source", help="source wav (or use --source-dir)")
    ap.add_argument("--source-dir", help="batch mode: convert every audio file in this directory")
    ap.add_argument("--target", required=True, help="reference voice wav")
    ap.add_argument("--output", default="./out")
    ap.add_argument("--preset", default="whisper_small_wavenet")
    ap.add_argument("--diffusion-steps", type=int, default=25)
    ap.add_argument("--length-adjust", type=float, default=1.0)
    ap.add_argument("--f0-condition", type=str2bool, default=False,
                    help="SVC mode: F0-conditioned 44.1 kHz model (reference "
                         "inference.py:546 selects its checkpoint the same "
                         "way; here it selects the whisper_base_f0_44k "
                         "preset unless --preset is already F0-conditioned)")
    ap.add_argument("--auto-f0-adjust", type=str2bool, default=False,
                    help="match source median log-F0 to the reference's "
                         "(inference.py:547)")
    ap.add_argument("--semi-tone-shift", type=float, default=0.0,
                    help="pitch shift in semitones applied to voiced frames "
                         "(inference.py:548)")
    ap.add_argument("--inference-cfg-rate", type=float, default=0.7)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="directory with converted .pkl parameter trees")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--profile", action="store_true",
                    help="print per-stage device timings (adds host syncs)")
    ap.add_argument("--compute-dtype", default=None,
                    choices=("bfloat16", "float32"),
                    help="sampler + content-encoder compute dtype (default: "
                         "bfloat16 on TPU, float32 elsewhere — the analogue "
                         "of the reference's --fp16 flag)")
    args = ap.parse_args(argv)

    from seedvc_tpu.apps.audio_io import load_wav, save_wav
    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.pipelines.convert import VoiceConverter

    cfg = get_preset(args.preset)
    if args.f0_condition and not cfg.model_params.DiT.f0_condition:
        # The reference CLI switches checkpoint set (22k -> 44.1k F0 model)
        # on this flag (inference.py:47-60, :368); presets carry that
        # choice here.
        print(f"[info] --f0-condition: preset {args.preset!r} is not "
              "F0-conditioned, using 'whisper_base_f0_44k'", file=sys.stderr)
        args.preset = "whisper_base_f0_44k"
        cfg = get_preset(args.preset)

    params = {}
    if args.checkpoint_dir:
        for name in ("vc", "whisper", "campplus", "vocoder", "rmvpe"):
            path = os.path.join(args.checkpoint_dir, f"{name}.pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    params[f"{name}_params"] = pickle.load(f)
    else:
        print("[warn] no --checkpoint-dir: running with RANDOM weights "
              "(smoke/perf mode)", file=sys.stderr)

    if args.compute_dtype:
        import jax.numpy as jnp

        params["compute_dtype"] = (jnp.bfloat16
                                   if args.compute_dtype == "bfloat16"
                                   else jnp.float32)
    converter = VoiceConverter(cfg, seed=args.seed, **params)

    if args.source_dir:
        from seedvc_tpu.train.dataset import scan_audio_files

        sources = scan_audio_files(args.source_dir)
    elif args.source:
        sources = [args.source]
    else:
        ap.error("one of --source / --source-dir is required")

    ref, ref_sr = load_wav(args.target)
    ref_name = os.path.splitext(os.path.basename(args.target))[0]
    os.makedirs(args.output, exist_ok=True)
    for source in sources:
        src, src_sr = load_wav(source)
        sr, wave, stats = converter.convert(
            src, src_sr, ref, ref_sr,
            diffusion_steps=args.diffusion_steps,
            length_adjust=args.length_adjust,
            cfg_rate=args.inference_cfg_rate,
            auto_f0_adjust=args.auto_f0_adjust,
            pitch_shift=args.semi_tone_shift,
            seed=args.seed,
            profile=args.profile,
        )
        if args.profile:
            for stage, rec in stats["stages"].items():
                print(f"  {stage:<10} {rec['seconds']:7.3f}s "
                      f"({rec['calls']} calls)")
        src_name = os.path.splitext(os.path.basename(source))[0]
        out_path = os.path.join(
            args.output,
            f"vc_{src_name}_{ref_name}_{args.length_adjust}"
            f"_{args.diffusion_steps}_{args.inference_cfg_rate}.wav")
        save_wav(out_path, wave, sr)
        print(f"RTF: {stats['rtf']:.4f}  ({stats['audio_seconds']:.2f}s audio "
              f"in {stats['wall_seconds']:.2f}s, {stats['chunks']} chunks)")
        print(f"saved: {out_path}")


if __name__ == "__main__":
    main()
