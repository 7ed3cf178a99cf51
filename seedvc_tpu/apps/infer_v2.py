"""v2 (accent/style conversion) CLI — analogue of ``inference_v2.py``.

    python -m seedvc_tpu.apps.infer_v2 --source a.wav --target ref.wav \
        --output out/ --diffusion-steps 30 --convert-style true
"""

from __future__ import annotations

import argparse

from seedvc_tpu.core.utils import str2bool
import os
import pickle
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="seedvc_tpu v2 voice/accent conversion")
    ap.add_argument("--source", required=True)
    ap.add_argument("--target", required=True)
    ap.add_argument("--output", default="./out_v2")
    ap.add_argument("--diffusion-steps", type=int, default=30)
    ap.add_argument("--length-adjust", type=float, default=1.0)
    ap.add_argument("--intelligibility-cfg-rate", type=float, default=0.7)
    ap.add_argument("--similarity-cfg-rate", type=float, default=0.7)
    ap.add_argument("--convert-style", type=str2bool, default=True)
    ap.add_argument("--anonymization-only", type=str2bool, default=False)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--repetition-penalty", type=float, default=1.0)
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args(argv)

    from seedvc_tpu.apps.audio_io import load_wav, save_wav
    from seedvc_tpu.pipelines.convert_v2 import V2Config, VoiceConverterV2

    params = {}
    if args.checkpoint_dir:
        from seedvc_tpu.pipelines.convert_v2 import V2_PARAM_NAMES

        for name in V2_PARAM_NAMES:
            p = os.path.join(args.checkpoint_dir, f"{name}.pkl")
            if os.path.exists(p):
                with open(p, "rb") as f:
                    params[name] = pickle.load(f)
    else:
        print("[warn] no --checkpoint-dir: RANDOM weights (smoke/perf mode)",
              file=sys.stderr)

    converter = VoiceConverterV2(V2Config(), params=params or None)

    src, src_sr = load_wav(args.source)
    ref, ref_sr = load_wav(args.target)
    sr, wave, stats = converter.convert_voice(
        src, src_sr, ref, ref_sr,
        convert_style=args.convert_style,
        anonymization_only=args.anonymization_only,
        diffusion_steps=args.diffusion_steps,
        length_adjust=args.length_adjust,
        intelligibility_cfg_rate=args.intelligibility_cfg_rate,
        similarity_cfg_rate=args.similarity_cfg_rate,
        top_p=args.top_p, temperature=args.temperature,
        repetition_penalty=args.repetition_penalty)

    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(
        args.output,
        f"vc_v2_{os.path.basename(args.source).split('.')[0]}_"
        f"{os.path.basename(args.target).split('.')[0]}.wav")
    save_wav(out_path, wave, sr)
    print(f"RTF: {stats['rtf']:.4f}  wide_tokens={stats['wide_tokens']}")
    print(f"saved: {out_path}")


if __name__ == "__main__":
    main()
