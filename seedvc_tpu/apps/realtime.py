"""Real-time voice conversion frontend.

TPU-native analogue of the reference ``real-time-gui.py`` (SURVEY §3.3)
without the GUI toolkit dependency: a CLI that drives
:class:`seedvc_tpu.pipelines.streaming.StreamingConverter` either

- **live** from an audio device (requires the optional ``sounddevice``
  package — the reference's backend, ``real-time-gui.py:969-977``), or
- **simulated** from a wav file (``--simulate``), feeding fixed-size blocks
  exactly as the device callback would — optionally paced at real time —
  and reporting the same latency metrics the reference GUI displays
  (inference time per block, total delay, ``real-time-gui.py:789-800``,
  ``:1127-1131``).

Settings persist to a JSON file between runs (the reference persists GUI
state to ``configs/inuse/config.json``, ``real-time-gui.py:444-449``).

    python -m seedvc_tpu.apps.realtime --reference ref.wav \
        --simulate input.wav --output out.wav --block-time 0.25

    python -m seedvc_tpu.apps.realtime --reference ref.wav \
        --input-device 1 --output-device 3   # live (needs sounddevice)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from seedvc_tpu.core.utils import str2bool


SETTINGS_PATH = os.path.join("configs", "inuse", "realtime.json")
SETTING_KEYS = ("preset", "block_time", "crossfade_time", "extra_time_ce",
                "extra_time_dit", "extra_time_right", "diffusion_steps",
                "cfg_rate", "max_prompt_time", "vad_threshold_db")


def load_settings(path: str = SETTINGS_PATH) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_settings(values: dict, path: str = SETTINGS_PATH) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({k: values[k] for k in SETTING_KEYS if k in values}, f,
                  indent=2)


def build_streamer(args, params: dict):
    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.pipelines.convert import VoiceConverter
    from seedvc_tpu.pipelines.streaming import StreamConfig, StreamingConverter

    cfg = get_preset(args.preset)
    converter = VoiceConverter(cfg, **params)
    scfg = StreamConfig(
        block_time=args.block_time,
        crossfade_time=args.crossfade_time,
        extra_time_ce=args.extra_time_ce,
        extra_time_dit=args.extra_time_dit,
        extra_time_right=args.extra_time_right,
        diffusion_steps=args.diffusion_steps,
        cfg_rate=args.cfg_rate,
        max_prompt_time=args.max_prompt_time,
        vad_threshold_db=args.vad_threshold_db,
    )
    return StreamingConverter(converter, scfg)


def algorithmic_delay_ms(streamer) -> float:
    # block*2 + extra_right, the reference's published formula (README.md:156)
    sr = streamer.sr
    return 1000.0 * (2 * streamer.block + streamer.extra_right) / sr


def run_simulated(streamer, args) -> None:
    import numpy as np

    from seedvc_tpu.apps.audio_io import load_wav, save_wav
    from seedvc_tpu.dsp.resample import resample
    import jax.numpy as jnp

    wave, sr = load_wav(args.simulate)
    wave = np.asarray(resample(jnp.asarray(wave), sr, streamer.sr))
    block = streamer.block
    n_blocks = max(-(-len(wave) // block), 1)  # ceil: pad the last block
    wave = np.pad(wave, (0, n_blocks * block - len(wave)))

    block_s = block / streamer.sr
    out_blocks, times = [], []
    for i in range(n_blocks):
        t0 = time.perf_counter()
        out_blocks.append(streamer.process_block(wave[i * block:(i + 1) * block]))
        dt = time.perf_counter() - t0
        times.append(dt)
        if args.realtime_pace and dt < block_s:
            time.sleep(block_s - dt)

    out = np.concatenate(out_blocks)
    if args.output:
        save_wav(args.output, out, streamer.sr)
        print(f"saved: {args.output}")

    warm = times[1:] if len(times) > 1 else times
    print(json.dumps({
        "blocks": n_blocks,
        "block_ms": round(block_s * 1000, 1),
        "infer_ms_mean": round(1000 * sum(warm) / len(warm), 1),
        "infer_ms_max": round(1000 * max(warm), 1),
        "occupancy": round(sum(warm) / len(warm) / block_s, 3),
        "algorithmic_delay_ms": round(algorithmic_delay_ms(streamer), 1),
        "realtime_ok": max(warm) < block_s,
    }))


def run_live(streamer, args) -> None:  # pragma: no cover - needs audio HW
    try:
        import sounddevice as sd
    except ImportError:
        sys.exit("live mode requires the optional 'sounddevice' package; "
                 "use --simulate <wav> for file-driven streaming instead")
    import numpy as np

    block = streamer.block
    infer_ms = [0.0]

    def callback(indata, outdata, frames, time_info, status):
        # device callback == reference audio_callback (real-time-gui.py:994)
        if status:
            print(status, file=sys.stderr)
        t0 = time.perf_counter()
        mono = indata.mean(axis=1).astype(np.float32)
        out = streamer.process_block(mono)
        outdata[:] = out[:, None]
        infer_ms[0] = (time.perf_counter() - t0) * 1000

    with sd.Stream(samplerate=streamer.sr, blocksize=block,
                   device=(args.input_device, args.output_device),
                   channels=1, dtype="float32", callback=callback):
        print(f"streaming at {streamer.sr} Hz, block {block} samples "
              f"({block / streamer.sr * 1000:.0f} ms); "
              f"algorithmic delay {algorithmic_delay_ms(streamer):.0f} ms; "
              "Ctrl-C to stop")
        try:
            while True:
                time.sleep(1.0)
                print(f"\rinfer {infer_ms[0]:6.1f} ms", end="", flush=True)
        except KeyboardInterrupt:
            print()


def main(argv=None):
    saved = load_settings()
    ap = argparse.ArgumentParser(description="seedvc_tpu real-time VC")
    ap.add_argument("--reference", required=True, help="reference voice wav")
    ap.add_argument("--preset", default=saved.get("preset", "xlsr_tiny"))
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--simulate", help="input wav: file-driven streaming")
    ap.add_argument("--output", help="output wav (simulate mode)")
    ap.add_argument("--realtime-pace", type=str2bool, default=False,
                    help="simulate mode: sleep to pace blocks at real time")
    ap.add_argument("--input-device", type=int, default=None)
    ap.add_argument("--output-device", type=int, default=None)
    ap.add_argument("--list-devices", action="store_true")
    ap.add_argument("--block-time", type=float,
                    default=saved.get("block_time", 0.25))
    ap.add_argument("--crossfade-time", type=float,
                    default=saved.get("crossfade_time", 0.04))
    ap.add_argument("--extra-time-ce", type=float,
                    default=saved.get("extra_time_ce", 2.5))
    ap.add_argument("--extra-time-dit", type=float,
                    default=saved.get("extra_time_dit", 0.5))
    ap.add_argument("--extra-time-right", type=float,
                    default=saved.get("extra_time_right", 0.02))
    ap.add_argument("--diffusion-steps", type=int,
                    default=saved.get("diffusion_steps", 10))
    ap.add_argument("--cfg-rate", type=float, default=saved.get("cfg_rate", 0.7))
    ap.add_argument("--max-prompt-time", type=float,
                    default=saved.get("max_prompt_time", 3.0))
    ap.add_argument("--vad-threshold-db", type=float,
                    default=saved.get("vad_threshold_db", -60.0))
    ap.add_argument("--save-settings", type=str2bool, default=True)
    args = ap.parse_args(argv)

    if args.list_devices:
        try:
            import sounddevice as sd
            print(sd.query_devices())
        except ImportError:
            print("sounddevice not installed; live mode unavailable "
                  "(simulate mode works without it)")
        return

    from seedvc_tpu.pipelines.wrapper import load_params_dir

    params = load_params_dir(args.checkpoint_dir)
    if not params:
        print("[warn] no --checkpoint-dir: RANDOM weights (latency smoke "
              "mode)", file=sys.stderr)

    streamer = build_streamer(args, params)

    from seedvc_tpu.apps.audio_io import load_wav

    ref, ref_sr = load_wav(args.reference)
    streamer.set_reference(ref, ref_sr)

    if args.save_settings:
        save_settings(vars(args))

    if args.simulate:
        run_simulated(streamer, args)
    else:
        run_live(streamer, args)


if __name__ == "__main__":
    main()
