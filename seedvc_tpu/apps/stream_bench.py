"""Realtime streaming latency benchmark on the current JAX device.

Mirrors the reference's headline realtime measurement (README.md:138-142:
150 ms inference per 0.18 s block at 10 diffusion steps, cfg 0.7, 3 s prompt
on an RTX 3060): runs the full per-block path (ring buffers -> whisper ->
regulate -> 10-step CFM -> vocoder -> SOLA) with the realtime model
(xlsr-tiny shape; random weights — latency is weight-independent) and prints
per-block wall time.

    python -m seedvc_tpu.apps.stream_bench [--block-time 0.25] [--steps 10]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="xlsr_tiny")
    ap.add_argument("--block-time", type=float, default=0.25)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--n-blocks", type=int, default=20)
    ap.add_argument("--use-whisper-small", action="store_true",
                    help="use whisper-small as content encoder (v1 default "
                         "shape) instead of the tiny test encoder")
    args = ap.parse_args(argv)

    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.models.whisper import WHISPER_SMALL, WhisperEncoderConfig
    from seedvc_tpu.pipelines.convert import VoiceConverter
    from seedvc_tpu.pipelines.streaming import StreamConfig, StreamingConverter

    cfg = get_preset(args.preset)
    # The realtime reference uses XLSR (1024-d) as content encoder; our
    # whisper-small encoder stands in with the same budget class (768-d,
    # 12 layers).  Content dim follows the preset's regulator input.
    wcfg = WHISPER_SMALL
    if cfg.model_params.length_regulator.in_channels != wcfg.d_model:
        wcfg = WhisperEncoderConfig(
            d_model=cfg.model_params.length_regulator.in_channels,
            n_layers=12, n_heads=16,
            ffn_dim=4 * cfg.model_params.length_regulator.in_channels)

    conv = VoiceConverter(cfg, whisper_cfg=wcfg)
    # VAD gate OFF: the bench drives white-noise blocks, which the
    # dual-feature VAD correctly rejects as non-speech — with the gate on
    # it would time the skip path, not the conversion path.
    scfg = StreamConfig(block_time=args.block_time,
                        diffusion_steps=args.steps,
                        vad_threshold_db=-10000.0)
    stream = StreamingConverter(conv, scfg)

    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(22050 * 3) * 0.1).astype(np.float32)
    t0 = time.perf_counter()
    stream.set_reference(ref, 22050)
    print(f"set_reference: {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(args.n_blocks):
        block = (rng.standard_normal(stream.block) * 0.1).astype(np.float32)
        t0 = time.perf_counter()
        out = stream.process_block(block)
        dt = time.perf_counter() - t0
        times.append(dt)
        if i < 3 or i == args.n_blocks - 1:
            print(f"block {i}: {dt*1000:.1f} ms (budget {args.block_time*1000:.0f} ms)")
    steady = np.median(times[3:])
    print(f"steady-state per-block: {steady*1000:.1f} ms for "
          f"{args.block_time*1000:.0f} ms blocks -> "
          f"{'REALTIME OK' if steady < args.block_time else 'TOO SLOW'} "
          f"(occupancy {steady/args.block_time*100:.0f}%)")
    print(f"algorithmic delay ~ {(args.block_time + scfg.crossfade_time + scfg.extra_time_right)*1000:.0f} ms + device time")


if __name__ == "__main__":
    main()
