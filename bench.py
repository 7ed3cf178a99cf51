"""North-star benchmark: offline VC mel-generation throughput on one chip.

Measures audio-seconds generated per wall-second for the flagship model
(seed-uvit-whisper-small-wavenet, 98M DiT + WaveNet post-net) running the
full 25-step Euler CFM sampler with CFG (2x stacked batch) over a 30-second
context window — the reference's standard inference configuration
(``EVAL.md:41-52``: 25 diffusion steps, cfg 0.7; 30 s context window,
``inference.py:470``).

Baseline: the reference publishes no offline RTF; its only latency figure is
the real-time path — 0.18 s of audio in 150 ms at 10 steps on an RTX 3060
(README.md:138-142), i.e. 1.2 audio-seconds/s.  vs_baseline is measured
against that (conservative: we run 25 steps, not 10).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus one
sub-object per pipeline leg, each run in an isolated child process with a
hard timeout (VERDICT r3 next #1 — every headline number driver-visible):

- ``e2e``          offline v1 pipeline audio-s/s (best + median of >=4 warm
                   reps) with probe-synced stage attribution,
- ``v2``           v2 accent conversion RTF (batched AR + 3-way CFG + vocoder),
- ``streaming``    realtime steady-state ms per 0.18 s block at 10 steps,
- ``ar_decode``    AR decode tokens/s at B=1 and B=4,
- ``train_onfly``  on-the-fly fine-tuning steps/s (prefetch vs sync).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from seedvc_tpu.core.config import get_preset
from seedvc_tpu.models.cfm import CFM, euler_solve

BASELINE_AUDIO_SEC_PER_S = 1.2  # RTX 3060 realtime block ratio (see above)


def _signal(seconds, seed, sr, f0=150.0):
    import numpy as np

    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = sum((0.3 / h) * np.sin(2 * np.pi * f0 * h * t) for h in (1, 2, 3))
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def bench_e2e(n_steps: int = 25, warm_reps: int = 4) -> dict:
    """Warm FULL-pipeline throughput: whisper -> regulate -> 25-step CFM ->
    BigVGAN -> crossfade on a 30 s source (the reference's RTF,
    ``inference.py:530``).  Random weights (timing is weight-independent).
    Reports best AND median over ``warm_reps`` warm runs: best-of-2 was too
    few to separate regression from the pool's documented multi-hour
    congestion episodes (VERDICT r3 weak #1)."""
    import dataclasses

    import numpy as np

    from seedvc_tpu.pipelines.convert import VoiceConverter

    cfg = get_preset("whisper_small_wavenet")
    cfg = dataclasses.replace(cfg, model_params=dataclasses.replace(
        cfg.model_params, DiT=dataclasses.replace(
            cfg.model_params.DiT, use_flash_attention=True)))
    vc = VoiceConverter(cfg, compute_dtype=jnp.bfloat16)
    sr = vc.sr

    src = _signal(30.0, 0, sr)
    ref = _signal(5.0, 1, sr, f0=220.0)

    t0 = time.perf_counter()
    vc.convert(src, sr, ref, sr, diffusion_steps=n_steps)  # compile
    compile_s = time.perf_counter() - t0
    print(f"e2e compile+first conversion: {compile_s:.1f}s", file=sys.stderr)

    # device-time stage attribution via constant-cost probe syncs
    # (core/profiling.probe_ready): totals track the unprofiled wall.
    # First profiled run compiles the per-shape probe programs (~0.7 s
    # each through the tunnel) — report the SECOND, probe-warm run.
    vc.convert(src, sr, ref, sr, diffusion_steps=n_steps, profile=True)
    _, _, pstats = vc.convert(src, sr, ref, sr, diffusion_steps=n_steps,
                              profile=True)
    walls = sorted(
        vc.convert(src, sr, ref, sr, diffusion_steps=n_steps, seed=i + 1)[2]
        ["wall_seconds"] for i in range(warm_reps))
    best = walls[0]
    median = walls[(len(walls) - 1) // 2]
    audio_s = len(src) / sr
    print(f"e2e warm: best {best:.3f}s / median {median:.3f}s over "
          f"{warm_reps} reps for {audio_s:.0f}s audio; stages "
          f"{pstats['stages']}", file=sys.stderr)
    return {
        "metric": "offline_vc_pipeline_throughput",
        "value": round(audio_s / best, 3),
        "median_value": round(audio_s / median, 3),
        "unit": "audio_seconds_per_second",
        "rtf": round(best / audio_s, 5),
        "rtf_median": round(median / audio_s, 5),
        "warm_reps": warm_reps,
        "profiled_wall_s": round(pstats["wall_seconds"], 3),
        "stages_profiled_s": {k: round(v["seconds"], 4)
                              for k, v in pstats["stages"].items()},
    }


def bench_streaming(block_time: float = 0.18, steps: int = 10,
                    n_blocks: int = 16) -> dict:
    """Realtime streaming steady-state ms/block at the reference's headline
    settings (10 diffusion steps, 0.18 s block — README.md:138-142: 150 ms
    inference per block on an RTX 3060).  Runs the xlsr-tiny realtime model
    (HiFT vocoder) through the fused one-dispatch block program with the
    VAD gate off (white-noise input would otherwise time the skip path)."""
    import numpy as np

    from seedvc_tpu.models.whisper import WHISPER_SMALL, WhisperEncoderConfig
    from seedvc_tpu.pipelines.convert import VoiceConverter
    from seedvc_tpu.pipelines.streaming import StreamConfig, StreamingConverter

    cfg = get_preset("xlsr_tiny")
    wcfg = WHISPER_SMALL
    if cfg.model_params.length_regulator.in_channels != wcfg.d_model:
        wcfg = WhisperEncoderConfig(
            d_model=cfg.model_params.length_regulator.in_channels,
            n_layers=12, n_heads=16,
            ffn_dim=4 * cfg.model_params.length_regulator.in_channels)
    conv = VoiceConverter(cfg, whisper_cfg=wcfg)
    scfg = StreamConfig(block_time=block_time, diffusion_steps=steps,
                        vad_threshold_db=-10000.0)
    stream = StreamingConverter(conv, scfg)

    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(conv.sr * 3) * 0.1).astype(np.float32)
    t0 = time.perf_counter()
    stream.set_reference(ref, conv.sr)
    print(f"streaming set_reference (compile): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(n_blocks):
        block = (rng.standard_normal(stream.block) * 0.1).astype(np.float32)
        t0 = time.perf_counter()
        stream.process_block(block)
        times.append(time.perf_counter() - t0)
    steady = float(np.median(times[3:]))
    print(f"streaming blocks ms: "
          f"{['%.0f' % (t * 1e3) for t in times]}", file=sys.stderr)
    return {
        "metric": "streaming_block_latency",
        "value": round(steady * 1e3, 1),
        "unit": "ms_per_block",
        "block_ms": round(block_time * 1e3, 1),
        "diffusion_steps": steps,
        "occupancy": round(steady / block_time, 3),
        "realtime_ok": bool(steady < block_time),
        "reference_ms": 150.0,  # RTX 3060 (README.md:138-142)
    }


def bench_v2(src_secs: float = 60.0, ref_secs: float = 3.0,
             steps: int = 30, warm_reps: int = 3) -> dict:
    """v2 accent-conversion RTF: HuBERT content -> batched AR decode ->
    3-way multi-cond CFG CFM -> BigVGAN, full-size random weights
    (reference ``inference_v2.py`` path; 60 s source so the duration-
    reduced tokens span >1500 and the AR chunks decode as ONE batched
    call — ``pipelines/convert_v2.py`` left-padded batching; the JSON
    carries ``ar_batch`` so a collapse back to B=1 is visible)."""
    import numpy as np

    from seedvc_tpu.pipelines.convert_v2 import VoiceConverterV2

    v2 = VoiceConverterV2()
    sr = v2.cfg.sr

    def chirp(secs, seed):
        # non-stationary source: a steady tone collapses ~10:1 under
        # duration reduction (measured) and never fills one 1500-token AR
        # chunk; the chirp+AM+noise mix retains ~0.6 of raw tokens
        rng = np.random.default_rng(seed)
        t = np.arange(int(secs * sr)) / sr
        f = 120 + 160 * (1 + np.sin(2 * np.pi * 0.41 * t))
        ph = np.cumsum(2 * np.pi * f / sr)
        x = 0.3 * np.sin(ph) + 0.12 * np.sin(2 * ph + 0.5)
        am = 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 1.7 * t))
        return (am * x + 0.06 * rng.standard_normal(len(t))).astype(np.float32)

    src = chirp(src_secs, 0)
    ref = _signal(ref_secs, 1, sr, f0=220.0)
    kw = dict(diffusion_steps=steps, convert_style=True)

    t0 = time.perf_counter()
    _, wave, stats = v2.convert_voice(src, sr, ref, sr, **kw)
    print(f"v2 compile+first conversion: {time.perf_counter() - t0:.1f}s "
          f"(wide_tokens {stats['wide_tokens']}, "
          f"ar_batch {stats['ar_batch']})", file=sys.stderr)

    walls = sorted(
        v2.convert_voice(src, sr, ref, sr, seed=i + 1, **kw)[2]
        ["wall_seconds"] for i in range(warm_reps))
    best, median = walls[0], walls[(len(walls) - 1) // 2]
    audio_s = len(wave) / sr
    print(f"v2 warm: best {best:.3f}s / median {median:.3f}s for "
          f"{audio_s:.1f}s audio", file=sys.stderr)
    return {
        "metric": "v2_accent_conversion_throughput",
        "value": round(audio_s / best, 3),
        "median_value": round(audio_s / median, 3),
        "unit": "audio_seconds_per_second",
        "rtf": round(best / audio_s, 5),
        "diffusion_steps": steps,
        "source_seconds": src_secs,
        "wide_tokens": int(stats["wide_tokens"]),
        "ar_batch": int(stats["ar_batch"]),
        "warm_reps": warm_reps,
    }


def bench_ar() -> dict:
    """AR incremental-decode tokens/s at B=1 and B=4 (VERDICT r2 bar:
    B=4 aggregate >= 2.5x B=1)."""
    from seedvc_tpu.apps.microbench import bench_ar_decode

    r1 = bench_ar_decode(B=1)
    r4 = bench_ar_decode(B=4)
    return {
        "metric": "ar_decode_tokens_per_s",
        "b1": r1["tokens_per_s"],
        "b4": r4["tokens_per_s"],
        "b1_ms_per_token": r1["ms_per_token"],
        "b4_vs_b1": round(r4["tokens_per_s"] / max(r1["tokens_per_s"], 1e-9),
                          2),
    }


def bench_train() -> dict:
    """On-the-fly v1 fine-tuning steps/s, prefetch worker vs synchronous
    (reference-style) schedule."""
    from seedvc_tpu.apps.microbench import bench_train_onfly

    rp = bench_train_onfly(prefetch=2)
    rs = bench_train_onfly(prefetch=0)
    return {
        "metric": "train_onfly_steps_per_s",
        "prefetch": rp["steps_per_s"],
        "sync": rs["steps_per_s"],
    }


def _run_leg(key: str, flag: str, budget_s: int) -> dict:
    """Run one benchmark leg in a CHILD process under a hard timeout.

    The big fused programs can take 3-6 min to compile through the axon
    tunnel (longer during pool congestion); isolating each leg keeps the
    main metric safe from a hung compile, and children run sequentially
    BEFORE this process touches the TPU so there is never a second active
    TPU client.
    """
    import subprocess

    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, __file__, flag],
            capture_output=True, text=True, timeout=budget_s)
    except subprocess.TimeoutExpired:
        print(f"[bench] leg {key}: TIMEOUT after {budget_s}s",
              file=sys.stderr)
        return {f"{key}_error": f"timeout after {budget_s}s"}
    sys.stderr.write(proc.stderr)
    print(f"[bench] leg {key}: {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return {key: json.loads(line)}
        except json.JSONDecodeError:
            continue
    return {f"{key}_error": f"no JSON from child (exit {proc.returncode})"}


# (key, child flag, per-leg budget seconds, leg function)
LEGS = [
    ("e2e", "--e2e-only", 1500, bench_e2e),
    ("v2", "--v2-only", 1500, bench_v2),
    ("streaming", "--streaming-only", 1100, bench_streaming),
    ("ar_decode", "--ar-only", 800, bench_ar),
    ("train_onfly", "--train-only", 1300, bench_train),
]


def main():
    import argparse
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler trace of one sampler run")
    ap.add_argument("--skip-e2e", action="store_true",
                    help="skip ALL pipeline legs (slow compiles); sampler "
                         "metric only")
    ap.add_argument("--legs", default=None,
                    help="comma-separated subset of legs to run "
                         f"({','.join(k for k, *_ in LEGS)}); default all")
    for key, flag, _budget, fn in LEGS:
        ap.add_argument(flag, dest=f"only_{key}", action="store_true",
                        help=f"(internal) run only the {key} leg")
    bench_args, _ = ap.parse_known_args()

    for key, _flag, _budget, fn in LEGS:
        if getattr(bench_args, f"only_{key}"):
            print(json.dumps(fn()))
            return

    # pipeline legs first, each in its own child, before this process opens
    # the TPU (one TPU client at a time through the tunnel).  A global
    # budget bounds the total: a congested pool degrades to fewer legs with
    # *_error notes, never a hung or overlong bench.
    leg_records: dict = {}
    want = None
    if bench_args.legs is not None:
        want = set(bench_args.legs.split(","))
    env_legs = os.environ.get("SEEDVC_BENCH_LEGS")
    if want is None and env_legs is not None:
        want = set(env_legs.split(","))
    skip_all = (bench_args.skip_e2e
                or os.environ.get("SEEDVC_BENCH_E2E") == "0")
    if not skip_all:
        deadline = time.monotonic() + int(
            os.environ.get("SEEDVC_BENCH_BUDGET_S", "5400"))
        for key, flag, leg_budget, _fn in LEGS:
            if want is not None and key not in want:
                continue
            remaining = deadline - time.monotonic()
            if remaining < 120:
                leg_records[f"{key}_error"] = "global bench budget exhausted"
                continue
            leg_records.update(
                _run_leg(key, flag, int(min(leg_budget, remaining))))

    cfg = get_preset("whisper_small_wavenet")
    # Pallas flash attention with tuned block sizes (block_q 1024 / block_k
    # 512): 2.1x faster DiT forward than XLA's materialised attention at this
    # shape (16.6 ms vs 34.9 ms, B=2 T=2560).
    mp = dataclasses.replace(
        cfg.model_params,
        DiT=dataclasses.replace(cfg.model_params.DiT,
                                use_flash_attention=True))
    sr = cfg.preprocess_params.sr
    hop = cfg.preprocess_params.spect_params.hop_length

    # ~30 s context window rounded to a flash-friendly multiple of 512:
    # prompt (3 s) + source chunk (~26.7 s).
    T = 2560
    prompt_len = int(sr / hop * 3)  # 258 frames
    n_steps = 25
    cfg_rate = 0.7
    B = 1
    C = mp.DiT.in_channels
    D = mp.DiT.content_dim
    compute_dtype = jnp.bfloat16

    cfm = CFM(mp)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, T, C), compute_dtype)
    lens = jnp.full((B,), T, jnp.int32)
    t0 = jnp.zeros((B,), jnp.float32)
    style = jax.random.normal(key, (B, mp.style_encoder.dim), compute_dtype)
    cond = jax.random.normal(key, (B, T, D), compute_dtype)
    variables = cfm.init(key, x0, x0, lens, t0, style, cond, method=cfm.estimate)
    # bf16 inference params: halves weight HBM traffic and keeps RMSNorm /
    # softmax f32 internally (reference runs fp16 on GPU by default).
    # Measured: 14.0 -> 12.5 ms/step together with the 1280/1280 flash blocks.
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)

    @jax.jit
    def sample(variables, key, cond, style):
        def estimate_fn(x, p, l, t, s, m, sc=None):
            return cfm.apply(variables, x, p, l, t, s, m, static_cond=sc,
                             method=cfm.estimate)

        def precompute_fn(x, p, l, s, m):
            return cfm.apply(variables, x, p, l, s, m,
                             method=cfm.precompute_cond)

        # x_lens=None: the 30 s window is fully used (the reference's
        # standard config), which statically removes every masking pass;
        # precompute_fn hoists the step-invariant conditioning matmuls out
        # of the 25-step scan.
        return euler_solve(
            estimate_fn, key, cond, None,
            jnp.zeros((B, T, C), compute_dtype), prompt_len, style,
            n_mels=C, n_timesteps=n_steps, cfg_rate=cfg_rate,
            precompute_fn=precompute_fn)

    import numpy as np

    # Warmup / compile.  Sync with np.asarray: through the axon tunnel,
    # block_until_ready can return before execution finishes (observed: a
    # 0.3 s program "timed" at 1 ms).
    t_compile = time.perf_counter()
    np.asarray(sample(variables, key, cond, style))
    print(f"compile+first run: {time.perf_counter() - t_compile:.1f}s",
          file=sys.stderr)

    # Queue N async calls, sync once on the last: amortises the single
    # host<->device result transfer (~0.8 MB over a ~50 MB/s tunnel link)
    # across the batch instead of paying it per measurement.
    N_CALLS = 3
    times = []
    for i in range(3):
        t0_ = time.perf_counter()
        out = None
        for j in range(N_CALLS):
            out = sample(variables, jax.random.PRNGKey(1 + i * N_CALLS + j),
                         cond, style)
        np.asarray(out)
        times.append((time.perf_counter() - t0_) / N_CALLS)
    best = min(times)

    if bench_args.trace_dir:
        from seedvc_tpu.core.profiling import trace

        with trace(bench_args.trace_dir):
            sample(variables, jax.random.PRNGKey(99), cond,
                   style).block_until_ready()
        print(f"trace written to {bench_args.trace_dir}", file=sys.stderr)

    audio_seconds = (T - prompt_len) * hop / sr
    value = audio_seconds / best
    print(f"times={['%.3f' % t for t in times]} audio_s={audio_seconds:.2f}",
          file=sys.stderr)

    # End-to-end pipeline metric (VERDICT r2 #2): the sampler above is the
    # hot kernel, but the conversion path is the north star.  Carried as
    # extra keys on the same single JSON line.
    record = {
        "metric": "offline_vc_mel_generation_throughput",
        "value": round(value, 3),
        "unit": "audio_seconds_per_second",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 3),
    }
    record.update(leg_records)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
