"""North-star benchmark: full-pipeline voice conversion throughput on one chip.

Headline metric: audio-seconds generated per wall-second for the flagship
end-to-end pipeline (seed-uvit-whisper-small-wavenet, 98M DiT + WaveNet
post-net: whisper -> regulate -> 25-step Euler CFM with CFG -> BigVGAN ->
crossfade) on a 30 s source — the reference's standard inference
configuration (``EVAL.md:41-52``: 25 diffusion steps, cfg 0.7; 30 s context
window, ``inference.py:470``).

Baseline: the reference publishes no offline RTF; its only latency figure is
the real-time path — 0.18 s of audio in 150 ms at 10 steps on an RTX 3060
(README.md:138-142), i.e. 1.2 audio-seconds/s.  vs_baseline is measured
against that (conservative: we run 25 steps, not 10).

Artifact protocol (VERDICT r4 next #1 — loss-proof): a CUMULATIVE JSON line
is printed after EVERY leg, so a driver timeout can only truncate the record,
never zero it (the driver tail-parses the last valid line).  Legs run as
child processes in priority order under a global budget
(``SEEDVC_BENCH_BUDGET_S``, default 1680 s); legs that don't fit are skipped
with an ``*_error`` note.  Every child embeds a congestion probe
(tiny-matmul dispatch ms + tunnel MB/s, before AND after the leg) so a
pool-congestion episode is visible IN the artifact, not just in prose.

Legs:

- ``e2e``          offline v1 pipeline audio-s/s (best + median + per-rep
                   walls) with probe-synced stage attribution,
- ``streaming``    realtime steady-state ms per 0.18 s block at 10 steps,
                   with dispatch/sync breakdown and a zero-new-compile
                   assertion after ``set_reference`` (warm start),
- ``v2``           v2 accent conversion RTF (batched AR + 3-way CFG +
                   vocoder) with per-rep walls + recompile guard,
- ``ar_decode``    AR decode tokens/s at B=1/B=4 AND the 25-step CFM
                   sampler kernel (the r1-r3 headline, ``sampler`` sub-key),
- ``train_onfly``  v1 on-the-fly fine-tuning steps/s (prefetch vs sync,
                   ONE trainer so the comparison shares compiles),
- ``train_v2``     v2 on-the-fly fine-tuning steps/s (VERDICT r4 next #6),
- ``streaming2``   second block size (0.5 s) for the latency/occupancy
                   curve (VERDICT r4 next #7).

The JAX persistent compilation cache is enabled (``.cache/jaxcomp``):
measured working through the axon tunnel this round, it converts the
multi-minute per-process XLA compiles into cache hits on repeat runs, which
is what keeps the full leg set inside the driver's timeout.  ``compile_s``
fields therefore measure cache state, not code speed — the warm-rep numbers
are the performance record.
"""

from __future__ import annotations

import json
import os
import sys
import time

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".cache", "jaxcomp")
os.makedirs(_CACHE_DIR, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

BASELINE_AUDIO_SEC_PER_S = 1.2  # RTX 3060 realtime block ratio (see above)


def _signal(seconds, seed, sr, f0=150.0):
    import numpy as np

    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = sum((0.3 / h) * np.sin(2 * np.pi * f0 * h * t) for h in (1, 2, 3))
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def congestion_probe(reps: int = 5) -> dict:
    """Pool-health instrument (VERDICT r4 weak #2: the band's instrument
    must be IN the artifact).  Measures the two tunnel characteristics that
    the verify-skill notes identify as the dominant measurement noise:
    per-dispatch round-trip (tiny matmul, ~10-25 ms healthy, >100 ms
    congested) and effective host<->device bandwidth (~50 MB/s healthy,
    ~11 MB/s congested)."""
    import numpy as np

    f = jax.jit(lambda a: (a @ a).sum())
    x = jnp.ones((256, 256), jnp.bfloat16)
    t0 = time.perf_counter()
    np.asarray(f(x))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(x))
        times.append(time.perf_counter() - t0)
    times.sort()

    buf = np.zeros(1 << 20, np.float32)  # 4 MB
    t0 = time.perf_counter()
    dev = jax.device_put(buf)
    np.asarray(dev[:1])
    put_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(dev)
    fetch_s = time.perf_counter() - t0
    mb = buf.nbytes / 1e6
    return {
        "tiny_ms_best": round(times[0] * 1e3, 1),
        "tiny_ms_median": round(times[len(times) // 2] * 1e3, 1),
        "compile_s": round(compile_s, 2),
        "put_mb_s": round(mb / max(put_s, 1e-9), 1),
        "fetch_mb_s": round(mb / max(fetch_s, 1e-9), 1),
    }


# ----------------------------------------------------------------------
def bench_e2e(n_steps: int = 25, warm_reps: int = 4) -> dict:
    """Warm FULL-pipeline throughput: whisper -> regulate -> 25-step CFM ->
    BigVGAN -> crossfade on a 30 s source (the reference's RTF,
    ``inference.py:530``).  Random weights (timing is weight-independent).
    Reports best, median AND the per-rep walls (VERDICT r4 weak #2)."""
    import dataclasses

    from seedvc_tpu.pipelines.convert import VoiceConverter

    from seedvc_tpu.core.config import get_preset

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
    rep_walls = [
        vc.convert(src, sr, ref, sr, diffusion_steps=n_steps, seed=i + 1)[2]
        ["wall_seconds"] for i in range(warm_reps)]
    walls = sorted(rep_walls)
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
        "rep_walls_s": [round(w, 3) for w in rep_walls],
        "compile_s": round(compile_s, 1),
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
    VAD gate off (white-noise input would otherwise time the skip path).

    ``set_reference`` compiles AND warms both block programs (VERDICT r4
    next #3), so block 0 must run at steady-state latency — pinned here by
    a zero-new-compile assertion over the block loop."""
    import numpy as np

    from seedvc_tpu.core.config import get_preset
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
    set_ref_s = time.perf_counter() - t0
    print(f"streaming set_reference (compile+warm): {set_ref_s:.1f}s",
          file=sys.stderr)

    cache0 = stream._fused._cache_size()
    times, dispatch, sync = [], [], []
    for i in range(n_blocks):
        block = (rng.standard_normal(stream.block) * 0.1).astype(np.float32)
        t0 = time.perf_counter()
        stream.process_block(block)
        times.append(time.perf_counter() - t0)
        dispatch.append(stream.last_timings["dispatch_ms"])
        sync.append(stream.last_timings["sync_ms"])
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
        "block0_ms": round(times[0] * 1e3, 1),
        "set_reference_s": round(set_ref_s, 1),
        "dispatch_ms_median": float(np.median(dispatch[3:])),
        "sync_ms_median": float(np.median(sync[3:])),
        "new_compiles_in_blocks": stream._fused._cache_size() - cache0,
        "reference_ms": 150.0,  # RTX 3060 (README.md:138-142)
    }


def bench_streaming2() -> dict:
    """Second block size for the latency/occupancy curve (the reference GUI
    exposes block time as a user knob, ``real-time-gui.py``)."""
    return bench_streaming(block_time=0.5, n_blocks=10)


def bench_v2(src_secs: float = 60.0, ref_secs: float = 3.0,
             steps: int = 30, warm_reps: int = 3) -> dict:
    """v2 accent-conversion RTF: HuBERT content -> batched AR decode ->
    3-way multi-cond CFG CFM -> BigVGAN, full-size random weights
    (reference ``inference_v2.py`` path; 60 s source so the duration-
    reduced tokens span >1500 and the AR chunks decode as ONE batched
    call).  Per-rep walls + a recompile guard after the first warm rep
    (VERDICT r4 weak #4: the 5.77 -> 9.69 s spread must be attributable)."""
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
    compile_s = time.perf_counter() - t0
    print(f"v2 compile+first conversion: {compile_s:.1f}s "
          f"(wide_tokens {stats['wide_tokens']}, "
          f"ar_batch {stats['ar_batch']})", file=sys.stderr)

    fns = [v2._sample_vocode_fn, v2._content_fn, v2._style_fn,
           v2._cfm_reg_fn, v2._ar_reg_fn, v2._generate, v2._chunk_fn]
    # Warm reps all use ONE seed: the AR decode is stochastic per seed, so
    # a fresh seed per rep changes the wide-token count and can cross a
    # 64-token regulate bucket -> a legitimate mid-measurement recompile
    # (observed: rep walls 4.4 vs 8.2 s with rep_new_compiles [1,0,1]).
    # With a fixed seed the geometry is constant, rep_new_compiles must be
    # 0, and the remaining spread is attributable to the pool (VERDICT r4
    # weak #4).
    rep_walls, rep_audio, rep_compiles = [], [], []
    sizes = [f._cache_size() for f in fns]
    for i in range(warm_reps):
        _, w_i, st_i = v2.convert_voice(src, sr, ref, sr, seed=0, **kw)
        rep_walls.append(st_i["wall_seconds"])
        rep_audio.append(len(w_i) / sr)
        new_sizes = [f._cache_size() for f in fns]
        rep_compiles.append(sum(b - a for a, b in zip(sizes, new_sizes)))
        sizes = new_sizes
    tputs = sorted(a / w for a, w in zip(rep_audio, rep_walls))
    best, median = tputs[-1], tputs[len(tputs) // 2]
    print(f"v2 warm: best {best:.2f} / median {median:.2f} audio-s/s; "
          f"walls {rep_walls} audio {rep_audio} "
          f"recompiles {rep_compiles}", file=sys.stderr)
    return {
        "metric": "v2_accent_conversion_throughput",
        "value": round(best, 3),
        "median_value": round(median, 3),
        "unit": "audio_seconds_per_second",
        "rtf": round(1.0 / best, 5),
        "diffusion_steps": steps,
        "source_seconds": src_secs,
        "wide_tokens": int(stats["wide_tokens"]),
        "ar_batch": int(stats["ar_batch"]),
        "rep_walls_s": [round(w, 3) for w in rep_walls],
        "rep_audio_s": [round(a, 2) for a in rep_audio],
        "rep_new_compiles": rep_compiles,
        "compile_s": round(compile_s, 1),
    }


def bench_ar() -> dict:
    """AR incremental-decode tokens/s at B=1/B=4 (VERDICT r2 bar: B=4
    aggregate >= 2.5x B=1) PLUS the 25-step CFM sampler kernel — the
    r1-r3 headline metric (B=1, T=2560, CFG stack), kept as a
    hold-the-line watch item (bar: >= 100 audio-s/s)."""
    from seedvc_tpu.apps.microbench import bench_ar_decode, bench_serving

    r1 = bench_ar_decode(B=1)
    r4 = bench_ar_decode(B=4)
    samp = bench_serving(B=1)
    return {
        "metric": "ar_decode_tokens_per_s",
        "b1": r1["tokens_per_s"],
        "b4": r4["tokens_per_s"],
        "b1_ms_per_token": r1["ms_per_token"],
        "b4_vs_b1": round(r4["tokens_per_s"] / max(r1["tokens_per_s"], 1e-9),
                          2),
        "sampler": {
            "metric": "offline_vc_mel_generation_throughput",
            "value": samp["audio_s_per_s"],
            "unit": "audio_seconds_per_second",
            "vs_baseline": round(samp["audio_s_per_s"]
                                 / BASELINE_AUDIO_SEC_PER_S, 3),
        },
    }


def bench_train() -> dict:
    """On-the-fly v1 fine-tuning steps/s, prefetch worker vs synchronous
    (reference-style) schedule — ONE trainer for both, so the sync variant
    reuses every compile (the r4 leg paid the multi-minute feature-program
    compiles twice and blew the leg budget)."""
    from seedvc_tpu.apps.microbench import bench_train_onfly_pair

    return {"metric": "train_onfly_steps_per_s",
            **bench_train_onfly_pair()}


def bench_train_v2() -> dict:
    """On-the-fly v2 fine-tuning steps/s (VERDICT r4 next #6: v1's 7.7x
    on-the-fly win had an unmeasured v2 twin)."""
    from seedvc_tpu.apps.microbench import bench_train_onfly_v2

    return {"metric": "train_v2_onfly_steps_per_s",
            **bench_train_onfly_v2()}


# ----------------------------------------------------------------------
# (key, expected wall s, hard timeout s, leg function) in priority order.
# expected values are calibrated session measurements with a warm compile
# cache; the budget gate skips legs that no longer fit instead of letting
# the driver kill the whole record (VERDICT r4 weak #1).
LEGS = [
    ("e2e", 280, 420, bench_e2e),
    ("streaming", 170, 300, bench_streaming),
    ("v2", 300, 500, bench_v2),
    ("ar_decode", 280, 420, bench_ar),
    ("train_onfly", 300, 450, bench_train),
    ("train_v2", 240, 400, bench_train_v2),
    ("streaming2", 150, 280, bench_streaming2),
]
# Calibration (this round, solo pool, warm compile cache; rc=0 total 906 s):
# e2e 175 s / streaming 43 / v2 134 / ar_decode 216 / train_onfly 180 /
# train_v2 102 / streaming2 55.  Each child pays ~60 s axon backend init
# (reported as the first probe's compile_s).  expected_s above ~= measured
# x1.5 congestion margin; the 1680 s budget skips tail legs gracefully in a
# congested pool instead of letting the driver kill the record.


def _run_child(key: str, budget_s: int) -> dict:
    """Run one benchmark leg in a CHILD process under a hard timeout.

    Children run sequentially and the parent never opens the TPU, so there
    is never a second active TPU client through the axon tunnel.  The child
    brackets its leg with congestion probes.
    """
    import subprocess

    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--child", key],
            capture_output=True, text=True, timeout=budget_s)
    except subprocess.TimeoutExpired as e:
        err = e.stderr
        if err:
            sys.stderr.write(err.decode() if isinstance(err, bytes) else err)
        print(f"[bench] leg {key}: TIMEOUT after {budget_s}s",
              file=sys.stderr)
        return {f"{key}_error": f"timeout after {budget_s}s"}
    sys.stderr.write(proc.stderr)
    wall = time.perf_counter() - t0
    print(f"[bench] leg {key}: {wall:.0f}s", file=sys.stderr)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            leg = json.loads(line)
            leg["leg_wall_s"] = round(wall, 1)
            return {key: leg}
        except json.JSONDecodeError:
            continue
    return {f"{key}_error": f"no JSON from child (exit {proc.returncode})"}


def _child_main(key: str):
    fn = dict((k, f) for k, _e, _h, f in LEGS)[key]
    probe = congestion_probe()
    result = fn()
    result["probe"] = probe
    result["probe_after"] = congestion_probe(reps=3)
    print(json.dumps(result), flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None,
                    help="(internal) run one leg in this process")
    ap.add_argument("--legs", default=None,
                    help="comma-separated subset of legs to run "
                         f"({','.join(k for k, *_ in LEGS)}); default all")
    ap.add_argument("--skip-e2e", action="store_true",
                    help="skip all pipeline legs (debug)")
    ap.add_argument("--budget", type=int, default=None,
                    help="global wall budget seconds (default env "
                         "SEEDVC_BENCH_BUDGET_S or 1680)")
    args, _ = ap.parse_known_args()

    if args.child:
        _child_main(args.child)
        return

    budget = args.budget or int(os.environ.get("SEEDVC_BENCH_BUDGET_S",
                                               "1680"))
    want = None
    if args.legs is not None:
        want = set(args.legs.split(","))
    env_legs = os.environ.get("SEEDVC_BENCH_LEGS")
    if want is None and env_legs is not None:
        want = set(env_legs.split(","))
    skip_all = args.skip_e2e or os.environ.get("SEEDVC_BENCH_E2E") == "0"

    record = {
        "metric": "offline_vc_pipeline_throughput",
        "value": None,
        "unit": "audio_seconds_per_second",
        "vs_baseline": None,
        "budget_s": budget,
        "legs_done": [],
        "complete": False,
    }
    # first line immediately: a kill during leg 1 still leaves valid JSON
    print(json.dumps(record), flush=True)

    deadline = time.monotonic() + budget
    for key, expected_s, hard_s, _fn in LEGS:
        if skip_all or (want is not None and key not in want):
            continue
        remaining = deadline - time.monotonic()
        if remaining < max(120, 0.7 * expected_s):
            record[f"{key}_error"] = (
                f"skipped: {remaining:.0f}s left < expected {expected_s}s")
            print(json.dumps(record), flush=True)
            continue
        record.update(_run_child(key, int(min(hard_s, remaining))))
        if key in record:
            record["legs_done"] = record["legs_done"] + [key]
        if key == "e2e" and "e2e" in record:
            record["value"] = record["e2e"].get("value")
            if record["value"]:
                record["vs_baseline"] = round(
                    record["value"] / BASELINE_AUDIO_SEC_PER_S, 3)
        print(json.dumps(record), flush=True)

    record["complete"] = True
    record["total_wall_s"] = round(budget - (deadline - time.monotonic()), 1)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
