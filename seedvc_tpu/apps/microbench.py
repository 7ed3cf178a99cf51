"""Per-component microbenchmarks with speed-of-light accounting.

SURVEY §7.1 item 9: "per-kernel microbench (speed-of-light accounting)".
Times the hot components of the flagship 98M whisper-small-wavenet sampler
at the production shape (B=2 CFG stack, T=2560, bf16 activations) and
reports ms plus achieved model FLOP/s so regressions and tuning wins are
attributable per component.

    python -m seedvc_tpu.apps.microbench              # all components
    python -m seedvc_tpu.apps.microbench --only dit,attention

Timing sync uses ``np.asarray`` (through the axon tunnel
``block_until_ready`` under-reports; see .claude/skills/verify).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, params, x, iters: int = 3, inner: int = 20) -> float:
    """Best-of-N per-call wall seconds for ``fn(params, x)`` where the
    output has x's shape.

    Two tunnel effects must be amortised: (1) syncing a multi-MB output
    through axon costs more than the kernels under test — only a scalar
    crosses the host boundary; (2) each dispatch has a ~25 ms round-trip —
    the component runs ``inner`` times inside one jitted ``fori_loop``
    (output fed back as input for a real data dependence) and the loop time
    is divided by ``inner``.
    """
    def body(_, c):
        return fn(params, c).astype(c.dtype)

    looped = jax.jit(lambda p, c: jnp.sum(
        jax.lax.fori_loop(0, inner, body, c).astype(jnp.float32)))
    np.asarray(looped(params, x))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = looped(params, x)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best / inner


def report(name: str, seconds: float, flops: float | None = None,
           bytes_moved: float | None = None) -> dict:
    row = {"name": name, "ms": round(seconds * 1e3, 3)}
    if flops:
        row["tflops_per_s"] = round(flops / seconds / 1e12, 2)
    if bytes_moved:
        row["gb_per_s"] = round(bytes_moved / seconds / 1e9, 1)
    print(json.dumps(row))
    return row


def bench_attention(B=2, T=2560, H=8, hd=64, flash=True):
    from seedvc_tpu.nn.layers import Attention

    attn = Attention(H * hd, H, use_flash=flash)
    x = jnp.zeros((B, T, H * hd), jnp.bfloat16)
    freqs = jnp.zeros((T, hd // 2, 2), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x, freqs, None)["params"]
    fn = jax.jit(lambda p, x: attn.apply({"params": p}, x, freqs, None))
    dt = timeit(fn, params, x)
    d = H * hd
    flops = 2 * B * (4 * T * d * d          # qkv+o projections
                     + 2 * T * T * d)       # qk + av
    return report(f"attention(flash={flash}) B{B} T{T} H{H} hd{hd}", dt, flops)


def bench_ffn(B=2, T=2560, d=512):
    from seedvc_tpu.nn.layers import FeedForward, ffn_intermediate_size

    inter = ffn_intermediate_size(d)
    ffn = FeedForward(d, inter)
    x = jnp.zeros((B, T, d), jnp.bfloat16)
    params = ffn.init(jax.random.PRNGKey(0), x)["params"]
    fn = jax.jit(lambda p, x: ffn.apply({"params": p}, x))
    dt = timeit(fn, params, x)
    flops = 2 * B * T * 3 * d * inter
    return report(f"swiglu_ffn B{B} T{T} d{d} inter{inter}", dt, flops)


def bench_int8_matmul(M=5120, K=512, N=1536):
    """MXU int8 probe at the FFN-w1 shape of the CFG-stacked sampler
    (M = 2*2560 tokens): is XLA's int8 dot actually ~2x bf16 on this chip
    (v5e peak: 394 int8 vs 197 bf16 TOP/s), and how much of that survives
    dynamic per-row activation quantisation?  Decides whether a
    weight+activation int8 trunk path is worth building."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    k1, k2 = jax.random.split(key)
    w1 = jax.random.normal(k1, (K, N), jnp.bfloat16) / 16.0
    w2 = jax.random.normal(k2, (N, K), jnp.bfloat16) / 16.0

    def q8(w):  # per-tensor weight quant (probe only)
        # guard: an all-zero tensor must not divide by zero
        s = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32))), 1e-8) / 127.0
        return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s

    w1q, s1 = q8(w1)
    w2q, s2 = q8(w2)
    flops = 2 * M * K * N * 2  # w1 + w2 round trip (output shape == input)

    def run(name, fn, p):
        dt = timeit(fn, p, x)
        return report(name, dt, flops)

    rows = [run(f"matmul2_bf16 {M}x{K}x{N}",
                jax.jit(lambda w_, x_: ((x_ @ w_[0]) @ w_[1]).astype(
                    jnp.bfloat16)), (w1, w2))]

    def dot8(x8, wq):
        return jax.lax.dot_general(x8, wq, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def int8_dynamic(w_, x_):
        # per-row dynamic activation scales (what a real trunk path pays)
        def qa(a):
            # guard: all-zero rows (e.g. padding) must not divide by zero
            s = jnp.maximum(jnp.max(jnp.abs(a.astype(jnp.float32)), axis=1,
                                    keepdims=True), 1e-8) / 127.0
            return jnp.round(a.astype(jnp.float32) / s).astype(jnp.int8), s

        x8, sx = qa(x_)
        h = dot8(x8, w_[0]).astype(jnp.float32) * (sx * s1)
        h8, sh = qa(h)
        o = dot8(h8, w_[1]).astype(jnp.float32) * (sh * s2)
        return o.astype(jnp.bfloat16)

    rows.append(run(f"matmul2_int8_dynamic {M}x{K}x{N}",
                    jax.jit(int8_dynamic), (w1q, w2q)))
    return rows


def bench_wavenet(B=2, T=2560):
    from seedvc_tpu.core.config import WavenetConfig
    from seedvc_tpu.nn.wavenet import WaveNet

    wn_cfg = WavenetConfig()
    wn = WaveNet(wn_cfg.hidden_dim, kernel_size=wn_cfg.kernel_size,
                 dilation_rate=wn_cfg.dilation_rate,
                 n_layers=wn_cfg.num_layers, gin_channels=wn_cfg.hidden_dim)
    x = jnp.zeros((B, T, wn_cfg.hidden_dim), jnp.bfloat16)
    mask = jnp.ones((B, T, 1), jnp.bfloat16)
    g = jnp.zeros((B, 1, wn_cfg.hidden_dim), jnp.bfloat16)
    params = wn.init(jax.random.PRNGKey(0), x, mask, g=g)["params"]
    fn = jax.jit(lambda p, x: wn.apply({"params": p}, x, mask, g=g))
    dt = timeit(fn, params, x)
    d = wn_cfg.hidden_dim
    flops = 2 * B * T * wn_cfg.num_layers * (
        d * 2 * d * wn_cfg.kernel_size   # in gated conv
        + d * 2 * d)                     # res/skip 1x1
    return report(f"wavenet_postnet B{B} T{T} d{d} L{wn_cfg.num_layers}",
                  dt, flops)


def bench_dit_step(B=1, T=2560, steps=1):
    """One estimator call at the CFG-stacked shape (2B, T)."""
    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.models.cfm import CFM

    cfg = get_preset("whisper_small_wavenet")
    mp = dataclasses.replace(
        cfg.model_params,
        DiT=dataclasses.replace(cfg.model_params.DiT,
                                use_flash_attention=True))
    cfm = CFM(mp)
    C, D = mp.DiT.in_channels, mp.DiT.content_dim
    dt_ = jnp.bfloat16
    x = jnp.zeros((2 * B, T, C), dt_)
    p = jnp.zeros((2 * B, T, C), dt_)
    lens = jnp.full((2 * B,), T, jnp.int32)
    t = jnp.zeros((2 * B,), jnp.float32)
    style = jnp.zeros((2 * B, mp.style_encoder.dim), dt_)
    cond = jnp.zeros((2 * B, T, D), dt_)
    key = jax.random.PRNGKey(0)
    variables = cfm.init(key, x, p, lens, t, style, cond, method=cfm.estimate)
    fn = jax.jit(lambda v, x: cfm.apply(v, x, p, lens, t, style, cond,
                                        method=cfm.estimate))
    dtm = timeit(fn, variables, x)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(variables))
    d_model = mp.DiT.hidden_dim
    flops = (2 * n_params * 2 * B * T                      # matmul 2*P*tokens
             + 2 * 2 * B * mp.DiT.depth * 2 * T * T * d_model)  # attention
    return report(f"dit_estimator_cfg_call B{2*B} T{T} ({n_params/1e6:.0f}M)",
                  dtm, flops)


def bench_serving(B=4, T=2560, n_steps=25):
    """Batched-serving throughput: the full 25-step CFM sampler at B
    utterances per program (CFG doubles to 2B), aggregate audio-s/s.

    Quantifies whether one chip serves concurrent conversions better than
    sequential B=1 calls (VERDICT r1 weak #4 asked for a B>1 number)."""
    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.models.cfm import CFM, euler_solve

    cfg = get_preset("whisper_small_wavenet")
    mp = dataclasses.replace(
        cfg.model_params,
        DiT=dataclasses.replace(cfg.model_params.DiT,
                                use_flash_attention=True))
    sr = cfg.preprocess_params.sr
    hop = cfg.preprocess_params.spect_params.hop_length
    prompt_len = int(sr / hop * 3)
    C, D = mp.DiT.in_channels, mp.DiT.content_dim
    cd = jnp.bfloat16
    cfm = CFM(mp)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, T, C), cd)
    style = jax.random.normal(key, (B, mp.style_encoder.dim), cd)
    cond = jax.random.normal(key, (B, T, D), cd)
    variables = cfm.init(key, x0, x0, None, jnp.zeros((B,)), style, cond,
                         method=cfm.estimate)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, variables)

    @jax.jit
    def sample(variables, key, cond, style):
        def estimate_fn(x, p, l, t, s, m, sc=None):
            return cfm.apply(variables, x, p, l, t, s, m, static_cond=sc,
                             method=cfm.estimate)

        def precompute_fn(x, p, l, s, m):
            return cfm.apply(variables, x, p, l, s, m,
                             method=cfm.precompute_cond)

        return euler_solve(estimate_fn, key, cond, None, x0, prompt_len,
                           style, n_mels=C, n_timesteps=n_steps, cfg_rate=0.7,
                           precompute_fn=precompute_fn)

    np.asarray(sample(variables, key, cond, style))
    t0 = time.perf_counter()
    out = None
    for j in range(3):
        out = sample(variables, jax.random.PRNGKey(j), cond, style)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / 3
    audio_s = B * (T - prompt_len) * hop / sr
    row = {"name": f"serving B{B} T{T} {n_steps}-step",
           "ms": round(dt * 1e3, 2),
           "audio_s_per_s": round(audio_s / dt, 2)}
    print(json.dumps(row))
    return row


def bench_vocoder(B=1, T=512):
    from seedvc_tpu.models.bigvgan import BIGVGAN_22K_80, BigVGAN

    voc_cfg = BIGVGAN_22K_80
    if jax.default_backend() == "tpu":
        voc_cfg = dataclasses.replace(voc_cfg, use_pallas=True)
    voc = BigVGAN(voc_cfg)
    mel = jnp.zeros((B, T, 80), jnp.float32)
    params = voc.init(jax.random.PRNGKey(0), mel)["params"]
    # output is a waveform (different shape) — single-dispatch timing with a
    # scalar reduction; the vocoder is big enough to dominate the round-trip.
    fn = jax.jit(lambda p, m: jnp.sum(voc.apply({"params": p}, m)))
    np.asarray(fn(params, mel))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(params, mel))
        dt = min(dt, time.perf_counter() - t0)
    samples = B * T * 256
    print(json.dumps({"name": f"bigvgan B{B} T{T}", "ms": round(dt * 1e3, 2),
                      "audio_s_per_s": round(samples / 22050 / dt, 1)}))


def bench_ar_decode(B=1, n_tokens=128, max_seq=4096):
    """Incremental AR decode ms/token at the reference model size
    (768d/12L, GQA 2 KV heads; ``modules/v2/ar.py``): one fori_loop over
    decode_step with an argmax->embed dependency between steps (sampling
    excluded — that's host-free anyway; this isolates the model+cache
    path).  Round-1 baseline: 1.9 ms/token (jnp.repeat GQA)."""
    import dataclasses as _dc

    from seedvc_tpu.models.ar import ARConfig, ARTransformer

    cfg = _dc.replace(ARConfig(), max_seq_len=max_seq)
    model = ARTransformer(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, 4), jnp.int32),
        jnp.broadcast_to(jnp.arange(4)[None], (B, 4)),
        jnp.tril(jnp.ones((4, 4), bool))[None, None], method=model.init_all)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    k0 = jnp.zeros((cfg.n_layer, B, max_seq, cfg.n_local_heads, cfg.head_dim),
                   jnp.bfloat16)
    v0 = jnp.zeros_like(k0)

    @jax.jit
    def run(variables, kc, vc):
        x0 = model.apply(variables, jnp.zeros((B, 1), jnp.int32),
                         method=model.embed_tokens)

        def body(i, carry):
            kc, vc, x = carry
            logits, kc, vc = model.apply(
                variables, x, jnp.full((B,), i, jnp.int32), i, kc, vc,
                method=model.decode_step)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            x = model.apply(variables, tok[:, None],
                            method=model.embed_tokens)
            return kc, vc, x

        _, _, x = jax.lax.fori_loop(0, n_tokens, body, (k0, v0, x0))
        return jnp.sum(x.astype(jnp.float32))

    np.asarray(run(variables, k0, v0))  # compile
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(variables, k0, v0))
        dt = min(dt, time.perf_counter() - t0)
    per_tok = dt / n_tokens
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(variables))
    row = {
        "name": f"ar_decode B{B} seq{max_seq} ({n_params/1e6:.0f}M params)",
        "ms_per_token": round(per_tok * 1e3, 3),
        "tokens_per_s": round(B / per_tok, 1),
    }
    print(json.dumps(row))
    return row



def bench_train_step(B=4, T=512, Ts=256, compute_dtype=None):
    """Flagship (98M DiT + WaveNet head) fused fwd+bwd+adamw SPMD train
    step at a fine-tuning shape (frozen-encoder features arrive
    precomputed, as in train/step.py): steps/s and achieved TFLOP/s.
    The reference publishes "~100 steps in ~2 min on a T4" for v1
    fine-tuning (README.md:10) ~ 0.8 steps/s."""
    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.models.vc import VCModel
    from seedvc_tpu.parallel.mesh import make_mesh
    from seedvc_tpu.train.optim import make_optimizer
    from seedvc_tpu.train.step import (init_state, make_sharded_train_step,
                                       shard_state)

    cfg = get_preset("whisper_small_wavenet")
    mp = cfg.model_params
    D_in = mp.length_regulator.in_channels
    batch = {
        "s_alt": jnp.zeros((B, Ts, D_in), jnp.float32),
        "s_ori": jnp.zeros((B, Ts, D_in), jnp.float32),
        "mels": jnp.zeros((B, T, mp.DiT.in_channels), jnp.float32),
        "mel_lens": jnp.full((B,), T, jnp.int32),
        "style": jnp.zeros((B, mp.style_encoder.dim), jnp.float32),
    }
    mesh = make_mesh(n_data=1, n_model=1)
    model = VCModel(mp)
    optimizer = make_optimizer(1e-4)
    state = init_state(model, optimizer, jax.random.PRNGKey(0), batch)
    state = shard_state(state, mesh)
    step = make_sharded_train_step(model, optimizer, mesh,
                                   compute_dtype=compute_dtype)
    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)
    np.asarray(metrics["loss"])  # compile + warm
    best = float("inf")
    iters = 3
    for _ in range(iters):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, key)
        np.asarray(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(state.params))
    flops = 3 * 2 * n_params * B * T  # fwd + 2x bwd matmul estimate
    tag = "" if compute_dtype is None else "_bf16"
    row = report(f"train_step{tag} B{B} T{T} ({n_params/1e6:.0f}M)", best,
                 flops)
    print(json.dumps({"name": f"train_steps_per_s{tag}",
                      "value": round(1.0 / best, 2)}))
    return row


def bench_train_onfly(B=4, steps=12, prefetch=2):
    """On-the-fly v1 fine-tuning throughput: frozen-encoder features are
    extracted per step (whisper 30 s forward, mel, CAMPPlus) instead of
    precomputed, with the prefetch worker (``train/prefetch.py``)
    overlapping feature prep and the SPMD train step.  Compare against
    ``bench_train_step`` (precomputed features) to see the feature-pipeline
    overhead; ``prefetch=0`` gives the reference-style synchronous schedule
    (``train.py:762-894``)."""
    import dataclasses as dc
    import os
    import tempfile
    import time as _time

    from seedvc_tpu.apps.audio_io import save_wav
    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.train.dataset import FTDataset
    from seedvc_tpu.train.trainer import Trainer, TrainerConfig

    cfg = get_preset("whisper_small_wavenet")
    sr = cfg.preprocess_params.sr
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="onfly_")
    # clips 5.7-5.86 s: mel lens 491-505 all land in the SAME 128-frame
    # bucket (512) and the same 6 s whisper bucket -> zero recompiles after
    # warmup
    for i in range(2 * B):
        secs = 5.7 + 0.02 * i
        t = np.arange(int(secs * sr)) / sr
        w = (0.3 * np.sin(2 * np.pi * 150 * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        save_wav(os.path.join(tmp, f"c{i}.wav"), w, sr)

    warm = 3
    tcfg = TrainerConfig(run_dir="", batch_size=B, epochs=10 ** 6,
                         max_steps=warm, log_interval=10 ** 9,
                         save_interval=10 ** 9, mel_bucket=128,
                         prefetch=prefetch)
    trainer = Trainer(cfg, tcfg)
    ds = FTDataset(tmp, sr, batch_size=B)
    t0 = _time.perf_counter()
    trainer.train(ds)  # compile + warm
    print(f"  [train_onfly] compile+warm ({warm} steps): "
          f"{_time.perf_counter() - t0:.1f}s")
    trainer.tcfg = dc.replace(tcfg, max_steps=warm + steps)
    t0 = _time.perf_counter()
    final = trainer.train(ds)
    dt = (_time.perf_counter() - t0) / (final - warm)
    tag = f"prefetch{prefetch}"
    row = report(f"train_onfly {tag} B{B} ({steps} steps)", dt, 0)
    row["steps_per_s"] = round(1.0 / dt, 2)
    print(json.dumps({"name": f"train_onfly_steps_per_s_{tag}",
                      "value": row["steps_per_s"]}))
    return row


def bench_train_onfly_pair(B=4, steps=10):
    """v1 on-the-fly steps/s, prefetch vs sync, from ONE trainer.

    ``Trainer.train`` reads ``self.tcfg.prefetch`` per call, so toggling the
    schedule between measurements reuses every compiled program (feature
    prep + SPMD step) — the separate-trainer variant paid the multi-minute
    compiles twice (r4 bench train leg: 626 s, mostly duplicate compiles).
    The feature cache is fully warm before BOTH measured phases (warmup
    covers all 2B clips), so the schedules see identical prep work."""
    import dataclasses as dc
    import os
    import tempfile
    import time as _time

    from seedvc_tpu.apps.audio_io import save_wav
    from seedvc_tpu.core.config import get_preset
    from seedvc_tpu.train.dataset import FTDataset
    from seedvc_tpu.train.trainer import Trainer, TrainerConfig

    cfg = get_preset("whisper_small_wavenet")
    sr = cfg.preprocess_params.sr
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="onfly_")
    # clips 5.7-5.86 s: mel lens 491-505 all land in the SAME 128-frame
    # bucket (512) and the same 6 s whisper bucket -> zero recompiles after
    # warmup
    for i in range(2 * B):
        secs = 5.7 + 0.02 * i
        t = np.arange(int(secs * sr)) / sr
        w = (0.3 * np.sin(2 * np.pi * 150 * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        save_wav(os.path.join(tmp, f"c{i}.wav"), w, sr)

    warm = 3
    tcfg = TrainerConfig(run_dir="", batch_size=B, epochs=10 ** 6,
                         max_steps=warm, log_interval=10 ** 9,
                         save_interval=10 ** 9, mel_bucket=128,
                         prefetch=2)
    trainer = Trainer(cfg, tcfg)
    ds = FTDataset(tmp, sr, batch_size=B)
    t0 = _time.perf_counter()
    trainer.train(ds)  # compile + warm (features cached for all clips)
    compile_s = _time.perf_counter() - t0
    print(f"  [train_onfly] compile+warm ({warm} steps): {compile_s:.1f}s")

    out = {"compile_warm_s": round(compile_s, 1)}
    done = warm
    for tag, depth in (("prefetch", 2), ("sync", 0)):
        trainer.tcfg = dc.replace(tcfg, prefetch=depth,
                                  max_steps=done + steps)
        t0 = _time.perf_counter()
        final = trainer.train(ds)
        dt = (_time.perf_counter() - t0) / (final - done)
        done = final
        out[tag] = round(1.0 / dt, 2)
        print(json.dumps({"name": f"train_onfly_steps_per_s_{tag}",
                          "value": out[tag]}))
    return out


def bench_train_onfly_v2(B=2, steps=8):
    """v2 on-the-fly fine-tuning steps/s (full-size HuBERT-large + ASTRAL
    + DiTV2 + AR), prefetch vs sync from ONE trainer — the v2 twin of
    ``bench_train_onfly_pair`` (VERDICT r4 next #6)."""
    import dataclasses as dc
    import os
    import tempfile
    import time as _time

    from seedvc_tpu.apps.audio_io import save_wav
    from seedvc_tpu.pipelines.convert_v2 import V2Config
    from seedvc_tpu.train.dataset import FTDataset
    from seedvc_tpu.train.trainer_v2 import TrainerV2, TrainerV2Config

    vcfg = V2Config()
    sr = vcfg.sr
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="onfly_v2_")
    # clips in one 5 s SSL bucket + one 128-frame mel bucket: zero
    # recompiles after warmup (same shaping rationale as the v1 pair)
    for i in range(2 * B):
        secs = 4.2 + 0.02 * i
        t = np.arange(int(secs * sr)) / sr
        w = (0.3 * np.sin(2 * np.pi * (150 + 7 * i) * t)
             + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        save_wav(os.path.join(tmp, f"c{i}.wav"), w, sr)

    warm = 3
    # token_bucket 256 >= every possible raw/reduced token count for these
    # clips: ar_C/tok_T stay one static bucket across shuffled batch
    # compositions (a 64 bucket could straddle a boundary and recompile
    # mid-measurement)
    tcfg = TrainerV2Config(batch_size=B, epochs=10 ** 6, max_steps=warm,
                           log_interval=10 ** 9, save_interval=10 ** 9,
                           prefetch=2, token_bucket=256)
    trainer = TrainerV2(vcfg, tcfg)
    ds = FTDataset(tmp, sr, batch_size=B)
    t0 = _time.perf_counter()
    trainer.train(ds)
    compile_s = _time.perf_counter() - t0
    print(f"  [train_onfly_v2] compile+warm ({warm} steps): {compile_s:.1f}s")

    out = {"compile_warm_s": round(compile_s, 1)}
    done = warm
    for tag, depth in (("prefetch", 2), ("sync", 0)):
        trainer.tcfg = dc.replace(tcfg, prefetch=depth,
                                  max_steps=done + steps)
        t0 = _time.perf_counter()
        final = trainer.train(ds)
        dt = (_time.perf_counter() - t0) / (final - done)
        done = final
        out[tag] = round(1.0 / dt, 2)
        print(json.dumps({"name": f"train_onfly_v2_steps_per_s_{tag}",
                          "value": out[tag]}))
    return out


ALL = {
    "attention": bench_attention,
    "attention_xla": lambda: bench_attention(flash=False),
    "ffn": bench_ffn,
    "int8_matmul": bench_int8_matmul,
    "wavenet": bench_wavenet,
    "dit": bench_dit_step,
    "vocoder": bench_vocoder,
    "ar_decode": bench_ar_decode,
    "ar_decode_b4": lambda: bench_ar_decode(B=4),
    "serving": bench_serving,
    "serving_b1": lambda: bench_serving(B=1),
    "serving_b2": lambda: bench_serving(B=2),
    "train_step": bench_train_step,
    "train_step_bf16": lambda: bench_train_step(compute_dtype=jnp.bfloat16),
    "train_onfly": bench_train_onfly,
    "train_onfly_sync": lambda: bench_train_onfly(prefetch=0),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of: " + ",".join(ALL))
    args = ap.parse_args(argv)
    names = args.only.split(",") if args.only else list(ALL)
    print(f"backend: {jax.default_backend()}", flush=True)
    for name in names:
        ALL[name]()


if __name__ == "__main__":
    main()
