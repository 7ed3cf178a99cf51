"""Pallas TPU attention kernel for the DiT trunk (non-causal, key-padded).

Why not ``jax.experimental.pallas.ops.tpu.flash_attention``: that kernel
upcasts Q/K/V to float32 (observed ``f32[1,8,2560,64]`` custom-call operands
on v5e), paying full-precision MXU passes and 2x the VMEM traffic.  At the
DiT shapes (T<=2560, head_dim 64) the ENTIRE K and V for one (batch, head)
fit in VMEM (~2x320 KB bf16), so no online-softmax streaming is needed at
all: one program computes a (block_q, T) logit tile in fp32, a full softmax
over the real keys, and the PV matmul — with Q/K/V kept in bf16 on the MXU
and fp32 accumulation (``preferred_element_type``).

Semantics match the reference SDPA path (``modules/diffusion_transformer.py:
194-260``): scores scaled by 1/sqrt(d), key-padding mask (queries may attend
only to keys < length), softmax in fp32.

Grid: (B*H, T // block_q); K/V block indices are constant in the minor grid
dimension, so Pallas fetches them once per (batch, head) and revisits them
from VMEM for every query block.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pair_swap_matrix(d: int, dtype=jnp.float32) -> jax.Array:
    """(d, d) permutation P with (x @ P)[2i] = x[2i+1], (x @ P)[2i+1] = x[2i].

    Built from 2-D iotas (TPU requires >=1-D iota); the matmul by P is how the
    kernel swaps RoPE pairs without strided lane slicing (a (bq, d) x (d, d)
    matmul is ~free on the MXU at d=64).
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    return (row == jnp.bitwise_xor(col, 1)).astype(dtype)


def _rope(x: jax.Array, cos: jax.Array, sin: jax.Array,
          swap: jax.Array) -> jax.Array:
    """Interleaved-pair RoPE in fp32: x*cos + pair_swap(x)*sin_signed.

    cos/sin are (T, d) with cos[:, 2i] = cos[:, 2i+1] = cos(theta_i) and
    sin[:, 2i] = -sin(theta_i), sin[:, 2i+1] = +sin(theta_i) — this is
    algebraically identical to the reference ``apply_rotary_emb``
    (``modules/diffusion_transformer.py:300-312``).
    """
    xf = x.astype(jnp.float32)
    swapped = jax.lax.dot_general(
        xf, swap, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return xf * cos + swapped * sin


def _attn_kernel_v2(q_ref, k_ref, v_ref, cos_ref, sin_ref, *rest,
                    scale: float, block_q: int):
    # rest is (bias_ref?, o_ref, k_scratch): bias only when masked; the
    # scratch ref comes after the output ref.
    if len(rest) == 3:
        bias_ref, o_ref, k_scratch = rest
    else:
        bias_ref, (o_ref, k_scratch) = None, rest
    i = pl.program_id(2)
    d = q_ref.shape[3]

    swap = _pair_swap_matrix(d)
    cos_q = cos_ref[pl.ds(i * block_q, block_q), :]
    sin_q = sin_ref[pl.ds(i * block_q, block_q), :]
    # scale folded into q after RoPE (saves a (bq, T) multiply pass).
    q = (_rope(q_ref[0, 0], cos_q, sin_q, swap) * scale).astype(q_ref.dtype)

    # Rotate K once per (batch, head): the K block is VMEM-resident across
    # the q-block grid dimension (constant index map), so cache its RoPE in
    # scratch on the first q-block instead of recomputing it T//bq times.
    @pl.when(i == 0)
    def _():
        k_scratch[...] = _rope(k_ref[0, 0], cos_ref[...], sin_ref[...],
                               swap).astype(k_scratch.dtype)

    k = k_scratch[...]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (bq, T) f32

    if bias_ref is not None:
        # Additive key-padding bias (0 or -1e30) precomputed OUTSIDE the
        # kernel: one broadcast add instead of an in-kernel iota+compare+
        # select, and a lax.cond that skips the pass when all keys are valid
        # measured ~0.95 ms SLOWER per call (Mosaic double-buffers the
        # conditional value and breaks the dot->exp fusion).
        s = s + bias_ref[0]

    m = jnp.max(s, axis=-1, keepdims=True)
    # exp fused straight into the dtype cast: only ONE (bq, T) buffer beyond
    # the logits is live (VMEM budget), and the normalisation is deferred —
    # PV runs on unnormalised probs and the (bq, d) output is divided by the
    # partition sum instead of the (bq, T) matrix.
    p = jnp.exp(s - m).astype(q_ref.dtype)
    denom = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
    acc = jax.lax.dot_general(
        p, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = (acc / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "masked"))
def dit_attention_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                        cos: jax.Array, sin: jax.Array,
                        lens: jax.Array | None = None, *,
                        block_q: int = 512, masked: bool = True) -> jax.Array:
    """Attention with in-kernel RoPE and deferred softmax normalisation.

    q/k/v: (B, H, T, d) bf16, PRE-RoPE.  cos/sin: (T, d) fp32 caches from
    ``rope_full_cache``.  lens: (B,) valid key counts (None = all valid).
    Returns (B, H, T, d).

    vs ``dit_attention``: RoPE is applied inside the kernel (profiling showed
    the out-of-kernel fp32 RoPE stack/reshape relayouts cost ~0.9 ms/step at
    B=2, T=2560), the 1/sqrt(d) scale is folded into q, key padding is one
    broadcast add of a bias row precomputed outside the kernel (loop-
    invariant across diffusion steps, so XLA hoists it out of the sampler
    scan), and the softmax division is applied to the (bq, d) output instead
    of the (bq, T) matrix.
    """
    B, H, T, d = q.shape
    if T % block_q:
        raise ValueError(f"T={T} not a multiple of block_q={block_q}")
    # Clamp block_q to the VMEM budget: the (bq, T) fp32 logits plus the
    # (bq, T) prob tile dominate; ~5 MB is fixed (K/V, RoPE caches and fp32
    # RoPE transients).  Measured: bq=1280 at T=2560 bf16 wants 24.8 MB
    # against the 16 MB scoped-vmem limit; bq<=640 compiles and is fastest.
    budget = 10 * 1024 * 1024
    per_row = T * (4 + q.dtype.itemsize)
    while block_q > 128 and (block_q * per_row > budget or T % block_q):
        block_q //= 2
    scale = 1.0 / math.sqrt(d)
    if lens is None:
        masked = False

    grid = (B, H, T // block_q)
    kernel = functools.partial(_attn_kernel_v2, scale=scale, block_q=block_q)
    in_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T, d), lambda b, h, i: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T, d), lambda b, h, i: (b, h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, d), lambda b, h, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((T, d), lambda b, h, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, cos, sin]
    if masked:
        bias = jnp.where(jnp.arange(T)[None, :] < lens[:, None].astype(
            jnp.int32), 0.0, NEG_INF).astype(jnp.float32)
        # (B, 1, T) so the block's last-two dims satisfy Mosaic tiling.
        in_specs.append(pl.BlockSpec((1, 1, T), lambda b, h, i: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias[:, None, :])

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T, d), q.dtype)],
        out_shape=jax.ShapeDtypeStruct((B, H, T, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * d,
            bytes_accessed=(3 * B * H * T * d + B * H * T * d) * 2,
            transcendentals=B * H * T * T,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(*args)


def _attn_kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 masked: bool):
    b = pl.program_id(0)
    q = q_ref[0]                      # (bq, d) bf16
    k = k_ref[0]                      # (T, d) bf16
    v = v_ref[0]                      # (T, d) bf16

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (bq, T) f32

    if masked:
        n = lens_ref[b]
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(cols < n, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(q.dtype)   # bf16 probs onto the MXU

    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "masked"))
def dit_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  lens: jax.Array | None = None, *,
                  block_q: int = 512, masked: bool = True) -> jax.Array:
    """q/k/v: (B, H, T, d); lens: (B,) valid key counts (None = all valid).

    Returns (B, H, T, d) in q's dtype.  T must be a multiple of block_q
    (the DiT pipeline pads its context to a multiple of 512).
    """
    B, H, T, d = q.shape
    if T % block_q:
        raise ValueError(f"T={T} not a multiple of block_q={block_q}")
    # Same scoped-VMEM guard as the fused kernel: the (bq, T) fp32 logit and
    # prob tiles dominate; halve block_q until the tile budget fits.
    budget = 10 * 1024 * 1024
    per_row = T * (4 + q.dtype.itemsize)
    while block_q > 128 and (block_q * per_row > budget or T % block_q):
        block_q //= 2
    scale = 1.0 / math.sqrt(d)
    if lens is None:
        lens = jnp.full((B,), T, jnp.int32)
        masked = False

    qf = q.reshape(B * H, T, d)
    kf = k.reshape(B * H, T, d)
    vf = v.reshape(B * H, T, d)
    # per-(b,h) lens, indexed by program_id(0)
    lens_bh = jnp.repeat(lens.astype(jnp.int32), H)

    grid = (B * H, T // block_q)
    kernel = functools.partial(_attn_kernel, scale=scale, masked=masked)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, lens: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, d), lambda b, i, lens: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, d), lambda b, i, lens: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, lens: (b, i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, T, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * T * d,
            bytes_accessed=(3 * B * H * T * d + B * H * T * d) * 2,
            transcendentals=B * H * T * T,
        ),
        interpret=(jax.default_backend() == "cpu"),
    )(lens_bh, qf, kf, vf)
    return out.reshape(B, H, T, d)


def dit_attention_reference(q, k, v, lens=None):
    """jnp reference for parity tests (same math, materialised logits)."""
    B, H, T, d = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / math.sqrt(d)
    if lens is not None:
        mask = jnp.arange(T)[None, :] < lens[:, None]      # (B, T)
        s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _pair_swap(x: jax.Array) -> jax.Array:
    """Swap interleaved pairs on the last axis: (x0,x1,x2,x3) ->
    (x1,x0,x3,x2) — the companion of the signed sin cache (see ``_rope``)."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    return jnp.stack((x2[..., 1], x2[..., 0]), axis=-1).reshape(x.shape)


def dit_attention_fused_reference(q, k, v, cos, sin, lens=None):
    """jnp reference of the fused kernel's math (RoPE via the (T, d)
    cos/signed-sin caches, then attention); used for parity tests and as
    the recompute target of the custom-vjp backward."""

    def rope(x):
        xf = x.astype(jnp.float32)
        return xf * cos[None, None] + _pair_swap(xf) * sin[None, None]

    return dit_attention_reference(rope(q).astype(q.dtype),
                                   rope(k).astype(k.dtype), v, lens)


# ---------------------------------------------------------------------------
# Differentiable wrappers: Pallas kernels carry no autodiff rule, so training
# through the fused attention would fail at trace time (observed: jvp
# AssertionError in the v1 train step with a flash preset).  Forward runs the
# kernel; backward recomputes via the jnp reference (standard
# kernel-forward / XLA-backward pattern — gradients are the reference math's).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _fused_diff(block_q: int):
    @jax.custom_vjp
    def f(q, k, v, cos, sin, lens):
        return dit_attention_fused(q, k, v, cos, sin, lens, block_q=block_q)

    def fwd(q, k, v, cos, sin, lens):
        return (dit_attention_fused(q, k, v, cos, sin, lens,
                                    block_q=block_q),
                (q, k, v, cos, sin, lens))

    def bwd(res, g):
        q, k, v, cos, sin, lens = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_: dit_attention_fused_reference(
                q_, k_, v_, cos, sin, lens), q, k, v)
        dq, dk, dv = vjp(g.astype(q.dtype))
        return dq, dk, dv, None, None, None

    f.defvjp(fwd, bwd)
    return f


def dit_attention_fused_diff(q, k, v, cos, sin, lens=None, *,
                             block_q: int = 512):
    """``dit_attention_fused`` with a recompute backward (trainable)."""
    return _fused_diff(block_q)(q, k, v, cos, sin, lens)


@functools.lru_cache(maxsize=None)
def _plain_diff(block_q: int):
    @jax.custom_vjp
    def f(q, k, v, lens):
        return dit_attention(q, k, v, lens, block_q=block_q)

    def fwd(q, k, v, lens):
        return dit_attention(q, k, v, lens, block_q=block_q), (q, k, v, lens)

    def bwd(res, g):
        q, k, v, lens = res
        _, vjp = jax.vjp(
            lambda q_, k_, v_: dit_attention_reference(q_, k_, v_, lens),
            q, k, v)
        dq, dk, dv = vjp(g.astype(q.dtype))
        return dq, dk, dv, None

    f.defvjp(fwd, bwd)
    return f


def dit_attention_diff(q, k, v, lens=None, *, block_q: int = 512):
    """``dit_attention`` with a recompute backward (trainable)."""
    return _plain_diff(block_q)(q, k, v, lens)
