"""Conditional flow matching: OT-CFM training loss + Euler ODE sampler.

Re-design of the reference BASECFM (``modules/flow_matching.py``):

- training (``:113-155``): t ~ U(0,1), straight-path interpolant
  ``y = (1-(1-σ)t)·z + t·x1`` with target velocity ``u = x1 - (1-σ)·z``;
  loss masked to the region [prompt_len, x_len) only.  The reference's
  per-sample Python loop becomes a vectorised mask.
- inference (``:31-112``): fixed-step Euler solver over
  ``t_span = linspace(0, 1, n+1)``, classifier-free guidance by stacking the
  conditional batch with a null batch (zeroed prompt/style/mu) and combining
  ``(1+r)·cond − r·uncond``; the prompt region of x is re-zeroed every step.

TPU-first: the sampler is a ``lax.scan`` over steps (one compiled program
regardless of step count), shapes static, the 2B CFG batch is the natural
axis to shard over the device mesh's ``data`` axis.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from seedvc_tpu.core.config import ModelParams
from seedvc_tpu.core.utils import sequence_mask
from seedvc_tpu.models.dit import DiT

SIGMA_MIN = 1e-6


class CFM(nn.Module):
    """Container module: owns the DiT estimator; exposes the training loss as
    ``__call__`` and the raw vector field as ``estimate``."""

    params_cfg: ModelParams

    def setup(self):
        self.estimator = DiT(self.params_cfg, name="estimator")

    def estimate(self, x, prompt_x, x_lens, t, style, cond,
                 cond_drop=None, deterministic=True, static_cond=None):
        return self.estimator(x, prompt_x, x_lens, t, style, cond,
                              cond_drop=cond_drop, deterministic=deterministic,
                              static_cond=static_cond)

    def precompute_cond(self, x, prompt_x, x_lens, style, cond,
                        cond_drop=None):
        """Step-invariant conditioning for the Euler sampler (see
        ``DiT.__call__`` return_static)."""
        t0 = jnp.zeros((x.shape[0],), jnp.float32)
        return self.estimator(x, prompt_x, x_lens, t0, style, cond,
                              cond_drop=cond_drop, return_static=True)

    def __call__(self, x1, x_lens, prompt_lens, mu, style, *,
                 rng_t, rng_noise, rng_drop=None, deterministic=True):
        """OT-CFM loss.

        x1: (B, T, C) target mel; x_lens/prompt_lens: (B,) ints;
        mu: (B, T, D) regulated content; style: (B, S).
        Returns (loss, estimator_out).
        """
        B, T, C = x1.shape
        dc = self.params_cfg.DiT
        t = jax.random.uniform(rng_t, (B,), dtype=jnp.float32)
        z = jax.random.normal(rng_noise, x1.shape, dtype=x1.dtype)

        tb = t[:, None, None].astype(x1.dtype)
        y = (1 - (1 - SIGMA_MIN) * tb) * z + tb * x1
        u = x1 - (1 - SIGMA_MIN) * z

        pos = jnp.arange(T)[None, :, None]
        in_prompt = pos < prompt_lens[:, None, None]
        prompt = jnp.where(in_prompt, x1, 0.0)
        y = jnp.where(in_prompt, 0.0, y)
        if dc.zero_prompt_speech_token:
            mu = jnp.where(in_prompt, 0.0, mu)

        cond_drop = None
        if rng_drop is not None and dc.class_dropout_prob > 0:
            cond_drop = jax.random.bernoulli(
                rng_drop, dc.class_dropout_prob, (B,)).astype(x1.dtype)

        out = self.estimator(y, prompt, x_lens, t, style, mu,
                             cond_drop=cond_drop, deterministic=deterministic)

        # Masked loss over [prompt_len, x_len): per-sample mean over valid
        # elements, then batch mean (reference ``:150-153``).
        valid = (~in_prompt) & (pos < x_lens[:, None, None])
        valid = valid.astype(jnp.float32)
        diff = (out - u).astype(jnp.float32)
        if self.params_cfg.reg_loss_type == "l2":
            per = (diff * diff) * valid
        else:
            per = jnp.abs(diff) * valid
        denom = jnp.maximum(valid.sum(axis=(1, 2)) * C, 1.0)
        # valid is (B, T, 1); each valid frame contributes C elements.
        loss = (per.sum(axis=(1, 2)) / denom).mean()
        return loss, out + (1 - SIGMA_MIN) * z


def euler_solve(
    estimate_fn: Callable,
    key: jax.Array,
    mu: jax.Array,          # (B, T, D) regulated content
    x_lens: jax.Array | None,  # (B,); None = full window (no masking passes)
    prompt: jax.Array,      # (B, T, C) prompt mel, zero-padded past prompt_len
    prompt_len,             # int or traced scalar
    style: jax.Array,       # (B, S)
    n_mels: int,
    n_timesteps: int,
    temperature: float = 1.0,
    cfg_rate: float = 0.7,
    t_scheduler: str = "linear",
    shard_axis: str | None = None,
    seq_shard_axis: str | None = None,
    precompute_fn: Callable | None = None,
) -> jax.Array:
    """Euler CFG sampler. estimate_fn(x, prompt_x, x_lens, t, style, mu) -> v.

    Returns the generated mel (B, T, C); the prompt region holds zeros, as in
    the reference (``flow_matching.py:110``).

    ``shard_axis``: mesh axis name to shard the CFG-stacked batch over
    (SURVEY §2.10: the duplicated cond/uncond batch is a natural 2x batch
    axis to split across devices; XLA inserts the collectives).  Requires a
    surrounding Mesh context when set.

    ``seq_shard_axis``: mesh axis name to shard the TIME axis of the
    (B, T, *) activations over (SURVEY §5.7's sequence-parallel stretch
    goal, expressed TPU-natively: sharding constraints on the activations,
    XLA's SPMD partitioner inserts the attention all-gathers and the
    conv halo exchanges).  Composable with ``shard_axis`` (CFG branches x
    sequence sub-blocks).  Requires ``use_flash_attention=False`` in the
    DiT config — the custom Pallas kernel is not partitionable over T.

    ``precompute_fn(x, prompt_x, x_lens, style, mu) -> static_cond``: when
    given, the step-invariant conditioning (projected content + static half
    of the DiT merge linear) is computed ONCE before the scan and
    ``estimate_fn`` is called with it as a trailing argument — hoisting ~7
    GFLOP/step of invariant matmuls out of the 25-step loop.
    """
    B, T, _ = mu.shape
    z = jax.random.normal(key, (B, T, n_mels), mu.dtype) * temperature
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    if t_scheduler == "cosine":
        # v2 schedule (``modules/v2/cfm.py:48``).
        t_span = t_span - (jnp.cos(jnp.pi / 2 * t_span) - 1 + t_span)

    pos = jnp.arange(T)[None, :, None]
    in_prompt = pos < jnp.asarray(prompt_len)[..., None, None]
    prompt_x = jnp.where(in_prompt, prompt, 0.0)
    x0 = jnp.where(in_prompt, 0.0, z)

    use_cfg = cfg_rate > 0

    def shard(a):
        if shard_axis is None and seq_shard_axis is None:
            return a
        from jax.sharding import PartitionSpec as P

        dims = [shard_axis] + [None] * (a.ndim - 1)
        if a.ndim >= 3 and seq_shard_axis is not None:
            dims[1] = seq_shard_axis  # (B, T, *): shard time
        spec = P(*dims)
        return jax.lax.with_sharding_constraint(a, spec)

    if use_cfg:
        est_prompt = shard(jnp.concatenate([prompt_x, jnp.zeros_like(prompt_x)], 0))
        est_style = shard(jnp.concatenate([style, jnp.zeros_like(style)], 0))
        est_mu = shard(jnp.concatenate([mu, jnp.zeros_like(mu)], 0))
        est_lens = (None if x_lens is None
                    else shard(jnp.concatenate([x_lens, x_lens], 0)))
    else:
        est_prompt, est_style, est_mu = (
            shard(prompt_x), shard(style), shard(mu))
        est_lens = None if x_lens is None else shard(x_lens)

    if precompute_fn is not None:
        x_shape = (est_mu.shape[0], T, n_mels)
        static_cond = precompute_fn(jnp.zeros(x_shape, mu.dtype), est_prompt,
                                    est_lens, est_style, est_mu)
        est_args = (static_cond,)
    else:
        est_args = ()

    def step(x, ts):
        t_cur, dt = ts
        if use_cfg:
            xx = shard(jnp.concatenate([x, x], 0))
            tt = jnp.full((2 * B,), t_cur, mu.dtype)
            v = estimate_fn(xx, est_prompt, est_lens, tt, est_style, est_mu,
                            *est_args)
            v_cond, v_null = jnp.split(v, 2, axis=0)
            v = (1.0 + cfg_rate) * v_cond - cfg_rate * v_null
        else:
            tt = jnp.full((B,), t_cur, mu.dtype)
            v = estimate_fn(x, est_prompt, est_lens, tt, est_style, est_mu,
                            *est_args)
        x = (x + dt.astype(jnp.float32) * v.astype(jnp.float32)).astype(x.dtype)
        x = jnp.where(in_prompt, jnp.zeros((), x.dtype), x)
        return x, None

    ts = jnp.stack([t_span[:-1], t_span[1:] - t_span[:-1]], axis=1)
    x_final, _ = jax.lax.scan(step, x0, ts)
    return x_final


def make_sampler(cfm_module: CFM, params, **kwargs) -> Callable:
    """Bind a CFM module + params into a jittable sampler closure (with the
    step-invariant conditioning hoisted out of the scan)."""

    def estimate_fn(x, prompt_x, x_lens, t, style, mu, static_cond=None):
        return cfm_module.apply(params, x, prompt_x, x_lens, t, style, mu,
                                static_cond=static_cond,
                                method=cfm_module.estimate)

    def precompute_fn(x, prompt_x, x_lens, style, mu):
        return cfm_module.apply(params, x, prompt_x, x_lens, style, mu,
                                method=cfm_module.precompute_cond)

    return partial(euler_solve, estimate_fn, precompute_fn=precompute_fn,
                   **kwargs)
