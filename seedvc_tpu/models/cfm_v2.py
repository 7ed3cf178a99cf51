"""v2 CFM: cosine t-schedule + multi-condition CFG Euler sampler.

Re-design of ``modules/v2/cfm.py``:

- inference uses the cosine schedule ``t <- t - (cos(pi t/2) - 1 + t)``
  (``cfm.py:48``),
- multi-condition CFG (MegaTTS3, ``cfm.py:113-125``): a 3-way stacked batch
  [full / text-only / unconditional] combined as
  ``(1 + r0 + r1)·cond_both − r0·uncond − r1·cond_txt``; degenerate cases
  when either rate is 0 collapse to 2-way stacks (``:88-112``), and
  ``random_voice`` anonymisation zeroes prompt+style (``:77-87``),
- training loss identical to v1 OT-CFM with L1 (``cfm.py:135-178``).

TPU-first: one ``lax.scan`` over steps; the stacked CFG batch is built once
outside the loop.  All four CFG modes compile to distinct fixed-shape
programs selected statically by (r0>0, r1>0, random_voice).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

SIGMA_MIN = 1e-6


def cosine_t_span(n_timesteps: int) -> jax.Array:
    t = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    return t - (jnp.cos(jnp.pi / 2 * t) - 1 + t)


def euler_solve_multicfg(
    estimate_fn: Callable,
    key: jax.Array,
    mu: jax.Array,          # (B, T, D) regulated content
    x_lens: jax.Array,      # (B,)
    prompt: jax.Array,      # (B, T, C) prompt mel zero-padded
    prompt_len,
    style: jax.Array,       # (B, S)
    n_mels: int,
    n_timesteps: int = 10,
    temperature: float = 1.0,
    cfg_rates: Sequence[float] = (0.5, 0.5),
    random_voice: bool = False,
    shard_axis: str | None = None,
    seq_shard_axis: str | None = None,
    precompute_fn: Callable | None = None,
) -> jax.Array:
    """estimate_fn(x, prompt_x, x_lens, t, style, mu) -> velocity.

    ``x_lens=None`` statically removes every masking pass (full window).
    ``precompute_fn(x, prompt_x, x_lens, style, mu) -> static_cond`` hoists
    the step-invariant conditioning out of the scan (see v1
    ``euler_solve``).

    ``shard_axis``: mesh axis name to shard the stacked CFG batch over —
    the v2 3-way stack [full / text-only / unconditional] is the natural
    batch axis to split across devices (SURVEY §2.10; mirrors v1
    ``euler_solve``'s ``shard_axis``).  Requires a surrounding Mesh context.

    ``seq_shard_axis``: shard the TIME axis of the (B, T, *) activations
    over a mesh axis (sequence parallelism; see v1 ``euler_solve`` — same
    contract, composable with ``shard_axis``, needs the non-Pallas
    attention path).
    """
    B, T, _ = mu.shape
    r0, r1 = float(cfg_rates[0]), float(cfg_rates[1])
    z = jax.random.normal(key, (B, T, n_mels), mu.dtype) * temperature

    pos = jnp.arange(T)[None, :, None]
    in_prompt = pos < jnp.asarray(prompt_len)[..., None, None]
    prompt_x = jnp.where(in_prompt, prompt, 0.0)
    x0 = jnp.where(in_prompt, 0.0, z)

    zero_p = jnp.zeros_like(prompt_x)
    zero_s = jnp.zeros_like(style)
    zero_m = jnp.zeros_like(mu)

    if random_voice:
        # [text-only / unconditional]
        branches = [(zero_p, zero_s, mu), (zero_p, zero_s, zero_m)]
        weights = (1.0 + r0, -r0)
    elif r0 == 0 and r1 == 0:
        branches = [(prompt_x, style, mu)]
        weights = (1.0,)
    elif r0 == 0:
        # [full / text-only]  (VoiceBox CFG on speaker)
        branches = [(prompt_x, style, mu), (zero_p, zero_s, mu)]
        weights = (1.0 + r1, -r1)
    elif r1 == 0:
        # [full / unconditional]
        branches = [(prompt_x, style, mu), (zero_p, zero_s, zero_m)]
        weights = (1.0 + r0, -r0)
    else:
        # [full / text-only / unconditional] (MegaTTS3)
        branches = [(prompt_x, style, mu), (zero_p, zero_s, mu),
                    (zero_p, zero_s, zero_m)]
        weights = (1.0 + r0 + r1, -r1, -r0)

    def shard(a):
        if shard_axis is None and seq_shard_axis is None:
            return a
        from jax.sharding import PartitionSpec as P

        dims = [shard_axis] + [None] * (a.ndim - 1)
        if a.ndim >= 3 and seq_shard_axis is not None:
            dims[1] = seq_shard_axis  # (B, T, *): shard time
        spec = P(*dims)
        return jax.lax.with_sharding_constraint(a, spec)

    n_br = len(branches)
    est_prompt = shard(jnp.concatenate([b[0] for b in branches], 0))
    est_style = shard(jnp.concatenate([b[1] for b in branches], 0))
    est_mu = shard(jnp.concatenate([b[2] for b in branches], 0))
    est_lens = (None if x_lens is None
                else shard(jnp.concatenate([x_lens] * n_br, 0)))
    w = jnp.asarray(weights, mu.dtype)

    t_span = cosine_t_span(n_timesteps)

    if precompute_fn is not None:
        static_cond = precompute_fn(
            jnp.zeros((n_br * B, T, n_mels), mu.dtype), est_prompt, est_lens,
            est_style, est_mu)
        est_args = (static_cond,)
    else:
        est_args = ()

    def step(x, ts):
        t_cur, dt = ts
        xx = shard(jnp.concatenate([x] * n_br, 0))
        tt = jnp.full((n_br * B,), t_cur, mu.dtype)
        v = estimate_fn(xx, est_prompt, est_lens, tt, est_style, est_mu,
                        *est_args)
        v = v.reshape(n_br, B, T, n_mels)
        v = jnp.tensordot(w, v, axes=1)
        x = (x + dt.astype(jnp.float32) * v.astype(jnp.float32)).astype(x.dtype)
        x = jnp.where(in_prompt, jnp.zeros((), x.dtype), x)
        return x, None

    ts = jnp.stack([t_span[:-1], t_span[1:] - t_span[:-1]], axis=1)
    x_final, _ = jax.lax.scan(step, x0, ts)
    return x_final


def cfm_v2_loss(estimate_fn, x1, x_lens, prompt_lens, mu, style, *,
                rng_t, rng_noise, loss_type: str = "l1"):
    """OT-CFM loss (``cfm.py:135-178``), vectorised masks."""
    B, T, C = x1.shape
    t = jax.random.uniform(rng_t, (B,), dtype=jnp.float32)
    z = jax.random.normal(rng_noise, x1.shape, dtype=x1.dtype)
    tb = t[:, None, None].astype(x1.dtype)
    y = (1 - (1 - SIGMA_MIN) * tb) * z + tb * x1
    u = x1 - (1 - SIGMA_MIN) * z

    pos = jnp.arange(T)[None, :, None]
    in_prompt = pos < prompt_lens[:, None, None]
    prompt = jnp.where(in_prompt, x1, 0.0)
    y = jnp.where(in_prompt, 0.0, y)

    out = estimate_fn(y, prompt, x_lens, t, style, mu)
    valid = ((~in_prompt) & (pos < x_lens[:, None, None])).astype(jnp.float32)
    diff = (out - u).astype(jnp.float32)
    per = diff * diff if loss_type == "l2" else jnp.abs(diff)
    per = per * valid
    denom = jnp.maximum(valid.sum(axis=(1, 2)) * C, 1.0)
    return (per.sum(axis=(1, 2)) / denom).mean()
