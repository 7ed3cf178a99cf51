"""Optimizers and LR schedules (optax).

Mirrors the reference's optimizer recipe (``optimizers.py:11-96``): AdamW with
betas (0.9, 0.98), eps 1e-6, weight decay 0.01, and either a per-step
exponential decay (gamma 0.999996) or the v2 warmup->cosine schedule
(``optimizers.py:107-138``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LRScaleState(NamedTuple):
    """Mutable LR multiplier carried in opt_state.

    The reference halves the LR on loss plateaus at runtime
    (``train.py:1122-1141``).  Under ``jax.jit`` a Python-float multiplier
    captured in the schedule closure is baked in at trace time, so the
    halving would be a silent no-op; carrying the scale as an opt_state leaf
    makes it an ordinary traced input of the compiled step."""

    scale: jax.Array


def lr_scale(init: float = 1.0) -> optax.GradientTransformation:
    """Final-position transform multiplying updates by a runtime scale."""

    def init_fn(params):
        del params
        return LRScaleState(jnp.asarray(init, jnp.float32))

    def update_fn(updates, state, params=None):
        del params
        updates = jax.tree_util.tree_map(
            lambda u: u * state.scale.astype(u.dtype), updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def with_lr_scale(opt: optax.GradientTransformation,
                  init: float = 1.0) -> optax.GradientTransformation:
    """Chain ``opt`` with a trailing :func:`lr_scale`; use
    :func:`get_lr_scale` / :func:`set_lr_scale` on the resulting opt_state."""
    return optax.chain(opt, lr_scale(init))


def get_lr_scale(opt_state) -> float:
    assert isinstance(opt_state[-1], LRScaleState), "not a with_lr_scale state"
    return float(opt_state[-1].scale)


def set_lr_scale(opt_state, value: float):
    assert isinstance(opt_state[-1], LRScaleState), "not a with_lr_scale state"
    return opt_state[:-1] + (LRScaleState(jnp.asarray(value, jnp.float32)),)


def warmup_cosine(base_lr: float, warmup_steps: int, total_steps: int,
                  final_scale: float = 0.1) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=base_lr * final_scale,
    )


def exponential(base_lr: float, gamma: float = 0.999996) -> optax.Schedule:
    return lambda step: base_lr * gamma ** step


def make_optimizer(
    lr: float | optax.Schedule = 1e-4,
    *,
    grad_clip: float = 10.0,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
    )


def make_multi_optimizer(
    lr,
    *,
    module_keys=("cfm", "length_regulator"),
    grad_clip: float = 10.0,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.98,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    """Per-module AdamW with PER-MODULE gradient clipping.

    Exact analogue of the reference ``MultiOptimizer`` (``optimizers.py:
    11-96``) + the v1 trainer's per-module ``clip_grad_norm_`` and separate
    ``optimizer.step('cfm') / step('length_regulator')`` calls
    (``train.py:889-894``): each top-level module gets its own AdamW chain,
    so the clip norm is computed per module rather than globally.

    ``lr`` may be a float/schedule (shared) or a dict {module_key: schedule}.
    """
    if not isinstance(lr, dict):
        lr = {k: lr for k in module_keys}
    transforms = {
        k: optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.adamw(lr[k], b1=b1, b2=b2, eps=eps,
                        weight_decay=weight_decay),
        )
        for k in module_keys
    }

    def label_fn(params):
        return {k: k for k in params}

    return optax.multi_transform(transforms, label_fn)
