"""Optimizers and LR schedules (optax).

Mirrors the reference's optimizer recipe (``optimizers.py:11-96``): AdamW with
betas (0.9, 0.98), eps 1e-6, weight decay 0.01, and either a per-step
exponential decay (gamma 0.999996) or the v2 warmup->cosine schedule
(``optimizers.py:107-138``).
"""

from __future__ import annotations

import optax


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
