"""Sharded training step: one jitted SPMD program over a (data, model) mesh.

The reference's only multi-device path is HF Accelerate DDP
(``train_v2.py:146-171``).  Here parameters carry tensor-parallel shardings
(``parallel/sharding.py``), the batch is sharded over ``data``, and XLA
inserts the gradient all-reduce and TP collectives automatically.  Optimizer
state (AdamW mu/nu) embeds the parameter paths, so the same path-regex rules
shard it identically to the parameters.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seedvc_tpu.models.vc import VCModel
from seedvc_tpu.parallel.mesh import AXES
from seedvc_tpu.parallel.sharding import logical_to_sharding


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array
    # exponential moving average of params (None = disabled).  The reference
    # ships EMA weights for its models (the tiny model is ``_ema.pth``;
    # ``modules/commons.py:423-432`` loads them) — training produces them here.
    ema_params: Any = None


def init_state(model: VCModel, optimizer: optax.GradientTransformation,
               rng: jax.Array, example_batch: dict) -> TrainState:
    variables = model.init(
        rng,
        example_batch["s_alt"], example_batch["s_ori"], example_batch["mels"],
        example_batch["mel_lens"], example_batch["style"],
        rngs_dict={"prompt": rng, "t": rng, "noise": rng, "drop": rng},
        deterministic=True,
    )
    params = variables["params"]
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def shard_state(state: TrainState, mesh: Mesh,
                fsdp: bool = False, fsdp_min_elems: int = 65536) -> TrainState:
    """Place a TrainState onto the mesh with TP (and optionally FSDP)
    shardings.  ``fsdp=True`` scatters params / AdamW moments / EMA over the
    ``data`` axis (ZeRO-3 analogue; ``parallel/sharding.py``) — XLA inserts
    the weight all-gathers and emits reduce-scatter for the gradients."""
    fsdp_axis = AXES.data if fsdp else None

    def place(tree):
        return jax.device_put(
            tree, logical_to_sharding(tree, mesh, fsdp_axis=fsdp_axis,
                                      fsdp_min_elems=fsdp_min_elems))

    return TrainState(
        params=place(state.params),
        opt_state=place(state.opt_state),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        ema_params=(None if state.ema_params is None
                    else place(state.ema_params)),
    )


def make_sharded_train_step(model: VCModel,
                            optimizer: optax.GradientTransformation,
                            mesh: Mesh,
                            teacher_params=None,
                            distill_weight: float = 0.5,
                            weight_ema_decay: float = 0.0,
                            compute_dtype=None):
    """Build step_fn(state, batch, rng) -> (state, metrics), jitted SPMD.

    With ``teacher_params``, adds the reference's output-level distillation
    loss (``train.py:871-887``): 0.5 * MSE between the student's and the
    frozen teacher's estimator outputs on the same noised inputs (identical
    rngs -> identical t/noise/prompt draws).

    ``compute_dtype=jnp.bfloat16`` runs the model compute in bf16 with f32
    master weights and f32 loss/grad accumulation — the TPU analogue of the
    reference's fp16 autocast (``train_v2.py:700``); flax layers take their
    computation dtype from the activations, and the CFM loss reduction is
    f32 regardless (``models/cfm.py``)."""

    replicated = NamedSharding(mesh, P())

    # bf16 compute casts only the big activations; F0 (Hz values feeding the
    # coarse-bin quantiser) and the length scalars stay f32/int.
    _CAST_KEYS = ("s_alt", "s_ori", "mels", "style")

    def cast(batch):
        if compute_dtype is None:
            return batch
        return {k: (v.astype(compute_dtype) if k in _CAST_KEYS else v)
                for k, v in batch.items()}

    def loss_fn(params, batch, rng):
        batch = cast(batch)
        keys = jax.random.split(rng, 4)
        rngs = {"prompt": keys[0], "t": keys[1], "noise": keys[2],
                "drop": keys[3]}
        kw = dict(f0=batch.get("f0"), s_lens=batch.get("s_lens"),
                  f0_lens=batch.get("f0_lens"))
        loss, out = model.apply(
            {"params": params},
            batch["s_alt"], batch["s_ori"], batch["mels"],
            batch["mel_lens"], batch["style"],
            rngs_dict=rngs, deterministic=True, **kw,
        )
        if teacher_params is not None:
            _, t_out = model.apply(
                {"params": teacher_params},
                batch["s_alt"], batch["s_ori"], batch["mels"],
                batch["mel_lens"], batch["style"],
                rngs_dict=rngs, deterministic=True, **kw,
            )
            t_out = jax.lax.stop_gradient(t_out)
            loss = loss + distill_weight * jnp.mean((out - t_out) ** 2)
        return loss

    def step_fn(state: TrainState, batch: dict, rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_ema = state.ema_params
        if weight_ema_decay > 0 and state.ema_params is not None:
            d = weight_ema_decay
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1 - d) * p, state.ema_params, new_params)
        return (
            TrainState(new_params, new_opt, state.step + 1, new_ema),
            {"loss": loss, "grad_norm": gnorm},
        )

    jitted = jax.jit(step_fn, donate_argnums=(0,))

    def run(state: TrainState, batch: dict, rng: jax.Array):
        batch = _shard_batch(batch, mesh)
        return jitted(state, batch, jax.device_put(rng, replicated))

    return run


def _shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Batch-axis tensors sharded over ``data``; scalars (traced true
    lengths) replicated."""
    return {
        k: jax.device_put(v, NamedSharding(
            mesh,
            P() if v.ndim == 0 else P(AXES.data, *([None] * (v.ndim - 1)))))
        for k, v in batch.items()
    }


def make_sharded_eval_step(model: VCModel, mesh: Mesh):
    """Validation loss only (no grads/update) — reference ``validate()``
    (``train.py:1034-1056``) computes the same CFM loss on held-out audio."""
    replicated = NamedSharding(mesh, P())

    def loss_fn(params, batch, rng):
        keys = jax.random.split(rng, 4)
        rngs = {"prompt": keys[0], "t": keys[1], "noise": keys[2],
                "drop": keys[3]}
        loss, _ = model.apply(
            {"params": params},
            batch["s_alt"], batch["s_ori"], batch["mels"],
            batch["mel_lens"], batch["style"],
            rngs_dict=rngs, deterministic=True,
            f0=batch.get("f0"), s_lens=batch.get("s_lens"),
            f0_lens=batch.get("f0_lens"),
        )
        return loss

    jitted = jax.jit(loss_fn)

    def run(params, batch: dict, rng):
        batch = _shard_batch(batch, mesh)
        return jitted(params, batch, jax.device_put(rng, replicated))

    return run
