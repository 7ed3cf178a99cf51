"""Small shared utilities (masks, padding helpers, PRNG splitting)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """Boolean mask of shape (B, max_length), True where t < lengths[b].

    TPU-native analogue of the reference's ``sequence_mask``
    (``modules/commons.py``): max_length must be static under jit.
    """
    positions = jnp.arange(max_length)[None, :]
    return positions < lengths[:, None]


def round_up(x: int, multiple: int) -> int:
    """Round x up to the nearest multiple (for MXU/VPU-friendly padding)."""
    return -(-x // multiple) * multiple


def pad_axis_to(x: jax.Array, axis: int, target: int, value=0.0) -> jax.Array:
    """Pad `axis` of x up to `target` length with a constant value."""
    cur = x.shape[axis]
    if cur >= target:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - cur)
    return jnp.pad(x, pads, constant_values=value)


def str2bool(v) -> bool:
    """argparse-friendly bool (reference ``modules/commons.py:10-18``)."""
    return str(v).lower() in ("yes", "true", "t", "y", "1")
