"""Device-mesh construction and basic sharding helpers.

The reference scales only via HF Accelerate DDP over NCCL
(``train_v2.py:146-171``).  The TPU-native design instead expresses all
parallelism as shardings over a named :class:`jax.sharding.Mesh`:

- ``data``  — utterance batch (DP) and the duplicated CFG branch batch;
  gradients reduce over this axis (XLA emits the collectives).
- ``model`` — tensor parallelism for the DiT / AR weights (attention heads
  and FFN hidden dim sharded; activations gathered via ICI collectives).

Multi-host: callers run ``jax.distributed.initialize()`` before building the
mesh; ``jax.devices()`` then spans all hosts and DCN traffic is confined to
the (outer-most) ``data`` axis.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class AxisNames:
    data: str = "data"
    model: str = "model"


AXES = AxisNames()


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Create a (data, model) mesh.

    n_data defaults to len(devices) // n_model.  Device order follows
    jax.devices(), which is ICI-contiguous on a TPU slice, so the inner
    (model) axis rides ICI neighbours.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    total = devices.size
    if n_data is None:
        n_data = total // n_model
    if n_data * n_model != total:
        raise ValueError(f"mesh {n_data}x{n_model} != {total} devices")
    return Mesh(devices.reshape(n_data, n_model), (AXES.data, AXES.model))


def shard_batch(mesh: Mesh, tree):
    """Shard the leading (batch) axis of every leaf over the data axis."""
    def to_sharded(x):
        spec = P(AXES.data, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(to_sharded, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
