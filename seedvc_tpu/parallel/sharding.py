"""Parameter sharding rules (Megatron-style tensor parallelism).

Rules map parameter-tree paths to PartitionSpecs.  The DiT/AR transformer
uses the classic column/row split: QKV and FFN-in weights shard their output
(hidden) dimension over the ``model`` axis, the output projections shard
their input dimension, so each attention+FFN pair needs exactly one
all-reduce (inserted automatically by XLA at the sharding boundary).

The reference has no tensor parallelism at all (SURVEY §2.10) — this module
is new, TPU-first functionality.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seedvc_tpu.parallel.mesh import AXES

# (regex over '/'-joined param path, PartitionSpec) — first match wins.
# Flax linen Dense kernels are (in, out); Conv kernels are (k, in, out).
DIT_RULES: Sequence[tuple[str, P]] = (
    # attention: fused qkv projection -> column parallel (out dim sharded)
    (r".*attention/wqkv/kernel", P(None, AXES.model)),
    (r".*attention/wo/kernel", P(AXES.model, None)),
    # SwiGLU: w1/w3 column parallel, w2 row parallel
    (r".*feed_forward/w1/kernel", P(None, AXES.model)),
    (r".*feed_forward/w3/kernel", P(None, AXES.model)),
    (r".*feed_forward/w2/kernel", P(AXES.model, None)),
    # biases of column-parallel layers follow the out dim
    (r".*attention/wqkv/bias", P(AXES.model)),
    (r".*feed_forward/w[13]/bias", P(AXES.model)),
)


def _spec_for(path: str, rules: Sequence[tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()  # replicated


def _add_fsdp_axis(spec: P, shape: tuple[int, ...], mesh: Mesh,
                   axis: str, min_elems: int) -> P:
    """ZeRO-3/FSDP-style augmentation of a (possibly TP-sharded) spec: shard
    the largest still-unsharded dimension of a large-enough parameter over
    ``axis``.  Parameters and optimizer moments then live scattered over the
    data axis; XLA's SPMD partitioner inserts the weight all-gathers at use
    and turns the gradient all-reduce into a reduce-scatter — the TPU-native
    expression of FSDP (no wrapper modules, no hooks)."""
    size = 1
    for d in shape:
        size *= d
    if size < min_elems or axis not in mesh.shape:
        return spec
    n = mesh.shape[axis]
    dims = list(spec) + [None] * (len(shape) - len(spec))
    best = -1
    for i, (d, s) in enumerate(zip(shape, dims)):
        if s is None and d % n == 0 and (best < 0 or d > shape[best]):
            best = i
    if best < 0:
        return spec
    dims[best] = axis
    return P(*dims)


def logical_to_sharding(params, mesh: Mesh,
                        rules: Sequence[tuple[str, P]] = DIT_RULES,
                        fsdp_axis: str | None = None,
                        fsdp_min_elems: int = 65536):
    """Return a pytree of NamedShardings matching `params`' structure.

    ``fsdp_axis``: additionally shard every parameter >= ``fsdp_min_elems``
    elements over this mesh axis (see ``_add_fsdp_axis``).  Composes with
    the TP rules: a QKV kernel can be (data, model)-sharded at once."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        parts = []
        for k in kp:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        return "/".join(parts)

    def to_sharding(kp, leaf):
        spec = _spec_for(path_str(kp), rules)
        # Drop axes that don't divide the dimension (e.g. tiny test shapes).
        if spec != P():
            ok = True
            for dim, axis in zip(leaf.shape, spec):
                if axis is not None and dim % mesh.shape[axis] != 0:
                    ok = False
            if not ok:
                spec = P()
        if fsdp_axis is not None and hasattr(leaf, "shape"):
            spec = _add_fsdp_axis(spec, leaf.shape, mesh, fsdp_axis,
                                  fsdp_min_elems)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def dit_param_sharding(params, mesh: Mesh):
    """Sharding pytree for the DiT parameter tree (TP over `model` axis)."""
    return logical_to_sharding(params, mesh, DIT_RULES)
