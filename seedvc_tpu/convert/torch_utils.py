"""Layout converters: torch state_dict tensors -> flax parameter arrays.

Conventions:
- torch Conv1d weight (out, in, k)      -> flax Conv kernel (k, in, out)
- torch Conv2d weight (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out)
- torch Linear weight (out, in)         -> flax Dense kernel (in, out)
- torch BatchNorm running stats         -> EvalBatchNorm {mean, var, scale, bias}
- weight-norm parameterizations (weight_g, weight_v) are folded into plain
  weights at conversion time (``fold_weight_norm``) — the TPU modules use
  unnormalized weights (see e.g. seedvc_tpu/nn/wavenet.py docstring).
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv1d_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 1, 0)


def conv2d_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    return _np(w).transpose(1, 0)


def bn_params(sd: dict, prefix: str, affine: bool = True) -> dict:
    out = {
        "mean": _np(sd[f"{prefix}.running_mean"]),
        "var": _np(sd[f"{prefix}.running_var"]),
    }
    if affine:
        out["scale"] = _np(sd[f"{prefix}.weight"])
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def fold_weight_norm(sd: dict, prefix: str) -> np.ndarray:
    """Fold torch weight_norm (weight_g, weight_v) into a plain weight.

    w = g * v / ||v||, with the norm over all dims except dim 0.
    """
    g = _np(sd[f"{prefix}.weight_g"])
    v = _np(sd[f"{prefix}.weight_v"])
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
    return g * v / norm
