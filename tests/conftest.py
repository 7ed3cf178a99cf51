"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding logic is exercised on a virtual CPU mesh (the TPU
analogue of a fake backend — the reference has no multi-device test
scaffolding at all, SURVEY §4).

Note: the axon TPU plugin registers itself via sitecustomize and overrides
JAX_PLATFORMS, so the env var alone is not enough — the jax.config update
below runs before any backend is initialised and reliably pins tests to CPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---------------------------------------------------------------------------
# librosa stub: the reference modules imported for golden generation require
# librosa (not installed).  One functional stub here, shared by every test
# file, so per-test stubs can't poison each other.
# ---------------------------------------------------------------------------
import types  # noqa: E402

import numpy as np  # noqa: E402


def _install_librosa_stub():
    if "librosa" in sys.modules:
        return
    from seedvc_tpu.dsp.mel import mel_filterbank

    librosa = types.ModuleType("librosa")
    librosa.filters = types.ModuleType("librosa.filters")
    librosa.filters.mel = (
        lambda *, sr, n_fft, n_mels, fmin=0.0, fmax=None, htk=False, **kw:
        mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk))
    librosa.util = types.ModuleType("librosa.util")
    librosa.util.normalize = lambda x, **kw: x
    librosa.util.pad_center = lambda data, *, size, **kw: np.pad(
        data, (int((size - len(data)) // 2),) * 2)
    librosa.util.tiny = lambda x: np.finfo(np.float32).tiny
    sys.modules["librosa"] = librosa
    sys.modules["librosa.filters"] = librosa.filters
    sys.modules["librosa.util"] = librosa.util


_install_librosa_stub()
