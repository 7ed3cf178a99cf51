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
# Scoped librosa stub: reference modules imported for golden generation need
# librosa (not installed).  The stub must NOT stay in sys.modules — a visible
# 'librosa' makes transformers think it's available and use it.  Tests call
# import_reference("modules.foo") which installs the stub, imports, and
# removes the stub again (imported reference modules keep their references).
# ---------------------------------------------------------------------------
import contextlib  # noqa: E402
import importlib  # noqa: E402
import types  # noqa: E402

import numpy as np  # noqa: E402

REFERENCE_ROOT = "/root/reference"


@contextlib.contextmanager
def librosa_stub():
    _extra = []
    # munch / dac are reference-only deps (config bag, VQ class) not
    # installed here; tiny functional stubs suffice for golden generation.
    if "munch" not in sys.modules:
        munch = types.ModuleType("munch")

        class Munch(dict):
            __getattr__ = dict.__getitem__
            __setattr__ = dict.__setitem__

        munch.Munch = Munch
        sys.modules["munch"] = munch
        _extra.append("munch")
    if "dac" not in sys.modules:
        dac = types.ModuleType("dac")
        dac.nn = types.ModuleType("dac.nn")
        dac.nn.quantize = types.ModuleType("dac.nn.quantize")

        class VectorQuantize:  # only referenced, never built in our configs
            def __init__(self, *a, **k):
                raise NotImplementedError

        dac.nn.quantize.VectorQuantize = VectorQuantize
        sys.modules["dac"] = dac
        sys.modules["dac.nn"] = dac.nn
        sys.modules["dac.nn.quantize"] = dac.nn.quantize
        _extra.extend(["dac", "dac.nn", "dac.nn.quantize"])
    if "librosa" in sys.modules:
        try:
            yield
        finally:
            for name in _extra:
                sys.modules.pop(name, None)
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
    try:
        yield
    finally:
        for name in ("librosa", "librosa.filters", "librosa.util", *_extra):
            sys.modules.pop(name, None)


def import_reference(module_name: str):
    """Import a /root/reference module (read-only golden source) with the
    librosa stub active only for the duration of the import."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    with librosa_stub():
        return importlib.import_module(module_name)
