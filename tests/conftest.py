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
