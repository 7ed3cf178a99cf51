"""Test configuration: force an 8-virtual-device CPU platform.

Must run before jax is imported anywhere: multi-chip sharding logic is
exercised on a virtual CPU mesh (the TPU analogue of a fake backend — the
reference has no multi-device test scaffolding at all, SURVEY §4).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override axon/TPU — tests run on host
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
