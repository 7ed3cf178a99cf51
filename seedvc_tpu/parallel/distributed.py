"""Multi-host initialisation (SURVEY §2.10 / §5.8).

The reference's only distributed path is HF Accelerate DDP over NCCL
(``train_v2.py:146-171``), configured by ``accelerate launch`` env vars.
The TPU-native equivalent is ``jax.distributed.initialize`` before any
backend use: after it, ``jax.devices()`` spans every host in the slice and
the (data, model) mesh from :mod:`seedvc_tpu.parallel.mesh` lays DP across
hosts (DCN) and TP within a host's ICI neighbourhood.

On Cloud TPU the coordinator/process env is injected by the runtime and
``jax.distributed.initialize()`` needs no arguments; bare-metal/multi-process
CPU testing passes them explicitly (or via the standard env vars
``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``).
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Returns True if a multi-process runtime was initialised, False when
    running single-process (no coordinator configured) — callers can always
    call this unconditionally before :func:`seedvc_tpu.parallel.mesh.make_mesh`.
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "JAX_PROCESS_ID")

    on_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                      or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not (coordinator_address or on_tpu_pod):
        return False  # single-process run

    import jax

    kwargs = {}
    if coordinator_address:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def _int_env(name: str) -> Optional[int]:
    value = os.environ.get(name)
    return int(value) if value is not None else None


def process_index() -> int:
    import jax

    return jax.process_index()


def is_coordinator() -> bool:
    """Rank-0 check for e.g. checkpoint writes (the reference gates saving
    on Accelerate's ``is_main_process``, ``train_v2.py:845``)."""
    return process_index() == 0
