"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seedvc_tpu.parallel.mesh import make_mesh
from seedvc_tpu.parallel.sharding import logical_to_sharding


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_param_sharding_rules():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "layers_0": {
            "attention": {"wqkv": {"kernel": jnp.zeros((64, 192))},
                          "wo": {"kernel": jnp.zeros((64, 64))}},
            "feed_forward": {"w1": {"kernel": jnp.zeros((64, 256))},
                             "w2": {"kernel": jnp.zeros((256, 64))}},
        },
        "other": {"kernel": jnp.zeros((7, 3))},
    }
    sh = logical_to_sharding(params, mesh)
    assert sh["layers_0"]["attention"]["wqkv"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["layers_0"]["attention"]["wo"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    assert sh["layers_0"]["feed_forward"]["w2"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    # non-divisible / unmatched -> replicated
    assert sh["other"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    res = compiled(*args)
    assert res.shape == (2, 256, 80)


def test_distributed_initialize_single_process_noop(monkeypatch):
    """Without a coordinator configured, initialize() is a no-op returning
    False; is_coordinator() still answers."""
    import seedvc_tpu.parallel.distributed as D

    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    D._initialized = False
    assert D.initialize() is False
    assert D.is_coordinator() is True  # single process == rank 0
