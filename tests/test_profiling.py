"""Profiling utilities (SURVEY §5.1: the reference has only ad-hoc CUDA
event timing; here tracing/stage-timing is a first-class subsystem)."""

import time

import jax
import jax.numpy as jnp


def test_stage_timer_accumulates():
    from seedvc_tpu.core.profiling import StageTimer

    timer = StageTimer()
    for _ in range(3):
        with timer("a"):
            time.sleep(0.01)
    with timer("b"):
        pass
    rep = timer.report()
    assert rep["a"]["calls"] == 3
    assert rep["a"]["seconds"] >= 0.03
    assert rep["b"]["calls"] == 1
    # report() rounds to 4 decimals; allow that much slack vs the raw total
    assert timer.total() >= rep["a"]["seconds"] - 1e-4


def test_stage_timer_disabled_is_noop():
    from seedvc_tpu.core.profiling import StageTimer

    timer = StageTimer(enabled=False)
    with timer("x"):
        pass
    assert timer.report() == {}


def test_trace_none_is_noop_and_annotate_runs():
    from seedvc_tpu.core.profiling import annotate, trace

    with trace(None):
        with annotate("span"):
            assert float(jnp.sum(jnp.ones(4))) == 4.0


def test_trace_writes_profile(tmp_path):
    from seedvc_tpu.core.profiling import trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jax.block_until_ready(jnp.ones(8) * 2)
    import os

    found = []
    for root, _dirs, files in os.walk(logdir):
        found.extend(files)
    assert found, "profiler produced no trace files"
