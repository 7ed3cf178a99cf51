"""Prefetch pipeline: ordering, laziness, error propagation, early exit."""

import threading
import time

import pytest

from seedvc_tpu.train.prefetch import prefetched


def test_order_and_completeness():
    out = list(prefetched(range(50), lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in range(50)]


def test_depth_zero_is_synchronous():
    seen = []

    def prep(x):
        seen.append(threading.current_thread() is threading.main_thread())
        return x

    assert list(prefetched(range(5), prep, depth=0)) == list(range(5))
    assert all(seen)


def test_worker_thread_used():
    names = set()

    def prep(x):
        names.add(threading.current_thread().name)
        return x

    assert list(prefetched(range(5), prep, depth=2)) == list(range(5))
    assert names == {"feature-prefetch"}


def test_exception_propagates():
    def prep(x):
        if x == 3:
            raise ValueError("boom")
        return x

    gen = prefetched(range(10), prep, depth=2)
    with pytest.raises(ValueError, match="boom"):
        list(gen)


def test_source_exception_propagates():
    def src():
        yield 1
        raise RuntimeError("source died")

    with pytest.raises(RuntimeError, match="source died"):
        list(prefetched(src(), lambda x: x, depth=2))


def test_early_abandonment_stops_worker():
    produced = []

    def prep(x):
        produced.append(x)
        return x

    gen = prefetched(range(1000), prep, depth=1)
    assert next(gen) == 0
    gen.close()  # consumer breaks out (max_steps / early stop)
    n = len(produced)
    time.sleep(0.3)
    # worker observed the stop event: at most the in-flight + queued items
    assert len(produced) <= n + 2


def test_runs_ahead_of_consumer():
    """With depth=2 the worker keeps preparing while the consumer sleeps."""
    prepared = []
    gen = prefetched(range(10), lambda x: prepared.append(x) or x, depth=2)
    assert next(gen) == 0
    deadline = time.monotonic() + 2.0
    while len(prepared) < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert len(prepared) >= 3  # consumer has taken 1; worker is ahead
    assert list(gen) == list(range(1, 10))
