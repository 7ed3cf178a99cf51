"""Background-thread feature prefetch for the trainers.

The reference prepares every batch's features synchronously between
optimizer steps (``train.py:762-894`` runs OpenVoice conversion, whisper
encoding and CAMPPlus pooling on the critical path).  On TPU that
serialization is worse: feature preparation mixes host-side numpy work
(padding, duration reduction) with frozen-encoder device programs and
device->host transfers, all of which can hide under the SPMD train step.

``prefetched`` runs the preparation callable in a daemon worker thread,
one-or-more batches ahead of the consumer, over a bounded queue:

- the worker owns the (ordered) numpy RNG and step counter, so
  deterministic choices (se_db speaker picks) are identical to the
  synchronous schedule;
- device programs dispatched by the worker (whisper, CAMPPlus, RMVPE,
  OpenVoice) interleave with the train step on the device queue, while the
  worker's host work and transfers overlap the step's device time;
- exceptions in the worker propagate to the consumer; abandoning the
  generator (early stop, ``max_steps``) stops the worker promptly.

depth<=0 degrades to the synchronous schedule (no thread), which is also
the safe setting for debugging.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, TypeVar

T = TypeVar("T")
U = TypeVar("U")

_SENTINEL = object()


def prefetched(iterable: Iterable[T], prepare: Callable[[T], U],
               depth: int = 2) -> Iterator[U]:
    """Yield ``prepare(item)`` for each item, computed ``depth`` ahead."""
    if depth <= 0:
        for item in iterable:
            yield prepare(item)
        return

    q: "queue.Queue[object]" = queue.Queue(maxsize=depth)
    stop = threading.Event()
    failure: list[BaseException] = []

    def _put(item: object) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                if not _put(prepare(item)):
                    return
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            failure.append(e)
        finally:
            _put(_SENTINEL)

    thread = threading.Thread(target=worker, name="feature-prefetch",
                              daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()
