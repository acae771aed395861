"""Background-thread batch producer.

The reference never overlaps batch assembly with compute (its DataLoader
uses the default ``num_workers=0``, SURVEY §5).  Our loaders assemble
static-shape batches with numpy copies that release the GIL, so a single
producer thread hides assembly time behind device dispatch.

``BackgroundIterator`` wraps any batch iterable: a daemon thread fills a
bounded queue; the consumer pops.  Exceptions propagate to the consumer;
the thread dies with the iterator (daemon + sentinel).  Enable for the
trainer's epoch loop with ``PCC_BG_LOADER=1``.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class BackgroundIterator:
    """Iterate ``iterable`` on a daemon thread through a bounded queue."""

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, prefetch: int = 2):
        self._iterable = iterable
        self._prefetch = max(1, prefetch)

    def __iter__(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self._prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that aborts if the consumer walked away."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for item in self._iterable:
                    if not put(item):
                        return
            except BaseException as e:  # surface in the consumer
                put(e)
                return
            put(self._SENTINEL)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer done or abandoned mid-epoch (exception, break,
            # GeneratorExit): unblock and retire the producer — otherwise
            # it would sit on q.put forever pinning full batches
            stop.set()
