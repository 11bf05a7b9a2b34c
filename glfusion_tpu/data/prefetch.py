"""Background-thread batch prefetching.

The reference hides host IO behind 8 DataLoader worker processes
(``main.py:135-145``). Here host work is already thin (C++ NIfTI decode +
nearest resize), so a single prefetch thread with a small queue suffices to
overlap it fully with device steps; the fused device-side preprocessing
runs on the accelerator stream.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Iterate ``iterable`` on a daemon thread, ``depth`` items ahead.

    Exceptions in the producer re-raise at the consumer's next pull.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # re-raise on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
