"""Background-thread batch prefetch — the reference's async reader
(async.c: a producer pthread filling a bounded slot queue) mapped onto
the batch pipeline: host decode for batch k+2 proceeds while batch k+1
sits on the device and batch k finalizes.
"""

from __future__ import annotations

import queue
import threading

_SENTINEL = object()


def prefetch(iterable, depth: int = 4):
    """Iterate ``iterable`` on a daemon thread, ``depth`` items ahead
    (async.c:202-207 uses 4*threads slots)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    exc = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            exc.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if exc:
                raise exc[0]
            return
        yield item
