"""Background-thread batch prefetching.

Host-side batch assembly (feature .npy loads, padding, prior lookup) runs in
a worker thread so it overlaps the device step — the JAX-world equivalent of
the reference's DataLoader worker (dataloader.py num_workers=1).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch_iterator(iterable: Iterable[T], size: int = 2) -> Iterator[T]:
    """Yield from ``iterable`` with up to ``size`` items computed ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    err: list = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    if err:
        raise err[0]
