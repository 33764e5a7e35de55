"""Background prefetching for batch generators.

The reference's file-backed generator (utils/datagen.py:5-64, ported as
datagen.gen_batch_from_file) blocks the training loop on scipy ``loadmat``
for every batch.  ``prefetch`` decouples producer and consumer with a
bounded queue on a daemon thread, so host I/O and preprocessing overlap
device execution — the standard input-pipeline shape for accelerator
training (the device never waits for the disk unless the disk truly can't
keep up).

Works with any iterator/generator (finite or infinite); preserves order.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class _End:
    pass


_END = _End()


def prefetch(iterable: Iterable, buffer_size: int = 2) -> Iterator:
    """Iterate ``iterable`` on a daemon thread, ``buffer_size`` items ahead.

    Exceptions raised by the producer are re-raised in the consumer at the
    point the failing item would have been consumed.
    """
    if buffer_size < 1:
        raise ValueError("buffer_size must be >= 1")
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — forwarded to the consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
