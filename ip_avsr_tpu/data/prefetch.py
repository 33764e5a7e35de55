"""Background prefetching for batch generators.

The reference's file-backed generator (utils/datagen.py:5-64, ported as
datagen.gen_batch_from_file) blocks the training loop on scipy ``loadmat``
for every batch.  ``prefetch`` decouples producer and consumer with a
bounded queue on a daemon thread, so host I/O and preprocessing overlap
device execution — the standard input-pipeline shape for accelerator
training (the device never waits for the disk unless the disk truly can't
keep up).  The Trainer wraps its host-side batch stream with this
(TrainOptions.prefetch_batches).

Works with any iterator/generator (finite or infinite); preserves order.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class _End:
    pass


_END = _End()


class _Raised:
    """Sentinel wrapper for a forwarded producer exception — keeps the error
    channel distinct from the data channel, so an iterator that legitimately
    YIELDS exception objects still delivers them as values."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch(iterable: Iterable, buffer_size: int = 2) -> Iterator:
    """Iterate ``iterable`` on a daemon thread, ``buffer_size`` items ahead.

    Exceptions raised by the producer are re-raised in the consumer at the
    point the failing item would have been consumed.  Abandoning the
    returned generator (break / exception / GC) stops the producer: its
    puts are stop-aware, so it never parks forever holding the underlying
    iterator's resources.
    """
    if buffer_size < 1:
        raise ValueError("buffer_size must be >= 1")
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterable:
                if not _put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded to the consumer
            _put(_Raised(e))
            return
        _put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, _Raised):
                raise item.exc
            yield item
    finally:
        stop.set()
        # drain so a producer blocked mid-put can observe the stop promptly
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
