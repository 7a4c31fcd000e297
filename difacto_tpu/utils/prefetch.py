"""Background prefetch iterator.

Counterpart of the reference's dmlc-core ``threadediter.h`` :: ThreadedIter
(producer/consumer prefetch of parsed chunks) and the prefetch thread of
``src/data/data_store.h``. Host-side parsing/padding overlaps with device
compute; depth > 1 keeps the device fed across parse-time jitter.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_END = object()


class ThreadedIter(Iterator[T]):
    def __init__(self, source: Iterable[T], depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None

        def run():
            try:
                for item in source:
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(_END)

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self) -> T:
        item = self._q.get()
        if item is _END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
