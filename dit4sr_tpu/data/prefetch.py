"""Background batch prefetcher.

Equivalent of basicsr's CPU/CUDA prefetchers
(basicsr/data/prefetch_dataloader.py:61-120): a thread pool keeps N batches
ahead of the training loop so host-side image decode + kernel synthesis
overlaps with device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class Prefetcher:
    """Wraps any batch iterable; prefetches up to `depth` batches."""

    _SENTINEL = object()

    def __init__(self, batches: Iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(batches),), daemon=True
        )
        self._thread.start()

    def _worker(self, it: Iterator):
        try:
            for item in it:
                self._q.put(item)
        except Exception as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item
