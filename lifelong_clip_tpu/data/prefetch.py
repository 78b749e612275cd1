"""Async host→HBM batch prefetch.

North-star item (BASELINE.json): the online stream's index order is fully
known up front (utils/stream.py), so the next batch's gather + device
upload can overlap the current step's device execution. A small
daemon-thread pipeline keeps ``depth`` batches in flight:

    host gather (numpy fancy-index) -> jax.device_put -> queue

JAX dispatch is already asynchronous, so the win here is hiding the
host-side gather + PCIe/ICI upload for large batches; on tunneled or
DCN-attached hosts this matters more.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


class BatchPrefetcher:
    """Iterate (batch_indices, device_images, host_labels) with lookahead.

    ``gather`` maps an index array to (images, labels) numpy arrays;
    ``place`` (optional) maps host arrays to device arrays (e.g. a
    sharded device_put). Errors in the worker re-raise at the consumer.
    """

    _DONE = object()

    def __init__(self,
                 index_batches: Iterable,
                 gather: Callable,
                 place: Optional[Callable] = None,
                 depth: int = 2):
        self._q = queue.Queue(maxsize=max(depth, 1))
        self._gather = gather
        self._place = place or (lambda x: jax.device_put(x))
        self._batches = list(index_batches)
        self._err = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for idx in self._batches:
                images, labels = self._gather(idx)
                dev_images = self._place(images)
                self._q.put((idx, dev_images, labels))
        except Exception as e:  # pragma: no cover - surfaced on consume
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self) -> Iterator:
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


def prefetch_stream(task_indices, batch_size: int, dataset,
                    place: Optional[Callable] = None, depth: int = 2):
    """Prefetching equivalent of ``stream.iter_batches`` + gather."""
    from ..utils.stream import iter_batches
    return BatchPrefetcher(iter_batches(task_indices, batch_size),
                           dataset.gather, place=place, depth=depth)
