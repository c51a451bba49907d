"""Host->device prefetch: overlap batch assembly/augmentation with TPU steps.

The reference relies on torch DataLoader workers for this (its configs ship
``workers: 0``, i.e. fully synchronous). Here a background thread prepares
the next batch(es) (HDF5 slicing + C++ augmentation) and issues
``jax.device_put`` with the data-parallel sharding so the transfer overlaps
the current step's compute — the double-buffered device prefetch of
SURVEY.md §7 step 3.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np


class DevicePrefetcher:
    """Wraps a host batch iterator; yields device-resident batches."""

    def __init__(self, it: Iterator[Dict[str, np.ndarray]],
                 place: Callable[[Dict[str, np.ndarray]], Dict],
                 depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._place = place
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for batch in it:
                    self._q.put(self._place(batch))
            except BaseException as e:  # propagate into the consumer
                self._err = e
            finally:
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_to_device(it, mesh=None, exclude=("count",), depth: int = 2):
    """Convenience: prefetch host batches with data-axis sharding."""
    from mvp_benchmark_tpu.parallel.mesh import get_mesh, shard_batch

    m = get_mesh(mesh)

    def place(batch):
        return shard_batch(m, batch, exclude=exclude)

    return DevicePrefetcher(it, place, depth)
