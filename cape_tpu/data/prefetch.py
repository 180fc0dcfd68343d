"""Background-thread batch prefetcher.

The TPU replacement for the reference's DataLoader worker processes
(`episodic_sampler.py` + torch DataLoader num_workers): a single daemon
thread assembles the next fixed-shape episode batches (PNG decode, crop,
augment, tokenize — all GIL-releasing PIL/cv2/numpy work) while the device
executes the current step, hiding host latency behind device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np


def stack_batches(iterable: Iterable, n: int) -> Iterator:
    """Group every `n` consecutive batch pytrees into one stacked pytree.

    Each leaf gains a leading (n,) axis — the scan axis consumed by
    `make_scan_train_step`. A final incomplete group is DROPPED (a
    different leading dim would force an XLA recompile); callers size
    their epoch to a multiple of `n`.
    """
    group = []
    for item in iterable:
        group.append(item)
        if len(group) == n:
            yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *group)
            group = []


def prefetch(iterable: Iterable, buffer_size: int = 2,
             transform: Optional[Callable] = None) -> Iterator:
    """Iterate `iterable` on a daemon thread, `buffer_size` items ahead.

    `transform` (e.g. `shard_batch` -> `jax.device_put`) runs on the
    producer thread so host->device transfers overlap device compute —
    measured 3.1 s/step (transfer-bound) vs 6 ms/step (device-resident) on
    the v5e relay for the flagship batch-4 train step.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    sentinel = object()
    error: list = []

    def producer():
        try:
            for item in iterable:
                if transform is not None:
                    item = transform(item)
                q.put(item)
        except BaseException as e:  # propagate to consumer
            error.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
