"""Host->device batch prefetching.

The reference overlaps data loading with compute via torch DataLoader worker
processes (reference train_egohmr.py:95-103, num_workers=4). The JAX-native
equivalent: a background thread prepares and `device_put`s the next batch(es)
while the current step runs — transfers overlap compute because device_put is
async.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterator[Any],
    *,
    size: int = 2,
    device_put: Optional[Callable[[Any], Any]] = None,
) -> Iterator[Any]:
    """Wrap a host batch iterator with an N-deep device prefetch queue.

    `device_put` defaults to jax.device_put on the default device; pass
    `functools.partial(shard_batch, mesh)` for sharded placement.
    """
    if device_put is None:
        device_put = lambda x: jax.tree_util.tree_map(jax.device_put, x)

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    error: list = []

    def producer():
        try:
            for item in iterator:
                q.put(device_put(item))
        except Exception as e:  # surfaced on the consumer side
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
