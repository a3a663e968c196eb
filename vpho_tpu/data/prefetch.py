"""Double-buffered host->device input pipeline.

The reference overlaps batch assembly with the GPU step via DataLoader
worker processes + pinned-memory H2D copies (dexycb6.py __getitem__ runs in
workers; Accelerate wraps the loader).  The TPU-native equivalent: a
background thread stages the next batch (host assembly + ``device_put``
onto the mesh) while the current jitted step runs on-device — JAX dispatch
is async, so one queue slot of lookahead hides the host time entirely
unless the host is the bottleneck.

Kept deliberately thread-based (not process-based): the per-item pipeline
is already vectorized numpy/cv2 which releases the GIL, and device_put is
non-blocking; a depth-2 queue is the whole trick.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator

_SENTINEL = object()


def prefetch(batches: Iterable[Any], transform: Callable[[Any], Any] | None = None,
             depth: int = 2) -> Iterator[Any]:
    """Yield ``transform(b)`` for each batch, computed ``depth`` ahead in a
    daemon thread.  Exceptions in the producer re-raise at the consumer's
    next pull (with the original traceback as __cause__)."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))

    def producer():
        try:
            for b in batches:
                q.put(transform(b) if transform is not None else b)
        except BaseException as e:  # noqa: BLE001 - reraised at consumer
            q.put((_SENTINEL, e))
            return
        q.put((_SENTINEL, None))

    t = threading.Thread(target=producer, daemon=True, name="vpho-prefetch")
    t.start()
    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _SENTINEL:
            if item[1] is not None:
                raise RuntimeError("prefetch producer failed") from item[1]
            return
        yield item
