"""Unit tests for the double-buffered input pipeline (data/prefetch.py)."""
import threading
import time

import numpy as np
import pytest

from vpho_tpu.data.prefetch import prefetch


def test_order_and_transform_preserved():
    out = list(prefetch(range(20), lambda x: x * x, depth=3))
    assert out == [i * i for i in range(20)]


def test_empty_iterable():
    assert list(prefetch([], None)) == []


def test_producer_exception_propagates_with_cause():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), None, depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError) as ei:
        list(it)
    assert isinstance(ei.value.__cause__, ValueError)


def test_transform_exception_propagates():
    def bad(x):
        if x == 2:
            raise KeyError("x2")
        return x

    it = prefetch(range(5), bad, depth=1)
    assert next(it) == 0
    with pytest.raises(RuntimeError):
        list(it)


def test_overlaps_producer_with_consumer():
    """With depth 2, the producer stages item i+1 while the consumer holds
    item i: total wall time ~ max(producer, consumer) not sum."""
    n, dt = 6, 0.05

    def slow_make():
        for i in range(n):
            time.sleep(dt)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_make(), None, depth=2):
        time.sleep(dt)  # consumer work
    elapsed = time.perf_counter() - t0
    serial = 2 * n * dt
    assert elapsed < serial * 0.8, f"no overlap: {elapsed:.3f}s vs serial {serial:.3f}s"


def test_tuple_items_pass_through():
    """Items that are 2-tuples must not be confused with the sentinel."""
    items = [(np.zeros(2), None), (None, ValueError("not a signal"))]
    out = list(prefetch(items, None))
    assert len(out) == 2
    assert out[1][1].args == ("not a signal",)


def test_consumer_can_stop_early():
    stop_evt = threading.Event()

    def gen():
        for i in range(1000):
            yield i
        stop_evt.set()

    it = prefetch(gen(), None, depth=2)
    for _ in range(3):
        next(it)
    del it  # daemon thread parks on the bounded queue; no deadlock/leak
    assert not stop_evt.is_set()
