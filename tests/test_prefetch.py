"""Prefetch pipeline tests: ordering, transform-in-producer, error
propagation, early close, trainer integration."""

import time

import pytest

from qst_tpu.data.prefetch import PrefetchIterator


def test_prefetch_preserves_order():
    out = list(PrefetchIterator(iter(range(100))))
    assert out == list(range(100))


def test_prefetch_transform_runs_in_producer():
    import threading

    main = threading.get_ident()
    seen = []

    def transform(x):
        seen.append(threading.get_ident())
        return x * 2

    out = list(PrefetchIterator(iter(range(10)), transform=transform))
    assert out == [x * 2 for x in range(10)]
    assert all(t != main for t in seen)


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("producer boom")

    it = PrefetchIterator(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer boom"):
        list(it)


def test_prefetch_close_early():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = PrefetchIterator(gen(), depth=2)
    next(it), next(it)
    it.close()
    time.sleep(0.05)
    n = len(produced)
    time.sleep(0.1)
    assert len(produced) == n  # producer actually stopped


def test_prefetch_overlaps_slow_producer_and_consumer():
    def gen():
        for i in range(6):
            time.sleep(0.05)  # producer work
            yield i

    # Wall-clock thresholds are flaky on a loaded CI box; retry a few times
    # and only fail if overlap is never observed. Serial would be ~0.6s;
    # overlapped is ~0.35s, so 0.5s splits them with wide margin.
    for attempt in range(3):
        t0 = time.perf_counter()
        for _ in PrefetchIterator(gen(), depth=2):
            time.sleep(0.05)  # consumer work
        elapsed = time.perf_counter() - t0
        if elapsed < 0.5:
            return
    assert elapsed < 0.5, f"no overlap after {attempt + 1} runs: {elapsed:.3f}s"


def test_prefetch_validation():
    with pytest.raises(ValueError):
        PrefetchIterator(iter([]), depth=0)
    assert list(PrefetchIterator(iter([]))) == []
