"""utils tests: the @synchronized decorator."""

import threading
import time

from qst_tpu.utils import synchronized


def test_synchronized_serializes():
    active = {"n": 0, "max": 0}

    @synchronized
    def critical(i):
        active["n"] += 1
        active["max"] = max(active["max"], active["n"])
        time.sleep(0.005)
        active["n"] -= 1
        return i

    threads = [threading.Thread(target=critical, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert active["max"] == 1  # never two threads inside at once


def test_synchronized_separate_locks():
    @synchronized
    def a():
        pass

    @synchronized
    def b():
        pass

    assert a.__lock__ is not b.__lock__
    assert a.__name__ == "a"  # wraps preserved
