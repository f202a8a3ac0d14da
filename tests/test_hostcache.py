"""BoundedCache: the shared host-side memoization helper."""

import threading

from romanimpreprocess_tpu.utils.hostcache import BoundedCache


def test_bounded_eviction_keeps_newest():
    c = BoundedCache(3)
    for i in range(5):
        assert c.put(i, i * 10) == i * 10
    assert len(c) == 3
    assert c.get(0) is None and c.get(1) is None
    assert c.get(4) == 40


def test_put_returns_local_value_under_contention():
    # many threads inserting distinct keys into a tiny cache: no
    # exceptions (the raw-dict idiom raised RuntimeError from pop
    # during next(iter(...))), and every caller gets ITS value back
    c = BoundedCache(2)
    errs = []

    def work(t):
        try:
            for i in range(200):
                v = object()
                assert c.put((t, i), v) is v
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=work, args=(t,)) for t in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(c) <= 2


def test_clear():
    c = BoundedCache(4)
    c.put("a", 1)
    c.clear()
    assert len(c) == 0 and c.get("a") is None
