"""Serving layer: dynamic micro-batching + the HTTP front end.

CPU tests with the hash-embedding mock encoder (the reference's
mock-LLM/mock-image pattern, SURVEY.md §4); the underlying device path is
the same Retriever/ExactIndex stack exercised on real TPU elsewhere.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from qst_tpu.retrieval import Retriever
from qst_tpu.serve import DynamicBatcher, RetrievalServer

from helpers import hash_embed


class MockEncoder:
    def encode(self, texts, **kw):
        return hash_embed(texts)


DOCS = [f"document number {i} about subject {i % 7}" for i in range(40)]


# ---------------------------------------------------------------------------
# DynamicBatcher
# ---------------------------------------------------------------------------

def test_batcher_batches_concurrent_submissions():
    calls = []

    def batch_fn(items):
        calls.append(len(items))
        return [x * 2 for x in items]

    with DynamicBatcher(batch_fn, max_batch=64, max_wait_s=0.05) as b:
        results = [None] * 16
        def worker(i):
            results[i] = b.submit(i)
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == [i * 2 for i in range(16)]
    # fewer calls than submissions = batching happened
    assert sum(calls) == 16 and len(calls) < 16, calls


def test_batcher_respects_max_batch():
    sizes = []

    def batch_fn(items):
        sizes.append(len(items))
        time.sleep(0.01)  # let the queue fill while a batch runs
        return items

    with DynamicBatcher(batch_fn, max_batch=4, max_wait_s=0.05) as b:
        futs = [b.submit_async(i) for i in range(10)]
        assert [f.result() for f in futs] == list(range(10))
    assert max(sizes) <= 4, sizes


def test_batcher_propagates_errors_and_recovers():
    def batch_fn(items):
        if any(x < 0 for x in items):
            raise RuntimeError("negative payload")
        return items

    b = DynamicBatcher(batch_fn, max_batch=1, max_wait_s=0.0)
    with pytest.raises(RuntimeError, match="negative"):
        b.submit(-1)
    assert b.submit(5) == 5  # collector thread survived the error
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(1)
    b.close()  # idempotent


def test_batcher_workers_overlap_batches():
    """With workers=2 a second batch runs while the first is still inside
    batch_fn (the transfer/compute overlap the server relies on)."""
    active = []
    peak = []
    lock = threading.Lock()

    def batch_fn(items):
        with lock:
            active.append(1)
            peak.append(len(active))
        time.sleep(0.05)  # hold the "device call" open
        with lock:
            active.pop()
        return [x * 2 for x in items]

    with DynamicBatcher(batch_fn, max_batch=1, max_wait_s=0.0,
                        workers=2) as b:
        futs = [b.submit_async(i) for i in range(6)]
        assert [f.result() for f in futs] == [i * 2 for i in range(6)]
    assert max(peak) == 2, peak  # two batches genuinely in flight


def test_batcher_workers_close_and_errors():
    def batch_fn(items):
        if any(x < 0 for x in items):
            raise RuntimeError("negative payload")
        return items

    b = DynamicBatcher(batch_fn, max_batch=2, max_wait_s=0.0, workers=3)
    futs = [b.submit_async(i) for i in range(10)]
    with pytest.raises(RuntimeError, match="negative"):
        b.submit(-1)
    assert [f.result() for f in futs] == list(range(10))
    b.close()  # joins all three workers
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(1)
    b.close()  # idempotent


def test_batcher_validation():
    with pytest.raises(ValueError, match="max_batch"):
        DynamicBatcher(lambda x: x, max_batch=0)
    with pytest.raises(ValueError, match="max_wait_s"):
        DynamicBatcher(lambda x: x, max_wait_s=-1)
    with pytest.raises(ValueError, match="workers"):
        DynamicBatcher(lambda x: x, workers=0)

    def bad(items):
        return items[:-1]

    with DynamicBatcher(bad, max_batch=1, max_wait_s=0.0) as b:
        with pytest.raises(RuntimeError, match="results for"):
            b.submit(1)


# ---------------------------------------------------------------------------
# DynamicBatcher split-phase mode (finalize_fn)
# ---------------------------------------------------------------------------

def test_batcher_split_phase_results_and_batching():
    dispatched = []

    def dispatch(items):
        dispatched.append(len(items))
        return [x * 2 for x in items]        # the "in-flight handle"

    def finalize(handle, items):
        assert len(handle) == len(items)
        return [h + 1 for h in handle]

    with DynamicBatcher(dispatch, max_batch=64, max_wait_s=0.05,
                        workers=2, finalize_fn=finalize) as b:
        results = [None] * 16

        def worker(i):
            results[i] = b.submit(i)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == [i * 2 + 1 for i in range(16)]
    assert sum(dispatched) == 16 and len(dispatched) < 16, dispatched


def test_batcher_split_phase_dispatch_overlaps_finalize():
    """The collector dispatches batch N+1 while batch N is still blocked
    inside finalize — the encode/search overlap the server relies on."""
    order = []
    lock = threading.Lock()
    release = threading.Event()

    def dispatch(items):
        with lock:
            order.append(("dispatch", items[0]))
        return items

    def finalize(handle, items):
        with lock:
            order.append(("finalize-start", handle[0]))
        if handle[0] == 0:
            release.wait(timeout=5)   # hold batch 0's materialization open
        return handle

    with DynamicBatcher(dispatch, max_batch=1, max_wait_s=0.0,
                        workers=2, finalize_fn=finalize) as b:
        f0 = b.submit_async(0)
        f1 = b.submit_async(1)
        assert f1.result() == 1       # batch 1 completes while 0 is held
        with lock:
            assert ("dispatch", 1) in order and ("finalize-start",
                                                 0) in order
        release.set()
        assert f0.result() == 0


def test_batcher_split_phase_saturation_grows_batches():
    """When every in-flight slot is busy, the collector must WAIT (not
    dispatch tiny batches): arrivals during the wait coalesce into one
    large batch — the throughput lever under load."""
    dispatched = []
    gate = threading.Event()

    def dispatch(items):
        dispatched.append(len(items))
        return items

    def finalize(handle, items):
        gate.wait(timeout=10)        # hold every in-flight slot busy
        return handle

    with DynamicBatcher(dispatch, max_batch=64, max_wait_s=0.0,
                        workers=1, finalize_fn=finalize) as b:
        # workers=1 -> 2 in-flight slots; occupy both with singleton
        # batches (submitted one at a time so they cannot coalesce)
        head = []
        for i in range(2):
            head.append(b.submit_async(i))
            for _ in range(200):
                if len(dispatched) == i + 1:
                    break
                time.sleep(0.01)
        assert dispatched == [1, 1], dispatched
        # 20 arrivals while saturated: must coalesce, not trickle
        tail = [b.submit_async(100 + i) for i in range(20)]
        time.sleep(0.1)              # all queued; collector asleep on slot
        gate.set()
        assert [f.result() for f in tail] == list(range(100, 120))
        for f in head:
            f.result()
    assert max(dispatched[2:]) >= 10, dispatched


def test_batcher_split_phase_errors_both_phases():
    def dispatch(items):
        if any(x == -1 for x in items):
            raise RuntimeError("dispatch boom")
        return items

    def finalize(handle, items):
        if any(x == -2 for x in handle):
            raise RuntimeError("finalize boom")
        return handle

    b = DynamicBatcher(dispatch, max_batch=1, max_wait_s=0.0,
                       workers=2, finalize_fn=finalize)
    with pytest.raises(RuntimeError, match="dispatch boom"):
        b.submit(-1)
    with pytest.raises(RuntimeError, match="finalize boom"):
        b.submit(-2)
    assert b.submit(7) == 7           # both phases survived their errors
    assert b.stats()["errors"] == 2
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(1)
    b.close()  # idempotent


def test_batcher_split_phase_close_drains_in_flight():
    """Items enqueued before close() resolve even when their finalize is
    still pending at close time (FIFO sentinel ordering)."""
    def dispatch(items):
        return items

    def finalize(handle, items):
        time.sleep(0.02)
        return [h * 3 for h in handle]

    b = DynamicBatcher(dispatch, max_batch=2, max_wait_s=0.0,
                       workers=2, finalize_fn=finalize)
    futs = [b.submit_async(i) for i in range(8)]
    b.close()
    assert [f.result() for f in futs] == [i * 3 for i in range(8)]


# ---------------------------------------------------------------------------
# RetrievalServer
# ---------------------------------------------------------------------------

@pytest.fixture()
def server():
    r = Retriever(MockEncoder()).build(DOCS, ids=[f"d{i}"
                                                  for i in range(len(DOCS))])
    srv = RetrievalServer(r, max_wait_s=0.002)
    port = srv.start()
    yield srv, port, r
    srv.stop()


def _post(port, path, obj, timeout=10, method="POST"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method=method)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def test_server_search_matches_retriever(server):
    srv, port, r = server
    queries = ["subject 3 things", "document number 5"]
    got = _post(port, "/search", {"queries": queries, "k": 4,
                                  "return_texts": True})["results"]
    want = r.search(queries, k=4, return_texts=True)
    for g_row, w_row in zip(got, want):
        assert [tuple(g) for g in g_row] == [
            (d, pytest.approx(s), t) for d, s, t in w_row]


def test_server_healthz_and_encode(server):
    srv, port, r = server
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10) as resp:
        h = json.loads(resp.read())
    assert h == {"ok": True, "n_docs": len(DOCS)}
    emb = _post(port, "/encode", {"texts": ["a", "b"]})["embeddings"]
    want = hash_embed(["a", "b"])
    np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-6)


def test_server_concurrent_requests_batched(server):
    srv, port, r = server
    results = [None] * 8

    def worker(i):
        results[i] = _post(port, "/search",
                           {"queries": [f"subject {i % 7}"], "k": 2})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, res in enumerate(results):
        want = r.search([f"subject {i % 7}"], k=2)
        assert res["results"][0] == [[d, pytest.approx(s)]
                                     for d, s in want[0]]


def test_server_bad_requests(server):
    srv, port, r = server
    for path, body in [("/search", {"queries": []}),
                       ("/search", {"queries": ["x"], "k": 0}),
                       ("/search", {"queries": ["x"], "k": 10_000}),
                       ("/search", {"queries": [1, 2]}),
                       ("/encode", {"texts": "not a list"})]:
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(port, path, body)
        assert exc_info.value.code == 400, (path, body)
    with pytest.raises(urllib.error.HTTPError) as exc_info:
        _post(port, "/nope", {})
    assert exc_info.value.code == 404


def test_server_requires_built_index():
    with pytest.raises(ValueError, match="no index"):
        RetrievalServer(Retriever(MockEncoder()))


def test_server_from_saved_index(tmp_path):
    """Persistence → serve integration: the index CLI's serve path loads a
    saved index and serves it."""
    r = Retriever(MockEncoder()).build(DOCS, ids=list(range(len(DOCS))))
    r.save(str(tmp_path / "idx"))
    r2 = Retriever(MockEncoder()).load(str(tmp_path / "idx"))
    srv = RetrievalServer(r2, max_wait_s=0.001)
    port = srv.start()
    try:
        got = _post(port, "/search", {"queries": ["subject 2"], "k": 3,
                                      "return_texts": True})["results"][0]
        want = r.search(["subject 2"], k=3, return_texts=True)[0]
        assert [tuple(g) for g in got] == [
            (d, pytest.approx(s), t) for d, s, t in want]
    finally:
        srv.stop()


# --------------------------------------------------- online corpus updates
def test_server_online_doc_updates():
    r = Retriever(MockEncoder()).build_updatable(DOCS[:10], capacity=256)
    srv = RetrievalServer(r, max_wait_s=0.001)
    port = srv.start()
    try:
        h = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10).read())
        assert h["n_docs"] == 10
        # add a distinctive doc online, then find it
        out = _post(port, "/docs", {"texts": ["zebra stripes in sunlight"],
                                    "ids": ["zebra"]})
        assert out["ids"] == ["zebra"]
        # the mock hash embedding is exact-text keyed: query with the
        # added doc's exact text (self-similarity 1.0)
        res = _post(port, "/search",
                    {"queries": ["zebra stripes in sunlight"],
                     "k": 1, "return_texts": True})
        assert res["results"][0][0][0] == "zebra"
        assert res["results"][0][0][2] == "zebra stripes in sunlight"
        # remove it; it must no longer be returned
        out = _post(port, "/docs", {"ids": ["zebra"]}, method="DELETE")
        assert out == {"removed": 1}
        res = _post(port, "/search",
                    {"queries": ["zebra stripes in sunlight"], "k": 5})
        assert all(row[0] != "zebra" for row in res["results"][0])
        # bad inputs
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/docs", {"texts": []})
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(port, "/docs", {"ids": ["missing"]}, method="DELETE")
        assert e.value.code == 400
    finally:
        srv.stop()


def test_server_static_index_rejects_doc_updates(server):
    srv, port, r = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/docs", {"texts": ["new doc"]})
    assert e.value.code == 400
    assert "static" in json.loads(e.value.read())["error"]


def test_server_concurrent_search_during_updates():
    """Searches racing online adds/removes must never crash or return a
    deleted buffer — every response is well-formed."""
    r = Retriever(MockEncoder()).build_updatable(
        [f"base document {i}" for i in range(20)], capacity=512)
    srv = RetrievalServer(r, max_wait_s=0.001)
    port = srv.start()
    errors = []

    def searcher(seed):
        try:
            for q in range(25):
                res = _post(port, "/search",
                            {"queries": [f"document {seed} {q}"], "k": 3})
                assert len(res["results"][0]) == 3
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def writer():
        try:
            for b in range(10):
                ids = _post(port, "/docs", {
                    "texts": [f"streamed doc {b}-{j}" for j in range(4)]
                })["ids"]
                _post(port, "/docs", {"ids": ids[:2]}, method="DELETE")
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=searcher, args=(i,))
               for i in range(4)] + [threading.Thread(target=writer)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    srv.stop()
    assert not errors, errors


def test_server_doc_update_id_validation():
    """Unhashable / non-scalar JSON ids are a 400, not a 500."""
    r = Retriever(MockEncoder()).build_updatable(DOCS[:3], capacity=32)
    srv = RetrievalServer(r, max_wait_s=0.001)
    port = srv.start()
    try:
        for body, method in [({"texts": ["a"], "ids": [[1]]}, "POST"),
                             ({"texts": ["a"], "ids": [True]}, "POST"),
                             ({"ids": [{"x": 1}]}, "DELETE")]:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(port, "/docs", body, method=method)
            assert e.value.code == 400, body
    finally:
        srv.stop()


def test_server_stats_endpoint(server):
    srv, port, r = server
    _post(port, "/search", {"queries": ["subject 1"], "k": 2})
    _post(port, "/encode", {"texts": ["a"]})
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=10) as resp:
        st = json.loads(resp.read())
    assert st["n_docs"] == len(DOCS) and st["uptime_s"] >= 0
    assert st["requests"]["search"] >= 1
    assert st["requests"]["encode"] >= 1
    assert st["latency_ms"]["p50"] is not None
    assert st["latency_ms"]["window"] >= 2
    b = st["batchers"]["search"]
    assert b["batches"] >= 1 and b["items"] >= 1 and b["errors"] == 0
    assert b["mean_batch"] > 0 and b["max_batch"] >= 1


def test_server_over_pq_and_ivf_indexes():
    """The HTTP stack serves every index family: PQ (refined scores), IVF
    (probed cells), and IVF-PQ (codes in cells) behind the same /search
    contract."""
    import urllib.request

    topics = ["cat", "dog", "pasta", "plane", "river"]
    docs = [f"{topics[i % 5]} doc number {i}" for i in range(400)]

    for dtype, kwargs in (("pq", {"pq_m": 16}),
                          ("ivf", {"ivf_clusters": 16, "ivf_probe": 4}),
                          ("ivfpq", {"pq_m": 16, "ivf_clusters": 16,
                                     "ivf_probe": 8})):
        r = Retriever(MockEncoder(), index_dtype=dtype, **kwargs).build(docs)
        server = RetrievalServer(r, max_batch=16, max_wait_s=0.002)
        port = server.start()
        try:
            body = json.dumps({"queries": ["a cat rests"], "k": 3,
                               "return_texts": True}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=30) as resp:
                payload = json.loads(resp.read())
            rows = payload["results"][0]
            assert 1 <= len(rows) <= 3
            assert rows[0][2].startswith("cat"), (dtype, rows)
        finally:
            server.stop()
