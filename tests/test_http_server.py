"""HTTP serving daemon: endpoints, concurrency, error paths."""

import json
import threading
import urllib.request
import urllib.error

import pytest

from sema_tpu.index import IndexManager
from sema_tpu.models import Encoder, get_spec
from sema_tpu.models.loader import random_params
from sema_tpu.search.http_server import SearchService, make_server
from sema_tpu.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    spec = get_spec("test-tiny")
    enc = Encoder(spec, random_params(spec), HashTokenizer(spec.vocab_size),
                  batch_size=8)
    mgr = IndexManager(tmp / "data", enc)

    tree = tmp / "tree"
    tree.mkdir()
    (tree / "auth.py").write_text(
        "def verify_token(jwt):\n    return decode_and_check(jwt)\n" * 4)
    (tree / "cache.md").write_text(
        "# LRU cache eviction policy\nleast recently used entries drop\n" * 4)
    mgr.process_and_index_files(sorted(tree.glob("*")))

    service = SearchService(mgr, max_batch=4, max_wait_ms=2)
    httpd = make_server(service, host="127.0.0.1", port=0)  # ephemeral port
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()
    service.close()


def get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    status, body = get(f"{server}/healthz")
    assert status == 200
    assert body["status"] == "ok"
    assert body["rows"] > 0
    assert body["model"] == "test-tiny"


def test_semantic_search_get(server):
    status, body = get(f"{server}/search?q=token+verification&k=3")
    assert status == 200
    assert len(body["results"]) == 3
    assert body["took_ms"] > 0
    r = body["results"][0]
    assert {"id", "file_path", "start_line", "end_line", "score",
            "content"} <= set(r)


def test_semantic_search_get_exact(server):
    """exact=1 (recall-contract routing, docs/API.md) serves the same
    results on a non-IVF store — the flag is a no-op there but must
    plumb through without error."""
    status, body = get(f"{server}/search?q=token+verification&k=3&exact=1")
    assert status == 200
    _, base = get(f"{server}/search?q=token+verification&k=3")
    assert [r["id"] for r in body["results"]] == \
        [r["id"] for r in base["results"]]


def test_keyword_search_get(server):
    status, body = get(f"{server}/search?q='eviction&k=10")
    assert status == 200
    assert body["results"]
    assert all("cache.md" in r["file_path"] for r in body["results"])


def test_post_search(server):
    req = urllib.request.Request(
        f"{server}/search", data=json.dumps({"q": "cache", "k": 2}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        body = json.loads(r.read())
    assert len(body["results"]) <= 2


def test_missing_query_400(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        get(f"{server}/search")
    assert ei.value.code == 400


def test_bad_k_400(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        get(f"{server}/search?q=x&k=banana")
    assert ei.value.code == 400


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        get(f"{server}/nope")
    assert ei.value.code == 404


def test_concurrent_requests(server):
    results = []
    errors = []

    def hit(i):
        try:
            results.append(get(f"{server}/search?q=query+number+{i}&k=1"))
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    assert len(results) == 16
    assert all(s == 200 for s, _ in results)


def test_overload_returns_503_with_retry_after(tmp_path):
    """A saturated batcher surfaces as HTTP 503 + Retry-After through
    the daemon (load shedding, not 60 s client timeouts)."""
    import numpy as np
    import time as _time
    from sema_tpu.search.server import QueryBatcher

    spec = get_spec("test-tiny")
    enc = Encoder(spec, random_params(spec), HashTokenizer(spec.vocab_size),
                  batch_size=8)
    mgr = IndexManager(tmp_path / "data", enc)
    tree = tmp_path / "tree"
    tree.mkdir()
    (tree / "a.md").write_text("alpha beta gamma delta " * 20)
    mgr.process_and_index_files(sorted(tree.glob("*")))

    service = SearchService(mgr, max_batch=1, max_wait_ms=0.1,
                            max_queue=1)

    class SlowStore:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def search_batch_async(self, q, k, **kw):
            _time.sleep(0.3)
            return self._inner.search_batch_async(q, k)

    service.batcher.close()
    service.batcher = QueryBatcher(SlowStore(mgr.vector_store),
                                   max_batch=1, max_wait_ms=0.1,
                                   max_queue=1)
    httpd = make_server(service, host="127.0.0.1", port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        codes = []

        def hit(i):
            try:
                with urllib.request.urlopen(f"{base}/search?q=alpha&k=2",
                                            timeout=30) as r:
                    codes.append(r.status)
            except urllib.error.HTTPError as e:
                codes.append(e.code)
                if e.code == 503:
                    assert e.headers.get("Retry-After") == "1"

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert 503 in codes, codes
        assert 200 in codes, codes
    finally:
        httpd.shutdown()
        service.close()
        mgr.close()


def _post(base, body_bytes):
    req = urllib.request.Request(
        f"{base}/search", data=body_bytes,
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.mark.parametrize("body", [
    b'{"q": "x", "k": null}',     # valid JSON, wrong k shape
    b'{"q": "x", "k": [1]}',
    b'[1, 2]',                    # valid JSON, not an object
    b'"hi"',
])
def test_post_wrong_shape_is_400(server, body):
    """Valid-JSON-wrong-shape bodies previously escaped do_POST as
    TypeError/AttributeError and reset the connection with no HTTP
    response (review finding, r3)."""
    status, payload = _post(server, body)
    assert status == 400
    assert "error" in payload


def test_post_non_string_q_is_400(server):
    status, payload = _post(server, b'{"q": 123}')
    assert status == 400


def test_short_query_is_400(server):
    """HTTP inherits the <=2-char query gate the TUI/CLI enforce
    (engine.py MIN_QUERY_BYTES; review finding: the gate was
    bypassed by this frontend)."""
    try:
        with urllib.request.urlopen(f"{server}/search?q=a", timeout=30) as r:
            status, payload = r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        status, payload = e.code, json.loads(e.read())
    assert status == 400
    assert "3 bytes" in payload["error"]


def test_embed_failure_degrades_to_substring(tmp_path):
    """Parity with IndexManager.search: a failed query embedding
    degrades to the substring scan instead of a 500 (review finding —
    serving 500'd where every other frontend degraded)."""
    spec = get_spec("test-tiny")
    enc = Encoder(spec, random_params(spec), HashTokenizer(spec.vocab_size),
                  batch_size=8)
    mgr = IndexManager(tmp_path / "data", enc)
    tree = tmp_path / "tree"
    tree.mkdir()
    (tree / "doc.txt").write_text("needle in the haystack content\n" * 8)
    mgr.process_and_index_files(sorted(tree.glob("*")))
    service = SearchService(mgr, max_batch=4, max_wait_ms=2)

    def boom(_):
        raise RuntimeError("device gone")
    mgr.encoder.encode_query = boom
    results = service.search("needle", 5)
    assert results and all("needle" in c.content for c, _ in results)
    service.close()
    mgr.close()


def test_batcher_close_fails_pending_fast():
    """close() fails queued AND inflight requests promptly instead of
    stranding their callers for the 60 s client timeout; a search()
    racing close() gets ServerOverloaded, not a hang (review findings,
    r3)."""
    import numpy as np
    from sema_tpu.search.server import QueryBatcher, ServerOverloaded

    class SlowStore:
        dim = 8

        def search_batch_async(self, q, k, live=None):
            return (q, k)

        def search_batch_finish(self, handle, q):
            import time
            time.sleep(0.2)
            qq, k = handle
            return (np.full((qq.shape[0], k), -np.inf, np.float32),
                    np.zeros((qq.shape[0], k), np.int32))

    b = QueryBatcher(SlowStore(), max_batch=2, max_wait_ms=1.0)
    b.close()
    with pytest.raises(ServerOverloaded):
        b.search(np.zeros(8, np.float32), 1, timeout=5)


def test_batcher_rejects_unbounded_queue():
    from sema_tpu.search.server import QueryBatcher

    class S:
        dim = 4
    with pytest.raises(ValueError):
        QueryBatcher(S(), max_queue=0)
