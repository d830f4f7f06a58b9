"""Batching inference server (pesto_tpu/serve.py): full HTTP surface
driven in-process — JSON + annotated-PDB responses vs the direct
Predictor path, cross-request batching, gzip bodies, and error codes."""

import gzip
import http.client
import json
import threading

import numpy as np
import pytest

from pesto_tpu.infer import Predictor
from pesto_tpu.models import get_config
from pesto_tpu.models.pesto import init_params
from pesto_tpu.serve import BatchingService, make_server

PDB = "/root/reference/examples/dna_rna/1H9D.pdb"
PDB1 = "/root/reference/examples/dna_rna/1H9D.pdb1"

# the whole module drives the server with real example structures from
# the read-only reference mount; skip (not hard-fail) when it is absent
import os  # noqa: E402

pytestmark = pytest.mark.skipif(
    not (os.path.exists(PDB) and os.path.exists(PDB1)),
    reason="reference example PDBs not mounted",
)


@pytest.fixture(scope="module")
def server():
    cfg = get_config("i_v4_0", dtype="float32")
    cfg = cfg.replace(layers=cfg.layers[:2])
    pred = Predictor(cfg, init_params(cfg))
    service = BatchingService(pred, max_batch=8, max_wait_ms=150.0)
    # cache off: these tests assert batcher/stats behavior per request,
    # and several re-post the same body; the cache has its own fixture
    srv = make_server(service, host="127.0.0.1", port=0, model_name="test",
                      max_body_bytes=2 << 20, cache_entries=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, service, pred
    srv.shutdown()
    service.close()


def _post(srv, body, path="/v1/predict", headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port, timeout=300)
    conn.request("POST", path, body=body, headers=headers or {})
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def _get(srv, path):
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port, timeout=60)
    conn.request("GET", path)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    return r.status, data


def test_healthz_and_unknown_paths(server):
    srv, _, _ = server
    status, data = _get(srv, "/healthz")
    assert status == 200 and json.loads(data)["ok"] is True
    assert _get(srv, "/nope")[0] == 404
    assert _post(srv, b"x", path="/nope")[0] == 404


def test_predict_json_matches_direct_predictor(server):
    srv, _, pred = server
    body = open(PDB, "rb").read()
    status, data = _post(srv, body)
    assert status == 200, data
    out = json.loads(data)
    # direct path on the same parsed structure
    from pesto_tpu.io import read_structure
    from pesto_tpu.structure import concatenate_chains, preprocess_structure

    structure = concatenate_chains(preprocess_structure(read_structure(PDB)))
    direct = pred.predict_batch([structure])[0]
    assert out["residues"] == direct.shape[0]
    assert out["classes"] == direct.shape[1]
    got = np.array(out["probabilities"], dtype=np.float32)
    assert np.abs(got - direct).max() < 1e-5  # JSON rounds to 6 decimals


def test_predict_gzip_and_pdb_format(server):
    srv, _, _ = server
    body = gzip.compress(open(PDB, "rb").read())
    status, data = _post(
        srv, body, path="/v1/predict?format=pdb&class=1",
        headers={"Content-Encoding": "gzip"},
    )
    assert status == 200
    text = data.decode()
    atom_lines = [l for l in text.splitlines() if l.startswith("ATOM")]
    assert atom_lines, "annotated PDB has no ATOM records"
    # B-factor column carries probabilities in [0, 1]
    bf = np.array([float(l[60:66]) for l in atom_lines])
    assert bf.min() >= 0.0 and bf.max() <= 1.0


def test_malformed_and_empty_bodies_are_client_errors(server):
    srv, _, _ = server
    assert _post(srv, b"")[0] == 400
    assert _post(srv, b"this is not a pdb\n")[0] == 400
    # class validation happens BEFORE the device dispatch, for both
    # out-of-range and non-integer values
    for bad in ("99", "abc", "1.5"):
        status, data = _post(srv, b"irrelevant",
                             path=f"/v1/predict?format=pdb&class={bad}")
        assert status == 400 and b"out of range" in data, bad


def test_oversized_and_bomb_bodies_are_rejected(server):
    srv, _, _ = server
    # Content-Length over the 2 MB cap -> 413 before the body is parsed
    assert _post(srv, b"x" * (3 << 20))[0] == 413
    # small gzip that INFLATES past the cap -> bounded decompress -> 400
    bomb = gzip.compress(b"0" * (8 << 20))
    assert len(bomb) < (1 << 20)
    status, data = _post(srv, bomb, headers={"Content-Encoding": "gzip"})
    assert status == 400 and b"inflates" in data


def test_post_unknown_path_keeps_connection_in_sync(server):
    """A 404'd POST must drain its body so the next request on the same
    keep-alive connection is parsed correctly."""
    srv, _, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port, timeout=60)
    conn.request("POST", "/v1/predic", body=b"ATOM garbage body\n" * 100)
    r = conn.getresponse()
    r.read()
    assert r.status == 404
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    data = r.read()
    conn.close()
    assert r.status == 200 and json.loads(data)["ok"] is True


def test_concurrent_requests_share_one_batch(server):
    srv, service, _ = server
    before = service.snapshot()
    body = open(PDB, "rb").read()
    results = [None] * 4

    def hit(i):
        results[i] = _post(srv, body)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    # identical input -> identical output across the batch
    outs = [json.loads(r[1])["probabilities"] for r in results]
    assert all(o == outs[0] for o in outs[1:])
    after = service.snapshot()
    new_batches = after["batches"] - before["batches"]
    new_items = after["batched_items"] - before["batched_items"]
    assert new_items == 4
    # the 150 ms window must have merged at least two requests into one
    # dispatch (the whole point of the batcher)
    assert new_batches < 4
    assert after["max_batch_seen"] >= 2
    # exact2 fallback telemetry is part of the stats surface (serving
    # observability for the silent exact-path re-run)
    assert "knn_fallbacks" in after and after["knn_fallbacks"] >= 0


@pytest.fixture(scope="module")
def cached_server():
    cfg = get_config("i_v4_0", dtype="float32")
    cfg = cfg.replace(layers=cfg.layers[:2])
    pred = Predictor(cfg, init_params(cfg))
    service = BatchingService(pred, max_batch=8, max_wait_ms=50.0)
    srv = make_server(service, host="127.0.0.1", port=0, model_name="test",
                      max_body_bytes=2 << 20, cache_entries=8)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, service
    srv.shutdown()
    service.close()


def test_response_cache_short_circuits_repeat_requests(cached_server):
    """A repeated identical request must be served from the LRU response
    cache: bytewise-identical payload, no new device dispatch (service
    request count unchanged), cache_hits incremented. A different output
    shape (format=pdb) for the same body is a separate cache entry."""
    srv, service = cached_server
    body = open(PDB, "rb").read()
    s1, d1 = _post(srv, body)
    assert s1 == 200
    before = service.snapshot()
    s2, d2 = _post(srv, body)
    after = service.snapshot()
    assert s2 == 200 and d2 == d1
    assert after["requests"] == before["requests"], "hit must skip the device"
    st = json.loads(_get(srv, "/v1/stats")[1])
    assert st["cache_hits"] == 1 and st["cache_entries"] >= 1
    # different response shape -> its own entry (miss, then hit)
    s3, d3 = _post(srv, body, path="/v1/predict?format=pdb&class=1")
    assert s3 == 200 and d3 != d1
    mid = service.snapshot()
    assert mid["requests"] == after["requests"] + 1
    s4, d4 = _post(srv, body, path="/v1/predict?format=pdb&class=1")
    assert s4 == 200 and d4 == d3
    assert service.snapshot()["requests"] == mid["requests"]
    # errors are never cached: a malformed body 400s every time
    assert _post(srv, b"not a pdb\n")[0] == 400
    assert _post(srv, b"not a pdb\n")[0] == 400
    assert json.loads(_get(srv, "/v1/stats")[1])["cache_hits"] == 2


def test_singleflight_dedups_concurrent_identical_requests(cached_server):
    """N identical requests arriving TOGETHER (before any response lands,
    so the LRU cache cannot help) must compute once: one leader runs the
    device path, followers wait on it and serve its cached bytes."""
    srv, service = cached_server
    body = open(PDB1, "rb").read()
    before = service.snapshot()
    results = [None] * 4

    def hit(i):
        results[i] = _post(srv, body)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    assert all(r[1] == results[0][1] for r in results[1:])
    after = service.snapshot()
    # the leader's request is the only one that touched the service
    assert after["requests"] == before["requests"] + 1
    st = json.loads(_get(srv, "/v1/stats")[1])
    # >=1 not >=3: a very fast leader can turn late arrivals into plain
    # cache hits — also a correct dedup, just via the other mechanism
    assert st["singleflight_waits"] >= 1


def test_back_pressure_429_when_overloaded(cached_server):
    """With the queue bound forced to zero, a non-cache-hit request must
    be rejected 429 with Retry-After instead of queueing (round-5
    serving-tail work: bounded queues convert overload into fast
    retries)."""
    srv, service = cached_server
    body = open(PDB, "rb").read() + b"\nREMARK backpressure probe\n"
    old = service.max_queue
    service.max_queue = 0
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                          timeout=60)
        conn.request("POST", "/v1/predict", body=body)
        r = conn.getresponse()
        data = r.read()
        assert r.status == 429
        assert r.getheader("Retry-After") == "1"
        assert b"capacity" in data
        conn.close()
    finally:
        service.max_queue = old
    assert service.snapshot()["rejected_429"] >= 1


def test_cache_key_tracks_knn_method_mutation(cached_server):
    """Flipping the live predictor's knn_method must not serve stale
    cached responses computed under the old method (ADVICE round 4):
    the method is part of the cache key."""
    srv, service = cached_server
    body = open(PDB, "rb").read() + b"\nREMARK knn-mutation probe\n"
    s1, d1 = _post(srv, body)
    assert s1 == 200
    before = service.snapshot()["requests"]
    s2, _ = _post(srv, body)  # cache hit: no new service request
    assert s2 == 200
    assert service.snapshot()["requests"] == before
    old = service.predictor.knn_method
    try:
        service.predictor.knn_method = "fast"
        s3, _ = _post(srv, body)  # different key -> recompute
        assert s3 == 200
        assert service.snapshot()["requests"] == before + 1
    finally:
        service.predictor.knn_method = old


def test_stats_carry_stage_breakdown(cached_server):
    """/v1/stats must expose the per-stage attribution (queue wait,
    parse, serialize, predictor encode/device) the round-5 serving
    analysis is built on."""
    srv, service = cached_server
    body = open(PDB, "rb").read() + b"\nREMARK stage probe\n"
    assert _post(srv, body)[0] == 200
    st = json.loads(_get(srv, "/v1/stats")[1])
    assert st["parse_n"] >= 1 and st["parse_ms_total"] > 0
    assert st["serialize_n"] >= 1
    assert "mean_queue_wait_ms" in st
    ps = st["predictor_stage_ms"]
    assert ps["batch_calls"] >= 1
    assert ps["record_encode"] > 0
    assert ps["device_wait"] >= 0


def test_response_cache_byte_budget():
    """_ResponseCache bounds BYTES as well as entries (ADVICE round 4:
    worst-case residency was entries x payload); an oversized payload
    is never cached."""
    from pesto_tpu.serve import _ResponseCache

    c = _ResponseCache(max_entries=10, max_bytes=100)
    c.put(("a",), (b"x" * 20, "t"))
    c.put(("b",), (b"y" * 20, "t"))
    c.put(("c",), (b"z" * 20, "t"))
    assert c.get(("a",)) is not None  # 60 bytes: all fit
    c.put(("d",), (b"w" * 25, "t"))  # 85 bytes: still fits ('a' was MRU'd)
    c.put(("e",), (b"v" * 25, "t"))  # 110 -> evict LRU until <= 100
    assert c._bytes <= 100
    assert c.get(("e",)) is not None
    # oversized single payload (> max_bytes // 4) is refused outright
    c.put(("big",), (b"B" * 26, "t"))
    assert c.get(("big",)) is None


def test_collect_window_extends_for_midparse_arrivals():
    """_collect must absorb an arrival that lands after max_wait_ms but
    while a handler is mid-parse (reserve() held): the round-4 merge
    plateau came from dispatching half-empty batches mid-burst."""
    import time as _time

    from pesto_tpu.serve import BatchingService, _Pending

    class _Stub:
        knn_method = "exact"

    svc = BatchingService(_Stub(), max_batch=8, max_wait_ms=20.0)
    # kill the internal batcher threads so we can drive _collect directly
    svc._stop.set()
    for _ in svc._threads:
        svc._q.put(None)
    for _t in svc._threads:
        _t.join(timeout=5)

    svc.reserve()
    svc._q.put(_Pending({"id": 1}))

    def late_arrival():
        _time.sleep(0.06)  # past the 20 ms base window
        svc.predict_async = None  # no-op marker
        svc._q.put(_Pending({"id": 2}))
        svc.unreserve()

    t = threading.Thread(target=late_arrival)
    t.start()
    batch = svc._collect()
    t.join()
    assert len(batch) == 2, "mid-parse arrival missed the batch"

    # and WITHOUT a reserve, the base window still closes promptly
    svc._q.put(_Pending({"id": 3}))
    t0 = _time.monotonic()
    batch = svc._collect()
    assert len(batch) == 1
    assert _time.monotonic() - t0 < 0.1


def test_listen_backlog_survives_burst_connects():
    """make_server must carry a deep listen backlog: socketserver's
    default of 5 drops burst connections (64 clients connecting at once
    overflow the accept queue; the kernel RSTs sockets the client already
    wrote to — reproduced as ConnectionResetError in the round-5 load
    sweep's 64-client windows)."""
    import http.client
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    class _Stub:
        knn_method = "exact"

        def predict_batch(self, structures, **kw):
            _time.sleep(0.01)
            return [
                np.zeros((max(len(set(s["resid"])), 1), 5), dtype=np.float32)
                for s in structures
            ]

    svc = BatchingService(_Stub(), max_batch=16, max_wait_ms=5.0)
    srv = make_server(svc, host="127.0.0.1", port=0, model_name="t",
                      max_body_bytes=1 << 20, cache_entries=0)
    assert srv.request_queue_size >= 64
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_port
    with open(PDB, "rb") as f:
        body = f.read()

    def one(_):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/v1/predict", body=body)
        r = conn.getresponse()
        r.read()
        conn.close()
        return r.status

    try:
        with ThreadPoolExecutor(64) as pool:
            statuses = list(pool.map(one, range(128)))
        assert all(s in (200, 429) for s in statuses), statuses
    finally:
        srv.shutdown()
        svc.close()
