"""Batching inference server: concurrent PDB/mmCIF requests -> one
device dispatch.

The reference ships notebook-driven inference only; this is the
production front half a serving deployment needs around the TPU
program. Design is TPU-first in the same sense as `infer.Predictor`:
the chip wants few, large, fixed-shape dispatches, so the server's job
is to turn many small concurrent HTTP requests into exactly that —

  - handler threads parse/clean each request's structure (host work,
    overlaps device execution) and block on a per-request event;
  - ONE batcher thread drains the queue, groups whatever arrived within
    `max_wait_ms` of the first pending request (up to `max_batch`), and
    makes a single `Predictor.predict_batch` call — which itself
    bucket-groups, software-pipelines, and serves per-item failures as
    None without failing neighbors (infer.py predict_batch contract);
  - per-item errors (unparseable file, over-bucket structure) map to
    HTTP 400/413 for that request only.

Endpoints:
  POST /v1/predict       body = PDB text (or gzip with Content-Encoding:
                         gzip; mmCIF with Content-Type: chemical/x-cif).
                         Returns JSON {"classes": N, "residues": R,
                         "probabilities": [[...N floats] x R]} or, with
                         ?format=pdb&class=K, the annotated PDB with the
                         class-K prediction in the B-factor column (the
                         apply_model output layout).
  GET  /healthz          liveness + device/model info.
  GET  /v1/stats         request/batch/latency counters.

Usage:
  python -m pesto_tpu.serve --ckpt model.pt [--port 8490] [--bf16]
      [--fast-knn] [--max-batch 16] [--max-wait-ms 20]

Tests drive the full HTTP surface in-process (tests/test_serve.py).
"""

import gzip
import json
import os
import sys
import tempfile
import threading
import time
import queue
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


class _Pending:
    __slots__ = ("structure", "event", "probs", "error", "error_kind",
                 "cancelled", "t_enqueue")

    def __init__(self, structure):
        self.structure = structure
        self.event = threading.Event()
        self.probs = None
        self.error = None
        # "item" = this request's fault (over-bucket/encode failure);
        # "server" = batch-level failure; None = success
        self.error_kind = None
        self.cancelled = False  # abandoned by a timed-out handler
        self.t_enqueue = time.monotonic()


class BatchingService:
    """Cross-request batcher: many concurrent predict() calls -> few
    predict_batch dispatches. Thread-safe; predict() blocks the calling
    thread until its batch is served."""

    def __init__(self, predictor, max_batch: int = 16, max_wait_ms: float = 20.0,
                 max_queue: int = 0, n_threads: int = 2):
        self.predictor = predictor
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        # back-pressure bound: reject (429) when this many requests are
        # already parsing or queued. 0 = default of 4x max_batch — deep
        # queues only grow the tail (round-4 p99 was queueing, not
        # compute); a bounded queue converts overload into fast retries.
        self.max_queue = int(max_queue) if max_queue else 4 * self.max_batch
        self._q = queue.Queue()
        self._stop = threading.Event()
        # handlers mid-parse: arrivals the batcher knows are imminent.
        # The collect window extends while this is nonzero so one batch
        # absorbs a burst whose parses finish a few ms apart (the round-4
        # merge plateau at 6.9/16 was exactly this stagger).
        self._parsing = 0
        self._parsing_lock = threading.Lock()
        self.stats = {
            "requests": 0, "errors": 0, "timeouts": 0, "batches": 0,
            "batched_items": 0, "max_batch_seen": 0, "atoms": 0,
            "residues": 0, "batch_ms_total": 0.0,
            # per-request stage attribution (cumulative ms; /v1/stats
            # divides by the counts to name the throughput ceiling)
            "queue_wait_ms_total": 0.0, "rejected_429": 0,
        }
        self._stats_lock = threading.Lock()
        # two batcher threads by default: predict_batch starts with a
        # serial host record-encode head (~110 ms for a 32-item batch)
        # before its internal chunk pipeline, so a single batcher thread
        # caps throughput at 1/(encode+device) per batch — the round-5
        # load sweep measured exactly that ceiling (batch_service
        # ~1557 ms/batch of 32 = 20.5 req/s). A second thread encodes
        # batch N+1 while batch N waits on the device (predict_batch is
        # concurrency-safe: per-call encoder checkout, locked timers).
        self.n_threads = max(1, int(n_threads))
        self._threads = [
            threading.Thread(target=self._run, daemon=True,
                             name=f"pesto-batcher-{i}")
            for i in range(self.n_threads)
        ]
        for t in self._threads:
            t.start()

    # -- back-pressure / arrival tracking ---------------------------------
    def overloaded(self) -> bool:
        with self._parsing_lock:
            parsing = self._parsing
        return self._q.qsize() + parsing >= self.max_queue

    def reserve(self):
        """A handler is about to parse a request destined for predict():
        the batcher may extend its collect window for it."""
        with self._parsing_lock:
            self._parsing += 1

    def unreserve(self):
        with self._parsing_lock:
            self._parsing -= 1

    def close(self):
        self._stop.set()
        for _ in self._threads:
            self._q.put(None)  # wake each drain
        for t in self._threads:
            t.join(timeout=10.0)

    def predict(self, structure, timeout_s: float = 300.0,
                reserved: bool = False):
        """Enqueue one cleaned structure; returns (probs, None, None) or
        (None, error_message, error_kind). With reserved=True, releases
        the caller's reserve() AFTER the item is visible in the queue
        (no window where the batcher sees neither signal)."""
        p = _Pending(structure)
        self._q.put(p)
        if reserved:
            self.unreserve()
        if not p.event.wait(timeout_s):
            # mark abandoned so the batcher sheds it instead of burning a
            # device dispatch on a request nobody is waiting for
            p.cancelled = True
            with self._stats_lock:
                self.stats["timeouts"] += 1
            return None, "prediction timed out", "server"
        return p.probs, p.error, p.error_kind

    # -- batcher thread ---------------------------------------------------
    def _collect(self):
        """Block for the first pending request, then keep draining until
        max_batch or until max_wait_ms passed since the first arrival.

        The window EXTENDS (up to a hard cap of 8x max_wait) while
        handler threads are mid-parse: those arrivals are milliseconds
        away, and dispatching without them fragments the burst into
        half-empty device batches (the round-4 load table's 6.9/16
        merge plateau). A full batch still dispatches immediately."""
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        t0 = time.monotonic()
        deadline = t0 + self.max_wait_s
        hard_deadline = t0 + 8.0 * self.max_wait_s
        while len(batch) < self.max_batch:
            now = time.monotonic()
            rem = deadline - now
            if rem <= 0:
                with self._parsing_lock:
                    parsing = self._parsing
                if parsing > 0 and now < hard_deadline:
                    # imminent arrivals: poll in short slices
                    rem = min(0.005, hard_deadline - now)
                else:
                    break
            try:
                nxt = self._q.get(timeout=rem)
            except queue.Empty:
                continue
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = [p for p in self._collect() if not p.cancelled]
            if not batch:
                continue
            t0 = time.monotonic()
            q_wait_ms = sum((t0 - p.t_enqueue) * 1e3 for p in batch)
            try:
                probs = self.predictor.predict_batch(
                    [p.structure for p in batch]
                )
            except Exception as e:  # noqa: BLE001 — batch-level failure
                for p in batch:
                    p.error = f"{type(e).__name__}: {e}"
                    p.error_kind = "server"
                    p.event.set()
                with self._stats_lock:
                    self.stats["errors"] += len(batch)
                    self.stats["requests"] += len(batch)
                continue
            dt_ms = (time.monotonic() - t0) * 1e3
            n_res = 0
            for p, pr in zip(batch, probs):
                if pr is None:
                    # predict_batch's per-item degradation contract
                    p.error = "structure could not be predicted (see server log)"
                    p.error_kind = "item"
                else:
                    p.probs = pr
                    n_res += pr.shape[0]
                p.event.set()
            with self._stats_lock:
                st = self.stats
                st["batches"] += 1
                st["batched_items"] += len(batch)
                st["max_batch_seen"] = max(st["max_batch_seen"], len(batch))
                st["requests"] += len(batch)
                st["errors"] += sum(1 for p in batch if p.error)
                st["atoms"] += sum(
                    int(p.structure["xyz"].shape[0]) for p in batch
                )
                st["residues"] += n_res
                st["batch_ms_total"] += dt_ms
                st["queue_wait_ms_total"] += q_wait_ms

    def snapshot(self):
        with self._stats_lock:
            st = dict(self.stats)
        # exact2/pallas overflow fallbacks (chunk re-ran the exact path):
        # proves the "overflow is rare" claim in production, and surfaces
        # a geometry regime where it isn't
        st["knn_fallbacks"] = getattr(self.predictor, "knn_fallback_count", 0)
        # predictor-side stage attribution (cumulative host ms inside
        # predict_batch: record encode pool / stacked-batch encode /
        # blocked device readback) — with the handler-side parse/
        # serialize/queue-wait counters this names the serving ceiling
        st["predictor_stage_ms"] = dict(
            getattr(self.predictor, "stage_ms", {}) or {})
        if st["batches"]:
            st["mean_batch_ms"] = round(st["batch_ms_total"] / st["batches"], 2)
            st["mean_batch_size"] = round(st["batched_items"] / st["batches"], 2)
        if st["requests"]:
            st["mean_queue_wait_ms"] = round(
                st["queue_wait_ms_total"] / st["requests"], 2)
        if st.get("parse_n"):
            st["mean_parse_ms"] = round(
                st["parse_ms_total"] / st["parse_n"], 2)
        if st.get("serialize_n"):
            st["mean_serialize_ms"] = round(
                st["serialize_ms_total"] / st["serialize_n"], 2)
        return st


def _bounded_gunzip(body: bytes, max_bytes: int) -> bytes:
    """Decompress with an inflated-size cap (gzip-bomb guard)."""
    import zlib

    d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
    out = d.decompress(body, max_bytes)
    if d.unconsumed_tail or (not d.eof and d.decompress(b"", 1)):
        raise ValueError(f"gzip body inflates past {max_bytes} bytes")
    return out


def _parse_body_to_structure(body: bytes, content_type: str, encoding: str,
                             max_bytes: int):
    """Request bytes -> cleaned merged structure (the apply_model host
    path). Raises ValueError on unusable input."""
    from .io import read_structure
    from .structure import concatenate_chains, preprocess_structure

    if encoding == "gzip":
        body = _bounded_gunzip(body, max_bytes)
    if not body.strip():
        raise ValueError("empty request body")
    suffix = ".cif" if "cif" in (content_type or "") else ".pdb"
    # the readers are path-based (shared with the native C++ parser);
    # spool to tmpfs — parse cost dominates the write
    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
        f.write(body)
        path = f.name
    try:
        subunits = preprocess_structure(read_structure(path))
        return concatenate_chains(subunits)
    finally:
        os.unlink(path)


def _annotated_pdb(structure, p_class) -> bytes:
    from .io.pdb import save_pdb
    from .structure import encode_bfactor, split_by_chain

    s = encode_bfactor(dict(structure), p_class)
    # save_pdb writes to a path (shared with the CLI's writer)
    fd, path = tempfile.mkstemp(suffix=".pdb")
    os.close(fd)
    try:
        save_pdb(split_by_chain(s), path)
        with open(path, "rb") as fh:
            return fh.read()
    finally:
        os.unlink(path)


class _ResponseCache:
    """Bounded LRU of complete response payloads keyed by request bytes.

    Screening workloads re-submit identical structures (retry storms,
    duplicate entries across ligand sets); a hit skips parse, encode,
    kNN and the device dispatch entirely. Keyed on the SHA-256 of the
    RAW body plus everything else that shapes the response (content
    type, content encoding, output format, class index), so two
    requests share an entry only when their responses are bytewise
    interchangeable — including the predictor's runtime-mutable kNN
    method (an operator flipping pred.knn_method must not keep serving
    responses computed under the old method). Thread-safe; size 0
    disables. Memory is bounded in BYTES as well as entries: a JSON
    probability payload for a large structure runs tens of MB, so an
    entry-count bound alone allowed entries x payload of residency."""

    def __init__(self, max_entries: int, max_bytes: int = 128 << 20):
        import collections
        import threading as _t

        self.max_entries = max_entries
        self.max_bytes = int(max_bytes)
        self._d = collections.OrderedDict()
        self._bytes = 0
        self._lock = _t.Lock()
        self.hits = 0

    @staticmethod
    def key(body: bytes, ctype: str, encoding: str, fmt: str, k: int,
            knn_method: str):
        import hashlib

        h = hashlib.sha256(body).hexdigest()
        return (h, ctype, encoding, fmt, k, knn_method)

    def get(self, key):
        if self.max_entries <= 0:
            return None
        with self._lock:
            v = self._d.get(key)
            if v is not None:
                self._d.move_to_end(key)
                self.hits += 1
            return v

    def put(self, key, payload_ctype):
        if self.max_entries <= 0:
            return
        size = len(payload_ctype[0])
        if size > self.max_bytes // 4:
            return  # one giant payload must not evict the whole cache
        with self._lock:
            old = self._d.pop(key, None)
            if old is not None:
                self._bytes -= len(old[0])
            self._d[key] = payload_ctype
            self._bytes += size
            while self._d and (len(self._d) > self.max_entries
                               or self._bytes > self.max_bytes):
                _, (pay, _c) = self._d.popitem(last=False)
                self._bytes -= len(pay)


class _Singleflight:
    """In-flight dedup: concurrent identical requests compute once.

    The LRU cache only helps AFTER the first response lands; a retry
    storm of N identical requests arriving together would compute N
    times. The first arrival for a key becomes the LEADER and computes;
    followers block on its event, then re-check the cache. A leader
    that errors never fills the cache — its followers fall through and
    compute themselves (rare, so no re-election complexity). Disabled
    alongside the cache (leaders always win when there is no cache to
    re-check)."""

    def __init__(self, enabled: bool):
        import threading as _t

        self.enabled = enabled
        self._lock = _t.Lock()
        self._inflight = {}
        self.waits = 0

    def lead_or_wait(self, key, timeout_s: float):
        """Returns True if the caller is the leader (must call done()),
        False if it waited for a leader (re-check the cache)."""
        if not self.enabled:
            return True
        with self._lock:
            ev = self._inflight.get(key)
            if ev is None:
                import threading as _t

                self._inflight[key] = _t.Event()
                return True
            self.waits += 1
        ev.wait(timeout_s)
        return False

    def done(self, key):
        if not self.enabled:
            return
        with self._lock:
            ev = self._inflight.pop(key, None)
        if ev is not None:
            ev.set()


def make_server(service: BatchingService, host: str = "127.0.0.1",
                port: int = 8490, model_name: str = "?",
                max_body_bytes: int = 64 << 20, cache_entries: int = 32):
    """Build (not start) the ThreadingHTTPServer. Tests call
    serve_forever on a thread; main() blocks on it."""

    cache = _ResponseCache(cache_entries)
    flight = _Singleflight(cache_entries > 0)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # stderr, not stdout
            sys.stderr.write("serve: %s\n" % (fmt % args))

        def _drain_body(self):
            """Consume the request body so a keep-alive connection stays
            in sync even on early error responses (otherwise the next
            request line is parsed out of the unread body bytes)."""
            try:
                length = int(self.headers.get("Content-Length", "0") or "0")
            except ValueError:
                length = 0
            while length > 0:
                chunk = self.rfile.read(min(length, 1 << 20))
                if not chunk:
                    break
                length -= len(chunk)

        def _send(self, code, payload: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _send_json(self, code, obj):
            self._send(code, json.dumps(obj).encode())

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._send_json(200, {
                    "ok": True, "model": model_name,
                    "knn_method": getattr(service.predictor, "knn_method", "?"),
                })
            elif path == "/v1/stats":
                st = service.snapshot()
                if st["batches"]:
                    st["mean_batch_size"] = st["batched_items"] / st["batches"]
                    st["mean_batch_ms"] = st["batch_ms_total"] / st["batches"]
                st["cache_hits"] = cache.hits
                st["cache_entries"] = len(cache._d)
                st["singleflight_waits"] = flight.waits
                self._send_json(200, st)
            else:
                self._send_json(404, {"error": "unknown path"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/v1/predict":
                self._drain_body()
                self._send_json(404, {"error": "unknown path"})
                return
            # validate query params BEFORE burning a device dispatch
            q = parse_qs(url.query)
            want_pdb = q.get("format", [""])[0] == "pdb"
            k = 0
            if want_pdb:
                n_classes = int(service.predictor.cfg.dm_n2)
                try:
                    k = int(q.get("class", ["0"])[0])
                except ValueError:
                    k = -1
                if not 0 <= k < n_classes:
                    self._drain_body()
                    self._send_json(400, {
                        "error": f"class {q.get('class', ['0'])[0]!r} out of "
                                 f"range [0, {n_classes})"})
                    return
            try:
                length = int(self.headers.get("Content-Length", "0") or "0")
            except ValueError:
                length = -1
            if not 0 <= length <= max_body_bytes:
                self._drain_body()
                self._send_json(413, {
                    "error": f"body must be 0..{max_body_bytes} bytes"})
                return
            ctype = self.headers.get("Content-Type", "")
            cenc = (self.headers.get("Content-Encoding") or "").lower()
            body = self.rfile.read(length)
            ckey = _ResponseCache.key(
                body, ctype, cenc, "pdb" if want_pdb else "json", k,
                getattr(service.predictor, "knn_method", "?"))
            hit = cache.get(ckey)
            if hit is not None:
                self._send(200, hit[0], ctype=hit[1])
                return
            # back-pressure AFTER the cache check (hits are free): a
            # bounded queue converts overload into fast 429 retries
            # instead of a seconds-deep latency tail
            if service.overloaded():
                with service._stats_lock:
                    service.stats["rejected_429"] += 1
                self.send_response(429)
                self.send_header("Retry-After", "1")
                payload = json.dumps({
                    "error": "server at capacity, retry"}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            # singleflight: if an identical request is already computing,
            # wait for it and serve its cached response instead of
            # computing again; on leader failure, fall through and compute
            # (a fall-through follower never calls done() — it holds no
            # registration, and popping would release a LATER leader's
            # followers early)
            is_leader = flight.lead_or_wait(ckey, 330.0)  # > predict timeout
            if not is_leader:
                hit = cache.get(ckey)
                if hit is not None:
                    self._send(200, hit[0], ctype=hit[1])
                    return
            try:
                # reserve BEFORE parsing: the batcher extends its collect
                # window for requests it knows are mid-parse
                service.reserve()
                handed_off = False
                try:
                    t_parse0 = time.monotonic()
                    try:
                        structure = _parse_body_to_structure(
                            body, ctype, cenc, max_body_bytes,
                        )
                    except Exception as e:  # noqa: BLE001 — client error
                        self._send_json(
                            400, {"error": f"unusable structure: {e}"})
                        return
                    parse_ms = (time.monotonic() - t_parse0) * 1e3
                    with service._stats_lock:
                        st = service.stats
                        st["parse_ms_total"] = (
                            st.get("parse_ms_total", 0.0) + parse_ms)
                        st["parse_n"] = st.get("parse_n", 0) + 1
                    probs, err, err_kind = service.predict(
                        structure, reserved=True)
                    handed_off = True
                finally:
                    if not handed_off:
                        service.unreserve()
                if err is not None:
                    # this item's fault (over-bucket/encode) -> 413;
                    # batch failure or timeout -> 503
                    self._send_json(413 if err_kind == "item" else 503,
                                    {"error": err})
                    return
                t_ser0 = time.monotonic()
                if want_pdb:
                    payload, out_ctype = (
                        _annotated_pdb(structure, probs[:, k]),
                        "chemical/x-pdb")
                else:
                    import numpy as np

                    payload, out_ctype = (json.dumps({
                        "classes": int(probs.shape[1]),
                        "residues": int(probs.shape[0]),
                        "probabilities": np.round(
                            np.asarray(probs, dtype=np.float64), 6).tolist(),
                    }).encode(), "application/json")
                ser_ms = (time.monotonic() - t_ser0) * 1e3
                with service._stats_lock:
                    st = service.stats
                    st["serialize_ms_total"] = (
                        st.get("serialize_ms_total", 0.0) + ser_ms)
                    st["serialize_n"] = st.get("serialize_n", 0) + 1
                cache.put(ckey, (payload, out_ctype))
                self._send(200, payload, ctype=out_ctype)
            finally:
                if is_leader:
                    flight.done(ckey)

    class Server(ThreadingHTTPServer):
        # listen backlog: the socketserver default of 5 drops connections
        # under burst concurrency (64 clients connecting at once establish
        # in the kernel SYN queue, never reach accept(), and get RST a few
        # seconds later — the client sees ConnectionResetError on a socket
        # it successfully wrote to). Deep enough for any plausible
        # client-burst; accepted-but-unread sockets cost only an fd.
        request_queue_size = 128

    return Server((host, port), Handler)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ckpt", default=None, help="reference torch .pt checkpoint")
    parser.add_argument("--orbax", default=None, help="orbax checkpoint dir")
    parser.add_argument("--model", default=None, help="config preset override")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8490)
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    parser.add_argument("--knn", default="exact",
                        choices=("exact", "exact2", "fast", "pallas"),
                        help="kNN method (default exact; 'fast' trades a "
                             "0.003 median-AUC delta for ~1.7x cheaper "
                             "selection — docs/PERFORMANCE.md §4 records "
                             "why exact2 lost its default slot)")
    parser.add_argument("--fast-knn", action="store_true",
                        help="shorthand for --knn fast")
    # Defaults from the round-5 concurrent-load sweep
    # (docs/artifacts/serving_load.json sweep_rows): (32, 10 ms) is at or
    # near the best measured req/s at 16/32/64 clients (15.8/18.4/20.1)
    # where the old (16, 20 ms) collapsed to 9.6 at 32 clients; the
    # adaptive collect window dispatches early on a full batch, so the
    # larger cap costs nothing at low concurrency.
    parser.add_argument("--max-batch", type=int, default=32)
    parser.add_argument("--max-wait-ms", type=float, default=10.0)
    parser.add_argument("--service-threads", type=int, default=2,
                        help="batcher threads; 2 overlaps batch N+1's "
                             "host encode with batch N's device wait")
    parser.add_argument("--max-queue", type=int, default=0,
                        help="reject (429) when this many requests are "
                             "parsing or queued; 0 = 4x max-batch")
    parser.add_argument("--max-body-mb", type=int, default=64,
                        help="reject request bodies larger than this (413)")
    parser.add_argument("--cache-entries", type=int, default=32,
                        help="LRU response cache size: repeated identical "
                             "requests (same body/format/class) are served "
                             "without touching the device; 0 disables")
    parser.add_argument("--warmup", action="store_true",
                        help="compile the common buckets before listening")
    args = parser.parse_args(argv)

    from .infer import Predictor
    from .models import get_config
    from .utils import enable_compilation_cache

    enable_compilation_cache()
    knn_method = "fast" if args.fast_knn else args.knn

    def _bf16(c):
        return c.replace(dtype="bfloat16", precision="default") if args.bf16 else c

    if args.ckpt:
        if args.model is not None:
            # explicit preset, like apply_model.py's --model branch
            cfg = _bf16(get_config(args.model, remat=False))
            pred = Predictor.from_reference_checkpoint(args.ckpt, cfg)
            pred.knn_method = knn_method
            model_name = args.model
        else:
            from .port import load_reference_checkpoint

            params, cfg = load_reference_checkpoint(args.ckpt)
            cfg = _bf16(cfg)
            pred = Predictor(cfg, params, knn_method=knn_method)
            model_name = f"ported:{os.path.basename(args.ckpt)}"
    elif args.orbax:
        cfg = _bf16(get_config(args.model or "i_v4_1", remat=False))
        from .train.checkpoint import restore_checkpoint
        from .train.state import create_train_state

        state, _ = create_train_state(cfg)
        restored = restore_checkpoint(args.orbax, state)
        if restored is None:
            parser.error(f"no checkpoint found in {args.orbax}")
        pred = Predictor(cfg, restored.params, knn_method=knn_method)
        model_name = args.model or "i_v4_1"
    else:
        parser.error("need --ckpt or --orbax")

    if args.warmup:
        pred.warmup()

    service = BatchingService(pred, max_batch=args.max_batch,
                              max_wait_ms=args.max_wait_ms,
                              max_queue=args.max_queue,
                              n_threads=args.service_threads)
    server = make_server(service, host=args.host, port=args.port,
                         model_name=model_name,
                         max_body_bytes=args.max_body_mb << 20,
                         cache_entries=args.cache_entries)
    print(f"pesto_tpu.serve listening on {args.host}:{args.port} "
          f"(model {model_name}, knn {knn_method}, max_batch {args.max_batch}, "
          f"max_wait {args.max_wait_ms} ms)", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
