"""Concurrent-load benchmark for the batching inference server
(pesto_tpu/serve.py): the production serving metric (VERDICT r3 item 6).

Drives an IN-PROCESS server (same code path as deployment: HTTP handler ->
BatchingService -> Predictor.predict_batch on the chip) with N concurrent
clients replaying real pdbs_test PDB files, and reports requests/s, p50 /
p99 latency and the batch-merge rate from /v1/stats, for the exact
(production default) and fast kNN methods.

    python scripts/exp_serving_load.py [--quick]

Writes the sweep artifact to docs/artifacts/serving_load.json; the table
in docs/PERFORMANCE.md §2 is generated from that file.
"""

import argparse
import glob
import http.client
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PDB_DIR = "/root/reference/pdbs_test"


def log(m):
    print(m, file=sys.stderr, flush=True)


def pick_bodies(max_files=6):
    """A fixed spread of real structures by size (bytes as a size proxy)."""
    paths = sorted(glob.glob(os.path.join(PDB_DIR, "*.pdb")), key=os.path.getsize)
    if not paths:
        raise SystemExit(f"no PDBs under {PDB_DIR}")
    idx = [int(i * (len(paths) - 1) / (max_files - 1)) for i in range(max_files)]
    chosen = [paths[i] for i in idx]
    bodies = [open(p, "rb").read() for p in chosen]
    log("request bodies: " + ", ".join(
        f"{os.path.basename(p)} ({len(b)//1024}K)" for p, b in zip(chosen, bodies)))
    return bodies


def run_load(port, bodies, n_clients, n_requests):
    lat = [None] * n_requests
    errs = []

    retries_429 = [0]

    conn_retries = [0]

    def one(i):
        body = bodies[i % len(bodies)]
        t0 = time.perf_counter()
        while True:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            try:
                conn.request("POST", "/v1/predict", body=body)
                r = conn.getresponse()
            except (ConnectionResetError, ConnectionRefusedError,
                    http.client.RemoteDisconnected):
                # transient connect-level failure (e.g. an accept-queue
                # drop): retry like a production client, but COUNT it so
                # the artifact stays honest; latency keeps accruing
                conn.close()
                conn_retries[0] += 1
                if conn_retries[0] > 3 * n_requests:
                    raise
                time.sleep(0.02)
                continue
            data = r.read()
            conn.close()
            if r.status == 429:
                # back-pressure contract: fast retry after a short pause;
                # latency keeps accruing so the tail stays honest
                retries_429[0] += 1
                time.sleep(0.02)
                continue
            break
        lat[i] = time.perf_counter() - t0
        if r.status != 200:
            errs.append(f"HTTP {r.status}: {data[:120]}")

    t0 = time.perf_counter()
    with ThreadPoolExecutor(n_clients) as pool:
        list(pool.map(one, range(n_requests)))
    wall = time.perf_counter() - t0
    if errs:
        raise RuntimeError(errs[0])
    lat.sort()
    p50 = lat[len(lat) // 2]
    p99 = lat[min(len(lat) - 1, int(len(lat) * 0.99))]
    return {
        "clients": n_clients,
        "requests": n_requests,
        "requests_per_sec": round(n_requests / wall, 2),
        "p50_ms": round(p50 * 1e3, 1),
        "p99_ms": round(p99 * 1e3, 1),
        "p99_over_p50": round(p99 / max(p50, 1e-9), 2),
        "client_retries_429": retries_429[0],
        "client_conn_retries": conn_retries[0],
        "wall_sec": round(wall, 2),
    }


def _stage_delta(before, after, n_requests, n_batches):
    """Per-request stage attribution for one measured window (VERDICT r4
    ask 1a): queue-wait / parse / serialize / device-batch means from the
    /v1/stats counter deltas, plus predictor-internal stage means."""
    d = lambda k: after.get(k, 0) - before.get(k, 0)  # noqa: E731
    out = {
        "mean_queue_wait_ms": round(d("queue_wait_ms_total") / max(n_requests, 1), 1),
        "mean_parse_ms": round(d("parse_ms_total") / max(d("parse_n"), 1), 1),
        "mean_serialize_ms": round(d("serialize_ms_total") / max(d("serialize_n"), 1), 1),
        "mean_batch_service_ms": round(d("batch_ms_total") / max(n_batches, 1), 1),
    }
    pb, pa = before.get("predictor_stage_ms", {}), after.get("predictor_stage_ms", {})
    for k in pa:
        out[f"predictor_{k}_ms_per_batch"] = round(
            (pa[k] - pb.get(k, 0)) / max(n_batches, 1), 1)
    return out


def measured_window(service, port, bodies, n_clients, n_requests, method):
    """One load window with stats-snapshot deltas folded into the row."""
    before = service.snapshot()
    row = run_load(port, bodies, n_clients, n_requests)
    after = service.snapshot()
    nb = after["batches"] - before["batches"]
    ni = after["batched_items"] - before["batched_items"]
    atoms = after.get("atoms", 0) - before.get("atoms", 0)
    row.update({
        "knn_method": method,
        "mean_batch_size": round(ni / max(nb, 1), 2),
        # the like-for-like capacity number: HTTP-side atoms/s vs the
        # chip's parse-inclusive predict_batch rate (BENCH e2e_from_pdb)
        "atoms": atoms,
        "atoms_per_sec": round(atoms / max(row["wall_sec"], 1e-9), 1),
        # per-WINDOW delta, not the cumulative counter
        "knn_fallbacks": (after.get("knn_fallbacks", 0)
                          - before.get("knn_fallbacks", 0)),
        "rejected_429": after.get("rejected_429", 0) - before.get("rejected_429", 0),
        "stages": _stage_delta(before, after, row["requests"], nb),
    })
    log(f"{method:6s} x{n_clients:2d} clients: "
        f"{row['requests_per_sec']:6.2f} req/s = "
        f"{row['atoms_per_sec']:8.0f} atoms/s  "
        f"p50 {row['p50_ms']:7.1f} ms  p99 {row['p99_ms']:7.1f} ms  "
        f"batch {row['mean_batch_size']:.2f}  stages {row['stages']}")
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="docs/artifacts/serving_load.json")
    args = ap.parse_args()

    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.serve import BatchingService, make_server
    from pesto_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    bodies = pick_bodies()

    cfg = get_config("i_v4_1", remat=False, dtype="bfloat16",
                     precision="default", gather="take")
    import jax

    params = jax.jit(lambda: init_params(cfg, na=256, nr=32))()
    jax.block_until_ready(params)

    results = {"device": str(jax.devices()[0]), "config": "i_v4_1 bf16",
               "max_batch": 16, "max_wait_ms": 20.0, "rows": [],
               "sweep_rows": []}
    n_req_base = 32 if args.quick else 96

    # the buckets + power-of-two chunk sizes the bodies will hit: warm
    # them IN-PROCESS first (no HTTP timeout to blow while the fused
    # program compiles; the compilation cache persists across methods)
    from pesto_tpu.batching import ATOM_BUCKETS, RES_BUCKETS, pick_bucket
    from pesto_tpu.serve import _parse_body_to_structure

    # derive the EXACT (atom, residue) bucket pairs the bodies will hit —
    # guessing nr from na//8 misses atypical atoms-per-residue ratios
    # (the committed round-4 artifact carries an 11.2 s p99 straggler
    # from exactly such a cold compile inside the timed window)
    from pesto_tpu.encoding import encode_structure

    structures = [_parse_body_to_structure(b, "", "", 64 << 20) for b in bodies]
    warm_pairs = sorted({
        (pick_bucket(s["xyz"].shape[0] + 1, ATOM_BUCKETS),
         pick_bucket(max(encode_structure(s)[1].shape[1], RES_BUCKETS[0]),
                     RES_BUCKETS))
        for s in structures
    })
    log(f"warm (atom, residue) buckets: {warm_pairs}")

    for method in ("exact", "fast"):
        pred = Predictor(cfg, params, knn_method=method)
        t0 = time.perf_counter()
        for na, nr in warm_pairs:
            # the chunk padder dispatches powers of two up to the
            # 32768-atom per-call budget (infer.py submit loop)
            bs = tuple(b for b in (1, 2, 4, 8, 16) if b * na <= 32768)
            pred.warmup(buckets=[(na, nr)], batch_sizes=bs)
        log(f"{method}: warmup {time.perf_counter()-t0:.1f}s")
        service = BatchingService(pred, max_batch=16, max_wait_ms=20.0)
        # cache OFF: this harness replays 6 bodies over ~100 requests, so
        # the production-default LRU response cache would short-circuit
        # nearly every request and the table would measure the cache, not
        # the parse+batch+device capacity it claims to
        srv = make_server(service, host="127.0.0.1", port=0,
                          model_name="bench", max_body_bytes=64 << 20,
                          cache_entries=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        port = srv.server_port
        try:
            # warm every bucket the bodies hit, at the merge batch shapes
            run_load(port, bodies, 8, 2 * len(bodies))
            # ...and as SINGLETON dispatches: the tunneled runtime pays a
            # multi-second stall on the first real dispatch of each shape
            # per process even when warmup() compiled it (measured 20.6 s
            # then 3.6 s in the first 1-client window across two runs);
            # the 8-client pre-pass only exercises merged-batch shapes
            run_load(port, bodies, 1, len(bodies))
            for n_clients in (1, 4, 16):
                row = measured_window(service, port, bodies, n_clients,
                                      max(n_req_base // (4 if n_clients == 1 else 1),
                                          n_clients * 2), method)
                results["rows"].append(row)
        finally:
            srv.shutdown()
            service.close()

    # knob sweep (VERDICT r4 ask 1b): max_batch x max_wait_ms x clients on
    # the production-default exact method; each point gets its own service
    # (fresh counters) over the SAME warmed predictor
    pred = Predictor(cfg, params, knn_method="exact")
    for na, nr in warm_pairs:
        bs = tuple(b for b in (1, 2, 4, 8, 16) if b * na <= 32768)
        pred.warmup(buckets=[(na, nr)], batch_sizes=bs)
    sweep_points = [(16, 20.0), (32, 20.0), (32, 10.0), (64, 10.0)]
    client_counts = (16, 32) if args.quick else (16, 32, 64)
    for max_batch, max_wait in sweep_points:
        service = BatchingService(pred, max_batch=max_batch,
                                  max_wait_ms=max_wait)
        srv = make_server(service, host="127.0.0.1", port=0,
                          model_name="bench", max_body_bytes=64 << 20,
                          cache_entries=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        port = srv.server_port
        try:
            run_load(port, bodies, 8, 2 * len(bodies))  # warm merge shapes
            for n_clients in client_counts:
                row = measured_window(service, port, bodies, n_clients,
                                      max(n_req_base, n_clients * 3), "exact")
                row.update({"max_batch": max_batch, "max_wait_ms": max_wait})
                results["sweep_rows"].append(row)
        finally:
            srv.shutdown()
            service.close()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
