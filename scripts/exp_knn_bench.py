"""kNN method micro-benchmark on one chip: exact / exact2 / fast /
pallas at the production 8k bucket, plus the raw TopK-unit costs that
decide exact2's default-worthiness.

exact2's premise (topology.py exact2 branch): XLA's TopK is element-
bound and INDEX TRACKING costs ~3x a values-only pass on some shapes,
so two values-only passes (threshold + candidate compaction) beat one
indexed pass. This script measures that premise directly:

    python scripts/exp_knn_bench.py [--na 8192] [--batch 4]

Timing protocol: chained iterations inside one jit (the tunneled
runtime's block_until_ready returns early; see utils/profiling.py).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def chain_time(fn, x0, iters=10, sync_s=0.035):
    """fn(x) -> (x_next, scalar-ish out); one host sync at the end."""
    import numpy as np

    x, out = fn(x0)
    _ = float(np.asarray(out).ravel()[0])  # warm + sync
    t0 = time.perf_counter()
    x, out = fn(x0)
    _ = float(np.asarray(out).ravel()[0])
    t1 = time.perf_counter()
    del x
    return max(t1 - t0 - sync_s, 0.0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--na", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from pesto_tpu.utils import enable_compilation_cache, wait_for_device

    if not wait_for_device(max_wait_s=600, log=log):
        sys.exit("device unavailable")
    enable_compilation_cache()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pesto_tpu.spatial import morton_order
    from pesto_tpu.topology import knn_topology_batch

    NA, B, K, ITERS = args.na, args.batch, args.k, args.iters
    rng = np.random.default_rng(0)
    # protein-like cloud, Morton-sorted like the serving path
    Xh = np.zeros((B, NA, 3), np.float32)
    mh = np.zeros((B, NA), np.float32)
    for b in range(B):
        n = NA - 1
        X = (rng.normal(size=(n, 3)) * (n / 850.0) ** (1 / 3) * 14).astype(
            np.float32
        )
        X = X[morton_order(X)]
        Xh[b, 1:] = X
        mh[b, 1:] = 1.0
    Xd, md = jax.device_put(jnp.asarray(Xh)), jax.device_put(jnp.asarray(mh))

    log(f"== kNN methods, B={B} x NA={NA}, k={K} (ms per BATCH) ==")
    results = {}
    for method in ("exact", "exact2", "fast", "pallas"):
        try:

            @functools.partial(jax.jit, static_argnames=())
            def step(X, m=md, meth=method):
                def body(Xc, _):
                    ids, d, r = knn_topology_batch(Xc, m, k=K, method=meth)
                    eps = (d.astype(jnp.float32).sum() % 3.0 - 1.0) * 1e-7
                    return Xc + eps, d[0, 1, 0]

                return jax.lax.scan(body, X, None, length=ITERS)

            t = chain_time(lambda x: step(x), Xd, iters=ITERS)
            results[method] = t * 1e3
            log(f"{method:7s}: {t * 1e3:8.2f} ms/batch "
                f"({t * 1e3 / B:6.2f} ms/structure)")
        except Exception as e:  # noqa: BLE001
            log(f"{method:7s}: failed ({type(e).__name__}: {str(e)[:100]})")

    # --- raw TopK unit costs at the chunked shape -----------------------
    W = 512
    rows = B * NA * (NA // W)
    vals = jax.device_put(
        jnp.asarray(rng.normal(size=(rows, W)).astype(np.float32))
    )
    log(f"\n== raw TopK units over [{rows}, {W}] f32 "
        f"({rows * W / 1e6:.0f} Melem) ==")

    def unit(fn, label):
        @jax.jit
        def step(v):
            def body(vc, _):
                out = fn(vc)
                eps = (out.astype(jnp.float32).sum() % 3.0 - 1.0) * 1e-7
                return vc + eps, out[0, 0]

            return jax.lax.scan(body, v, None, length=ITERS)

        t = chain_time(lambda v: step(v), vals, iters=ITERS)
        log(f"{label:34s}: {t * 1e3:8.2f} ms")
        return t * 1e3

    r = {}
    r["topk_values_only"] = unit(lambda v: jax.lax.top_k(v, K)[0],
                                 "top_k values-only (k=64)")
    r["topk_with_indices"] = unit(
        lambda v: jax.lax.top_k(v, K)[1].astype(jnp.float32),
        "top_k WITH indices (k=64)")
    r["topk_int_values_only"] = unit(
        lambda v: jax.lax.top_k(v.astype(jnp.int32), K)[0].astype(jnp.float32),
        "top_k int32 values-only (k=64)")
    r["approx_partial_reduce"] = unit(
        lambda v: jax.lax.approx_max_k(
            v.reshape(B * NA, NA), K + 32, recall_target=0.95,
            aggregate_to_topk=False)[0],
        "approx_max_k partial (k+32, full row)")
    ratio = (r["topk_with_indices"] / r["topk_values_only"]
             if r["topk_values_only"] else float("nan"))
    log(f"\nindex-tracking multiplier: {ratio:.2f}x")
    print({"methods_ms_per_batch": results, "units_ms": r,
           "index_multiplier": round(ratio, 2)})


if __name__ == "__main__":
    main()
