"""Serving-throughput sweep: find the best predict_batch operating point.

Sweeps the knobs bench.py pins at their defaults — kNN method (exact /
exact2 / fast / pallas), per-dispatch atom budget (chunk batch size), and
software-pipeline depth — over the bench workload (12 structures x 8k
atoms, flagship 32-layer bf16 config) and prints a ranked table. Run on
a healthy TPU after a toolchain change or before re-baselining bench.py:

    python scripts/exp_serving_sweep.py [--quick]

The measured context (round 3): e2e exact 72.5k / fast 84.8k atoms/s vs
113.9k forward-only — the gap is on-device kNN time plus per-dispatch
runtime overhead, so the levers here are exactly kNN method and the
dispatch granularity.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="2 reps instead of 3")
    ap.add_argument("--n-structs", type=int, default=12)
    ap.add_argument("--atoms", type=int, default=8191)
    args = ap.parse_args()

    from pesto_tpu.utils import wait_for_device

    if not wait_for_device(max_wait_s=600, log=log):
        sys.exit("device unavailable")

    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.synthetic import random_structure_record
    from pesto_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = get_config(
        "i_v4_1", remat=False, dtype="bfloat16", precision="default",
        gather="take",
    )
    params = init_params(cfg)
    records = [
        random_structure_record(n_atoms=args.atoms, n_res=args.atoms // 4,
                                seed=100 + i)
        for i in range(args.n_structs)
    ]
    total_atoms = args.n_structs * args.atoms
    reps = 2 if args.quick else 3

    rows = []
    for method in ("exact", "exact2", "fast", "pallas"):
        try:
            pred = Predictor(cfg, params, knn_method=method)
            for atoms_per_call in (32768, 65536):
                for depth in (2, 3):
                    kw = dict(atoms_per_call=atoms_per_call,
                              pipeline_depth=depth)
                    _ = pred.predict_batch(records, **kw)  # warm/compile
                    best = min(
                        _timed(pred, records, kw) for _ in range(reps)
                    )
                    rate = total_atoms / best
                    rows.append((rate, method, atoms_per_call, depth, best))
                    log(f"{method:7s} apc={atoms_per_call} depth={depth}: "
                        f"{best*1e3:6.0f} ms = {rate:8.0f} atoms/s")
        except Exception as e:  # noqa: BLE001 — pallas may not compile
            log(f"{method}: skipped ({type(e).__name__}: {str(e)[:120]})")

    rows.sort(reverse=True)
    print("\nrate_atoms_per_s  method  atoms_per_call  depth")
    for rate, method, apc, depth, _ in rows:
        print(f"{rate:16.0f}  {method:6s}  {apc:14d}  {depth}")
    if rows:
        r = rows[0]
        print(f"\nBEST: {r[1]} atoms_per_call={r[2]} depth={r[3]} "
              f"-> {r[0]:.0f} atoms/s")


def _timed(pred, records, kw):
    t0 = time.perf_counter()
    out = pred.predict_batch(records, **kw)
    dt = time.perf_counter() - t0
    assert all(p is not None for p in out)
    return dt


if __name__ == "__main__":
    main()
