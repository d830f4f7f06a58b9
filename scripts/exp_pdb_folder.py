"""On-chip probe: parse-inclusive folder inference — serial vs threaded
host parse.

bench.py's `e2e_from_pdb` line (the headline's numerator) used to parse
the 64 pdbs_test files serially on the main thread before calling
predict_batch; the round-5 on-chip run measured 3.18 s total against
2.12 s of device-bound record-level work, i.e. ~1.07 s (17 ms/file) of
dead host time. Predictor.predict_pdb_files moves parse + preprocess
into a thread pool (the native C++ parser releases the GIL inside its
ctypes call), mirroring the reference's own production pipelines which
parse in 8 DataLoader workers (interfaceome/apply_model.py,
model/main.py:37).

This probe times both paths on the same predictor + compile cache and
writes docs/artifacts/pdb_folder_parse.json.

Usage: python scripts/exp_pdb_folder.py [--reps 3]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-files", type=int, default=64)
    args = ap.parse_args()

    paths = sorted(glob.glob("/root/reference/pdbs_test/*.pdb"))[: args.n_files]
    if not paths:
        sys.exit("no pdbs_test files mounted")

    from pesto_tpu.utils import wait_for_device

    if not wait_for_device(max_wait_s=1800, log=log):
        sys.exit("device unavailable")

    import jax

    from pesto_tpu.infer import Predictor
    from pesto_tpu.io import read_structure
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.structure import concatenate_chains, preprocess_structure
    from pesto_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg32 = get_config("i_v4_1", remat=False)
    cfg16 = cfg32.replace(dtype="bfloat16", precision="default")
    params = jax.jit(lambda: init_params(cfg32, na=256, nr=32))()
    jax.block_until_ready(params)
    pred = Predictor(cfg16, params)

    def serial():
        recs = [
            concatenate_chains(preprocess_structure(read_structure(p)))
            for p in paths
        ]
        probs = pred.predict_batch(recs)
        return recs, probs

    def threaded(nt):
        return pred.predict_pdb_files(paths, num_threads=nt)

    # host-only parse cost (no device), serial and threaded
    t0 = time.perf_counter()
    recs_h = [
        concatenate_chains(preprocess_structure(read_structure(p)))
        for p in paths
    ]
    t_parse_serial = time.perf_counter() - t0
    atoms = sum(r["xyz"].shape[0] for r in recs_h)
    from concurrent.futures import ThreadPoolExecutor

    def load(p):
        return concatenate_chains(preprocess_structure(read_structure(p)))

    with ThreadPoolExecutor(8) as pool:
        t0 = time.perf_counter()
        _ = list(pool.map(load, paths))
        t_parse_thr8 = time.perf_counter() - t0
    log(f"host parse only: serial {t_parse_serial:.2f}s, "
        f"8 threads {t_parse_thr8:.2f}s ({len(paths)} files, {atoms} atoms)")

    # warm compiles once (shapes shared by both paths)
    serial()

    results = {}
    for name, fn in [("serial", serial)] + [
        (f"threaded{nt}", lambda nt=nt: threaded(nt)) for nt in (4, 8, 16)
    ]:
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            recs, probs = fn()
            dt = time.perf_counter() - t0
            n_ok = sum(p is not None for p in probs)
            assert n_ok == len(paths), f"{name}: {n_ok}/{len(paths)} ok"
            best = dt if best is None else min(best, dt)
        results[name] = {
            "sec": round(best, 3),
            "atoms_per_sec": round(atoms / best, 1),
        }
        log(f"{name}: {best:.3f}s = {atoms/best:.0f} atoms/s")

    # numerical identity between the two paths (same batch grouping ->
    # same compiled programs -> bit-identical outputs expected)
    r_s, p_s = serial()
    r_t, p_t = threaded(8)
    maxdiff = max(
        float(np.max(np.abs(a - b))) for a, b in zip(p_s, p_t)
    )
    log(f"serial vs threaded max|prob diff|: {maxdiff:.2e}")

    out = {
        "what": "parse-inclusive folder inference: serial vs threaded host parse",
        "n_files": len(paths),
        "atoms": atoms,
        "host_parse_only_sec": {
            "serial": round(t_parse_serial, 3),
            "threads8": round(t_parse_thr8, 3),
        },
        "end_to_end": results,
        "serial_vs_threaded_max_prob_diff": maxdiff,
        "device": str(jax.devices()[0]),
    }
    art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "artifacts", "pdb_folder_parse.json",
    )
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
