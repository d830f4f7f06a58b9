"""On-chip experiment: decompose the sustained mixed-bucket training
window (bench.py train_mixed) into its constituent costs, so the claim
"the window is ~97% step time — no scheduling/loader overhead left to
remove" (docs/PERFORMANCE.md, VERDICT r4 item 4) is a measured artifact
rather than arithmetic on headline numbers.

Reproduces the exact bench.py configuration (same SynthDataset sizes,
same BucketedLoader settings, same 17-epoch / 102-step window with two
eval passes and one overlapped async checkpoint), then measures:

  per-shape  isolated steady-state sec/step for each distinct batch
             shape the loader emits (threading state, donated like the
             window does)
  eval       one full eval pass (forward-only over all 6 batches)
  window     the full 17-epoch sustained window, same as bench.py

and reports predicted = sum(per-shape x count) x epochs + 2 x eval
against the measured window wall. The residual is everything that is
NOT step/eval compute: loader host pad + compact-encode, device_put,
dispatch gaps, async-checkpoint interference.

Writes docs/artifacts/mixed_decomp.json.

Reference being replaced: model/main.py:103-255 trained the same
architecture at batch 1 on a V100 (~4.6-5.1 structures/s sustained).

Usage: python scripts/exp_mixed_decomp.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pesto_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from pesto_tpu.data.loader import BucketedLoader
from pesto_tpu.models import get_config
from pesto_tpu.synthetic import random_structure_arrays
from pesto_tpu.topology import extract_topology
from pesto_tpu.train import create_train_state
from pesto_tpu.train.checkpoint import AsyncCheckpointer
from pesto_tpu.train.step import build_eval_step_fn, build_train_step_fn

EPOCHS = 17
ITERS = 4  # steady-state repeats per distinct shape


def log(m):
    print(m, file=sys.stderr, flush=True)


class SynthDataset:
    """Identical to bench.py's mixed-bucket synthetic dataset."""

    def __init__(self, sizes):
        self.items = []
        for i, (n_at, n_rs) in enumerate(sizes):
            X, q, M = random_structure_arrays(n_at, n_rs, seed=200 + i)
            ids = extract_topology(X, 64)[0].astype(np.int32)
            y = (np.random.RandomState(i).rand(n_rs, 5) < 0.1).astype(np.float32)
            self.items.append((X, ids, q, M, y))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def main():
    sizes = ([(1000, 126)] * 16 + [(2000, 250)] * 8 + [(4000, 500)] * 6
             + [(8191, 1024)] * 4)
    ds = SynthDataset(sizes)
    loader = BucketedLoader(
        ds, np.array([(a, r) for a, r in sizes]), atoms_per_batch=16384,
        max_batch=32, shuffle=True, seed=3, gather_tables=False,
        compact=True,
    )

    tcfg = get_config("i_v4_1", dtype="bfloat16", precision="default",
                      remat=True, remat_policy="dots_nb")
    tstate, tx = create_train_state(tcfg, learning_rate=1e-5)
    jstep = jax.jit(build_train_step_fn(tcfg, tx), donate_argnums=(0,))
    jeval = jax.jit(build_eval_step_fn(tcfg))

    # ---- warm every shape (compile; cache shared with bench.py runs)
    st = tstate
    host_batches = list(loader)
    for hb in host_batches:
        st, out = jstep(st, jax.device_put(hb))
    _ = float(out["loss"])
    for hb in host_batches:
        _ = jeval(st, jax.device_put(hb))["loss"]
    log(f"warmed {len(host_batches)} loader batches")

    # ---- per-shape steady-state step cost (device-resident batch, so
    # the number is pure step compute; the window's device_put/host cost
    # shows up in the residual instead)
    def shape_sig(hb):
        x = hb.X if hasattr(hb, "X") else hb[0]
        return tuple(np.asarray(x).shape)

    per_shape = {}
    for hb in host_batches:
        sig = shape_sig(hb)
        if sig in per_shape:
            per_shape[sig]["count"] += 1
            continue
        dev = jax.device_put(hb)
        st, out = jstep(st, dev)  # re-warm this shape right before timing
        _ = float(out["loss"])
        t0 = time.perf_counter()
        for _i in range(ITERS):
            st, out = jstep(st, dev)
        _ = float(out["loss"])
        dt = (time.perf_counter() - t0) / ITERS
        B = sig[0]
        per_shape[sig] = {"batch_shape": list(sig), "sec_per_step": round(dt, 4),
                          "structures": B, "count": 1}
        log(f"shape {sig}: {dt:.3f}s/step")

    # ---- one full eval pass
    devs = [jax.device_put(hb) for hb in host_batches]
    ev = None
    for d in devs:
        ev = jeval(st, d)["loss"]
    _ = float(np.asarray(ev).ravel()[0])
    t0 = time.perf_counter()
    for d in devs:
        ev = jeval(st, d)["loss"]
    _ = float(np.asarray(ev).ravel()[0])
    t_eval = time.perf_counter() - t0
    log(f"eval pass (6 batches, forward-only): {t_eval:.2f}s")

    # ---- the full sustained window, exactly as bench.py runs it
    ckpt_async = AsyncCheckpointer()
    steps = 0
    n_evals = 0
    eval_out = None
    with tempfile.TemporaryDirectory() as ckdir:
        t0 = time.perf_counter()
        for _epoch in range(EPOCHS):
            for hb in loader:
                st, out = jstep(st, jax.device_put(hb))
                steps += 1
            if steps % 48 == 0:
                n_evals += 1
                for hb in loader:
                    eval_out = jeval(st, jax.device_put(hb))["loss"]
                ckpt_async.save(ckdir, st)
        ckpt_async.wait()
        _ = float(out["loss"])
        if eval_out is not None:
            _ = float(np.asarray(eval_out).ravel()[0])
        t_window = time.perf_counter() - t0

    n_struct = len(sizes)
    sps = EPOCHS * n_struct / t_window
    step_pred = EPOCHS * sum(v["sec_per_step"] * v["count"]
                             for v in per_shape.values())
    predicted = step_pred + n_evals * t_eval
    residual = t_window - predicted
    out = {
        "what": "decomposition of the bench.py train_mixed sustained window",
        "config": {"epochs": EPOCHS, "steps": steps, "n_evals": n_evals,
                   "atoms_per_batch": 16384, "remat": "dots_nb",
                   "dataset": "16x1k + 8x2k + 6x4k + 4x8k (bench.py sizes)"},
        "per_shape_sec_per_step": sorted(
            (v for v in per_shape.values()), key=lambda v: v["batch_shape"]),
        "eval_pass_sec": round(t_eval, 3),
        "window_wall_sec": round(t_window, 2),
        "structures_per_sec": round(sps, 2),
        "predicted_step_sec": round(step_pred, 2),
        "predicted_step_plus_eval_sec": round(predicted, 2),
        "residual_sec": round(residual, 2),
        "residual_pct_of_window": round(100.0 * residual / t_window, 1),
        "conclusion": (
            "residual = loader host pad/compact-encode + device_put + "
            "dispatch gaps + async-ckpt interference; if this is small, "
            "the window is step-bound and further train_mixed gains "
            "require faster backward passes, not window engineering"),
    }
    log(f"window {t_window:.1f}s = {sps:.2f} structures/s; "
        f"predicted step+eval {predicted:.1f}s; residual {residual:.1f}s "
        f"({100.0 * residual / t_window:.1f}%)")
    art = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "docs", "artifacts", "mixed_decomp.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
