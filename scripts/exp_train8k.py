"""On-chip experiment: 8k-bucket training memory/remat levers (VERDICT r3
item 3). The flagship's 4x8k train step pays FULL remat because dots_nb
would save ~24.95 GB of edge activations vs 15.75 GB HBM; the nn=64 group
alone is the hog. Measures sec/step for:

  full        full per-layer remat (round-3 bench configuration)
  group64     dots_nb for the nn=8/16/32 groups, full remat ONLY for the
              nn=64 group (config.remat_full_nn_min=64)
  group32     dots_nb for nn=8/16, full remat for nn=32/64
  dots_nb_b2  plain dots_nb at B=2 (half batch, for reference)

Usage: python scripts/exp_train8k.py [case ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pesto_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from pesto_tpu.batching import stack_batch
from pesto_tpu.models import get_config
from pesto_tpu.synthetic import random_padded_structure
from pesto_tpu.train import create_train_state
from pesto_tpu.train.step import build_train_step_fn

ITERS = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench(label, B=4, remat=True, **cfg_kw):
    cfg = get_config("i_v4_1", dtype="bfloat16", precision="default",
                     remat=remat, **cfg_kw)
    state, tx = create_train_state(cfg, learning_rate=1e-5)
    raw_step = build_train_step_fn(cfg, tx)
    batch = stack_batch([
        random_padded_structure(n_atoms=8191, n_res=1024, na=8192, nr=1024,
                                seed=i, with_labels=True)
        for i in range(B)
    ])
    batch = jax.device_put(batch)

    def body(st, _):
        st, out = raw_step(st, batch)
        return st, out["loss"]

    tf = jax.jit(lambda s: jax.lax.scan(body, s, None, length=ITERS))
    try:
        t0 = time.time()
        s, losses = tf(state)
        _ = float(losses[-1])
        log(f"  {label}: compile+warm {time.time()-t0:.1f}s")
        t0 = time.perf_counter()
        s, losses = tf(s)
        _ = float(losses[-1])
        dt = (time.perf_counter() - t0 - 0.035) / ITERS
        log(f"  {label}: {dt:.3f}s/step = {B/dt:.2f} structures/s = "
            f"{B*8191/dt:.0f} atoms/s")
        return dt
    except Exception as e:
        log(f"  {label}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return None


CASES = {
    "full": lambda: bench("full remat (r3 baseline)"),
    "group64": lambda: bench("dots_nb + full@nn>=64",
                             remat_policy="dots_nb", remat_full_nn_min=64),
    "group32": lambda: bench("dots_nb + full@nn>=32",
                             remat_policy="dots_nb", remat_full_nn_min=32),
    "dots_nb_b2": lambda: bench("dots_nb B=2", B=2, remat_policy="dots_nb"),
    # "dots" saves EVERY matmul output (more than dots_nb); it fits the
    # 16x1k bucket (same 16384 flat atoms), so it should fit B=2x8k too
    "dots_b2": lambda: bench("dots B=2", B=2, remat_policy="dots"),
    # no remat at all at B=1: the floor for what remat costs
    "none_b1": lambda: bench("no remat B=1", B=1, remat=False),
    # named-checkpoint policy: save gathered neighbors + edge-MLP output +
    # attention weights (~45% of dots_nb's bytes); backward recomputes the
    # edge-MLP hiddens but never re-runs the gather
    "edges_b2": lambda: bench("edges B=2", B=2, remat_policy="edges"),
    "edges_b4": lambda: bench("edges B=4", B=4, remat_policy="edges"),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["full", "group64", "group32"]
    for n in names:
        CASES[n]()
