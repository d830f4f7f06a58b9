"""On-chip experiment: training-step throughput levers.

Measures structures/s of the flagship (i_v4_1, 32-layer) train step at the
1k-atom bucket, B=16, across combinations of:
  - compute dtype (float32 vs bfloat16, fp32 master weights either way)
  - remat policy (full per-layer vs dots_saveable)
  - donated vs copied train state

Usage: python scripts/exp_train.py [combo ...]
where combo is e.g. fp32:full bf16:full bf16:dots bf16:none
(default: all four). Reference loop: model/main.py:179-204.
"""

import sys
import time

import jax

sys.path.insert(0, ".")

from pesto_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from pesto_tpu.batching import stack_batch
from pesto_tpu.models import get_config
from pesto_tpu.synthetic import random_padded_structure
from pesto_tpu.train import create_train_state
from pesto_tpu.train.step import build_train_step_fn


def bench(dtype, remat_policy, donate=True, B=16, tables=False):
    remat = remat_policy != "none"
    kw = {"dtype": dtype, "remat": remat}
    if dtype == "bfloat16":
        # the production bf16 path (train_cli, bench.py) pairs bf16 with
        # DEFAULT matmul precision; inheriting the config default
        # ("highest") measures slow multi-pass bf16 matmuls instead
        kw["precision"] = "default"
    if remat and remat_policy != "full":
        kw["remat_policy"] = remat_policy
    cfg = get_config("i_v4_1", **kw)
    state, tx = create_train_state(cfg, learning_rate=1e-5)
    step = jax.jit(build_train_step_fn(cfg, tx), donate_argnums=(0,) if donate else ())
    batch = stack_batch(
        [
            random_padded_structure(
                n_atoms=1000, n_res=126, na=1024, nr=128, seed=i, with_labels=True,
                with_gather_tables=tables,
            )
            for i in range(B)
        ]
    )
    t0 = time.time()
    try:
        state, out = step(state, batch)
        loss0 = float(out["loss"])
    except Exception as e:
        print(f"{dtype}:{remat_policy}:donate={donate}  FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    print(f"  compile {time.time()-t0:.1f}s, loss {loss0:.4f}")
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        state, out = step(state, batch)
    loss = float(out["loss"])
    dt = (time.perf_counter() - t0 - 0.027) / iters
    print(
        f"{dtype}:{remat_policy}:donate={donate}  {dt*1e3:.0f} ms/step = "
        f"{B/dt:.1f} structures/s (loss {loss:.4f})"
    )


if __name__ == "__main__":
    combos = sys.argv[1:] or ["float32:full", "bfloat16:full", "bfloat16:dots", "bfloat16:none"]
    for c in combos:
        parts = c.replace("fp32", "float32").replace("bf16", "bfloat16").split(":")
        dt, pol = parts[0], parts[1]
        donate = "nodonate" not in parts[2:]
        tables = "tables" in parts[2:]
        bench(dt, pol, donate, tables=tables)
