"""Is approx_max_k's PartialReduce output an exact SUBSET of its input?

The premise behind exact2's original "exact by construction" argument
(docs/PERFORMANCE.md §4, failure 3): with aggregate_to_topk=False the
partial tournament reduce supposedly returns a subset of each row's
true values, so a threshold derived from it can only OVER-estimate the
true k-th distance. The round-4 bench's in-run identity check proved
the conclusion false on TPU (exact2 != exact bitwise with zero overflow
fallbacks), which means the premise fails there; on CPU approx_max_k
lowers to exact top_k, so CPU runs always pass.

This probe isolates the premise: run the PartialReduce on a random
matrix and check (a) whether every returned value equals the input at
its returned index, (b) whether every returned value appears anywhere
in its row, and (c) how often the subset's k-th-largest exceeds the
true k-th-largest — the exact failure that makes the derived ball miss
true neighbors. Run on the TPU after a toolchain change:

    python scripts/exp_partialreduce_subset.py

Whatever this prints, exact2's correctness no longer depends on it: the
count-based underflow guard (topology.py exact2 branch) verifies the
ball against true distances every run and falls back to plain exact.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from pesto_tpu.utils import enable_compilation_cache, wait_for_device

    if not wait_for_device(1200, 60, log=print, sleep_s=60):
        sys.exit("device unavailable")
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    x = rng.rand(512, 8192).astype(np.float32) * 100.0
    xd = jax.device_put(jnp.asarray(x))
    f = jax.jit(lambda a: jax.lax.approx_max_k(
        a, 96, recall_target=0.95, aggregate_to_topk=False))
    vals, idx = (np.asarray(v) for v in f(xd))
    print("partial-reduce output shape:", vals.shape)

    gathered = np.take_along_axis(x, idx.astype(np.int64) % x.shape[1], axis=1)
    match = vals == gathered
    print(f"vals == x[idx]: {match.mean()*100:.2f}% of entries")
    present = np.array([np.isin(vals[i], x[i]).mean() for i in range(64)])
    print(f"vals present anywhere in row (first 64 rows): "
          f"{present.mean()*100:.2f}%")
    bad = np.where(~match)
    if len(bad[0]):
        i, j = bad[0][0], bad[1][0]
        print(f"example mismatch row {i} slot {j}: val={vals[i, j]!r} "
              f"x[idx]={gathered[i, j]!r} idx={idx[i, j]}")

    # threshold-undershoot consequence at k=64 (max semantics: a subset
    # k-th-largest ABOVE the true k-th-largest shrinks the ball)
    kth_sub = np.sort(vals, axis=1)[:, -64]
    kth_true = np.sort(x, axis=1)[:, -64]
    over = kth_sub > kth_true
    print(f"rows where subset 64th-largest > true 64th-largest "
          f"(derived ball would MISS true members): {over.mean()*100:.2f}%")
    print(f"rows where equal: {(kth_sub == kth_true).mean()*100:.2f}%")


if __name__ == "__main__":
    main()
