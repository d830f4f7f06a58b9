"""exact2 slack sizing probe (round 4).

The serving sweep caught exact2's overflow fallback firing on EVERY
chunk of the bench workload (uniform protein-density clouds): on TPU the
`approx_max_k` partial reduce's threshold over-estimate is loose, so the
candidate ball {Dsq <= thr} systematically outgrows the k+32 slack that
round 3 shipped (CPU tests never saw it — approx_max_k on CPU is exact,
making the ball exactly k there). This probe measures, ON CHIP:

  1. per-structure overflow rate vs slack in {32, 96, 192, 448}, for
     (a) real pdbs_test structures and (b) the synthetic bench records;
  2. exact2 unit cost vs slack at the 8k bucket (the compaction top-k is
     element-bound, so extra slack should be near-free);
  3. exact vs exact2(best slack) head-to-head.

    python scripts/exp_exact2_slack.py
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    from pesto_tpu.utils import enable_compilation_cache, wait_for_device

    if not wait_for_device(max_wait_s=600, log=log):
        sys.exit("device unavailable")
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pesto_tpu.batching import pad_structure_arrays
    from pesto_tpu.encoding import encode_structure
    from pesto_tpu.io import read_pdb
    from pesto_tpu.spatial import morton_order
    from pesto_tpu.structure import concatenate_chains, preprocess_structure
    from pesto_tpu.synthetic import random_structure_arrays
    from pesto_tpu.topology import _knn_core, knn_topology_batch

    NA, K = 8192, 64

    def pad_xyz(X):
        X = np.asarray(X, np.float32)
        X = X[morton_order(X)]
        n = X.shape[0]
        Xp = np.zeros((NA, 3), np.float32)
        Xp[1 : n + 1] = X
        m = np.zeros((NA,), np.float32)
        m[1 : n + 1] = 1.0
        return Xp, m

    # (a) real structures: largest pdbs_test files that fit the 8k bucket
    reals = []
    for p in sorted(glob.glob("/root/reference/pdbs_test/*.pdb"),
                    key=os.path.getsize, reverse=True):
        if len(reals) >= 24:
            break
        try:
            s = read_pdb(p)
            structure = concatenate_chains(preprocess_structure(s))
            X = structure["xyz"]
            if 2000 <= X.shape[0] <= NA - 1:
                reals.append(pad_xyz(X))
        except Exception:
            continue
    log(f"real structures: {len(reals)} (sizes "
        f"{[int(m.sum()) for _, m in reals[:8]]}...)")

    # (b) synthetic uniform clouds (the bench generator's geometry)
    synths = [pad_xyz(random_structure_arrays(8191, 1024, seed=100 + i)[0])
              for i in range(12)]

    for label, group in (("real-pdb", reals), ("synthetic", synths)):
        Xb = jnp.asarray(np.stack([x for x, _ in group]))
        mb = jnp.asarray(np.stack([m for _, m in group]))
        for slack in (32, 96, 192, 448):
            core = jax.jit(
                lambda X, am, s=slack: jax.vmap(
                    lambda x, a: _knn_core(x, a, K, None, "exact2", s)[3]
                )(X, am)
            )
            ovf = np.asarray(core(Xb, mb))
            log(f"{label:9s} slack={slack:3d}: overflow "
                f"{int(ovf.sum())}/{len(ovf)}")

    # unit cost vs slack (batch of 4 like the serving chunk), chained
    Xb4 = jnp.asarray(np.stack([x for x, _ in (reals or synths)[:4]]))
    mb4 = jnp.asarray(np.stack([m for _, m in (reals or synths)[:4]]))

    def chain(fn, X):
        def body(c, _):
            ids = fn(c)
            eps = (ids[0, 1, 1].astype(jnp.float32) % 3.0 - 1.0) * 1e-7
            return c + eps, ids[0, 1, 0]
        jf = jax.jit(lambda x: jax.lax.scan(body, x, None, length=10))
        o = jf(X)
        _ = int(np.asarray(o[1][-1]))
        t0 = time.perf_counter()
        o = jf(X)
        _ = int(np.asarray(o[1][-1]))
        return (time.perf_counter() - t0 - 0.035) / 10 * 1e3

    t = chain(lambda X: knn_topology_batch(X, mb4, k=K, method="exact")[0], Xb4)
    log(f"unit exact          : {t:7.2f} ms/batch4")
    for slack in (32, 96, 192, 448):
        t = chain(
            lambda X, s=slack: knn_topology_batch(
                X, mb4, k=K, method="exact2", exact2_slack=s)[0], Xb4)
        log(f"unit exact2 s={slack:3d}   : {t:7.2f} ms/batch4")
    t = chain(lambda X: knn_topology_batch(X, mb4, k=K, method="fast")[0], Xb4)
    log(f"unit fast           : {t:7.2f} ms/batch4")


if __name__ == "__main__":
    main()
