"""Quick probe: full 32-layer bf16 forward at 4 x 8k (bench.py's shape) —
compares today's toolchain against the recorded r3 number (276 ms/batch).

    python scripts/exp_forward_probe.py [layers]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from pesto_tpu.batching import BatchEncoder
    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.synthetic import random_structure_arrays
    from pesto_tpu.topology import knn_topology
    from pesto_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    pallas = "pallas" in sys.argv[2:]
    n_atoms, n_res, na, nr, B = 8191, 1024, 8192, 1024, 4
    cfg32 = get_config("i_v4_1", remat=False)
    cfg16 = cfg32.replace(dtype="bfloat16", precision="default",
                          layers=cfg32.layers[-n_layers:],
                          pallas_edges=pallas)
    params = jax.jit(lambda: init_params(cfg16.replace(dtype="float32"),
                                         na=256, nr=32))()
    jax.block_until_ready(params)
    pred16 = Predictor(cfg16, params)

    raw = [random_structure_arrays(n_atoms=n_atoms, n_res=n_res, seed=i)
           for i in range(B)]
    enc = BatchEncoder(8)
    batch = enc.encode(raw, na=na, nr=nr, spatial_sort=True)
    import functools

    knn_batched = jax.jit(lambda X, am: jax.vmap(
        functools.partial(knn_topology, k=64), in_axes=(0, 0))(X, am)[0])
    import dataclasses

    ids_b = knn_batched(jax.device_put(batch.X), jax.device_put(batch.atom_mask))
    batch = dataclasses.replace(batch, ids_topk=ids_b)
    _ = int(np.asarray(ids_b[0, 1, 0]))

    ITERS = 10
    model, p = pred16.model, pred16.params
    args = tuple(jax.device_put(a) for a in
                 (batch.X, batch.ids_topk, batch.q, batch.M, batch.atom_mask))

    def body(X, _):
        z = model.apply({"params": p}, X, *args[1:])
        eps = (z[..., 0, 0].astype(jnp.float32) % 3.0 - 1.0).sum() * 1e-7
        return X + eps.astype(X.dtype), z[..., 0, 0]

    f = jax.jit(lambda X: jax.lax.scan(body, X, None, length=ITERS))
    t0 = time.time()
    X, zs = f(args[0])
    _ = float(np.asarray(zs, dtype=np.float32).ravel()[0])
    print(f"compile+warm {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    X, zs = f(X)
    _ = float(np.asarray(zs, dtype=np.float32).ravel()[0])
    dt = (time.perf_counter() - t0 - 0.035) / ITERS
    tag = "pallas" if pallas else "xla"
    print(f"bf16 forward ({n_layers} layers, {tag}, 4x8k): {dt*1e3:.1f} ms/batch "
          f"= {B*n_atoms/dt:.0f} atoms/s", file=sys.stderr)


if __name__ == "__main__":
    main()
