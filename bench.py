"""Benchmark: flagship (i_v4_1, 32-layer) geometric-attention inference
throughput per chip, in atoms/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "atoms/s", "vs_baseline": N}

Baseline: the reference PyTorch implementation on this host's CPU
(torch 2.13 eager, fp32, 32-layer config, 8191-atom structure took 224 s
-> 36.6 atoms/s, measured 2026-08-16; BASELINE.md targets >=20x CPU-torch
per chip at unchanged AUC).
"""

import json
import sys
import time

import numpy as np

BASELINE_ATOMS_PER_SEC = 36.6  # measured reference torch-CPU on this host


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from pesto_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from pesto_tpu.batching import stack_batch
    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.synthetic import random_padded_structure

    cfg = get_config("i_v4_1", remat=False)
    t0 = time.time()
    params = jax.jit(lambda: init_params(cfg, na=256, nr=32))()
    jax.block_until_ready(params)
    log(f"init {time.time()-t0:.1f}s")
    pred = Predictor(cfg, params)

    n_atoms, n_res = 8191, 1024
    na, nr = 8192, 1024

    for batch_size in (4, 2, 1):
        try:
            t0 = time.time()
            structures = [
                random_padded_structure(
                    n_atoms=n_atoms, n_res=n_res, na=na, nr=nr, seed=i
                )
                for i in range(batch_size)
            ]
            batch = stack_batch(structures)
            log(f"B={batch_size}: encode+knn {time.time()-t0:.1f}s")

            # chained-dependency timing: fold a scalar of each output back
            # into the input so iterations serialize, and force ONE host
            # sync at the end (block_until_ready is unreliable under the
            # tunneled TPU runtime; a host readback costs ~27ms once)
            import jax.numpy as jnp

            model = pred.model

            def step(params, X, ids, q, M, am):
                z = model.apply({"params": params}, X, ids, q, M, am)
                return X + jnp.sum(z) * 0.0, z

            f = jax.jit(step)
            t0 = time.time()
            X, z = f(pred.params, batch.X, batch.ids_topk, batch.q, batch.M, batch.atom_mask)
            _ = float(z[0, 0, 0])
            log(f"B={batch_size}: compile+warmup {time.time()-t0:.1f}s")
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                X, z = f(pred.params, X, batch.ids_topk, batch.q, batch.M, batch.atom_mask)
            _ = float(z[0, 0, 0])
            dt = (time.perf_counter() - t0 - 0.027) / iters
            break
        except Exception as e:  # OOM at this batch size -> back off
            log(f"B={batch_size} failed: {type(e).__name__}: {str(e)[:200]}")
            err = e
            continue
    else:
        raise err

    atoms_per_sec = batch_size * n_atoms / dt

    # training throughput (flagship, remat, Adam, dynamic pos_ratios):
    # reference trains ~4.6-5.1 structures/s on a V100 (BASELINE.md)
    train_sps = None
    try:
        from pesto_tpu.train import create_train_state
        from pesto_tpu.train.step import build_train_step_fn

        tcfg = get_config("i_v4_1", remat=True)
        tstate, tx = create_train_state(tcfg, learning_rate=1e-5)
        tstep = jax.jit(build_train_step_fn(tcfg, tx), donate_argnums=(0,))
        tb = stack_batch(
            [
                random_padded_structure(
                    n_atoms=1000, n_res=126, na=1024, nr=128, seed=i, with_labels=True
                )
                for i in range(16)
            ]
        )
        s, out = tstep(tstate, tb)
        _ = float(out["loss"])
        t0 = time.perf_counter()
        for _ in range(10):
            s, out = tstep(s, tb)
        _ = float(out["loss"])
        tdt = (time.perf_counter() - t0 - 0.027) / 10
        train_sps = 16 / tdt
        log(f"train: {tdt:.3f}s/step = {train_sps:.1f} structures/s")
    except Exception as e:
        log(f"train bench skipped: {type(e).__name__}: {str(e)[:120]}")

    print(
        json.dumps(
            {
                "metric": "i_v4_1_inference_atoms_per_sec_per_chip",
                "value": round(atoms_per_sec, 1),
                "unit": "atoms/s",
                "vs_baseline": round(atoms_per_sec / BASELINE_ATOMS_PER_SEC, 2),
                "detail": {
                    "batch_size": batch_size,
                    "atoms": n_atoms,
                    "layers": len(cfg.layers),
                    "sec_per_batch": round(dt, 4),
                    "train_structures_per_sec": round(train_sps, 2) if train_sps else None,
                    "train_vs_v100_baseline": round(train_sps / 5.0, 2) if train_sps else None,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
