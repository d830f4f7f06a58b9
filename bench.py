"""Benchmark: flagship (i_v4_1, 32-layer) geometric-attention inference
throughput per chip, in atoms/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "atoms/s", "vs_baseline": N}

The headline is END-TO-END serving throughput through the production
Predictor.predict_batch path (bfloat16 activations, exact kNN, device-
resident ids, software-pipelined chunks): raw structure records -> host
encode + Morton sort -> batched on-device exact kNN -> forward ->
probabilities, for 12 structures of 8k atoms. Forward-only and fp32-exact numbers are in
`detail` (the reference's profiling protocol times load/process/run
stages separately, profiling.py:68-119).

Baseline: the reference PyTorch implementation on this host's CPU
(torch 2.13 eager, fp32, 32-layer config, 8191-atom structure took 224 s
-> 36.6 atoms/s end-to-end, measured 2026-08-16; BASELINE.md targets
>=20x CPU-torch per chip at unchanged AUC). bf16 serving accuracy is
validated on the full pdbs_test benchmark: median AUC 0.8945 with exact
kNN, 0.8915 in fast-kNN mode (docs/VALIDATION.md, ppi_benchmark_*.csv).
"""

import json
import sys
import time

import numpy as np

BASELINE_ATOMS_PER_SEC = 36.6  # measured reference torch-CPU on this host


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# Timing protocol: the tunneled TPU runtime adds ~30-120 ms per DISPATCH
# and ~73 MB/s host->device bandwidth, and block_until_ready returns
# early — so iterations are chained INSIDE one jitted lax.scan through a
# non-foldable data dependency (an output-derived ~1e-7 coordinate
# perturbation), with ONE host readback at the end. device_put inputs
# once; the readback cost (~35 ms) is subtracted via _SYNC_MS.
_SYNC_MS = 0.035
BENCH_ITERS = 10


def bench_forward(pred, batch):
    import jax
    import jax.numpy as jnp

    model, params = pred.model, pred.params
    args = tuple(
        jax.device_put(a) if a is not None else None
        for a in (batch.X, batch.ids_topk, batch.q, batch.M, batch.atom_mask,
                  batch.gather_cand, batch.gather_loc)
    )

    def body(X, _):
        z = model.apply({"params": params}, X, *args[1:])
        eps = (z[..., 0, 0].astype(jnp.float32) % 3.0 - 1.0).sum() * 1e-7
        return X + eps.astype(X.dtype), z[..., 0, 0]

    f = jax.jit(lambda X: jax.lax.scan(body, X, None, length=BENCH_ITERS))
    t0 = time.time()
    X, zs = f(args[0])
    _ = float(np.asarray(zs, dtype=np.float32).ravel()[0])
    log(f"  forward compile+warmup {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    X, zs = f(args[0])
    _ = float(np.asarray(zs, dtype=np.float32).ravel()[0])
    return (time.perf_counter() - t0 - _SYNC_MS) / BENCH_ITERS


def main():
    import jax

    from pesto_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from pesto_tpu.batching import attach_gather_tables, pad_structure_arrays, stack_batch
    from pesto_tpu.infer import Predictor
    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import init_params
    from pesto_tpu.spatial import morton_order
    from pesto_tpu.synthetic import random_structure_arrays
    from pesto_tpu.topology import knn_topology

    n_atoms, n_res = 8191, 1024
    na, nr = 8192, 1024
    B = 4

    cfg32 = get_config("i_v4_1", remat=False)
    cfg16 = cfg32.replace(dtype="bfloat16", precision="default")
    t0 = time.time()
    params = jax.jit(lambda: init_params(cfg32, na=256, nr=32))()
    jax.block_until_ready(params)
    log(f"init {time.time()-t0:.1f}s")
    pred16 = Predictor(cfg16, params)
    pred32 = Predictor(cfg32, params)

    # raw inputs (host numpy)
    raw = [random_structure_arrays(n_atoms=n_atoms, n_res=n_res, seed=i) for i in range(B)]

    # --- end-to-end serving pipeline, timed per stage -------------------
    # mirrors Predictor.predict_batch: threaded host encode, ONE batched
    # (vmapped) kNN device call for the whole batch, ids kept ON DEVICE
    # (gather tables are a training-path optimization; serving would pay
    # an ids host round trip to build them for a ~0.4 ms/layer gain)
    import dataclasses
    import functools
    from concurrent.futures import ThreadPoolExecutor

    from pesto_tpu.batching import BatchEncoder

    enc = BatchEncoder(8)
    knn_batched = jax.jit(
        lambda X, am: jax.vmap(functools.partial(knn_topology, k=64), in_axes=(0, 0))(X, am)[0]
    )

    def encode_batch(raws):
        batch = enc.encode(raws, na=na, nr=nr, spatial_sort=True)
        ids_b = knn_batched(jax.device_put(batch.X), jax.device_put(batch.atom_mask))
        batch = dataclasses.replace(batch, ids_topk=ids_b)
        # one scalar readback stands in for the step's dispatch sync
        _ = int(np.asarray(ids_b[0, 1, 0]))
        return batch

    # knn device time alone (in-program chained, per 8k-atom structure)
    import jax.numpy as jnp

    ps0 = pad_structure_arrays(raw[0][0], raw[0][1], raw[0][2], na=na, nr=nr)
    Xd = jax.device_put(ps0.X)
    amd = jax.device_put(ps0.atom_mask)

    def knn_body(X, _):
        ids = knn_topology(X, amd, k=64)[0]
        eps = (ids[1, 1].astype(jnp.float32) % 3.0 - 1.0) * 1e-7
        return X + eps, ids[1, 0]

    kf = jax.jit(lambda X: jax.lax.scan(knn_body, X, None, length=BENCH_ITERS))
    X1, o = kf(Xd)
    _ = int(np.asarray(o[-1]))
    t0 = time.perf_counter()
    X1, o = kf(Xd)
    _ = int(np.asarray(o[-1]))
    knn_ms = (time.perf_counter() - t0 - _SYNC_MS) / BENCH_ITERS * 1e3
    log(f"knn (exact, 8k atoms): {knn_ms:.1f} ms")

    # encode stage (host: Morton sort + pad + gather tables), steady
    # state: first pass pays numpy first-touch + device dispatch warmup,
    # so measure the repeat
    batch = encode_batch(raw)
    t0 = time.perf_counter()
    batch = encode_batch(raw)
    t_encode = time.perf_counter() - t0 - _SYNC_MS
    t_encode = max(t_encode, B * knn_ms * 1e-3)
    log(f"encode+knn for B={B} (steady): {t_encode*1e3:.0f} ms")

    # forward stage. fp32 runs WITHOUT gather tables (the production
    # gating: one-hot MXU selection wins in bf16, but fp32-HIGHEST
    # one-hot matmuls are 3-pass and lose badly to the row gather)
    import dataclasses

    dt16 = bench_forward(pred16, batch)
    log(f"bf16 forward: {dt16*1e3:.0f} ms/batch")
    dt32 = bench_forward(pred32, batch)
    log(f"fp32 forward: {dt32*1e3:.0f} ms/batch")

    total_atoms = B * n_atoms
    e2e_serial = total_atoms / (t_encode + dt16)
    fwd16 = total_atoms / dt16
    fwd32 = total_atoms / dt32

    # --- production path: Predictor.predict_batch over raw records ------
    # software-pipelined (chunk k+1 host-encodes while chunk k runs on
    # device): 12 structures = 3 chunks of B=4; timing includes parse-free
    # host encode, batched kNN, forward, sigmoid and the probs readback
    from pesto_tpu.synthetic import random_structure_record

    records = [
        random_structure_record(n_atoms=n_atoms, n_res=n_res, seed=100 + i)
        for i in range(12)
    ]
    _ = pred16.predict_batch(records)  # warm (compiles already cached)
    t0 = time.perf_counter()
    probs_out = pred16.predict_batch(records)
    t_pb = time.perf_counter() - t0
    assert all(p.shape[0] > 0 for p in probs_out)
    e2e = 12 * n_atoms / t_pb
    log(f"predict_batch (12x8k, pipelined): {t_pb*1e3:.0f} ms = {e2e:.0f} atoms/s")

    # --- training throughput (flagship, production fast config) ---------
    # bf16 compute + fp32 master weights, dots_nb remat, one-hot gather
    # tables, donated state. Reference trains ~4.6-5.1 structures/s on a
    # V100 (BASELINE.md).
    train_sps = None
    try:
        from pesto_tpu.synthetic import random_padded_structure
        from pesto_tpu.train import create_train_state
        from pesto_tpu.train.step import build_train_step_fn

        tcfg = get_config(
            "i_v4_1", dtype="bfloat16", precision="default",
            remat=True, remat_policy="dots_nb",
        )
        tstate, tx = create_train_state(tcfg, learning_rate=1e-5)
        tb = stack_batch(
            [
                random_padded_structure(
                    n_atoms=1000, n_res=126, na=1024, nr=128, seed=i,
                    with_labels=True, with_gather_tables=True,
                )
                for i in range(16)
            ]
        )
        tb = jax.device_put(tb)  # once; the step loop must time compute
        raw_step = build_train_step_fn(tcfg, tx)

        def train_body(state, _):
            state, out = raw_step(state, tb)
            return state, out["loss"]

        tf = jax.jit(lambda s: jax.lax.scan(train_body, s, None, length=BENCH_ITERS))
        s, losses = tf(tstate)
        _ = float(losses[-1])
        t0 = time.perf_counter()
        s, losses = tf(s)
        _ = float(losses[-1])
        tdt = (time.perf_counter() - t0 - _SYNC_MS) / BENCH_ITERS
        train_sps = 16 / tdt
        log(f"train: {tdt:.3f}s/step = {train_sps:.1f} structures/s")
    except Exception as e:
        log(f"train bench skipped: {type(e).__name__}: {str(e)[:120]}")

    print(
        json.dumps(
            {
                "metric": "i_v4_1_e2e_inference_atoms_per_sec_per_chip",
                "value": round(e2e, 1),
                "unit": "atoms/s",
                "vs_baseline": round(e2e / BASELINE_ATOMS_PER_SEC, 2),
                "detail": {
                    "batch_size": B,
                    "atoms": n_atoms,
                    "layers": len(cfg16.layers),
                    "e2e_sec_per_batch": round(t_pb / 3, 4),
                    "e2e_serial_atoms_per_sec": round(e2e_serial, 1),
                    "forward_atoms_per_sec_bf16": round(fwd16, 1),
                    "forward_atoms_per_sec_fp32_exact": round(fwd32, 1),
                    "knn_ms_8k_exact": round(knn_ms, 1),
                    "encode_knn_ms_batch": round(t_encode * 1e3, 1),
                    "train_structures_per_sec": round(train_sps, 2) if train_sps else None,
                    "train_vs_v100_baseline": round(train_sps / 5.0, 2) if train_sps else None,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
