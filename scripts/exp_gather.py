"""TPU micro-experiments for the two measured bottlenecks (ROADMAP 1-2):
per-layer neighbor gather and kNN top-k. Run on the real chip:

    python scripts/exp_gather.py [gather|topk|onehot|pallas]

Informs the round-2 kernel design; results recorded in docs/ROADMAP.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    """Force completion with a SCALAR readback (never pull whole arrays
    through the tunneled runtime — a 1 GB readback takes seconds)."""
    return float(out.ravel()[0])


def timeit(f, *args, iters=20):
    """Chained timing: serialize iterations through arg 0, one host sync."""
    x, out = f(*args)
    _ = _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, out = f(x, *args[1:])
    _ = _sync(out)
    return (time.perf_counter() - t0 - 0.027) / iters


def exp_gather():
    """Gather row-rate vs table size and row width."""
    import jax
    import jax.numpy as jnp

    N, NN = 32768, 64
    rng = np.random.RandomState(0)
    for table_rows, width in [(32768, 128), (2048, 128), (512, 128), (32768, 32), (128, 128)]:
        table = jnp.asarray(rng.rand(table_rows, width), jnp.float32)
        ids = jnp.asarray(rng.randint(0, table_rows, size=(N, NN)), jnp.int32)

        @jax.jit
        def f(t, ids):
            g = jnp.take(t, ids, axis=0)
            return t + jnp.sum(g) * 0.0, g

        dt = timeit(f, table, ids)
        rows = N * NN
        print(f"take table[{table_rows},{width}] rows={rows/1e6:.1f}M: "
              f"{dt*1e3:.2f} ms = {rows/dt/1e6:.0f} M rows/s, "
              f"{rows*width*4/dt/1e9:.0f} GB/s")


def exp_onehot():
    """Tile-local one-hot selection as batched einsum (XLA, no pallas):
    [T, m, U] x [T, U, F]. Includes on-the-fly one-hot build cost."""
    import jax
    import jax.numpy as jnp

    N, NN, F = 32768, 64, 128
    TILE = 256
    T = N // TILE
    m = TILE * NN
    rng = np.random.RandomState(0)
    for U, dt_name in [(512, "bf16"), (512, "f32_high"), (768, "bf16"), (256, "bf16")]:
        cand = jnp.asarray(rng.rand(T, U, F), jnp.float32)
        lids = jnp.asarray(rng.randint(0, U, size=(T, m)), jnp.int32)
        if dt_name == "bf16":
            cand_c = cand.astype(jnp.bfloat16)
            prec = jax.lax.Precision.DEFAULT
        else:
            cand_c = cand
            prec = jax.lax.Precision.HIGH

        @jax.jit
        def f(c, lids):
            oh = (lids[:, :, None] == jnp.arange(U)[None, None, :]).astype(c.dtype)
            out = jnp.einsum("tmu,tuf->tmf", oh, c, precision=prec)
            return c + jnp.sum(out) * 0.0, out

        dt = timeit(f, cand_c, lids)
        rows = N * NN
        flops = T * m * U * F * 2
        print(f"onehot U={U} {dt_name}: {dt*1e3:.2f} ms = {rows/dt/1e6:.0f} M rows/s "
              f"({flops/dt/1e12:.1f} TFLOP/s)")


def exp_topk():
    """lax.top_k vs hierarchical vs approx_max_k on [8192, 8192]."""
    import jax
    import jax.numpy as jnp

    N, K = 8192, 64
    rng = np.random.RandomState(0)
    D = jnp.asarray(rng.rand(N, N), jnp.float32)

    @jax.jit
    def full(d):
        v, i = jax.lax.top_k(-d, K)
        return d + jnp.sum(v) * 0.0, i

    @jax.jit
    def hier(d):
        # stage 1: top-K within 16 chunks of 512; stage 2: top-K of 1024
        C = 16
        dc = d.reshape(N, C, N // C)
        v1, i1 = jax.lax.top_k(-dc, K)                    # [N, C, K]
        base = (jnp.arange(C) * (N // C))[None, :, None]
        cand_ids = (i1 + base).reshape(N, C * K)
        v2, i2 = jax.lax.top_k(v1.reshape(N, C * K), K)
        ids = jnp.take_along_axis(cand_ids, i2, axis=1)
        return d + jnp.sum(v2) * 0.0, ids

    @jax.jit
    def approx(d):
        v, i = jax.lax.approx_max_k(-d, K + 64, recall_target=0.95)
        v2, s = jax.lax.top_k(v, K)
        ids = jnp.take_along_axis(i, s, axis=1)
        return d + jnp.sum(v2) * 0.0, ids

    for name, f in [("full_topk", full), ("hierarchical", hier), ("approx", approx)]:
        dt = timeit(f, D)
        print(f"{name}: {dt*1e3:.2f} ms")

    # exactness of hierarchical vs full
    _, i_full = full(D)
    _, i_hier = hier(D)
    same = np.mean([np.array_equal(np.sort(a), np.sort(b))
                    for a, b in zip(np.asarray(i_full), np.asarray(i_hier))])
    print(f"hierarchical exact-set agreement: {same:.4f}")


def exp_pallas():
    """Does Mosaic lower a lane-wise dynamic gather (jnp.take along a
    128-wide table) inside a pallas kernel?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]           # [8, 128]
        idx = idx_ref[:]           # [8, 128] int32 in [0,128)
        out_ref[:] = jnp.take_along_axis(tab, idx, axis=1)

    tab = jnp.asarray(np.random.rand(8, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 128, size=(8, 128)), jnp.int32)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        ref = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
        print("take_along_axis lanes: OK, exact:", np.array_equal(np.asarray(out), ref))
    except Exception as e:
        print(f"take_along_axis lanes FAILED: {type(e).__name__}: {str(e)[:300]}")

    def kern2(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:][0], axis=0)

    try:
        out = pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(np.random.rand(128, 128), jnp.float32),
          jnp.asarray(np.random.randint(0, 128, size=(8, 128)), jnp.int32))
        print("take rows: OK")
    except Exception as e:
        print(f"take rows FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    from pesto_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("gather", "all"):
        exp_gather()
    if which in ("onehot", "all"):
        exp_onehot()
    if which in ("topk", "all"):
        exp_topk()
    if which in ("pallas", "all"):
        exp_pallas()
