"""Per-layer micro-benchmark for the fused geometric attention kernel
(ops/geometric_pallas.py) vs the XLA fused path, at the production shape
(N=32768 flat atoms = 4 x 8k batch, nn=64, S=32, bf16 stream).

Round-4 context: the bf16-broadcast Mosaic bug that blocked the all-bf16
kernel variant is FIXED on this toolchain (docs/MOSAIC_BUGS.md probe log),
so this harness exists to measure each conversion step. Run on a real TPU:

    python scripts/exp_fused_layer.py [xla] [pallas]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, NN, S, NH, NK = 32768, 64, 32, 2, 3
ITERS = 10
_SYNC_MS = 0.035


def log(m):
    print(m, file=sys.stderr, flush=True)


def chain_time(f, x0, label):
    """Chained timing through a data dependency, one scalar readback."""
    import jax

    jf = jax.jit(lambda x: jax.lax.scan(lambda c, _: (f(c), 0.0), x, None,
                                        length=ITERS)[0])
    t0 = time.time()
    out = jf(x0)
    _ = float(np.asarray(out, dtype=np.float32).ravel()[0])
    log(f"  {label}: compile+warm {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    out = jf(out)
    _ = float(np.asarray(out, dtype=np.float32).ravel()[0])
    ms = (time.perf_counter() - t0 - _SYNC_MS) / ITERS * 1e3
    log(f"  {label}: {ms:.2f} ms/layer")
    return ms


def make_inputs(dt):
    """Production-realistic inputs: 4 Morton-sorted 8k protein-density
    clouds flat-batched to N atoms, REAL kNN topology (gather locality
    matters — uniformly random ids thrash and inflate the gather 30x)."""
    import jax
    import jax.numpy as jnp

    from pesto_tpu.spatial import morton_order
    from pesto_tpu.topology import knn_topology

    rng = np.random.RandomState(0)
    NAS = 8192
    nb = N // NAS
    ids_all, d_all, r_all = [], [], []
    for b in range(nb):
        X = (rng.rand(NAS - 1, 3).astype(np.float32) * (NAS / 0.1) ** (1 / 3))
        X = X[morton_order(X)]
        Xp = np.zeros((NAS, 3), np.float32)
        Xp[1:] = X
        am = np.zeros((NAS,), np.float32)
        am[1:] = 1.0
        ids, dd, rr = knn_topology(jnp.asarray(Xp), jnp.asarray(am), k=NN)
        ids_all.append(np.asarray(ids) + b * NAS)
        d_all.append(np.asarray(dd))
        r_all.append(np.asarray(rr))
    qp = jnp.asarray(rng.randn(N, 4 * S).astype(np.float32), dt)
    ids = jnp.asarray(np.concatenate(ids_all), jnp.int32)
    d = jnp.asarray(np.concatenate(d_all), dt)
    r = jnp.asarray(np.concatenate(r_all), dt)
    return jax.device_put((qp, ids, d, r))


def weights(dt):
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05, dt)  # noqa: E731
    in_dim = 6 * S + 1
    return {
        "k0c": mk(1 + 2 * S, 4 * S), "b0": mk(4 * S), "k0e": mk(4 * S, 4 * S),
        "k1": mk(4 * S, 4 * S), "b1": mk(4 * S),
        "k2q": mk(S, NK), "b2q": mk(NK), "k2p": mk(S, 3 * NK), "b2p": mk(3 * NK),
        "k2v": mk(2 * S, 2 * S), "b2v": mk(2 * S),
        "nq": mk(N, 2 * NH * NK),
        "in_dim": in_dim,
    }


def run_pallas(dt_name="bfloat16"):
    import jax.numpy as jnp

    from pesto_tpu.ops.geometric_pallas import fused_edge_attention, pack_k2_aligned

    dt = jnp.dtype(dt_name)
    qp, ids, d, r = make_inputs(dt)
    w = weights(dt)
    K2a, B2a = pack_k2_aligned(w["k2q"], w["k2p"], w["k2v"], w["b2q"],
                               w["b2p"], w["b2v"], S, NK, dt)

    def one(qp):
        qp_t = jnp.take(qp, ids.T, axis=0, mode="clip")
        q = qp[:, :S]
        p_flat = qp[:, S:]
        Zq, Zp = fused_edge_attention(
            qp_t, d.T, jnp.transpose(r, (1, 0, 2)), q, p_flat,
            w["k0c"], w["b0"], w["k0e"], w["k1"], w["b1"], K2a, B2a,
            w["nq"].astype(jnp.float32),
            S=S, Nh=NH, Nk=NK, nn=NN,
        )
        out = jnp.concatenate([q + Zq[:, :S], p_flat + Zp[:, : 3 * S]], axis=1)
        return out.astype(dt)

    return chain_time(one, qp, f"pallas kernel ({dt_name}, incl. gather)")


def run_xla(dt_name="bfloat16"):
    """The XLA fused path via the real model layer (one nn=64 layer)."""
    import jax
    import jax.numpy as jnp

    from pesto_tpu.models import get_config
    from pesto_tpu.models.pesto import StateUpdate

    dt = jnp.dtype(dt_name)
    qp, ids, d, r = make_inputs(dt)
    base = get_config("i_v4_1", remat=False, dtype=dt_name, precision="default")
    lc = base.layers[-1]
    mod = StateUpdate(lc, dt, jax.lax.Precision.DEFAULT, fused=True)
    rngk = jax.random.PRNGKey(0)
    q0 = qp[:, :S]
    p0 = qp[:, S:].reshape(N, 3, S)
    qnn = jnp.take(qp[:, :S], ids, axis=0)
    pnn = jnp.take(qp[:, S:], ids, axis=0).reshape(N, NN, 3, S)
    params = mod.init(rngk, q0, p0, qnn, pnn, d, r)

    def one(qp):
        q = qp[:, :S]
        p = qp[:, S:].reshape(N, 3, S)
        q_nn = jnp.take(qp[:, :S], ids, axis=0)
        p_nn = jnp.take(qp[:, S:], ids, axis=0).reshape(N, NN, 3, S)
        q2, p2 = mod.apply(params, q, p, q_nn, p_nn, d, r)
        return jnp.concatenate([q2, p2.reshape(N, 3 * S)], axis=1).astype(dt)

    return chain_time(one, qp, f"XLA fused layer ({dt_name}, incl. gather)")


if __name__ == "__main__":
    which = sys.argv[1:] or ["xla", "pallas"]
    for w in which:
        if w == "xla":
            run_xla()
        elif w == "pallas":
            run_pallas()
        else:
            log(f"unknown case {w}")
