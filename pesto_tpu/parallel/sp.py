"""Atom-axis (sequence/context-parallel analog) sharding.

The reference caps structures at 8192 atoms partly because one GPU must
hold the whole graph (SURVEY.md §2.7/§5). Here a single structure's atom
axis shards across the mesh: every per-atom tensor (X, ids_topk, q0, M,
atom_mask, and all layer states) is partitioned on the 'model' axis, and
GSPMD inserts the collectives — an all-gather of the (tiny, ~4 MB) state
for the neighbor gathers and psums for the global reductions (Dmax, the
residue-pool softmax). Validated exact against the single-device forward.

Compose with data parallelism on the 'data' axis for batched workloads:
batch -> 'data', atoms -> 'model'.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import PestoConfig, PestoModel


def make_sp_forward(cfg: PestoConfig, mesh: Mesh, batch_axis: bool = False):
    """Jitted forward with the atom axis sharded over mesh axis 'model'.

    Without batch_axis: arguments are single-structure (X [NA,3], ...).
    With batch_axis: leading batch dim shards over 'data', atoms over
    'model' (2-D parallelism)."""
    model = PestoModel(cfg)
    rep = NamedSharding(mesh, P())
    fwd = lambda pp, X, ids, q, M, am: model.apply({"params": pp}, X, ids, q, M, am)  # noqa: E731
    if batch_axis:
        atom = NamedSharding(mesh, P("data", "model"))
        out = NamedSharding(mesh, P("data"))
    else:
        atom = NamedSharding(mesh, P("model"))
        out = rep
    return jax.jit(
        fwd,
        in_shardings=(rep, atom, atom, atom, atom, atom),
        out_shardings=out,
    )


def make_sp_train_step(cfg: PestoConfig, tx, mesh: Mesh, pos_weight_factor: float = 0.5,
                       donate: bool = True):
    """Training step with batch sharded over 'data' AND atoms over 'model'
    (2-D data x sequence parallelism); params/optimizer replicated."""
    from ..train.step import build_train_step_fn

    fn = build_train_step_fn(cfg, tx, pos_weight_factor)
    rep = NamedSharding(mesh, P())
    atom = NamedSharding(mesh, P("data", "model"))
    batch_only = NamedSharding(mesh, P("data"))

    return jax.jit(
        fn,
        in_shardings=(rep, _padded_structure_shardings(atom, batch_only)),
        out_shardings=(rep, {"loss": rep, "losses": rep, "p": batch_only}),
        donate_argnums=(0,) if donate else (),
    )


def _padded_structure_shardings(atom, batch_only):
    from ..batching import PaddedStructure

    return PaddedStructure(
        X=atom, ids_topk=atom, q=atom, M=atom,
        atom_mask=atom, res_mask=batch_only, y=batch_only,
    )


def shard_batch_sp(batch, mesh: Mesh):
    """Place a batch with [B, NA, ...] arrays onto the (data, model) mesh."""
    import dataclasses

    atom = NamedSharding(mesh, P("data", "model"))
    batch_only = NamedSharding(mesh, P("data"))
    put = lambda x, s: jax.device_put(x, s) if x is not None else None
    return dataclasses.replace(
        batch,
        X=put(batch.X, atom),
        ids_topk=put(batch.ids_topk, atom),
        q=put(batch.q, atom),
        M=put(batch.M, atom),
        atom_mask=put(batch.atom_mask, atom),
        res_mask=put(batch.res_mask, batch_only),
        y=put(batch.y, batch_only),
    )


def make_sp_serve(cfg: PestoConfig, mesh: Mesh, nr=None):
    """Single-structure SERVING forward with the atom axis sharded over
    'model': per-atom arrays (X, ids, feature/membership codes, mask)
    partition across the mesh, parameters replicate, and the fp32
    sigmoid'd probabilities come back replicated. Supports the compact
    integer-code inputs (q codes + residue codes with static nr), which
    keep host arrays O(N) — a dense M for a 131k-atom structure would be
    NAxNR f32 (~8.6 GB)."""
    model = PestoModel(cfg)
    rep = NamedSharding(mesh, P())
    atom = NamedSharding(mesh, P("model"))

    # nr is baked into the closure: pjit rejects kwargs (and static
    # argnames ride on kwargs) once in_shardings is specified
    def fwd(pp, X, ids, q, M, am):
        z = model.apply({"params": pp}, X, ids, q, M, am, nr=nr)
        return jax.nn.sigmoid(z.astype(jax.numpy.float32))

    return jax.jit(
        fwd,
        in_shardings=(rep, atom, atom, atom, atom, atom),
        out_shardings=rep,
    )
