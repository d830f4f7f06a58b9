"""Full training runtime (the reference's model/main.py:103-255, rebuilt
for bucketed batches + a device mesh).

Differences by design:
  - batches are padded same-bucket stacks (batch_size >> 1) instead of
    ragged single structures;
  - eval is pure (does not advance pos_ratios);
  - orbax checkpoints carry optimizer moments + pos_ratios + step, so a
    resume is exact (the reference reconstructs pos_ratios from log lines
    and drops Adam moments);
  - with more than one device, the step runs data-parallel over the mesh.
"""

import dataclasses
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np

from ..data.dataset import H5Dataset
from ..data.loader import BucketedLoader
from ..data.selection import select_by_interface_types, select_by_max_ba, select_by_sid
from ..encoding import categ_to_resnames
from ..metrics import bc_score_names, bc_scoring, nanmean
from ..models import PestoConfig
from .checkpoint import AsyncCheckpointer, restore_checkpoint, save_config_snapshot
from .logger import Logger
from .state import create_train_state
from .step import make_eval_step, make_train_step


def default_r_types():
    return [
        categ_to_resnames["protein"],
        categ_to_resnames["dna"] + categ_to_resnames["rna"],
        categ_to_resnames["ion"],
        categ_to_resnames["ligand"],
        categ_to_resnames["lipid"],
    ]


@dataclasses.dataclass
class TrainConfig:
    # data (reference config_data, model/config.py:6-23)
    dataset_filepath: str = "datasets/contacts_rr5A_64nn_8192.h5"
    train_selection_filepath: Optional[str] = None
    test_selection_filepath: Optional[str] = None
    max_ba: int = 1
    max_size: int = 1024 * 8
    min_num_res: int = 48
    l_types: Sequence[str] = tuple(categ_to_resnames["protein"])
    r_types: Sequence[Sequence[str]] = tuple(tuple(r) for r in default_r_types())

    # runtime (reference config_runtime, model/config.py:68-81)
    num_epochs: int = 100
    learning_rate: float = 1e-5
    lr_schedule: str = "constant"   # constant | cosine | warmup_cosine
    warmup_steps: int = 0
    total_steps: int = 1_000_000
    pos_weight_factor: float = 0.5
    log_step: int = 1024
    eval_step: int = 1024 * 8
    eval_size: int = 1024
    reload: bool = True

    # TPU batching
    atoms_per_batch: int = 16384
    max_batch: int = 32
    seed: int = 0
    use_mesh: bool = True
    # host input pipeline: decode/pad in this many worker processes
    # (reference num_workers=8, model/main.py:37); 0 = one prefetch thread
    num_workers: int = 8
    # one-hot MXU gather tables (Morton-sorted layout); pairs with
    # PestoConfig.gather="auto"
    gather_tables: bool = True
    # tables only for buckets up to this atom count: the table einsum at
    # the 8192 bucket crashes the remote compile (docs/MOSAIC_BUGS.md)
    # and row-gather wins there anyway
    gather_tables_max_na: Optional[int] = 4096
    # ship q/M as integer codes expanded on device (the dense M is NAxNR
    # f32, the dominant host pad+transfer cost at 8k buckets). "auto":
    # enabled when the model is single-vocabulary (element-only) —
    # multi-vocab q concatenates several one-hots and has no single code
    compact: str = "auto"


def setup_dataset(tc: TrainConfig, selection_filepath: Optional[str], features_flags):
    ds = H5Dataset(tc.dataset_filepath, features_flags=features_flags)
    m = np.ones(len(ds.keys), dtype=bool)
    if selection_filepath:
        sids_sel = np.genfromtxt(selection_filepath, dtype=np.dtype("U"))
        m &= select_by_sid(ds, sids_sel)
    m &= select_by_max_ba(ds, tc.max_ba)
    m &= ds.sizes[:, 0] <= tc.max_size
    m &= ds.sizes[:, 1] >= tc.min_num_res
    m &= select_by_interface_types(ds, list(tc.l_types), np.concatenate([list(r) for r in tc.r_types]))
    ds.update_mask(m)
    ds.set_types(list(tc.l_types), [list(r) for r in tc.r_types])
    return ds


def _local_rows(p):
    """Host copy of this process's rows of a (possibly multi-host global)
    batch-sharded array. Single-process: the whole array."""
    if jax.process_count() == 1:
        return np.asarray(p)
    shards = sorted(p.addressable_shards, key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def _scores_from_arrays(y, rm, p):
    """bc_scoring per structure from host copies of (y, res_mask, p)."""
    scores = []
    for b in range(y.shape[0]):
        nr = int(rm[b].sum())
        if nr > 0:
            scores.append(bc_scoring(y[b, :nr], p[b, :nr]))
    return scores


def _per_structure_scores(batch, p):
    """bc_scoring per structure in a padded batch (reference scores per
    ragged batch, model/main.py:61-79). `batch` must be the process-LOCAL
    host batch; `p` may be a global array (local rows are extracted)."""
    return _scores_from_arrays(np.asarray(batch.y), np.asarray(batch.res_mask), _local_rows(p))


def _aggregate(results):
    """results: list of (losses [C], scores list [8,C]) -> flat score dict
    (reference scoring(), model/main.py:61-79). Empty inputs are real:
    a zero-batch eval selection, or a multi-host process whose row slices
    were all padding dummies — NaN scores, never np.stack([]) crashes."""
    if not results:
        return {"loss": float("nan")}
    losses = np.mean(np.stack([r[0] for r in results]), axis=0)
    all_scores = [s for r in results for s in r[1]]
    if all_scores:
        m_scores = nanmean(np.stack(all_scores), axis=0)
    else:
        m_scores = np.full((len(bc_score_names), losses.shape[0]), np.nan)
    out = {"loss": float(np.sum(losses))}
    for i in range(losses.shape[0]):
        out[f"{i}/loss"] = float(losses[i])
        for j, name in enumerate(bc_score_names):
            out[f"{i}/{name}"] = float(m_scores[j, i])
    return out


def _log_scores(logger, scores, global_step, pos_ratios, step_type, tb_writer=None):
    pr_str = ", ".join(f"{r:.4f}" for r in np.asarray(pos_ratios))
    logger.print(f"{step_type}> [{global_step}] loss={scores['loss']:.4f}, pos_ratios=[{pr_str}]")
    stats = {k: v for k, v in scores.items() if not np.isnan(v)}
    stats["global_step"] = int(global_step)
    stats["pos_ratios"] = list(np.asarray(pos_ratios).astype(float))
    stats["step_type"] = step_type
    logger.store(**stats)
    if tb_writer is not None:
        for key, v in scores.items():
            if not np.isnan(v):
                tb_writer.add_scalar(f"{step_type}/{key}", v, global_step)


class _NullLogger:
    """Non-main-process logger: same interface, no file writes. Keeps
    log_lst_filepath so _restore_min_loss can still READ process 0's .dat
    on a shared filesystem."""

    def __init__(self, output_dir, name):
        self.log_lst_filepath = os.path.join(output_dir, f"{name}.dat")

    def print(self, msg):
        pass

    def store(self, **stats):
        pass

    def restart_timer(self):
        pass


def _restore_min_loss(logger) -> float:
    """Best test loss recorded in this run dir's .dat (the reference
    recovers run state from train.dat the same way, model/main.py:124-136);
    1e9 for a fresh run or an unreadable log."""
    import json

    best = 1e9
    try:
        with open(logger.log_lst_filepath) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                if e.get("step_type") == "test" and "loss" in e:
                    v = float(e["loss"])
                    if np.isfinite(v):
                        best = min(best, v)
    except OSError:
        pass
    return best


def run_eval(state, loader_test, eval_step, put, eval_size: int):
    """One evaluation pass with a STRUCTURE budget: stops once eval_size
    real (non-dummy) structures have been scored. The reference's
    eval_size=1024 counts structures at batch_size=1 (model/main.py:243,
    config.py:79); counting batches would inflate the budget by up to
    max_batch and make scores incomparable across batch settings."""
    test_results = []
    n_eval_structures = 0
    for host_tb in loader_test:
        tb = put(host_tb)
        o = eval_step(state, tb)
        sc = _per_structure_scores(host_tb, o["p"])
        test_results.append((np.asarray(o["losses"]), sc))
        n_proc = jax.process_count()
        if n_proc > 1:
            # every process must break on the SAME iteration or the SPMD
            # collectives desync; local non-dummy counts differ per process,
            # so budget by the (identical) global padded row count instead
            n_eval_structures += np.asarray(host_tb.res_mask).shape[0] * n_proc
        else:
            n_eval_structures += len(sc)
        if n_eval_structures >= eval_size:
            break
    return _aggregate(test_results), n_eval_structures


def train(
    model_cfg: PestoConfig,
    tc: TrainConfig,
    output_dir: str,
    init_params_from: Optional[dict] = None,
) -> None:
    # multi-host: only process 0 writes logs/snapshots — N processes
    # appending the same train.dat interleave JSON lines (non-atomic over
    # NFS) and race on the snapshot files. Checkpoint saves stay
    # all-process (orbax multi-host saves are collective).
    is_main = jax.process_index() == 0
    logger = Logger(output_dir, "train") if is_main else _NullLogger(output_dir, "train")
    logger.print(">>> Configuration")
    logger.print(str(dataclasses.asdict(tc)))
    if is_main:
        save_config_snapshot(output_dir, model=model_cfg, train=tc)
        try:
            from .checkpoint import save_code_snapshot

            save_code_snapshot(output_dir)
        except Exception:
            pass

    state, tx = create_train_state(
        model_cfg, learning_rate=tc.learning_rate,
        rng=jax.random.PRNGKey(tc.seed), params=init_params_from,
        schedule=tc.lr_schedule, warmup_steps=tc.warmup_steps,
        total_steps=tc.total_steps,
    )

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    logger.print(f"> {n_params} parameters")

    ckpt_dir = os.path.join(output_dir, "ckpt")
    best_dir = os.path.join(output_dir, "best")
    if tc.reload:
        restored = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state = restored
            logger.print(f"Reloaded checkpoint at step {int(state.global_step)}")

    logger.print(">>> Loading data")
    ds_train = setup_dataset(tc, tc.train_selection_filepath, model_cfg.feature_flags)
    ds_test = setup_dataset(tc, tc.test_selection_filepath, model_cfg.feature_flags)
    logger.print(f"> training data size: {len(ds_train)}")
    logger.print(f"> testing data size: {len(ds_test)}")

    n_dev = len(jax.devices())
    batch_multiple = n_dev if (tc.use_mesh and n_dev > 1) else 1
    # multi-host SPMD: every process follows the IDENTICAL global batch plan
    # (same seed) and materializes only its own row slice of each batch;
    # shard_batch assembles the global arrays from the process-local shards
    # via jax.make_array_from_process_local_data.
    n_proc, proc_id = jax.process_count(), jax.process_index()
    compact = (sum(model_cfg.feature_flags) == 1) if tc.compact == "auto" else bool(tc.compact)
    loader_train = BucketedLoader(
        ds_train, ds_train.sizes_selected(),
        atoms_per_batch=tc.atoms_per_batch, max_batch=tc.max_batch,
        shuffle=True, seed=tc.seed, batch_multiple=batch_multiple,
        process_count=n_proc, process_index=proc_id,
        num_workers=tc.num_workers, gather_tables=tc.gather_tables,
        gather_tables_max_na=tc.gather_tables_max_na, compact=compact,
    )
    loader_test = BucketedLoader(
        ds_test, ds_test.sizes_selected(),
        atoms_per_batch=tc.atoms_per_batch, max_batch=tc.max_batch,
        shuffle=False, seed=tc.seed, batch_multiple=batch_multiple,
        process_count=n_proc, process_index=proc_id,
        num_workers=tc.num_workers, gather_tables=tc.gather_tables,
        gather_tables_max_na=tc.gather_tables_max_na, compact=compact,
    )
    if tc.use_mesh and n_dev > 1:
        from ..parallel import make_dp_train_step, make_dp_eval_step, make_mesh, replicate_state, shard_batch

        mesh = make_mesh()
        train_step = make_dp_train_step(model_cfg, tx, mesh, tc.pos_weight_factor, donate=True)
        eval_step = make_dp_eval_step(model_cfg, mesh, tc.pos_weight_factor)
        state = replicate_state(state, mesh)
        put = lambda b: shard_batch(b, mesh)
        logger.print(f"> data-parallel over {n_dev} devices")
    else:
        train_step = make_train_step(model_cfg, tx, tc.pos_weight_factor, donate=True)
        eval_step = make_eval_step(model_cfg, tc.pos_weight_factor)
        put = lambda b: b

    tb_writer = None
    if is_main:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(os.path.join(output_dir, "tb"))
        except Exception:
            pass

    logger.print(">>> Starting training")
    logger.restart_timer()
    # restore the best-so-far eval loss across resumes, or the first
    # post-resume eval (almost surely worse than the pre-crash best)
    # overwrites the genuine best/ checkpoint (keep=1)
    min_loss = _restore_min_loss(logger)
    if min_loss < 1e9:
        logger.print(f"> resumed best eval loss {min_loss:.4f}")
    # pending per-step outputs: scoring is DEFERRED to the log boundary so
    # the hot loop never blocks on a device sync or host sklearn work —
    # syncing per step (the round-4 shape) serializes host scoring into
    # the device pipeline. Only (y, res_mask, losses, p) are retained
    # (small: p is [B,NR,C]); device->host copies are started async.
    pending = []
    t_last = time.time()
    global_step = steps_last = int(state.global_step)
    ckpt = AsyncCheckpointer()

    def drain_scores():
        results = []
        for y, rm, losses_d, p_d in pending:
            results.append((np.asarray(losses_d), _scores_from_arrays(y, rm, _local_rows(p_d))))
        pending.clear()
        return _aggregate(results)

    try:
        for epoch in range(tc.num_epochs):
            for host_batch in loader_train:
                batch = put(host_batch)
                state, out = train_step(state, batch)
                global_step += 1
                losses_d, p_d = out["losses"], out["p"]
                try:
                    losses_d.copy_to_host_async()
                    p_d.copy_to_host_async()
                except Exception:
                    pass  # non-addressable multi-host arrays: copy at drain
                pending.append(
                    (np.asarray(host_batch.y), np.asarray(host_batch.res_mask), losses_d, p_d)
                )

                if (global_step + 1) % tc.log_step == 0:
                    scores = drain_scores()
                    dt = time.time() - t_last
                    sps = (global_step - steps_last) / max(dt, 1e-9)
                    t_last, steps_last = time.time(), global_step
                    scores["steps_per_sec"] = sps
                    _log_scores(logger, scores, global_step, state.pos_ratios, "train", tb_writer)
                    ckpt.save(ckpt_dir, state)

                if (global_step + 1) % tc.eval_step == 0:
                    scores, _ = run_eval(state, loader_test, eval_step, put, tc.eval_size)
                    _log_scores(logger, scores, global_step, state.pos_ratios, "test", tb_writer)
                    if scores["loss"] <= min_loss:
                        min_loss = scores["loss"]
                        logger.print(f"> saving best model (loss {min_loss:.4f})")
                        ckpt.save(best_dir, state, keep=1)
            logger.print(f"epoch {epoch + 1}/{tc.num_epochs} done")
    finally:
        # tear down forked worker pools so an exception (or normal return)
        # never leaves orphaned loader processes behind
        loader_train.close()
        loader_test.close()
        # flush queued checkpoint writes; never mask an in-flight
        # training exception with a writer error
        import sys as _sys

        try:
            ckpt.close()
        except Exception:
            if _sys.exc_info()[0] is None:
                raise
            logger.print("WARNING: async checkpoint write failed during teardown")
