"""Bucketed batch loader: variable-size structures -> fixed-shape batches.

TPU replacement for the reference's DataLoader + ragged collate
(model/main.py:37, src/dataset.py:91-112): items are grouped by
(atom-bucket, residue-bucket); each batch stacks same-bucket structures so
every train step hits an already-compiled XLA program. Batch sizes scale
inversely with bucket size to keep the atom budget per step roughly
constant (the reference is locked to batch_size=1 by raggedness).
"""

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

# per-worker loader reference, set by the Pool INITIALIZER (fork start
# method: initargs are inherited, never pickled). The initializer — not a
# parent-side global set around Pool() — matters twice: respawned
# replacement workers (after an OOM kill) re-run it, and two live loaders
# (train + test) each bind their own pools. Workers run numpy-only code —
# they never touch jax, so forking from a process with a live TPU client
# is safe.
_FORK_LOADER = None


def _pool_init(loader):
    global _FORK_LOADER
    _FORK_LOADER = loader


def _mp_make_batch(spec):
    bucket, items = spec
    return _FORK_LOADER._make_batch(bucket, items)

from ..batching import (
    ATOM_BUCKETS,
    RES_BUCKETS,
    PaddedStructure,
    pad_structure_arrays,
    pick_bucket,
    stack_batch,
)


class BucketedLoader:
    """Iterates PaddedStructure batches from an indexable dataset whose
    items are (X, ids_topk, q, M, y) unpadded numpy arrays."""

    def __init__(
        self,
        dataset,
        sizes: np.ndarray,          # [N, 2] (n_atoms, n_res) per item
        atoms_per_batch: int = 16384,
        min_batch: int = 1,
        max_batch: int = 64,
        shuffle: bool = True,
        seed: int = 0,
        drop_incomplete: bool = False,
        num_shards: int = 1,
        shard_index: int = 0,
        prefetch: int = 2,
        batch_multiple: int = 1,
        process_count: int = 1,
        process_index: int = 0,
        gather_tables: bool = False,
        gather_tables_max_na: Optional[int] = None,
        gather_u: int = 1024,
        num_workers: int = 0,
        worker_timeout: float = 600.0,
        compact: bool = False,
    ):
        self.dataset = dataset
        self.worker_timeout = worker_timeout
        self.sizes = np.asarray(sizes)
        self.atoms_per_batch = atoms_per_batch
        self.min_batch = min_batch
        self.max_batch = max_batch
        self.shuffle = shuffle
        self.seed = seed
        self.drop_incomplete = drop_incomplete
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.prefetch = prefetch
        self.batch_multiple = batch_multiple
        # multi-host SPMD: every process computes the IDENTICAL global batch
        # plan (same seed/epoch), but materializes only its own contiguous
        # row slice of each batch; jax.make_array_from_process_local_data
        # then assembles the global array (see parallel.dp.shard_batch).
        # This keeps batch counts, bucket sequences and shapes in lockstep
        # across processes, which SPMD collectives require. Distinct from
        # num_shards/shard_index, which statically split the DATASET (used
        # by per-process dataset builds, not SPMD training).
        if process_count > 1:
            if batch_multiple % process_count:
                raise ValueError(
                    f"batch_multiple ({batch_multiple}) must be a multiple of "
                    f"process_count ({process_count}) so every batch splits "
                    "evenly across processes"
                )
            if num_shards != 1:
                raise ValueError("num_shards dataset splitting and process_count "
                                 "SPMD row-slicing are mutually exclusive")
        self.process_count = process_count
        self.process_index = process_index
        # Morton-sort items and attach tile-local one-hot gather tables
        # (fixed width so same-bucket batches stack); see pesto_tpu.spatial
        if gather_tables and process_count > 1:
            # table presence is decided PER ITEM (build_gather_tables falls
            # back to None when a tile's candidate set exceeds gather_u) and
            # each process materializes only its own row slice — so two
            # processes could disagree on whether a batch carries tables,
            # compile different programs, and desync the SPMD collectives.
            # Tables are a single-host optimization; multi-host uses the
            # row-gather path (model gather="auto" handles their absence).
            import sys as _sys

            print(
                "BucketedLoader: gather_tables disabled for process_count > 1 "
                "(per-item table fallback would desync SPMD programs)",
                file=_sys.stderr,
            )
            gather_tables = False
        self.gather_tables = gather_tables
        # tables only for buckets up to this atom count: the table einsum
        # at the 8192 bucket crashes the remote compile (docs/MOSAIC_BUGS
        # .md) and row-gather wins there anyway; None = all buckets
        self.gather_tables_max_na = gather_tables_max_na
        self.gather_u = gather_u
        # ship q/M as per-atom integer codes, expanded on device
        # (models/pesto.py compact path): the dense M is NAxNR f32 — the
        # dominant host pad + transfer cost. Valid only for single-
        # vocabulary features (element-only models); the caller gates on
        # sum(feature_flags) == 1. Buckets routed to gather tables keep
        # the dense layout (sort_encoded_item operates on dense rows).
        self.compact = compact
        # parse/decode/pad in num_workers forked processes (the reference
        # uses 8-16 DataLoader workers, model/main.py:37); 0 = a single
        # prefetch thread. Workers are created lazily on first iteration
        # and live for the loader's lifetime.
        self.num_workers = num_workers
        self._pool = None
        self.epoch = 0

        # precompute bucket assignment per item
        self.item_buckets = np.array(
            [
                (pick_bucket(int(a) + 1, ATOM_BUCKETS), pick_bucket(max(int(r), 1), RES_BUCKETS))
                for a, r in self.sizes
            ]
        )

    def _batch_size_for(self, na: int) -> int:
        b = int(np.clip(self.atoms_per_batch // na, self.min_batch, self.max_batch))
        m = self.batch_multiple
        return max(m, (b // m) * m) if m > 1 else b

    def _plan(self) -> list:
        """Group item indices into same-bucket batches for this epoch."""
        idx = np.arange(len(self.sizes))
        idx = idx[self.shard_index :: self.num_shards]
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        groups: Dict[tuple, list] = {}
        batches = []
        for i in idx:
            b = tuple(self.item_buckets[i])
            groups.setdefault(b, []).append(int(i))
            if len(groups[b]) >= self._batch_size_for(b[0]):
                batches.append((b, groups.pop(b)))
        for b, items in groups.items():
            if not self.drop_incomplete:
                batches.append((b, items))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch + 7919)
            rng.shuffle(batches)
        return batches

    def _padded_count(self, n_items: int) -> int:
        m = self.batch_multiple
        if m > 1 and n_items % m:
            return n_items + (m - n_items % m)
        return n_items

    def _make_batch(self, bucket, items) -> PaddedStructure:
        na, nr = bucket
        # pad to the mesh multiple with fully-masked dummy structures so the
        # batch axis always shards evenly; dummies carry zero res_mask and
        # contribute nothing to loss or metrics
        total = self._padded_count(len(items))
        slots = list(items) + [None] * (total - len(items))
        if self.process_count > 1:
            # identical global plan everywhere; build only our row slice
            per = total // self.process_count
            slots = slots[self.process_index * per : (self.process_index + 1) * per]

        use_tables = self.gather_tables and (
            self.gather_tables_max_na is None or na <= self.gather_tables_max_na
        )

        def load(i):
            X, ids_topk, q, M, y = self.dataset[i]
            if use_tables:
                import dataclasses as _dc

                from ..spatial import build_gather_tables, sort_encoded_item

                X, ids_topk, q, M = sort_encoded_item(X, ids_topk, q, M)
                ps = pad_structure_arrays(X, q, M, na=na, nr=nr, y=y, ids_topk_raw=ids_topk)
                cand, loc = build_gather_tables(
                    np.asarray(ps.ids_topk), na, u_fixed=self.gather_u
                )
                if cand is not None:
                    ps = _dc.replace(ps, gather_cand=cand, gather_loc=loc)
                return ps
            return pad_structure_arrays(X, q, M, na=na, nr=nr, y=y, ids_topk_raw=ids_topk,
                                        compact=self.compact)

        padded, dummy = [], None
        for i in slots:
            if i is None:
                if dummy is None:
                    # zero a real item of this (same-bucket, same-shape)
                    # batch so dtypes and the label width match exactly
                    dummy = self._zeroed(padded[0] if padded else load(items[0]))
                padded.append(dummy)
            else:
                padded.append(load(i))
        return stack_batch(padded)

    @staticmethod
    def _zeroed(tmpl):
        import dataclasses as _dc

        return _dc.replace(
            tmpl,
            X=np.zeros_like(tmpl.X),
            ids_topk=np.zeros_like(tmpl.ids_topk),
            q=np.zeros_like(tmpl.q),
            M=np.zeros_like(tmpl.M),
            atom_mask=np.zeros_like(tmpl.atom_mask),
            res_mask=np.zeros_like(tmpl.res_mask),
            y=np.zeros_like(tmpl.y) if tmpl.y is not None else None,
            # all-zero tables are valid: every edge selects the sink row
            gather_cand=np.zeros_like(tmpl.gather_cand) if tmpl.gather_cand is not None else None,
            gather_loc=np.zeros_like(tmpl.gather_loc) if tmpl.gather_loc is not None else None,
        )

    def _ensure_pool(self):
        if self._pool is None:
            import multiprocessing as mp

            # drop any handle the parent opened so children open their own
            # (h5py handles are not fork-safe; H5Dataset also pid-guards)
            ds_reset = getattr(self.dataset, "reset_handles", None)
            if ds_reset is not None:
                ds_reset()
            self._pool = mp.get_context("fork").Pool(
                self.num_workers, initializer=_pool_init, initargs=(self,)
            )
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool = None

    def _iter_processes(self, batches) -> Iterator[PaddedStructure]:
        """Ordered bounded-window fan-out over the worker pool."""
        from collections import deque

        pool = self._ensure_pool()
        depth = self.num_workers + max(self.prefetch, 1)
        inflight = deque()

        def drain(res):
            # bounded get() in a retry loop so a dead worker (e.g.
            # OOM-killed mid-epoch) surfaces as a diagnostic instead of a
            # silent forever-hang; each retry re-checks the pool's state
            import multiprocessing as mp

            waited = 0.0
            while True:
                try:
                    return res.get(timeout=30.0)
                except mp.TimeoutError:
                    waited += 30.0
                    dead = [w for w in pool._pool if not w.is_alive()]
                    if dead:
                        raise RuntimeError(
                            f"loader worker process(es) died (pids "
                            f"{[w.pid for w in dead]}, exitcodes "
                            f"{[w.exitcode for w in dead]}) — likely "
                            f"OOM-killed; reduce num_workers or batch size"
                        )
                    if waited >= self.worker_timeout:
                        raise RuntimeError(
                            f"loader batch not produced after {waited:.0f}s "
                            f"with all {self.num_workers} workers alive — "
                            f"stuck worker (I/O hang?)"
                        )

        for spec in batches:
            inflight.append(pool.apply_async(_mp_make_batch, (spec,)))
            if len(inflight) >= depth:
                yield drain(inflight.popleft())
        while inflight:
            yield drain(inflight.popleft())

    def __iter__(self) -> Iterator[PaddedStructure]:
        batches = self._plan()
        self.epoch += 1
        if self.num_workers > 0:
            yield from self._iter_processes(batches)
            return
        if self.prefetch <= 0:
            for bucket, items in batches:
                yield self._make_batch(bucket, items)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()  # consumer stopped iterating early

        def put(item) -> bool:
            # bounded put so an abandoned producer exits instead of
            # blocking on a full queue forever (run_eval breaks out of the
            # loader at its eval budget; without this every eval leaked a
            # thread plus prefetch+1 materialized batches)
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=1.0)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for bucket, items in batches:
                    if abandoned.is_set() or not put(self._make_batch(bucket, items)):
                        return
            except Exception as e:  # surface loader errors to the consumer
                put(e)
            put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            abandoned.set()

    def __len__(self):
        return len(self._plan())
