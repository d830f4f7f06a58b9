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
from typing import Dict, Iterator

import numpy as np

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
    ):
        self.dataset = dataset
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

    def _make_batch(self, bucket, items) -> PaddedStructure:
        na, nr = bucket
        padded = []
        for i in items:
            X, ids_topk, q, M, y = self.dataset[i]
            padded.append(
                pad_structure_arrays(X, q, M, na=na, nr=nr, y=y, ids_topk_raw=ids_topk)
            )
        # pad to the mesh multiple with fully-masked dummy structures so the
        # batch axis always shards evenly; dummies carry zero res_mask and
        # contribute nothing to loss or metrics
        m = self.batch_multiple
        if m > 1 and len(padded) % m:
            import jax.numpy as jnp
            import dataclasses as _dc

            tmpl = padded[0]
            dummy = _dc.replace(
                tmpl,
                X=jnp.zeros_like(tmpl.X),
                ids_topk=jnp.zeros_like(tmpl.ids_topk),
                q=jnp.zeros_like(tmpl.q),
                M=jnp.zeros_like(tmpl.M),
                atom_mask=jnp.zeros_like(tmpl.atom_mask),
                res_mask=jnp.zeros_like(tmpl.res_mask),
                y=jnp.zeros_like(tmpl.y) if tmpl.y is not None else None,
            )
            padded.extend([dummy] * (m - len(padded) % m))
        return stack_batch(padded)

    def __iter__(self) -> Iterator[PaddedStructure]:
        batches = self._plan()
        self.epoch += 1
        if self.prefetch <= 0:
            for bucket, items in batches:
                yield self._make_batch(bucket, items)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for bucket, items in batches:
                    q.put(self._make_batch(bucket, items))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, Exception):
                raise item
            yield item

    def __len__(self):
        return len(self._plan())
