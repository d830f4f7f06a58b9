"""Inference engine: bucketed, jitted, batched prediction.

Replaces the reference's per-structure eager loop (apply_model.ipynb cell 6,
profiling.py:68-105) with a TPU-native design: one compiled forward per
(atom-bucket, residue-bucket) shape, vmapped over a batch axis, fed by the
host-side encode/pad pipeline. Padding makes every call shape-static, so
XLA compiles each bucket exactly once per process.
"""

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .batching import PaddedStructure, encode_and_pad, stack_batch
from .models import PestoConfig, PestoModel
from .port import load_reference_checkpoint
from .structure import concatenate_chains, preprocess_structure


class Predictor:
    """Bucketed jitted inference on padded structures."""

    def __init__(self, cfg: PestoConfig, params, knn_method: str = "exact"):
        self.cfg = cfg
        self.model = PestoModel(cfg)
        self.params = params
        self.knn_method = knn_method  # "fast": approx kNN, far-tail swaps only
        # one-hot MXU gather wins over the row-gather in bf16 (tables ride
        # a Morton-sorted layout built host-side at encode time)
        self.use_gather_tables = cfg.gather == "onehot" or (
            cfg.gather == "auto" and cfg.dtype == "bfloat16"
        )
        self._single = jax.jit(self._apply)
        # batches flatten into the atom axis inside the model (faster than
        # vmap on TPU); same jitted entry point handles both ranks
        self._batched = self._single

    @classmethod
    def from_reference_checkpoint(cls, path: str, cfg: PestoConfig) -> "Predictor":
        return cls(cfg, load_reference_checkpoint(path, cfg))

    def _apply(self, params, X, ids, q, M, am, cand=None, loc=None):
        return self.model.apply({"params": params}, X, ids, q, M, am, cand, loc)

    def export_compiled(self, path: str, buckets=((512, 64),)) -> None:
        """Serialize the forward as portable StableHLO artifacts
        (jax.export), one per bucket, for deployment without tracing the
        model. Load with Predictor.load_exported."""
        import pickle

        from jax import export as jexport

        from .synthetic import random_padded_structure

        blobs = {}
        for na, nr in buckets:
            ps = random_padded_structure(
                n_atoms=min(na - 1, 64), n_res=min(nr, 8),
                n_features=self.cfg.em_n0, na=na, nr=nr,
            )
            exp = jexport.export(jax.jit(self._apply))(
                self.params, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask
            )
            blobs[(na, nr)] = exp.serialize()
        with open(path, "wb") as f:
            pickle.dump({"buckets": blobs}, f)

    @staticmethod
    def load_exported(path: str):
        """Load exported artifacts; returns {(na, nr): callable(params,
        X, ids, q, M, am) -> logits}."""
        import pickle

        from jax import export as jexport

        with open(path, "rb") as f:
            data = pickle.load(f)
        return {
            bucket: jexport.deserialize(blob).call
            for bucket, blob in data["buckets"].items()
        }

    def warmup(self, buckets=None, batch_sizes=(1,)) -> None:
        """Precompile the forward for the given (na, nr) buckets (all
        default buckets if None) so serving never pays a first-compile
        stall. Combine with utils.enable_compilation_cache() to persist
        across processes."""
        from .batching import ATOM_BUCKETS, RES_BUCKETS
        from .synthetic import random_padded_structure

        if buckets is None:
            buckets = list(zip(ATOM_BUCKETS, RES_BUCKETS))
        for na, nr in buckets:
            ps = random_padded_structure(
                n_atoms=min(na - 1, 64), n_res=min(nr, 8),
                n_features=self.cfg.em_n0, na=na, nr=nr,
            )
            for b in batch_sizes:
                target = stack_batch([ps] * b) if b > 1 else ps
                jax.block_until_ready(self.logits(target))

    def logits(self, ps: PaddedStructure) -> jax.Array:
        """Per-residue logits [NR, C] (or [B, NR, C] for batches)."""
        fn = self._batched if ps.X.ndim == 3 else self._single
        return fn(
            self.params, ps.X, ps.ids_topk, ps.q, ps.M, ps.atom_mask,
            ps.gather_cand, ps.gather_loc,
        )

    def probabilities(self, ps: PaddedStructure) -> np.ndarray:
        # always float32 on host (bf16 outputs are not numpy-interoperable)
        return np.asarray(jax.nn.sigmoid(self.logits(ps).astype(jnp.float32)))

    def predict_structure(self, structure: dict) -> np.ndarray:
        """Cleaned+concatenated structure record -> [n_res, C] probs."""
        ps = encode_and_pad(
            structure, feature_flags=self.cfg.feature_flags, knn_method=self.knn_method,
            with_gather_tables=self.use_gather_tables,
        )
        nr = int(np.sum(np.asarray(ps.res_mask)))
        return self.probabilities(ps)[:nr]

    def predict_pdb_file(self, path: str) -> Tuple[dict, np.ndarray]:
        """Raw PDB or mmCIF file -> (preprocessed merged structure,
        [n_res, C] probs).

        Mirrors the reference inference chain (apply_model.ipynb cell 6):
        read -> clean -> tag -> split -> filter -> dedup -> concat -> model.
        mmCIF input is a capability beyond the reference (which reads only
        legacy PDB, src/structure_io.py).
        """
        from .io import read_structure

        subunits = preprocess_structure(read_structure(path))
        structure = concatenate_chains(subunits)
        return structure, self.predict_structure(structure)

    def predict_batch(self, structures: list, atoms_per_call: int = 32768) -> list:
        """Predict a list of structure records, grouping into per-bucket
        batches for throughput (batch size capped by an atom budget per
        device call). Returns a list of [n_res_i, C] arrays."""
        encoded = []
        for i, s in enumerate(structures):
            ps = encode_and_pad(
                s, feature_flags=self.cfg.feature_flags, knn_method=self.knn_method,
                with_gather_tables=self.use_gather_tables,
            )
            encoded.append((i, ps))
        buckets: Dict[tuple, list] = {}
        for i, ps in encoded:
            buckets.setdefault((ps.X.shape[0], ps.M.shape[1]), []).append((i, ps))
        out = [None] * len(structures)
        for (na, _), group in buckets.items():
            bmax = max(1, atoms_per_call // na)
            for k in range(0, len(group), bmax):
                chunk = group[k : k + bmax]
                batch = stack_batch([ps for _, ps in chunk]) if len(chunk) > 1 else chunk[0][1]
                probs = self.probabilities(batch)
                if len(chunk) == 1:
                    probs = probs[None]
                for (i, ps), pb in zip(chunk, probs):
                    nr = int(np.sum(np.asarray(ps.res_mask)))
                    out[i] = pb[:nr]
        return out
