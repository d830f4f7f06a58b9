"""pesto_tpu — TPU-native geometric transformer framework for protein interface prediction.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of LBM-EPFL/PeSTo
(reference mounted at /root/reference). The compute path is functional JAX
designed for the TPU compilation model: static padded shapes (size buckets),
masking instead of ragged logic, vmapped batching, `shard_map` data
parallelism over a device mesh, and Pallas kernels for the hot ops.

Layers (mirroring the reference layer map in SURVEY.md §1):
  - io/         PDB / mmCIF structure file I/O (pure Python, gemmi-free)
  - structure/  host-side numpy structure record operations
  - encoding    vocabularies and feature/geometry encoding
  - topology    device-side kNN topology + contact extraction (XLA + Pallas)
  - models/     the geometric transformer (flax.linen), configs
  - batching    padding / bucketing / collation with the sink-slot convention
  - port        torch checkpoint -> JAX parameter conversion
  - train/      loss, metrics, train loop, logger, orbax checkpoints
  - data/       HDF5 dataset codec (reference-schema compatible) + builders
  - parallel/   mesh construction and sharded train/infer steps
  - apps/       inference CLI, profiling, MD trajectories, interfaceome
"""

__version__ = "0.1.0"

_LAZY = {
    "Predictor": ("pesto_tpu.infer", "Predictor"),
    "PestoModel": ("pesto_tpu.models", "PestoModel"),
    "PestoConfig": ("pesto_tpu.models", "PestoConfig"),
    "get_config": ("pesto_tpu.models", "get_config"),
    "read_pdb": ("pesto_tpu.io", "read_pdb"),
    "save_pdb": ("pesto_tpu.io", "save_pdb"),
    "load_reference_checkpoint": ("pesto_tpu.port", "load_reference_checkpoint"),
    "infer_variant": ("pesto_tpu.port", "infer_variant"),
}


def __getattr__(name):
    # lazy top-level API: `from pesto_tpu import Predictor` without paying
    # jax/flax import cost for host-only uses
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'pesto_tpu' has no attribute {name!r}")
