"""Device mesh construction and sharding specs.

The reference is single-device (SURVEY.md §2.7: no distributed backend).
Here parallelism is native: a ('data', 'model') mesh where the batch axis
shards over 'data' (pure DP — the right strategy for a ~1M-param model)
and 'model' is reserved for sharding the state/head dims of much larger
configs. Gradients reduce over ICI via the collectives XLA inserts for the
replicated-param / sharded-batch jit."""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
