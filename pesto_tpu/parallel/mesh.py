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
    if n_data < 1 or n_model < 1:
        raise ValueError(
            f"mesh {n_data}x{n_model} impossible with {len(devices)} "
            f"device(s) (n_model exceeds the device count?)"
        )
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"only {len(devices)} available"
        )
    if n_data * n_model < len(devices):
        # silent truncation hides misconfiguration (e.g. training quietly
        # using 6 of 8 chips) — say so
        import sys

        print(
            f"make_mesh: using {n_data * n_model} of {len(devices)} devices",
            file=sys.stderr,
        )
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
