"""Persistent XLA compilation cache (compiles of the big bucketed programs
cost tens of seconds on first use; cache them across processes)."""

import os


def enable_compilation_cache(path: str = None):
    import jax

    path = path or os.environ.get(
        "PESTO_COMPILATION_CACHE", os.path.expanduser("~/.cache/pesto_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    return path
