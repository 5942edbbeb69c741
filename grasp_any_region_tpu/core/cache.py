"""Persistent XLA compilation cache — compile once per machine, not per run."""

import os

_DEFAULT = os.path.expanduser("~/.cache/gar_tpu_xla")


def enable_compilation_cache(path: str = _DEFAULT) -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
