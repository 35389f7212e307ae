"""Persistent XLA compilation cache setup.

K/M/shape combinations are static arguments to the jitted kernels, so every
new configuration triggers a compile; caching them on disk makes repeat runs
(tests, CLI invocations) start in milliseconds instead of tens of seconds.
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT = pathlib.Path(
    os.environ.get("GA_TPU_CACHE_DIR", os.path.expanduser("~/.cache/ga_tpu_xla"))
)


def enable_compilation_cache(path: os.PathLike | None = None) -> None:
    """Idempotently point JAX at a persistent compilation cache."""
    import jax

    cache_dir = pathlib.Path(path) if path is not None else _DEFAULT
    cache_dir.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
