"""Runtime/bootstrap helpers."""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 5.0) -> None:
    """Persistent XLA compilation cache — the big pipeline graphs take
    minutes to compile; cache them across CLI invocations."""
    path = path or os.path.expanduser("~/.cache/vspbfr_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass  # older jax without the flags
