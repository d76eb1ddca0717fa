"""Persistent XLA compilation cache.

First compiles of the big jitted programs cost 20-250 s; the persistent
cache makes warm process starts near-instant. Enabled by default for the
CLI/server/bench entry points; disable with WHISPER_TPU_XLA_CACHE=0 or point
it at a different directory.
"""

from __future__ import annotations

import os


def enable(default_dir: str = "~/.cache/whisper_tpu_xla") -> str | None:
    path = os.environ.get("WHISPER_TPU_XLA_CACHE")
    if path == "0":
        return None
    path = os.path.expanduser(path or default_dir)
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return path
    except Exception:  # backend may not support executable serialization
        return None
