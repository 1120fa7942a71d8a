"""Persistent XLA compilation cache setup.

First compiles through the remote-compile tunnel cost seconds-to-minutes;
the persistent cache makes every subsequent process start warm.  Called by
the CLI entry points and bench; library users can call it explicitly.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> None:
    import jax

    cache_dir = (path or os.environ.get("GWT_JAX_CACHE")
                 or os.path.expanduser("~/.cache/godot_whisper_tpu/xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs: run uncached
