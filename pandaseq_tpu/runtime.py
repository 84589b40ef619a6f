"""Runtime knobs: persistent compilation cache and platform selection.

The axon TPU tunnel compiles remotely (hundreds of seconds for the large
batch programs); the persistent cache makes that a once-per-version cost.
"""

from __future__ import annotations

import os


class maybe_profile:
    """jax.profiler trace over a run when PANDASEQ_TPU_PROFILE=<dir> is
    set (the framework's tracing story — SURVEY.md §5; the reference has
    only debug-flag logging)."""

    def __init__(self, trace_dir: str | None = None):
        self.dir = trace_dir or os.environ.get("PANDASEQ_TPU_PROFILE")
        self.active = False

    def __enter__(self):
        if self.dir:
            try:
                import jax
                jax.profiler.start_trace(self.dir)
                self.active = True
            except Exception:
                pass
        return self

    def __exit__(self, *exc):
        if self.active:
            try:
                import jax
                jax.profiler.stop_trace()
            except Exception:
                pass
        return False


def enable_compilation_cache(cache_dir: str | None = None):
    """Point JAX's persistent compilation cache at a writable directory
    (env PANDASEQ_TPU_CACHE overrides; default ~/.cache/pandaseq_tpu)."""
    import jax

    cache_dir = (cache_dir or os.environ.get("PANDASEQ_TPU_CACHE")
                 or os.path.expanduser("~/.cache/pandaseq_tpu/jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
