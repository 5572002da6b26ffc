"""Device/runtime setup helpers."""

import os

_initialized = False


def setup_runtime(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (compiles through a
    remote-attached TPU cost tens of seconds each; the cache makes repeat
    pipeline runs start hot). Safe to call multiple times."""
    global _initialized
    if _initialized:
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("NECAT_TPU_JAX_CACHE",
                                   os.path.expanduser("~/.cache/necat_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    _initialized = True
