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
    warm_downlink()
    _initialized = True


def _is_transient_device_error(e: BaseException) -> bool:
    s = str(e)
    return any(t in s for t in ("remote_compile", "read body",
                                "response body closed", "UNAVAILABLE",
                                "DEADLINE_EXCEEDED", "Connection reset"))


def tunnel_retry(fn, *args, _attempts: int = 3, **kw):
    """Run a dispatch, retrying transient tunnel failures (the axon-attached
    TPU compiles via an HTTP service — observed: 'remote_compile: read body:
    response body closed before all bytes were read' killing hour-long runs).
    Only errors matching known-transient signatures are retried."""
    import time as _time

    from necat_tpu.utils.logging import logger
    for a in range(_attempts):
        try:
            return fn(*args, **kw)
        except Exception as e:  # noqa: BLE001 — filtered by signature below
            if a + 1 >= _attempts or not _is_transient_device_error(e):
                raise
            logger.warning("transient device error (attempt %d/%d): %s",
                           a + 1, _attempts, str(e)[:200])
            _time.sleep(2.0 * (a + 1))


import weakref

_CACHED_STORES: "weakref.WeakSet" = weakref.WeakSet()


def register_cached_store(store) -> None:
    """Track a ReadStore carrying device-resident caches (packed word store,
    k-mer index) so release_device_caches can drop them on HBM exhaustion."""
    try:
        _CACHED_STORES.add(store)
    except TypeError:
        pass


def release_device_caches() -> None:
    """Free every registered store's device caches + jit caches.

    Called by the stage retry loop after a failure (pipeline/stages._stage):
    a RESOURCE_EXHAUSTED dispatch leaves HBM full of cached word stores,
    index arrays and executable temps, so a bare retry fails instantly —
    dropping the caches lets the retry rebuild into a clean device. Costs a
    re-upload + executable reloads (persistent compile cache stays warm)."""
    import gc

    for s in list(_CACHED_STORES):
        s.__dict__.pop("_devstore_cache", None)
        s.__dict__.pop("_index_cache", None)
    gc.collect()
    try:
        import jax
        jax.clear_caches()
    except Exception:
        pass
    gc.collect()


_warm_thread = None


def warm_downlink() -> None:
    """Pay the device->host link setup cost up front, off the main thread.

    The first d2h transfer through the remote-attached TPU link costs ~100 s
    (measured; subsequent transfers run at 20-40 MB/s). Warming it in a
    background thread overlaps that one-time cost with host-side work
    (read loading, packing, k-mer index build)."""
    global _warm_thread
    if _warm_thread is not None:
        return
    if os.environ.get("NECAT_TPU_COORDINATOR"):
        # multi-host launch: backend init must wait for jax.distributed
        return
    import threading

    def _warm():
        try:
            import jax
            import numpy as _np
            if jax.default_backend() != "tpu":
                return
            d = jax.device_put(_np.zeros(8, _np.uint8))
            _np.asarray(d)
        except Exception:
            pass

    _warm_thread = threading.Thread(target=_warm, daemon=True)
    _warm_thread.start()
