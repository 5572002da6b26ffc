"""Timestamped logger (OC_LOG / plgdInfo equivalents, ontcns_aux.h:19-35)."""

import logging
import sys

logger = logging.getLogger("necat_tpu")
if not logger.handlers:
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter("%(asctime)s [%(levelname)s] %(message)s",
                                     datefmt="%Y-%m-%d %H:%M:%S"))
    logger.addHandler(h)
    logger.setLevel(logging.INFO)


# ----------------------------------------------------------------- timing
# TIMING_START/TIMING_END role (src/common/ontcns_aux.h:107-116): cheap
# accumulating wall-clock scopes, enabled with NECAT_TPU_TIMING=1.
import atexit as _atexit
import collections as _collections
import contextlib as _contextlib
import os as _os
import time as _time

_TIMERS = _collections.Counter()
_COUNTS = _collections.Counter()
TIMING_ON = bool(_os.environ.get("NECAT_TPU_TIMING"))


@_contextlib.contextmanager
def timed(name: str):
    if not TIMING_ON:
        yield
        return
    t0 = _time.perf_counter()
    try:
        yield
    finally:
        _TIMERS[name] += _time.perf_counter() - t0
        _COUNTS[name] += 1


def timing_report():
    return {k: (round(v, 2), _COUNTS[k]) for k, v in _TIMERS.most_common()}


if TIMING_ON:
    @_atexit.register
    def _dump_timers():
        # stderr, NOT stdout: bench.py's one-line JSON contract requires the
        # summary to be the last stdout line (BENCH_r02 lost its headline to
        # this dump landing after the JSON)
        import sys as _sys
        for k, (v, c) in timing_report().items():
            print(f"[timing] {k}: {v}s over {c} calls", file=_sys.stderr)
