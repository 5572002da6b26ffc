#!/usr/bin/env python
"""Microbenchmark the extension-chunk pipeline stages on the attached TPU.

Times (steady-state, after one warmup) for a representative correction chunk:
  - _diag_sub_matrix_pallas (ENC build)
  - banded_forward_pallas
  - banded_backtrack_cols
  - full _extend_batch_jit (both sides fused)
  - scatter_chunk_mm
  - fused extend_scatter (the production program)
with varying real window lengths (lb) inside one tier, to verify the
dead-block skip actually saves wall clock.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("NECAT_TPU_JAX_CACHE",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
from necat_tpu.utils.device import setup_runtime  # noqa: E402
setup_runtime()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from necat_tpu.align import banded  # noqa: E402
from necat_tpu.align.pallas_banded import (  # noqa: E402
    _diag_sub_matrix_pallas, banded_backtrack_cols, banded_forward_pallas)
from necat_tpu.consensus import tags as tags_mod  # noqa: E402


def t(fn, *args, n=3, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    W = 128
    import ast
    cfgs = (ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else
            [(512, 16384, 1.0), (512, 16384, 0.5),
             (256, 32768, 1.0), (256, 32768, 0.5), (512, 8192, 1.0)])
    for (PB, L, real_frac) in cfgs:
        reallen = int(L * real_frac) - 64
        a = jnp.asarray(rng.integers(0, 4, (PB, L)), jnp.uint8)
        b = jnp.asarray(rng.integers(0, 4, (PB, L)), jnp.uint8)
        la = jnp.full((PB,), reallen, jnp.int32)
        lb = jnp.full((PB,), reallen, jnp.int32)
        dt_enc = t(lambda: _diag_sub_matrix_pallas(a, b, la, lb, W, L, CBLK=128))
        dt_fwd = t(lambda: banded_forward_pallas(a, b, la, lb, W, max_cols=L))
        dirs, offs, _, cost = banded_forward_pallas(a, b, la, lb, W, max_cols=L)
        dirs = jax.block_until_ready(dirs)
        dt_bt = t(lambda: banded_backtrack_cols(dirs, la, lb, W, max_cols=L))
        aq = la // 2
        at = lb // 2
        dt_all = t(lambda: banded._extend_batch_jit(
            a, la, b, lb, aq, at, W=W, tail_match=8, insb_words=1))
        out = banded._extend_batch_jit(a, la, b, lb, aq, at, W=W,
                                       tail_match=8, insb_words=1)
        TB, D = int(os.environ.get("MB_TB", 64)), 8
        wts = jnp.zeros((TB + 1, D, 5, L), jnp.float32)
        cov = jnp.zeros((TB + 1, L), jnp.int32)
        row = jnp.asarray(rng.integers(0, TB, PB), jnp.int32)
        w = jnp.ones((PB,), jnp.float32)
        ts = jnp.full((PB,), reallen, jnp.int32)

        def sc(wts, cov):
            return tags_mod.scatter_chunk_mm(
                wts, cov, out["left_cols"], (out["left_insb"],),
                out["left_lead"], out["left_leadb"], out["left_jc"],
                out["right_cols"], (out["right_insb"],), out["right_lead"],
                out["right_leadb"], out["right_jc"],
                at, row, w, ts)
        # donation: re-create tensors each call outside the timer is awkward;
        # time a jit wrapper without donation instead (upper bound)
        scj = jax.jit(sc)
        r = scj(wts, cov); jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = scj(wts, cov)
        jax.block_until_ready(r)
        dt_sc = (time.perf_counter() - t0) / 3
        print(f"PB={PB} L={L} real={reallen}: enc={dt_enc*1e3:.0f}ms "
              f"fwd={dt_fwd*1e3:.0f}ms bt={dt_bt*1e3:.0f}ms "
              f"extend_all={dt_all*1e3:.0f}ms scatter={dt_sc*1e3:.0f}ms",
              flush=True)


if __name__ == "__main__":
    main()
