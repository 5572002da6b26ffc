#!/usr/bin/env python
"""Micro-profile the extension + scatter sub-kernels at production shapes.

Times each stage of the fused extension program separately (diagonalizer,
forward DP, backtrack, clip/stats, row-shift gathers) and the MM scatter,
so optimization effort goes where the wall time is.
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


def bench(fn, *args, n=3, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    from necat_tpu.align import banded
    from necat_tpu.align.pallas_banded import (_diag_sub_matrix_pallas,
                                               banded_backtrack_cols,
                                               banded_forward_pallas)

    PB, L, W = 256, 20480, 128
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, (PB, L)).astype(np.uint8)
    b = rng.integers(0, 4, (PB, L)).astype(np.uint8)
    la = np.full(PB, L - 200, np.int32)
    lb = np.full(PB, L - 100, np.int32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    laj, lbj = jnp.asarray(la), jnp.asarray(lb)

    t_diag = bench(_diag_sub_matrix_pallas, aj, bj, laj, lbj, W, L, 128)
    print(f"diag_sub_matrix: {t_diag*1e3:.1f} ms  "
          f"({PB*L*W/t_diag/1e9:.1f} Gcell/s)")

    t_fwd = bench(banded_forward_pallas, aj, bj, laj, lbj, W, L)
    print(f"forward(total incl diag): {t_fwd*1e3:.1f} ms")

    dirs, offs, _, cost = banded_forward_pallas(aj, bj, laj, lbj, W, L)
    dirs = jax.block_until_ready(dirs)
    t_bt = bench(banded_backtrack_cols, dirs, laj, lbj, W, L)
    print(f"backtrack: {t_bt*1e3:.1f} ms")

    cols, insb, lead = banded_backtrack_cols(dirs, laj, lbj, W, L)
    cols = jax.block_until_ready(cols)
    t_clip = bench(jax.jit(banded.cols_clip_stats), cols, lead, aj, bj)
    print(f"cols_clip_stats: {t_clip*1e3:.1f} ms")

    from necat_tpu.consensus.tags import _row_shift
    sh = jnp.asarray(rng.integers(0, L, PB).astype(np.int32))
    t_shift = bench(jax.jit(_row_shift), aj.astype(jnp.int32), sh)
    print(f"row_shift [PB,L]: {t_shift*1e3:.1f} ms")

    # full fused extension
    anq = jnp.asarray(np.full(PB, L // 2, np.int32))
    ant = jnp.asarray(np.full(PB, L // 2, np.int32))
    t_ext = bench(banded._extend_batch_jit, aj, laj, bj, lbj, anq, ant,
                  W=W, tail_match=8, insb_words=1)
    cells = PB * L * W * 2
    print(f"extend_batch fused: {t_ext*1e3:.1f} ms "
          f"({cells/t_ext/1e9:.1f} Gcell/s both sides)")

    # scatter at production shape
    from necat_tpu.consensus import tags as tags_mod
    TB, D, Lt = 64, 8, 20480
    weights = jnp.zeros((TB + 1, D, 5, Lt), jnp.float32)
    covten = jnp.zeros((TB + 1, Lt), jnp.int32)
    colsX = jnp.asarray(rng.integers(0, 1 << 10, (PB, Lt)).astype(np.int32))
    insbX = jnp.asarray(rng.integers(0, 1 << 28, (PB, Lt)).astype(np.int32))
    leadX = jnp.asarray(rng.integers(0, 7, PB).astype(np.int32))
    leadbX = jnp.asarray(rng.integers(0, 4, (PB, 7)).astype(np.int32))
    jcX = jnp.asarray(np.full(PB, Lt - 300, np.int32))
    atX = jnp.asarray(rng.integers(0, 200, PB).astype(np.int32))
    rowX = jnp.asarray(rng.integers(0, TB, PB).astype(np.int32))
    wX = jnp.asarray(np.ones(PB, np.float32))
    tszX = jnp.asarray(np.full(PB, Lt - 10, np.int32))

    def run_scatter(w, c):
        return tags_mod.scatter_chunk_mm(w, c, colsX, insbX, leadX, leadbX,
                                         jcX, colsX, insbX, leadX, leadbX,
                                         jcX, atX, rowX, wX, tszX)

    # donation: rebuild tensors each call
    r = run_scatter(weights, covten)
    jax.block_until_ready(r)
    w2, c2 = r
    t0 = time.perf_counter()
    n = 4
    for _ in range(n):
        w2, c2 = run_scatter(w2, c2)
    jax.block_until_ready((w2, c2))
    t_sc = (time.perf_counter() - t0) / n
    print(f"scatter_chunk_mm [PB={PB},Lt={Lt},TB={TB},D={D}]: {t_sc*1e3:.1f} ms")


if __name__ == "__main__":
    main()
