#!/usr/bin/env python
"""Measure the real engine.submit dispatch pipeline: N chunks enqueued
back-to-back (desc upload + fused gather+extend) then one sync — separates
per-dispatch enqueue cost from device execution."""

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

from necat_tpu.align.engine import DESC_COLS, gather_extend  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    NW = 4 * (1 << 20)  # 4M words = 64 Mb packed
    words = jnp.asarray(rng.integers(0, 1 << 32, NW, dtype=np.uint32))
    PB, L, W = 256, 20480, 128
    total_bases = NW * 16

    def make_desc(anchor_frac):
        desc = np.zeros((PB, len(DESC_COLS)), np.int32)
        qlen = np.full(PB, L - 300)
        desc[:, 0] = rng.integers(0, total_bases - L - 16, PB)   # qg
        desc[:, 1] = qlen                                        # qglen
        desc[:, 2] = rng.integers(0, 2, PB)                      # qrc
        desc[:, 3] = rng.integers(0, total_bases - L - 16, PB)   # tg
        desc[:, 4] = qlen                                        # tglen
        desc[:, 5] = qlen                                        # qlen
        desc[:, 6] = qlen                                        # tlen
        desc[:, 7] = (qlen * anchor_frac).astype(np.int32)       # aq
        desc[:, 8] = (qlen * anchor_frac).astype(np.int32)       # at
        return desc

    for frac, tag in ((0.5, "mid"), (0.1, "edge")):
        desc = make_desc(frac)
        out = gather_extend(words, words, jnp.asarray(desc), W=W, L=L)
        jax.block_until_ready(out["stats"])
        N = 6
        t0 = time.perf_counter()
        enq = []
        outs = []
        for i in range(N):
            t1 = time.perf_counter()
            o = gather_extend(words, words, jnp.asarray(desc), W=W, L=L)
            o["stats"].copy_to_host_async()
            enq.append(time.perf_counter() - t1)
            outs.append(o)
        t_enq = time.perf_counter() - t0
        for o in outs:
            np.asarray(o["stats"])
        t_all = time.perf_counter() - t0
        print(f"anchor={tag}: enqueue/chunk={t_enq/N*1e3:.0f} ms "
              f"(first {enq[0]*1e3:.0f}, rest {np.mean(enq[1:])*1e3:.0f}), "
              f"total/chunk={t_all/N*1e3:.0f} ms")


def alternation_test():
    """Does switching executables cost? Alternate two tiers + a scatter."""
    rng = np.random.default_rng(0)
    NW = 4 * (1 << 20)
    words = jnp.asarray(rng.integers(0, 1 << 32, NW, dtype=np.uint32))
    W = 128
    total_bases = NW * 16

    def desc_for(PB, L):
        desc = np.zeros((PB, len(DESC_COLS)), np.int32)
        qlen = np.full(PB, L - 300)
        desc[:, 0] = rng.integers(0, total_bases - L - 16, PB)
        desc[:, 1] = qlen
        desc[:, 3] = rng.integers(0, total_bases - L - 16, PB)
        desc[:, 4] = qlen
        desc[:, 5] = qlen
        desc[:, 6] = qlen
        desc[:, 7] = qlen // 2
        desc[:, 8] = qlen // 2
        return desc

    shapes = [(256, 20480), (256, 16384), (512, 12288)]
    descs = {s: jnp.asarray(desc_for(*s)) for s in shapes}
    for (PB, L), d in descs.items():
        o = gather_extend(words, words, d, W=W, L=L)
        jax.block_until_ready(o["stats"])
    # alternate
    t0 = time.perf_counter()
    outs = []
    N = 9
    for i in range(N):
        PB, L = shapes[i % len(shapes)]
        t1 = time.perf_counter()
        o = gather_extend(words, words, descs[(PB, L)], W=W, L=L)
        dt = time.perf_counter() - t1
        outs.append((o, dt))
    for o, _ in outs:
        np.asarray(o["stats"])
    t_all = time.perf_counter() - t0
    print("alternating tiers: enqueues [ms]:",
          [f"{dt*1e3:.0f}" for _, dt in outs],
          f"total/chunk={t_all/N*1e3:.0f} ms")


if __name__ == "__main__":
    import sys as _sys
    if "--alternation" in _sys.argv:
        alternation_test()
    else:
        main()
        alternation_test()
