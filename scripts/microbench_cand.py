#!/usr/bin/env python
"""Microbenchmark the candidate-detection sub-stages on the attached TPU.

Times each jitted sub-stage of candidates_forward separately (hashing, CSR
lookup, hit expansion, sort+group, chain DP) at bench-representative shapes,
to locate where the ~300 ms/batch of cand.exec goes."""
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

from necat_tpu.index.kmer_index import (KmerIndex, _lookup_ranges,  # noqa: E402
                                        query_kmer_hashes)
from necat_tpu.io import simulate  # noqa: E402
from necat_tpu.io.readstore import ReadStore  # noqa: E402
from necat_tpu.overlap import candidates as C  # noqa: E402
from necat_tpu.overlap.chain import chain_pairs  # noqa: E402
from necat_tpu.overlap.options import MapOptions  # noqa: E402
from necat_tpu.utils.benchdata import gen_benchmark_reads  # noqa: E402


def t(fn, n=3):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    genome, store, _ = gen_benchmark_reads(genome_size=200_000, coverage=20,
                                           seed=7)
    opts = MapOptions()
    idx = KmerIndex.build(store.bases, store.offsets, k=opts.kmer_size,
                          occ_cutoff=opts.occ_cutoff)
    from necat_tpu.io.devstore import get_devstore
    qdev = get_devstore(store)
    B, L = 256, 16384
    qidx = np.argsort(store.lengths)[-B:]
    batch = qdev.read_rows(qidx, np.zeros(B, bool), L)
    lens = jnp.asarray(store.lengths[qidx].astype(np.int32))
    sub_off = jnp.asarray(store.offsets.astype(np.int32))
    soff_limit = jnp.full((B,), np.iinfo(np.int32).max, jnp.int32)
    k, shift = idx.k, 2 * idx.k - idx.n_bucket_bits

    qk = jax.jit(lambda: query_kmer_hashes(batch, lens, k, opts.scan_window))
    print(f"hashes: {t(qk):.1f}ms", flush=True)
    qh, qoffs, kvalid = qk()
    lk = jax.jit(lambda: _lookup_ranges(idx.sorted_hashes, idx.bucket_starts,
                                        qh, shift, idx.occ_cutoff,
                                        idx.n_search_steps))
    print(f"lookup: {t(lk):.1f}ms", flush=True)
    start, count = lk()
    count = jnp.where(kvalid, count, 0)
    for MH in (1 << 19, 1 << 21):
        ex = jax.jit(lambda MH=MH: C._expand_hits(
            start, count, idx.sorted_positions, soff_limit, MH))
        print(f"expand(max_hits={MH}): {t(ex):.1f}ms", flush=True)
    qrow, kcol, pos, valid, total = C._expand_hits(
        start, count, idx.sorted_positions, soff_limit, 1 << 21)
    print("  total hits:", int(total), flush=True)
    for MP in (8192, 32768):
        gp = jax.jit(lambda MP=MP: C._group_pairs(
            qrow, jnp.take(qoffs, kcol), pos, valid, sub_off, MP,
            opts.max_seeds_per_pair))
        print(f"group(max_pairs={MP}): {t(gp):.1f}ms", flush=True)
    g = C._group_pairs(qrow, jnp.take(qoffs, kcol), pos, valid, sub_off,
                       8192, opts.max_seeds_per_pair)
    print("  n_pairs:", int(g["n_pairs"]), flush=True)
    ch = jax.jit(lambda: chain_pairs(g["seed_q"], g["seed_s"], g["seed_mask"],
                                     opts.kmer_size, opts.chain_max_dist,
                                     opts.chain_bw))
    print(f"chain(P=8192,S=64): {t(ch):.1f}ms", flush=True)


if __name__ == "__main__":
    main()
