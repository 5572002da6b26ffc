"""Shared benchmark dataset generator (used by bench.py and the reference
baseline run so both see identical reads)."""

from __future__ import annotations

import os

import numpy as np

from necat_tpu.io import simulate
from necat_tpu.io.readstore import ReadStore


def gen_benchmark_reads(genome_size: int = 500_000, coverage: float = 30.0,
                        seed: int = 1234):
    """ONT-like raw reads from a random genome (the E. coli 40X stand-in,
    scaled). Returns (genome, ReadStore)."""
    genome = simulate.random_genome(genome_size, seed=seed)
    em = simulate.ErrorModel(sub=0.05, ins=0.05, dele=0.05)
    reads, st, sd, ln = simulate.simulate_reads(
        genome, coverage=coverage, mean_len=12000, min_len=3000, max_len=40000,
        em=em, seed=seed + 1)
    return genome, ReadStore.from_seqs(reads), (st, sd, ln)


def write_benchmark_fasta(path: str | os.PathLike, genome_size: int = 500_000,
                          coverage: float = 30.0, seed: int = 1234) -> int:
    _, store, _ = gen_benchmark_reads(genome_size, coverage, seed)
    store.to_fasta(path)
    return store.n_reads
