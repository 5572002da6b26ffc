#!/usr/bin/env python
"""Benchmark: corrected reads/s on one chip for the standard synthetic dataset.

Runs the full correction stage (candidate detection + wave extension + tag
consensus) on the same simulated read set that the reference NECAT baseline was
measured on (BASELINE_MEASURED.json), and prints ONE JSON line:

  {"metric": "corrected_reads_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": ratio_vs_20thread_reference, ...}

The compilation cache warms across runs (first run on a fresh cache pays
tens of seconds of XLA/Mosaic compiles).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("NECAT_TPU_JAX_CACHE",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

from necat_tpu.utils.device import setup_runtime  # noqa: E402

setup_runtime()

import jax  # noqa: E402

from necat_tpu.consensus.correct import correct_reads  # noqa: E402
from necat_tpu.consensus.options import CnsOptions  # noqa: E402
from necat_tpu.overlap.candidates import Candidates  # noqa: E402
from necat_tpu.overlap.options import MapOptions  # noqa: E402
from necat_tpu.overlap.overlapper import find_all_candidates  # noqa: E402
from necat_tpu.utils.benchdata import gen_benchmark_reads  # noqa: E402


def main() -> int:
    genome_size = int(os.environ.get("BENCH_GENOME_SIZE", 200_000))
    coverage = float(os.environ.get("BENCH_COVERAGE", 20))
    genome, store, _ = gen_benchmark_reads(genome_size=genome_size,
                                           coverage=coverage, seed=7)
    max_hits = int(os.environ.get("BENCH_MAX_HITS", 1 << 21))
    from necat_tpu.utils.logging import timed
    t0 = time.time()
    with timed("bench.candidates"):
        cands = find_all_candidates(store, store,
                                    MapOptions(max_hits=max_hits, max_pairs=8192),
                                    pairwise=True)
        call = Candidates.concat([cands, cands.swap_roles()])
    with timed("bench.correct"):
        recs = correct_reads(store, call, CnsOptions())
    wall = time.time() - t0
    ncorr = len({r.tid for r in recs if r.corrected})
    reads_per_s = ncorr / wall

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    vs = None
    try:
        base = json.load(open(base_path))
        # scale the measured per-read baseline if the dataset size differs
        scale = (genome_size * coverage) / (200_000 * 20)
        ref = base["reads_per_second_20threads_extrapolated"]
        vs = round(reads_per_s / ref, 3) if scale == 1.0 else None
        if vs is None:
            vs = round(reads_per_s / ref, 3)  # per-read rate is size-invariant
    except Exception:
        vs = 0.0

    print(json.dumps({
        "metric": "corrected_reads_per_s_per_chip",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": vs,
        "corrected_reads": ncorr,
        "wall_s": round(wall, 1),
        "device": str(jax.devices()[0]),
        "dataset": f"synthetic {genome_size/1e3:.0f}kb x{coverage:.0f} ONT@15%err",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
