#!/usr/bin/env python
"""Benchmark: corrected reads/s on one chip for the standard synthetic dataset.

Runs the full correction stage (candidate detection + wave extension + tag
consensus) on the same simulated read set that the reference NECAT baseline was
measured on (BASELINE_MEASURED.json), and prints ONE JSON line:

  {"metric": "corrected_reads_per_s_per_chip", "value": N, "unit": "reads/s",
   "vs_baseline": ratio_vs_20thread_reference, "breakdown": {...},
   "pallas_check": "pass", "accuracy_ident_pct": ...}

vs_baseline divides by the reference's 20-thread-extrapolated per-read rate
(BASELINE_MEASURED.json); the per-read rate is dataset-size invariant, so the
ratio holds for BENCH_GENOME_SIZE/BENCH_COVERAGE overrides too.

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
os.environ.setdefault("NECAT_TPU_TIMING", "1")

from necat_tpu.utils.device import setup_runtime  # noqa: E402

setup_runtime()

import numpy as np  # noqa: E402
import jax  # noqa: E402

from necat_tpu.consensus.correct import correct_reads  # noqa: E402
from necat_tpu.consensus.options import CnsOptions  # noqa: E402
from necat_tpu.io import simulate  # noqa: E402
from necat_tpu.overlap.candidates import Candidates  # noqa: E402
from necat_tpu.overlap.options import MapOptions  # noqa: E402
from necat_tpu.overlap.overlapper import find_all_candidates  # noqa: E402
from necat_tpu.utils.benchdata import gen_benchmark_reads  # noqa: E402
from necat_tpu.utils.logging import timed, timing_report  # noqa: E402


def check_pallas() -> str:
    """A/B the Pallas forward/backtrack against the lax.scan oracle ON THE
    BENCH BACKEND (the oracle tests only run on CPU, where Pallas is skipped).

    Gated behind BENCH_CHECK_PALLAS=1: the NO_PALLAS scan path on TPU costs
    minutes of compile+run that are NOT part of the measured metric (round-2
    bench spent ~45 min of process wall outside the timed region)."""
    if os.environ.get("BENCH_CHECK_PALLAS", "0") != "1":
        return "skipped(gated; BENCH_CHECK_PALLAS=1 enables)"
    if jax.default_backend() != "tpu":
        return "skipped(cpu)"
    import jax.numpy as jnp
    from necat_tpu.align import banded
    rng = np.random.default_rng(42)
    em = simulate.ErrorModel(sub=0.05, ins=0.05, dele=0.05)
    P, L, W = 8, 2048, 128
    a = np.zeros((P, L), np.uint8)
    b = np.zeros((P, L), np.uint8)
    ql = np.zeros(P, np.int32)
    tl = np.zeros(P, np.int32)
    aq = np.zeros(P, np.int32)
    at = np.zeros(P, np.int32)
    for i in range(P):
        t = rng.integers(0, 4, int(rng.integers(1200, 1900))).astype(np.uint8)
        q = simulate.mutate(t, em, rng)[:L]
        a[i, :len(q)] = q
        b[i, :len(t)] = t
        ql[i], tl[i] = len(q), len(t)
        aq[i], at[i] = len(q) // 2, len(q) // 2
    args = tuple(jnp.asarray(x) for x in (a, ql, b, tl, aq, at))
    res_p = banded.extend_batch(*args, W=W)
    os.environ["NECAT_TPU_NO_PALLAS"] = "1"
    try:
        res_s = banded.extend_batch(*args, W=W)
    finally:
        del os.environ["NECAT_TPU_NO_PALLAS"]
    same_ident = np.allclose(np.asarray(res_p.ident), np.asarray(res_s.ident),
                             atol=2.0)
    same_cols = (np.abs(np.asarray(res_p.n_cols) - np.asarray(res_s.n_cols))
                 <= 0.02 * np.maximum(np.asarray(res_s.n_cols), 1)).all()
    # static vs adaptive band schedules may pick slightly different co-optimal
    # paths; endpoints and identity must agree closely
    return "pass" if (same_ident and same_cols) else "FAIL"


def accuracy_sample(recs, reads, genome, st, sd, ln, n_sample=24):
    idents = []
    for r in recs:
        if not r.corrected or len(idents) >= n_sample:
            continue
        i = r.tid
        frac_l, frac_r = r.left / len(reads[i]), r.right / len(reads[i])
        s0, L0 = int(st[i]), int(ln[i])
        if sd[i] == 0:
            a, b = s0 + int(frac_l * L0), s0 + int(frac_r * L0)
        else:
            a, b = s0 + int((1 - frac_r) * L0), s0 + int((1 - frac_l) * L0)
        if b - a < 2000:
            continue
        seq = r.seq if sd[i] == 0 else (3 - r.seq[::-1]).astype(np.uint8)
        idents.append(simulate.identity_to_genome(seq, genome, a, 0, b - a))
    return round(float(np.mean(idents)), 2) if idents else None


def main() -> int:
    genome_size = int(os.environ.get("BENCH_GENOME_SIZE", 200_000))
    coverage = float(os.environ.get("BENCH_COVERAGE", 20))
    genome, store, (st, sd, ln) = gen_benchmark_reads(genome_size=genome_size,
                                                      coverage=coverage, seed=7)
    reads = [store.get(i) for i in range(store.n_reads)]
    pallas_check = check_pallas()
    mopts = MapOptions()
    if "BENCH_MAX_HITS" in os.environ:
        mopts = MapOptions(max_hits=int(os.environ["BENCH_MAX_HITS"]))
    copts = CnsOptions()
    if "BENCH_BAND" in os.environ:
        import dataclasses as _dc
        copts = _dc.replace(copts, band_width=int(os.environ["BENCH_BAND"]))

    # Two passes: the first pays one-time per-process costs that are artifacts
    # of the tunnel-attached device (5-10 s PER EXECUTABLE to load compiled
    # programs into the device, even on persistent-cache hits — a local
    # PCIe-attached TPU loads in ~ms). The SECOND pass is the steady-state
    # production rate and is the headline; cold wall is reported alongside.
    passes = int(os.environ.get("BENCH_PASSES", 2))
    walls = []
    snaps = []
    for p_ in range(max(passes, 1)):
        if p_ == passes - 1 and os.environ.get("BENCH_SYNC_LAST_PASS"):
            # profiling aid: serialize dispatches on the last pass so the
            # per-chunk exec timers (cns.fused_exec_*) capture device time
            os.environ["NECAT_TPU_SYNC_DISPATCH"] = "1"
        t0 = time.time()
        with timed("bench.candidates"):
            cands = find_all_candidates(store, store, mopts, pairwise=True)
            call = Candidates.concat([cands, cands.swap_roles()])
        with timed("bench.correct"):
            recs = correct_reads(store, call, copts)
        walls.append(time.time() - t0)
        snaps.append({k: v for k, (v, _) in timing_report().items()})
    wall = walls[-1]
    # last-pass-only timer deltas: the steady-state breakdown (cumulative
    # timers fold the cold pass's one-time executable loads into every key)
    steady = {}
    if len(snaps) >= 2:
        prev = snaps[-2]
        steady = {k: round(v - prev.get(k, 0.0), 2)
                  for k, v in snaps[-1].items()
                  if v - prev.get(k, 0.0) >= 0.01}
        steady = dict(sorted(steady.items(), key=lambda kv: -kv[1]))
    ncorr = len({r.tid for r in recs if r.corrected})
    reads_per_s = ncorr / wall

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
    try:
        ref = json.load(open(base_path))["reads_per_second_20threads_extrapolated"]
        vs = round(reads_per_s / ref, 3)
    except Exception:
        vs = 0.0

    # ---------------- full-pipeline per-stage steady times (VERDICT r3 #2):
    # drive correct -> trim -> assemble -> bridge -> polish through the real
    # Project stages on the same dataset; executables are already loaded from
    # the passes above, so these walls are steady-state stage costs.
    t_extra0 = time.time()
    extra_budget = float(os.environ.get("BENCH_EXTRA_BUDGET_S", 2400))
    stages = {}
    if os.environ.get("BENCH_PIPELINE", "1") != "0":
        import shutil
        import tempfile

        from necat_tpu.pipeline.config import load_config
        from necat_tpu.pipeline.stages import Project

        wd = tempfile.mkdtemp(prefix="bench_pipe_")
        try:
            reads_path = os.path.join(wd, "reads.fasta")
            store.to_fasta(reads_path)
            rl = os.path.join(wd, "read_list.txt")
            with open(rl, "w") as f:
                f.write(reads_path + "\n")
            cfg_path = os.path.join(wd, "run.cfg")
            with open(cfg_path, "w") as f:
                f.write(f"PROJECT={wd}/prj\nONT_READ_LIST={rl}\n"
                        f"GENOME_SIZE={genome_size}\nNUM_ITER=1\n"
                        "MIN_READ_LENGTH=3000\nPREP_OUTPUT_COVERAGE=40\n"
                        "CNS_OUTPUT_COVERAGE=30\nPOLISH_CONTIGS=true\n")
            prj = Project(load_config(cfg_path), os.path.join(wd, "prj"))
            for name, fn_ in (("correct", prj.run_correct),
                              ("trim", prj.run_trim),
                              ("assemble", prj.run_assemble),
                              ("bridge", prj.run_bridge)):
                t0 = time.time()
                out_path = fn_()
                stages[f"{name}_s"] = round(time.time() - t0, 1)
            t0 = time.time()
            prj.run_polish(out_path, "final")
            stages["polish_s"] = round(time.time() - t0, 1)
        except Exception as e:  # the headline must still print
            stages["error"] = f"{type(e).__name__}: {e}"
        finally:
            shutil.rmtree(wd, ignore_errors=True)

    # ---------------- E. coli-scale steady rate (VERDICT r3 #9): same recipe
    # at 4.6 Mb x 40X so the README headline is driver-reproducible. One pass
    # — the executables are warm, so this is the steady rate.
    ecoli = {}
    if time.time() - t_extra0 > extra_budget:
        ecoli = {"skipped": f"extra budget {extra_budget:.0f}s exhausted"}
    elif os.environ.get("BENCH_ECOLI", "1") != "0":
        try:
            _, est, _ = gen_benchmark_reads(genome_size=4_600_000,
                                            coverage=40, seed=7)
            t0 = time.time()
            ecands = find_all_candidates(est, est, mopts, pairwise=True)
            ecall = Candidates.concat([ecands, ecands.swap_roles()])
            erecs = correct_reads(est, ecall, copts)
            ewall = time.time() - t0
            encorr = len({r.tid for r in erecs if r.corrected})
            ecoli = {"reads_per_s": round(encorr / ewall, 1),
                     "corrected_reads": encorr, "wall_s": round(ewall, 1),
                     "n_reads": est.n_reads,
                     "dataset": "synthetic 4.6Mb x40 ONT@15%err"}
        except Exception as e:
            ecoli = {"error": f"{type(e).__name__}: {e}"}

    breakdown = {k: v for k, (v, _) in timing_report().items()}
    print(json.dumps({
        "metric": "corrected_reads_per_s_per_chip",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": vs,
        "corrected_reads": ncorr,
        "wall_s": round(wall, 1),
        "cold_wall_s": round(walls[0], 1),
        "accuracy_ident_pct": accuracy_sample(recs, reads, genome, st, sd, ln),
        "pallas_check": pallas_check,
        "device": str(jax.devices()[0]),
        "dataset": f"synthetic {genome_size/1e3:.0f}kb x{coverage:.0f} ONT@15%err",
        "breakdown": breakdown,
        "breakdown_steady": steady,
        "stages": stages,
        "ecoli": ecoli,
    }))
    # the JSON summary must be the LAST stdout line (the driver tails stdout);
    # timing dumps go to stderr (utils/logging.py)
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
