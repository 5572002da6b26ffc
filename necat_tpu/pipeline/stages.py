"""Pipeline stage orchestration with Plgd-style resume.

Replaces the Perl job engine (Plgd/Project.pm runJob/serialRunJobs): each stage
writes its outputs plus a `.done.json` manifest (input fingerprints + params);
a stage re-runs only when an input changed or the manifest is missing —
the reference's "outputs newer than inputs AND .done has rc 0" skip rule
(Project.pm:131-177, Utils.pm:61-79). Stage layout mirrors necat.pl's project
directories (1-consensus, 2-trim_bases, 3-assembly, 4-fsa, 6-bridge_contigs).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import Callable, List

import numpy as np

from necat_tpu.assembly.contigs import AssembleOptions, assemble
from necat_tpu.assembly.overlap_filter import FilterOptions
from necat_tpu.consensus.correct import correct_reads
from necat_tpu.consensus.options import CnsOptions
from necat_tpu.io import seqio
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.candidates import Candidates
from necat_tpu.overlap.m4 import M4Records
from necat_tpu.overlap.options import MapOptions
from necat_tpu.overlap.overlapper import find_all_candidates, overlap_all_vs_all
from necat_tpu.parallel import launcher
from necat_tpu.pipeline.config import Config
from necat_tpu.polish.polish import PolishOptions, polish_contigs
from necat_tpu.trim.lcr import TrimOptions, trim_reads
from necat_tpu.utils.logging import logger


def _fingerprint(paths: List[str]) -> str:
    h = hashlib.sha256()
    for p in paths:
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


# bounded retry budget for a failing stage (the reference retries failed grid
# scripts with a global MAX_SCRIPT_ERROR error budget, Plgd/Project.pm:222-244)
MAX_STAGE_ERROR = int(os.environ.get("NECAT_TPU_MAX_STAGE_ERROR", "3"))


def _stage(workdir: str, name: str, ifiles: List[str], ofiles: List[str],
           params: dict, fn: Callable[[], None],
           coordinator_only: bool = False) -> bool:
    """Run fn unless outputs are up to date. Returns True if it ran.

    In multi-host runs (parallel/launcher.py), `coordinator_only` stages execute
    fn on process 0 while the others wait at the barrier; striped stages run fn
    on every host (fn itself stripes the work) and the manifest write is still
    coordinator-gated. Both ends with a barrier so downstream stages can read
    the outputs from the shared filesystem on any host.

    A failing fn is retried up to MAX_STAGE_ERROR times (Project.pm:222-244
    semantics); NECAT_TPU_PROFILE=<dir> wraps each stage in a jax.profiler
    trace (the TIMING_START/END role, ontcns_aux.h:107-116)."""
    os.makedirs(workdir, exist_ok=True)
    done_path = os.path.join(workdir, f"{name}.done.json")
    fp = _fingerprint(ifiles)
    pjson = json.dumps(params, sort_keys=True, default=str)
    if os.path.exists(done_path) and all(os.path.exists(o) for o in ofiles):
        try:
            d = json.load(open(done_path))
            if d.get("input_fp") == fp and d.get("params") == pjson and d.get("rc") == 0:
                logger.info("stage %s: up to date, skipping", name)
                return False
        except Exception:
            pass
    logger.info("stage %s: running", name)
    t0 = time.time()
    if not coordinator_only or launcher.is_coordinator():
        prof_dir = os.environ.get("NECAT_TPU_PROFILE")
        attempts = 0
        while True:
            try:
                if prof_dir:
                    import jax

                    with jax.profiler.trace(os.path.join(prof_dir, name)):
                        fn()
                else:
                    fn()
                break
            except Exception:
                attempts += 1
                if attempts >= MAX_STAGE_ERROR:
                    logger.error("stage %s: failed %d times, giving up",
                                 name, attempts)
                    raise
                logger.warning("stage %s: attempt %d failed, retrying",
                               name, attempts, exc_info=True)
                # a RESOURCE_EXHAUSTED dispatch leaves HBM full of cached
                # device stores/indexes/executable temps; drop them so the
                # retry starts into a clean device (re-upload + reload from
                # the persistent compile cache is far cheaper than a dead run)
                from necat_tpu.utils.device import release_device_caches
                release_device_caches()
    launcher.barrier(f"stage:{name}")
    if launcher.is_coordinator():
        json.dump({"input_fp": fp, "params": pjson, "rc": 0,
                   "wall_s": round(time.time() - t0, 1)}, open(done_path, "w"))
    launcher.barrier(f"stage:{name}:done")
    logger.info("stage %s: done in %.1fs", name, time.time() - t0)
    return True


def _read_input_list(cfg: Config) -> List[str]:
    files = []
    with open(cfg.read_list) as f:
        for line in f:
            line = line.strip()
            if line:
                files.append(line)
    return files


def load_raw_reads(cfg: Config, keep_coverage: float = 0.0) -> ReadStore:
    """Load the input read set.

    With keep_coverage > 0 (and a genome size), loading is two-pass: pass 1
    visits one file at a time and keeps only LENGTHS; the global
    longest-to-coverage keep set (identical to
    ReadStore.longest_to_coverage over the concatenated order) is computed
    from those; pass 2 reloads each file and keeps only its selected reads.
    Peak memory is the kept set plus ONE input file — not every input store
    at once (the reference never holds all inputs either: oc2mkdb packs per
    2 GB volume, makedb/main.c:8)."""
    paths = _read_input_list(cfg)
    if keep_coverage <= 0 or cfg.genome_size <= 0:
        return ReadStore.concat(
            [ReadStore.from_fasta(p, min_length=cfg.min_read_length)
             for p in paths])
    lens_per_file = []
    for p in paths:
        st = ReadStore.from_fasta(p, min_length=cfg.min_read_length)
        lens_per_file.append(st.lengths.copy())
        del st
    all_lens = np.concatenate(lens_per_file)
    target = int(cfg.genome_size * keep_coverage)
    order = np.argsort(all_lens, kind="stable")[::-1]
    csum = np.cumsum(all_lens[order])
    n_keep = min(int(np.searchsorted(csum, target)) + 1, len(all_lens))
    keep = np.sort(order[:n_keep])
    parts = []
    base = 0
    for p, fl in zip(paths, lens_per_file):
        sel = keep[(keep >= base) & (keep < base + len(fl))] - base
        st = ReadStore.from_fasta(p, min_length=cfg.min_read_length)
        parts.append(st.subset(sel) if len(sel) != st.n_reads else st)
        base += len(fl)
    return ReadStore.concat(parts)


@dataclasses.dataclass
class Project:
    cfg: Config
    root: str

    def __post_init__(self):
        os.makedirs(self.root, exist_ok=True)

    def path(self, *parts) -> str:
        return os.path.join(self.root, *parts)

    def _vol_size(self, store: ReadStore) -> int:
        """Subject-volume size for all-vs-all overlap stages: explicit
        VOL_SIZE, else automatic 2 GB volumes when the read set exceeds the
        device word store's 2^31-base bound (oc2mkdb, makedb/main.c:8)."""
        vol = int(float(self.cfg.get("VOL_SIZE", "0") or 0))
        if vol <= 0 and store.total_bases >= (1 << 31):
            vol = 2_000_000_000
        return vol

    def _opt_params(self, *keys: str) -> dict:
        """Every config option string a stage consumes, for its manifest:
        editing e.g. FSA_OL_FILTER_OPTIONS must invalidate the assemble
        stage's .done manifest and force a rerun (the reference reruns when
        the generated script text changes, Plgd/Project.pm:131-177)."""
        return {k: self.cfg.get(k, "") for k in keys}

    # ------------------------------------------------------------------ stages
    def run_correct(self) -> str:
        """necat.pl correct (runConsensus, :420-520). Returns cns_final path."""
        cfg = self.cfg
        wd = self.path("1-consensus")
        out = os.path.join(wd, "cns_final.fasta.gz")
        ifiles = _read_input_list(cfg)

        def fn():
            pid, nproc = launcher.init_multihost()
            # prep: longest reads to PREP_OUTPUT_COVERAGE (runCnsPrepare),
            # selected during loading so only the kept set is materialized
            cur = load_raw_reads(cfg, keep_coverage=cfg.prep_output_coverage)
            for it in range(cfg.num_iter):
                logger.info("correction iteration %d/%d: %d reads",
                            it + 1, cfg.num_iter, cur.n_reads)
                # iteration 1 maps sensitive / later iterations fast, with
                # rescue on for fast and -f per last-iteration — exactly
                # runCnsAlign/runCnsCorrect (necat.pl:165-173, 250-261)
                if it == 0:
                    mopts = MapOptions.from_string(
                        cfg.get("OVLP_SENSITIVE_OPTIONS", ""))
                    copts = CnsOptions.from_string(
                        cfg.get("CNS_SENSITIVE_OPTIONS", "") + " -r 0")
                else:
                    mopts = MapOptions.from_string(
                        cfg.get("OVLP_FAST_OPTIONS", ""))
                    copts = CnsOptions.from_string(
                        cfg.get("CNS_FAST_OPTIONS", "") + " -r 1")
                copts = dataclasses.replace(
                    copts, full_consensus=(it + 1 != cfg.num_iter),
                    small_memory=cfg.get("SMALL_MEMORY", "0").strip()
                    in ("1", "true"))
                # volume tiling (oc2mkdb 2 GB volumes, makedb/main.c:8):
                # explicit VOL_SIZE, or automatic when the read set exceeds
                # the device word store's 2^31-base bound
                vol_size = self._vol_size(cur)
                if vol_size > 0:
                    from necat_tpu.overlap.overlapper import candidates_by_volumes
                    cands = candidates_by_volumes(cur, mopts, vol_size)
                else:
                    cands = find_all_candidates(cur, cur, mopts, pairwise=True)
                call = Candidates.concat([cands, cands.swap_roles()])
                stripe = (launcher.host_stripe(cur.n_reads, pid, nproc)
                          if nproc > 1 else None)
                recs = correct_reads(cur, call, copts, template_ids=stripe)
                recs.sort(key=lambda r: (r.tid, r.left))  # oc2ReorderCnsReads role
                if it + 1 == cfg.num_iter:
                    # final extract reads ONLY cns.fasta (runCnsExtract,
                    # necat.pl:397-416): raw-passthrough pieces and whole
                    # uncorrected reads go to raw.fasta and never reach
                    # cns_final — keeping them dragged corrected-read (and
                    # hence contig) identity down ~0.3-1 pp
                    recs = [r for r in recs if r.corrected]
                seqs = [r.seq for r in recs]
                names = [f"{r.tid}_{r.left}_{r.right}_{r.org_size}" for r in recs]
                if nproc > 1:
                    # shared-filesystem exchange of per-host stripes (the role of
                    # the reference's per-node cns partial files merged by
                    # oc2ReorderCnsReads): every host writes its part, then all
                    # hosts reload the union sorted back into (tid, left) order
                    # so multi-host output is bit-identical to single-host.
                    ReadStore.from_seqs(seqs, names).to_fasta(
                        os.path.join(wd, f"it{it}.part{pid}.fasta.gz"))
                    launcher.barrier(f"correct:it{it}")
                    merged = ReadStore.concat(
                        [ReadStore.from_fasta(
                            os.path.join(wd, f"it{it}.part{p}.fasta.gz"))
                         for p in range(nproc)])
                    order = sorted(
                        range(merged.n_reads),
                        key=lambda i: tuple(map(int,
                                                merged.names[i].split("_")[:2])))
                    cur = merged.subset(np.array(order, np.int64))
                else:
                    cur = ReadStore.from_seqs(seqs, names)
            # extract longest corrected to CNS_OUTPUT_COVERAGE (runCnsExtract)
            if cfg.genome_size > 0:
                keep = cur.longest_to_coverage(cfg.genome_size, cfg.cns_output_coverage)
                cur = cur.subset(keep)
            cur.to_fasta(out)
            n50, _ = cur.n50()
            logger.info("cns_final: %d reads, %d bases, N50 %d",
                        cur.n_reads, cur.total_bases, n50)

        params = {"num_iter": cfg.num_iter, "cov": cfg.prep_output_coverage,
                  "cns_cov": cfg.cns_output_coverage,
                  "min_read_length": cfg.min_read_length,
                  **self._opt_params("OVLP_SENSITIVE_OPTIONS",
                                     "CNS_SENSITIVE_OPTIONS",
                                     "OVLP_FAST_OPTIONS", "CNS_FAST_OPTIONS",
                                     "SMALL_MEMORY")}
        _stage(wd, "correct", ifiles, [out], params, fn)
        return out

    def run_trim(self) -> str:
        """Trim stage (runTrimBases*): returns trimReads path."""
        cns = self.run_correct()
        wd = self.path("2-trim_bases")
        out = self.path("trimReads.fasta.gz")

        method = (self.cfg.get("TRIM_METHOD", "fast").strip() or "fast")

        def fn():
            reads = ReadStore.from_fasta(cns)
            mopts = MapOptions.from_string(
                self.cfg.get("TRIM_OVLP_OPTIONS", ""),
                MapOptions(ncan=100, n_chains_per_pair=2))
            m4 = overlap_all_vs_all(reads, mopts,
                                    vol_size=self._vol_size(reads))
            if method in ("accurate", "accurate0"):
                # TRIM_METHOD selection (necat.pl:1196-1210): the accurate
                # variants re-consensus each read over its cover range
                from necat_tpu.trim.accurate import trim_reads_accurate
                trimmed, kept, ranges = trim_reads_accurate(reads, m4)
            else:
                trimmed, kept, ranges = trim_reads(reads, m4, TrimOptions())
            trimmed.to_fasta(out)
            logger.info("trimmed (%s): %d/%d reads kept", method,
                        trimmed.n_reads, reads.n_reads)

        _stage(wd, "trim", [cns], [out],
               {"method": method, **self._opt_params("TRIM_OVLP_OPTIONS")},
               fn, coordinator_only=True)
        return out

    def run_assemble(self) -> str:
        """Assembly (runAlignReads + runAssemble): returns contigs path."""
        trimmed_path = self.run_trim()
        wd = self.path("4-fsa")
        out = os.path.join(wd, "contigs.fasta")

        def fn():
            trimmed = ReadStore.from_fasta(trimmed_path)
            mopts = MapOptions.from_string(
                self.cfg.get("ASM_OVLP_OPTIONS", ""),
                MapOptions(ncan=100, n_chains_per_pair=2))
            m4 = overlap_all_vs_all(trimmed, mopts,
                                    vol_size=self._vol_size(trimmed))
            os.makedirs(wd, exist_ok=True)
            m4.save(os.path.join(wd, "pm.m4.gz"))
            # FSA_* option strings are passed verbatim to the fsa layer, like
            # necat.pl passes them to the binaries (necat.pl:1228-1245)
            fopts = FilterOptions.from_string(
                self.cfg.get("FSA_OL_FILTER_OPTIONS", ""))
            aopts = AssembleOptions.from_string(
                self.cfg.get("FSA_ASSEMBLE_OPTIONS", ""))
            res = assemble(trimmed, m4, fopts,
                           min_contig_length=aopts.min_contig_length,
                           max_spur_length=aopts.max_spur_length,
                           select_branch=aopts.select_branch)
            res.contigs.to_fasta(out)
            res.bubbles.to_fasta(os.path.join(wd, "bubbles.fasta"))
            with open(os.path.join(wd, "contig_tiles"), "w") as f:
                for ci, tiles in enumerate(res.tiles):
                    for t in tiles:
                        f.write(f"ctg{ci}\t{t.read}\t{t.orient}\t{t.ctg_start}\t{t.ctg_end}\n")
            with open(os.path.join(wd, "bubble_tiles"), "w") as f:
                for bi, tiles in enumerate(res.bubble_tiles):
                    for t in tiles:
                        f.write(f"{res.bubbles.names[bi]}\t{t.read}\t{t.orient}\t"
                                f"{t.ctg_start}\t{t.ctg_end}\n")
            # ol_filter's readinfos + coverage dumps (overlap_filter.hpp:
            # 162-167): per-read mean identity and coverage min/max, plus the
            # auto params the bridge stage consumes (contig_bridge.cpp:197-290)
            json.dump({"min_identity": res.min_identity,
                       "max_overhang": res.max_overhang},
                      open(os.path.join(wd, "readinfos.json"), "w"))
            if res.read_ident is not None:
                with open(os.path.join(wd, "readinfos.txt"), "w") as f:
                    for r in range(len(res.read_ident)):
                        if np.isnan(res.read_ident[r]):
                            continue
                        cmin, cmax = (res.read_cov[r] if res.read_cov is not None
                                      else (0, 0))
                        f.write(f"{r}\t{res.read_ident[r]:.2f}\t{cmin}\t{cmax}\n")
            n50, _ = res.contigs.n50()
            logger.info("contigs: %d, total %d, N50 %d",
                        res.contigs.n_reads, res.contigs.total_bases, n50)

        _stage(wd, "assemble", [trimmed_path], [out],
               self._opt_params("ASM_OVLP_OPTIONS", "FSA_OL_FILTER_OPTIONS",
                                "FSA_ASSEMBLE_OPTIONS"),
               fn, coordinator_only=True)
        return out

    def run_bridge(self) -> str:
        """Bridge stage (runAlignContigs + runBridgeContigs)."""
        ctg_path = self.run_assemble()
        wd = self.path("6-bridge_contigs")
        out = os.path.join(wd, "bridged_contigs.fasta")

        def fn():
            from necat_tpu.bridge.bridge import BridgeOptions, bridge_contigs
            contigs = ReadStore.from_fasta(ctg_path)
            reads = load_raw_reads(self.cfg)
            bopts = BridgeOptions.from_string(
                self.cfg.get("FSA_CTG_BRIDGE_OPTIONS", ""))
            ri_path = self.path("4-fsa", "readinfos.json")
            readinfos = None
            if os.path.exists(ri_path):
                try:
                    readinfos = json.load(open(ri_path))
                except Exception:
                    pass
            bridged = bridge_contigs(contigs, reads, opts=bopts,
                                     readinfos=readinfos)
            bridged.to_fasta(out)

        _stage(wd, "bridge", [ctg_path], [out],
               self._opt_params("FSA_CTG_BRIDGE_OPTIONS"),
               fn, coordinator_only=True)
        return out

    def cleanup(self) -> None:
        """CLEANUP=1: delete intermediate files after a successful run (the
        reference's mfiles deletion, Plgd/Project.pm:168-170). Stage outputs
        and .done manifests are kept so resume still works."""
        import glob

        patterns = ["1-consensus/it*.part*.fasta.gz", "4-fsa/pm.m4.gz",
                    "*-polish/part*.fasta.gz"]
        for pat in patterns:
            for p in glob.glob(self.path(pat)):
                try:
                    os.remove(p)
                    logger.info("cleanup: removed %s", p)
                except OSError:
                    pass

    def run_polish(self, ctg_path: str, tag: str) -> str:
        wd = self.path(f"{tag}-polish")
        out = self.path(f"polished_contigs.fasta" if tag == "final" else f"{tag}_polished.fasta")

        def fn():
            pid, nproc = launcher.init_multihost()
            contigs = ReadStore.from_fasta(ctg_path)
            reads = load_raw_reads(self.cfg)
            if nproc > 1:
                # stripe contigs across hosts (the reference polishes per-contig
                # partitions per grid job); merge back in original contig order.
                stripe = launcher.host_stripe(contigs.n_reads, pid, nproc)
                part = polish_contigs(contigs.subset(stripe), reads)
                part.to_fasta(os.path.join(wd, f"part{pid}.fasta.gz"))
                launcher.barrier("polish:parts")
                if not launcher.is_coordinator():
                    return
                parts = [ReadStore.from_fasta(os.path.join(wd, f"part{p}.fasta.gz"))
                         for p in range(nproc)]
                by_name = {s.names[i]: s.get(i) for s in parts
                           for i in range(s.n_reads)}
                names = [f"{n}_polished" for n in contigs.names]
                pol = ReadStore.from_seqs([by_name[n] for n in names], names)
            else:
                pol = polish_contigs(contigs, reads)
            pol.to_fasta(out)
            n50, _ = pol.n50()
            logger.info("polished: %d contigs, total %d, N50 %d",
                        pol.n_reads, pol.total_bases, n50)

        _stage(wd, "polish", [ctg_path], [out],
               self._opt_params("POLISH_OVLP_OPTIONS", "POLISH_CNS_OPTIONS"),
               fn)
        return out
