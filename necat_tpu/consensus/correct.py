"""Read correction driver: candidates -> wave-based extension -> tag consensus.

Batched re-design of consensus_one_read (src/consensus/consensus_one_read.c:215-392):
templates are bucketed (TB per consensus tensor) and grouped into SUPERGROUPS
whose waves run as one global, fully-asynchronous dispatch stream: every
extension chunk of a wave (all buckets) is dispatched before the first stats
sync, every scatter is a single fused device call, and the only barriers are
one stats read per wave and one packed-consensus download per bucket. The
reference's per-template wave loop (waves of 50 until coverage full,
:317-372) survives as host-side selection over a coverage mirror; the adaptive
identity cutoff comes from the first good overlaps (error_estimate.c:32-184).

The oc2pcan shuffle (partition_candidates/pcan.c) is replaced by an in-memory
role-expansion + lexsort grouping of candidates by template id.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from necat_tpu.align.engine import (ExtendEngine, collect_stats, new_stats,
                                    splice_rescue)
from necat_tpu.consensus import tags as tags_mod
from necat_tpu.consensus.backbone import compact_from_packed, consensus_packed
from necat_tpu.consensus.options import CnsOptions
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.candidates import Candidates
from necat_tpu.utils import shapes
from necat_tpu.utils.logging import timed


@dataclasses.dataclass
class CnsRecord:
    tid: int
    left: int
    right: int
    org_size: int
    seq: np.ndarray
    corrected: bool


# ----------------------------------------------------------------- host helpers

def is_good_overlap(ql, qr, qs, tl, tr, ts, margin=200):
    """error_estimate.c:7-30 — overlap ends near sequence ends on paired sides."""
    qlh, qrh, tlh, trh = ql, qs - qr, tl, ts - tr
    m = margin
    return ((qlh <= m) & (qrh <= m)) | ((tlh <= m) & (trh <= m)) | \
           ((qrh <= m) & (tlh <= m)) | ((trh <= m) & (qlh <= m))


def check_mapping_range(ql, qr, qs, tl, tr, ts, min_size, ratio):
    """consensus_aux.c:115-122."""
    return ((qr - ql) >= min_size) | ((tr - tl) >= min_size) | \
           ((qr - ql) >= qs * ratio) | ((tr - tl) >= ts * ratio)


def is_full_cov_ovlp(ql, qr, qs, tl, tr, ts, ovlp_size, tail):
    """consensus_aux.c:93-112 — query or template nearly fully covered."""
    r = ((ql <= tail) & (qs - qr <= tail)) | ((tl <= tail) & (ts - tr <= tail))
    r |= (qs - qr <= tail) & (tl <= tail) & ((qr - ql) >= ovlp_size)
    r |= (ts - tr <= tail) & (ql <= tail) & ((qr - ql) >= ovlp_size)
    return r


def estimate_ident_cutoff(idents: np.ndarray) -> float:
    """error_estimate.c:32-64: mean - 5*stddev over the top 70% (when n >= 8)."""
    n = len(idents)
    if n < 5:
        return 0.0
    idents = np.sort(idents)[::-1]
    if n >= 8:
        n = int(n * 0.7)
    sel = idents[:n]
    return float(sel.mean() - 5.0 * sel.std())


def _bucket_len(x: int) -> int:
    """Pad lengths to one of the global shape tiers (bounds recompiles)."""
    return shapes.length_tier(x)


def group_by_template(cands: Candidates, max_examined: int):
    """Sort candidates by (sid, score desc), dedup by query read (each query
    extended at most once per template — the reference's `extended` id set,
    consensus_one_read.c:330-338), cap at max_examined.
    Returns dict sid -> candidate index array."""
    if len(cands) == 0:
        return {}
    # best-scoring candidate per (sid, qid)
    order = np.lexsort((-cands.score, cands.qid, cands.sid))
    sid_s, qid_s = cands.sid[order], cands.qid[order]
    first = np.r_[True, (sid_s[1:] != sid_s[:-1]) | (qid_s[1:] != qid_s[:-1])]
    order = order[first]
    order = order[np.lexsort((-cands.score[order], cands.sid[order]))]
    sid_sorted = cands.sid[order]
    groups: Dict[int, np.ndarray] = {}
    bounds = np.flatnonzero(np.r_[True, sid_sorted[1:] != sid_sorted[:-1]])
    bounds = np.r_[bounds, len(order)]
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        tid = int(sid_sorted[s])
        groups[tid] = order[s:min(e, s + max_examined)]
    return groups


# --------------------------------------------------------------------- driver

def fused_mode(opts: CnsOptions) -> bool:
    """The fused single-dispatch path (consensus/fused.py) is the default on
    every backend; the legacy two-program flow survives as the oracle
    (NECAT_TPU_FUSED=0 or CnsOptions(fused=False) selects it)."""
    import os
    v = os.environ.get("NECAT_TPU_FUSED")
    if v is not None:
        return v not in ("0", "false")
    if opts.fused is not None:
        return opts.fused
    return True


def correct_reads(
    store: ReadStore,
    cands: Candidates,
    opts: CnsOptions = CnsOptions(),
    min_cov_for_template: int | None = None,
    emit_uncorrected: bool = True,
    verbose: bool = False,
    template_ids=None,
    template_cuts: dict | None = None,
) -> List[CnsRecord]:
    """Correct all templates that have candidates. `cands` must already be
    role-expanded (each overlap present for both reads as templates).

    `template_ids` restricts the work to a subset of read ids (a host's stripe
    in multi-host runs — the role of the reference's `-mn node_id num_nodes`
    partition striding, src/consensus/main.c:71-73); both corrected output and
    the uncorrected passthrough are limited to the stripe so that the union of
    all stripes is exactly the single-host output."""
    groups = group_by_template(cands, opts.max_examined)
    min_need = opts.min_cov if min_cov_for_template is None else min_cov_for_template
    stripe = None if template_ids is None else set(int(t) for t in template_ids)

    tids_all = np.array(sorted(groups.keys()), dtype=np.int64)
    # drop templates with fewer candidates than min coverage (consensus_one_read.c:218)
    tids_all = np.array([t for t in tids_all if len(groups[t]) >= min_need
                         and (stripe is None or t in stripe)], dtype=np.int64)
    records: List[CnsRecord] = []

    # uncorrected passthrough for reads with no/insufficient candidates
    if emit_uncorrected:
        have = set(tids_all.tolist())
        for r in range(store.n_reads):
            if r not in have and (stripe is None or r in stripe):
                records.append(CnsRecord(tid=r, left=0, right=int(store.lengths[r]),
                                         org_size=int(store.lengths[r]),
                                         seq=store.get(r), corrected=False))

    # process templates in descending length order, bucketed
    lens = store.lengths
    order = np.argsort(-lens[tids_all], kind="stable")
    tids_sorted = tids_all[order]
    TB = opts.templates_per_batch
    from necat_tpu.io.devstore import get_devstore
    small_memory = opts.small_memory or store.total_bases >= (1 << 31)
    devices = _correction_devices() if fused_mode(opts) else [None]
    # one bucket per correction device unless pinned (buckets are the unit of
    # multi-chip data parallelism; on one chip a single merged bucket keeps
    # every chunk tier-mix-only — 4 small buckets ran 60%-full lanes)
    nb = opts.buckets_per_supergroup or max(1, len(devices))
    SG = TB * nb
    engines = None
    if not small_memory and len(tids_sorted):
        with timed("cns.devstore_init"):
            # multi-device: replicate the packed store per device; template
            # buckets run round-robin on the devices (no collectives — the
            # reference's per-node partition stripes, consensus/main.c:71-73)
            engines = [ExtendEngine(d, d, opts.pairs_per_chunk)
                       for d in (get_devstore(store, device=dv)
                                 for dv in devices)]
    ctxs = []
    for s in range(0, len(tids_sorted), SG):
        sg_ids = tids_sorted[s:s + SG]
        if small_memory:
            # SMALL_MEMORY mode (oc2cns -s, consensus/read_id_pool.h:29-63):
            # upload only the reads this supergroup touches; ids remapped
            ids = set(int(t) for t in sg_ids)
            for t in sg_ids:
                ids.update(int(q) for q in cands.qid[groups[int(t)]])
            ids = np.array(sorted(ids), dtype=np.int64)
            sub = store.subset(ids)
            with timed("cns.devstore_init"):
                sg_engines = [ExtendEngine(d, d, opts.pairs_per_chunk)
                              for d in (get_devstore(sub, device=dv)
                                        for dv in devices)]
            id_map = ids
        else:
            sg_engines = engines
            id_map = None
        ctxs.append(_run_supergroup(store, sg_engines, cands, groups,
                                    sg_ids, opts, id_map=id_map))
        # bounded-depth pipeline: compact supergroup i-1 while supergroup i's
        # waves run — its async d2h downloads complete behind the dispatch
        # stream, but only ONE extra supergroup's device arrays stay alive
        # (unbounded deferral made peak memory scale with supergroup count,
        # defeating SMALL_MEMORY — advisor r4, medium)
        while len(ctxs) > 1:
            records.extend(_compact_supergroup(store, ctxs.pop(0), opts,
                                               template_cuts or {}))
    for ctx in ctxs:
        records.extend(_compact_supergroup(store, ctx, opts,
                                           template_cuts or {}))
    return records


def _correction_devices() -> list:
    """Devices for the bucket-parallel correction path. Default: all local
    TPU chips; 1 elsewhere. NECAT_TPU_CNS_DEVICES=<n> overrides (used by the
    CPU-mesh dryrun/tests with xla_force_host_platform_device_count)."""
    import os
    n = os.environ.get("NECAT_TPU_CNS_DEVICES")
    if n is not None:
        k = int(n)
        return list(jax.devices()[:k]) if k > 1 else [None]
    if jax.default_backend() == "tpu":
        d = jax.local_devices()
        if len(d) > 1:
            return list(d)
    return [None]


def _on_device(device, fn):
    """Run an array-creating fn with `device` as the default placement."""
    if device is None:
        return fn()
    with jax.default_device(device):
        return fn()


class _Bucket:
    def __init__(self, store, ids, TB, D, device=None):
        self.n_real = len(ids)
        self.ids = (np.concatenate([ids, np.repeat(ids[-1:], TB - len(ids))])
                    if len(ids) < TB else ids)
        self.Lt = _bucket_len(int(store.lengths[self.ids].max()))
        self.tlens = store.lengths[self.ids].astype(np.int64).copy()
        self.tlens[self.n_real:] = 0     # padding rows emit nothing
        self.device = device
        self.weights = _on_device(
            device, lambda: jnp.zeros((TB + 1, D, 5, self.Lt), jnp.float32))
        self.covten = _on_device(
            device, lambda: jnp.zeros((TB + 1, self.Lt), jnp.int32))


class _Tpl:
    __slots__ = ("tid", "bucket", "row", "n", "cand_idx", "cov",
                 "cutoff", "accepted")

    def __init__(self, tid, bucket, row, n, cand_idx):
        self.tid = tid
        self.bucket = bucket
        self.row = row
        self.n = n
        self.cand_idx = cand_idx
        self.cov = None      # view into _SelState.cov_buf
        self.cutoff = np.nan
        self.accepted = []   # (qid, qdir, qoff, qend, toff, tend, w) —
                             # retained in wide-delta mode for hotspot splicing


class _SelState:
    """Vectorized wave-selection state for one supergroup.

    Replaces the per-template Python cursor loop (the reference's per-thread
    wave loop, consensus_one_read.c:317-372) with flat candidate arrays and a
    CONCATENATED coverage buffer: per-template coverage vectors are views into
    `cov_buf`, so both the wave-selection coverage test and the acceptance
    update are single numpy passes over the whole supergroup."""

    def __init__(self, tpls):
        self.n_tpl = len(tpls)
        lens = np.array([len(t.cand_idx) for t in tpls], dtype=np.int64)
        self.cand_len = lens
        total_c = int(lens.sum())
        self.cand_start = np.zeros(self.n_tpl, np.int64)
        if self.n_tpl > 1:
            np.cumsum(lens[:-1], out=self.cand_start[1:])
        self.cand_li = np.repeat(np.arange(self.n_tpl, dtype=np.int64), lens)
        self.cand_ci = (np.concatenate([np.asarray(t.cand_idx) for t in tpls])
                        if self.n_tpl else np.zeros(0, np.int64)).astype(np.int64)
        self.cand_pos = (np.arange(total_c, dtype=np.int64)
                         - np.repeat(self.cand_start, lens))
        self.cursor = np.zeros(self.n_tpl, np.int64)
        tn = np.array([t.n for t in tpls], dtype=np.int64)
        self.tpl_n = tn
        self.tpl_off = np.zeros(self.n_tpl + 1, np.int64)
        np.cumsum(tn, out=self.tpl_off[1:])
        self.cov_buf = np.zeros(int(tn.sum()), np.int32)
        for li, t in enumerate(tpls):
            t.cov = self.cov_buf[self.tpl_off[li]:self.tpl_off[li] + t.n]
        self.tpl_row = np.array([t.row for t in tpls], dtype=np.int64)
        self.tpl_bucket = np.array([t.bucket for t in tpls], dtype=np.int64)
        self.tpl_tid = np.array([t.tid for t in tpls], dtype=np.int64)


def _select_wave(st: _SelState, cands, round_id: int, wave: int, max_cov: int):
    """One wave of (template, candidate) pairs: per template, scan pending
    candidates in score order, skip those whose span is already at max_cov
    (rounds > 0), take up to `wave`; skipped and taken are both consumed.
    Returns (p_tpl, p_ci, slots) with slots = per-template take rank (0-based,
    the round-0 ident-buffer slot)."""
    empty = (np.zeros(0, np.int64),) * 3
    if st.n_tpl == 0 or len(st.cand_li) == 0:
        return empty
    pend = st.cand_pos >= st.cursor[st.cand_li]
    if not pend.any():
        return empty
    if round_id > 0:
        # prefix-sum of under-covered positions over the concatenated buffer:
        # a candidate is skippable iff its span holds none
        U = np.empty(len(st.cov_buf) + 1, np.int64)
        U[0] = 0
        np.cumsum(st.cov_buf < max_cov, out=U[1:])
        off = st.tpl_off[st.cand_li]
        n = st.tpl_n[st.cand_li]
        sb = np.clip(cands.sbeg[st.cand_ci], 0, n)
        se = np.clip(cands.send[st.cand_ci], 0, n)
        under = U[off + se] - U[off + sb]
        elig = pend & (under > 0)
    else:
        elig = pend
    cs = np.cumsum(elig)
    pre = np.concatenate([[0], cs])[st.cand_start]
    rank = cs - np.repeat(pre, st.cand_len)          # 1-based among eligible
    take = elig & (rank <= wave)
    idx = np.flatnonzero(take)
    tk_li = st.cand_li[idx]
    cnt = np.bincount(tk_li, minlength=st.n_tpl)
    last = np.full(st.n_tpl, -1, np.int64)
    np.maximum.at(last, tk_li, st.cand_pos[idx])
    act = np.zeros(st.n_tpl, bool)
    act[st.cand_li[pend]] = True
    newcur = np.where(cnt >= wave, last + 1, st.cand_len)
    st.cursor = np.where(act, newcur, st.cursor)
    return tk_li, st.cand_ci[idx], (rank[idx] - 1)


def _apply_cov(st: _SelState, li_acc, tl_acc, tr_acc) -> None:
    """cov[tl:tr] += 1 for every accepted pair, as one diff+cumsum pass."""
    if len(li_acc) == 0:
        return
    d = np.zeros(len(st.cov_buf) + 1, np.int32)
    off = st.tpl_off[li_acc]
    n = st.tpl_n[li_acc]
    np.add.at(d, off + np.clip(tl_acc, 0, n), 1)
    np.add.at(d, off + np.clip(tr_acc, 0, n), -1)
    st.cov_buf += np.cumsum(d[:len(st.cov_buf)], dtype=np.int32)


def _insb_words(opts: CnsOptions) -> int:
    return min(max(-(-max(opts.max_delta - 1, 1) // tags_mod.N_INSB), 1), 3)


def _run_waves_legacy(engines, cands, tpls, buckets, opts: CnsOptions,
                      st: _SelState, local_ids) -> None:
    """The two-program oracle flow: extend chunks, host-side acceptance,
    separate scatter dispatches (round-2 production path, now the oracle the
    fused path is equality-tested against). Single-device only."""
    engine = engines[0]
    dev = engine.qdev
    TB = opts.templates_per_batch
    D = opts.max_delta
    estimating = not opts.use_fixed_ident_cutoff
    if not estimating:
        for t in tpls:
            t.cutoff = 100.0 * (1.0 - opts.error)
    round_id = 0 if estimating else 1   # (consensus_one_read.c:273-278)
    max_rounds = -(-opts.max_examined // opts.wave_size) + 1
    use_mm = tags_mod.use_mm_scatter()
    insb_words = _insb_words(opts)

    while round_id <= max_rounds:
        wave = (opts.n_ident + 10) if round_id == 0 else opts.wave_size
        with timed("cns.wave_build"):
            p_tpl, p_ci, _ = _select_wave(st, cands, round_id, wave,
                                          opts.max_cov)
        if len(p_tpl) == 0:
            if round_id == 0:
                round_id += 1
                continue
            break
        npairs = len(p_ci)
        tsize = st.tpl_n[p_tpl]
        tg_base = dev.offsets[local_ids(st.tpl_tid[p_tpl])]
        gkey = st.tpl_bucket[p_tpl]

        # ---------------- extension: one fused dispatch per chunk, zero
        # intermediate syncs; stats stream back asynchronously
        with timed("cns.extend_pairs_total"):
            chunks = engine.submit(
                sel=np.arange(npairs), qids=local_ids(cands.qid[p_ci]),
                qdir=cands.qdir[p_ci].astype(np.int32),
                qsize=cands.qsize[p_ci].astype(np.int64),
                tg_base=tg_base, tsize=tsize,
                aq=cands.qbeg[p_ci].astype(np.int64),
                at_abs=cands.sbeg[p_ci].astype(np.int64),
                W=opts.band_width, groups=gkey, insb_words=insb_words)
            stats = new_stats(npairs)
            collect_stats(chunks, stats)

            if opts.rescue_long_indels:
                # cns_extension rescue trigger (consensus_aux.c:152-157) with
                # the band-doubling ladder (same rungs as the fused path)
                scale = opts.rescue_band_scale
                while (scale <= opts.rescue_band_max_scale
                       and opts.band_width * scale <= shapes.MAX_BAND):
                    lhang = np.maximum(stats["qoff"] - cands.qbeg[p_ci], 0)
                    rhang = np.maximum(cands.qend[p_ci] - stats["qend"], 0)
                    bad = np.flatnonzero((lhang + rhang) > 200)
                    if len(bad) == 0:
                        break
                    rchunks = engine.submit(
                        sel=bad, qids=local_ids(cands.qid[p_ci[bad]]),
                        qdir=cands.qdir[p_ci[bad]].astype(np.int32),
                        qsize=cands.qsize[p_ci[bad]].astype(np.int64),
                        tg_base=tg_base[bad], tsize=tsize[bad],
                        aq=cands.qbeg[p_ci[bad]].astype(np.int64),
                        at_abs=cands.sbeg[p_ci[bad]].astype(np.int64),
                        W=opts.band_width * scale,
                        groups=gkey[bad], insb_words=insb_words)
                    splice_rescue(chunks, rchunks, stats)
                    scale *= 2

        # ---------------- round 0: estimate identity cutoffs
        with timed("cns.accept"):
            ql, qr = stats["qoff"], stats["qend"]
            tl, tr = stats["toff"], stats["tend"]
            ident = stats["ident"]
            qs = cands.qsize[p_ci]
            if round_id == 0:
                ok_align = stats["n_cols"] >= opts.min_align_size
                good_all = is_good_overlap(ql, qr, qs, tl, tr, tsize,
                                           opts.good_end_margin) & ok_align
                span_all = (((qr - ql) >= 0.6 * qs)
                            | ((tr - tl) >= 0.6 * tsize)) & ok_align
                for li in np.unique(p_tpl):
                    sel = p_tpl == li
                    idents = ident[sel][good_all[sel]][:opts.n_ident]
                    if len(idents) < opts.n_ident:
                        idents = ident[sel][span_all[sel]][:opts.n_ident]
                    tpls[li].cutoff = estimate_ident_cutoff(np.asarray(idents))

            # ---------------- acceptance
            cut = np.array([tpls[li].cutoff for li in p_tpl])
            cut = np.where(np.isnan(cut), 0.0, cut)
            ok = stats["n_cols"] >= opts.min_align_size
            ok &= check_mapping_range(ql, qr, qs, tl, tr, tsize,
                                      opts.min_align_size, opts.mapping_ratio)
            pass_ident = ident >= cut
            if round_id > 0:
                pass_ident |= is_full_cov_ovlp(ql, qr, qs, tl, tr, tsize,
                                               5000, 100)
            ok &= pass_ident
            wide_mode = 3 * D > 30
            acc = np.flatnonzero(ok)
            _apply_cov(st, p_tpl[acc], tl[acc], tr[acc])
            if wide_mode and len(acc):
                w_acc = tags_mod.calc_cns_weight(ident[acc])
                for j, i in enumerate(acc):
                    ci = p_ci[i]
                    tpls[p_tpl[i]].accepted.append(
                        (int(cands.qid[ci]), int(cands.qdir[ci]),
                         int(ql[i]), int(qr[i]), int(tl[i]), int(tr[i]),
                         float(w_acc[j])))

        # ---------------- scatter: one fused dispatch per chunk
        with timed("cns.scatter_round_total"):
            w_all = tags_mod.calc_cns_weight(ident)
            for ch in chunks:
                b = buckets[ch.group]
                PB = len(ch.live)
                row = np.full(PB, TB, np.int32)
                keep = ok[ch.sel] & ch.live[:ch.n_real]
                row[:ch.n_real] = np.where(keep, st.tpl_row[p_tpl[ch.sel]], TB)
                w = np.zeros(PB, np.float32)
                w[:ch.n_real] = w_all[ch.sel]
                tsz = np.zeros(PB, np.int32)
                tsz[:ch.n_real] = tsize[ch.sel]
                at_abs = ch.at.astype(np.int64).copy()
                at_abs[:ch.n_real] += ch.ws
                _scatter_chunk(b, ch, row, w, tsz, at_abs.astype(np.int32),
                               use_mm)
                ch.release()
        round_id += 1


def _run_waves_fused(engines, cands, tpls, buckets, opts: CnsOptions,
                     st: _SelState, local_ids) -> None:
    """Fused single-dispatch flow (consensus/fused.py): per chunk ONE device
    program does gather+extend+accept+scatter against device-resident
    cutoffs; the only per-wave host sync is the stats read that feeds the
    coverage mirror. Rescue runs by deferral (see fused.py docstring).
    With multiple engines, bucket bi's programs run on engines[bi % n]'s
    device (see dispatch_wave)."""
    from necat_tpu.consensus import fused
    dev = engines[0].qdev
    TB = opts.templates_per_batch
    D = opts.max_delta
    estimating = not opts.use_fixed_ident_cutoff
    cutoffs = {bi: _on_device(
        buckets[bi].device,
        lambda: jnp.full((TB + 1,),
                         0.0 if estimating else 100.0 * (1.0 - opts.error),
                         jnp.float32)) for bi in range(len(buckets))}
    tensors = {bi: (b.weights, b.covten) for bi, b in enumerate(buckets)}
    for b in buckets:
        b.weights = b.covten = None    # ownership in tensors (donated through)
    insb_words = _insb_words(opts)
    wide_mode = 3 * D > 30
    rescue = opts.rescue_long_indels
    round_id = 0 if estimating else 1
    max_rounds = -(-opts.max_examined // opts.wave_size) + 1
    W0 = opts.band_width
    Wwide = opts.band_width * opts.rescue_band_scale

    while round_id <= max_rounds:
        wave = (opts.n_ident + 10) if round_id == 0 else opts.wave_size
        with timed("cns.wave_build"):
            p_tpl, p_ci, slots = _select_wave(st, cands, round_id, wave,
                                              opts.max_cov)
        if len(p_tpl) == 0:
            if round_id == 0:
                round_id += 1
                continue
            break
        npairs = len(p_ci)
        base = dict(qids=local_ids(cands.qid[p_ci]),
                    qdir=cands.qdir[p_ci].astype(np.int32),
                    qsize=cands.qsize[p_ci].astype(np.int64),
                    tg_base=dev.offsets[local_ids(st.tpl_tid[p_tpl])],
                    tsize_full=st.tpl_n[p_tpl],
                    aq=cands.qbeg[p_ci].astype(np.int64),
                    at_abs=cands.sbeg[p_ci].astype(np.int64),
                    rows=st.tpl_row[p_tpl], groups=st.tpl_bucket[p_tpl],
                    insb_words=insb_words,
                    min_align_size=opts.min_align_size,
                    mapping_ratio=opts.mapping_ratio,
                    good_end_margin=opts.good_end_margin)

        def sub(idx, base=base):
            d = dict(base)
            for k in ("qids", "qdir", "qsize", "tg_base", "tsize_full", "aq",
                      "at_abs", "rows", "groups"):
                d[k] = base[k][idx]
            return d

        allow_fc = round_id > 0
        lane_w = None
        if round_id == 0:
            # ident estimation (+ rescue ladder into the ident buffer)
            assert wave <= fused.IDENT_SLOTS, \
                "n_ident+10 must fit IDENT_SLOTS (fused.py)"
            ibufs = {bi: _on_device(
                buckets[bi].device,
                lambda: jnp.zeros((TB + 1, fused.IDENT_SLOTS, 3),
                                  jnp.float32))
                for bi in sorted({int(g) for g in base["groups"]})}
            with timed("cns.extend_pairs_total"):
                ich = fused.dispatch_wave(
                    engines, **base, W=W0, cutoffs=cutoffs, tensors=tensors,
                    allow_fullcov=False, slots=slots, ibufs=ibufs)
                if rescue:
                    # band-doubling ladder (cols_guard keeps the best rung's
                    # idents in the slot buffer); lane_w remembers each
                    # lane's best band for the scatter re-dispatch below
                    fused.release_bufs(ich)
                    s0 = fused.new_fused_stats(npairs)
                    fused.collect_fused(ich, s0)
                    lane_w = np.full(npairs, W0, np.int64)
                    best_c = s0["n_cols"].copy()
                    hang = (np.maximum(s0["qoff"] - cands.qbeg[p_ci], 0)
                            + np.maximum(cands.qend[p_ci] - s0["qend"], 0))
                    bad = np.flatnonzero(hang > 200)
                    scale = opts.rescue_band_scale
                    while (len(bad) and scale <= opts.rescue_band_max_scale
                           and W0 * scale <= shapes.MAX_BAND):
                        Wx = W0 * scale
                        wch = fused.dispatch_wave(
                            engines, **sub(bad), W=Wx, cutoffs=cutoffs,
                            tensors=tensors, allow_fullcov=False,
                            slots=slots[bad], ibufs=ibufs,
                            nc0=best_c[bad], cols_guard=True)
                        fused.release_bufs(wch)
                        s1 = fused.new_fused_stats(npairs)
                        fused.collect_fused(wch, s1, sel=bad)
                        imp = s1["n_cols"][bad] >= best_c[bad]
                        lane_w[bad[imp]] = Wx
                        best_c[bad] = np.maximum(best_c[bad],
                                                 s1["n_cols"][bad])
                        h1 = (np.maximum(s1["qoff"][bad]
                                         - cands.qbeg[p_ci[bad]], 0)
                              + np.maximum(cands.qend[p_ci[bad]]
                                           - s1["qend"][bad], 0))
                        # a rung only counts if it kept/improved the result
                        bad = bad[(h1 > 200) | ~imp]
                        scale *= 2
            for bi, ib in ibufs.items():
                cutoffs[bi] = fused.cutoff_from_idents(ib,
                                                       n_ident=opts.n_ident)

        stats = fused.new_fused_stats(npairs)
        with timed("cns.extend_pairs_total"):
            if round_id == 0 and not rescue:
                # scatter the ident chunks from their retained buffers: no
                # re-extension (round 0 was ~37% of extension lanes at scale)
                fused.scatter_round0(engines, ich, cutoffs, tensors,
                                     opts.min_align_size, opts.mapping_ratio)
                fused.collect_fused(ich, stats)
            elif lane_w is not None:
                # round 0 + rescue: the per-lane band is already decided
                for Wx in np.unique(lane_w):
                    idx = np.flatnonzero(lane_w == Wx)
                    ch = fused.dispatch_wave(
                        engines, **sub(idx), W=int(Wx), cutoffs=cutoffs,
                        tensors=tensors, allow_fullcov=False)
                    fused.collect_fused(ch, stats, sel=idx)
            else:
                ch = fused.dispatch_wave(
                    engines, **base, W=W0, cutoffs=cutoffs, tensors=tensors,
                    allow_fullcov=allow_fc,
                    qend_cand=cands.qend[p_ci].astype(np.int64),
                    rescue_defer=rescue)
                fused.collect_fused(ch, stats)
                if rescue:
                    # band-doubling ladder: deferred lanes climb with both
                    # the hang check (rescue_defer) and the best-cols guard;
                    # lanes that exhaust the ladder replay at their best band
                    di = np.flatnonzero(stats["deferred"])
                    best_w = np.full(npairs, W0, np.int64)
                    best_c = stats["n_cols"].copy()
                    scale = opts.rescue_band_scale
                    while (len(di) and scale <= opts.rescue_band_max_scale
                           and W0 * scale <= shapes.MAX_BAND):
                        Wx = W0 * scale
                        last = (scale * 2 > opts.rescue_band_max_scale
                                or W0 * scale * 2 > shapes.MAX_BAND)
                        wch = fused.dispatch_wave(
                            engines, **sub(di), W=Wx, cutoffs=cutoffs,
                            tensors=tensors, allow_fullcov=allow_fc,
                            qend_cand=cands.qend[p_ci[di]].astype(np.int64),
                            nc0=best_c[di], cols_guard=True,
                            rescue_defer=not last)
                        prev_c = best_c[di].copy()
                        fused.collect_fused(wch, stats, sel=di)
                        new_c = stats["n_cols"][di]
                        best_w[di[new_c >= prev_c]] = Wx
                        best_c[di] = np.maximum(new_c, prev_c)
                        di = di[stats["deferred"][di]]
                        scale *= 2
                    if len(di):
                        for Wx in np.unique(best_w[di]):
                            sel_w = di[best_w[di] == Wx]
                            fch = fused.dispatch_wave(
                                engines, **sub(sel_w), W=int(Wx),
                                cutoffs=cutoffs, tensors=tensors,
                                allow_fullcov=allow_fc)
                            fused.collect_fused(fch, stats, sel=sel_w)

        with timed("cns.accept"):
            acc = np.flatnonzero(stats["ok"])
            _apply_cov(st, p_tpl[acc], stats["toff"][acc], stats["tend"][acc])
            if wide_mode and len(acc):
                w_acc = tags_mod.calc_cns_weight(stats["ident"][acc])
                for j, i in enumerate(acc):
                    ci = p_ci[i]
                    tpls[p_tpl[i]].accepted.append(
                        (int(cands.qid[ci]), int(cands.qdir[ci]),
                         int(stats["qoff"][i]), int(stats["qend"][i]),
                         int(stats["toff"][i]), int(stats["tend"][i]),
                         float(w_acc[j])))
        round_id += 1

    for bi, b in enumerate(buckets):
        b.weights, b.covten = tensors[bi]


def _run_supergroup(store, engines, cands, groups, sg_ids,
                    opts: CnsOptions,
                    id_map: np.ndarray | None = None):
    """Wave phase of one supergroup: extension waves + consensus call + async
    download issue. Returns the context `_compact_supergroup` consumes (no
    engine references, so SMALL_MEMORY per-supergroup device stores stay
    collectable)."""
    def local_ids(global_ids):
        """Map global read ids to the supergroup devstore's id space
        (identity unless SMALL_MEMORY built a per-supergroup store)."""
        if id_map is None:
            return np.asarray(global_ids)
        return np.searchsorted(id_map, np.asarray(global_ids))
    TB = opts.templates_per_batch
    D = opts.max_delta
    n_sg = len(sg_ids)
    buckets: List[_Bucket] = []
    tpls: List[_Tpl] = []
    with timed("cns.bucket_setup"):
        for bi in range(0, n_sg, TB):
            ids = sg_ids[bi:bi + TB]
            b = _Bucket(store, ids, TB, D,
                        device=engines[len(buckets) % len(engines)].device)
            buckets.append(b)
            for row in range(b.n_real):
                tid = int(b.ids[row])
                tpls.append(_Tpl(tid, len(buckets) - 1, row, int(b.tlens[row]),
                                 groups[tid]))

    st = _SelState(tpls)
    if fused_mode(opts):
        _run_waves_fused(engines, cands, tpls, buckets, opts, st, local_ids)
    else:
        _run_waves_legacy(engines, cands, tpls, buckets, opts, st, local_ids)

    # ---------------- consensus call + bit-packed download + host compaction
    # 3-bit fields per delta fit int32 only up to D=10; the wide-delta path
    # (polish, u16-delta role) downloads the compacted emission STREAM instead
    use_stream = 3 * D > 30
    dl_list = []
    with timed("cns.call_consensus"):
        for b in buckets:
            if use_stream:
                from necat_tpu.consensus.backbone import (consensus_stream,
                                                          hot_insertion_mask)
                SL = b.Lt + max(1024, b.Lt // 4)
                hot = hot_insertion_mask(b.weights[:TB], b.covten[:TB],
                                         opts.min_cov)
                dl = consensus_stream(b.weights[:TB], b.covten[:TB],
                                      opts.min_cov, opts.ins_frac,
                                      opts.ins_offset, SL=SL) + (hot,)
            else:
                from necat_tpu.consensus.backbone import (flatten_packed,
                                                          split_packed_sparse)
                packed = consensus_packed(b.weights[:TB], b.covten[:TB],
                                          opts.min_cov, opts.ins_frac,
                                          opts.ins_offset)
                # ragged flatten before the d2h: only the real sum(tlens)
                # columns cross the ~20 MB/s tunnel link (the padded [TB, Lt]
                # tensor cost 2.5 s/pass at bench scale)
                starts = np.zeros(TB + 1, np.int64)
                np.cumsum(b.tlens[:TB], out=starts[1:])
                NF = max(1 << 20, 1 << int(int(starts[TB]) - 1).bit_length())
                b._flat_starts = starts
                flat = flatten_packed(packed, jnp.asarray(starts, jnp.int32),
                                      NF=NF)
                # sparse split: 1 byte/position main stream + insertion
                # sidecar (~4x fewer d2h bytes than the int32 packing; the
                # device `flat` is retained as the overflow fallback)
                dl = split_packed_sparse(flat, D=D, SP=max(NF // 8, 1 << 14)) \
                    + (flat,)
            for x in dl[:4 if not use_stream else len(dl)]:
                try:
                    x.copy_to_host_async()
                except Exception:
                    pass
            dl_list.append(dl)
            b.weights = b.covten = None     # free the tensors early
    return dict(buckets=buckets, dl_list=dl_list, tpls=tpls,
                use_stream=use_stream)


def _compact_supergroup(store, ctx, opts: CnsOptions,
                        template_cuts: dict | None = None) -> List[CnsRecord]:
    """Host compaction phase (see _run_supergroup)."""
    TB = opts.templates_per_batch
    D = opts.max_delta
    buckets, dl_list, tpls = ctx["buckets"], ctx["dl_list"], ctx["tpls"]
    use_stream = ctx["use_stream"]
    records: List[CnsRecord] = []
    for bi, (b, dl) in enumerate(zip(buckets, dl_list)):
        b._index = bi
        with timed("cns.compact"):
            tbatch_np, _ = store.padded_batch(b.ids, pad_to=b.Lt, multiple=1)
            # full consensus (-f 1, intermediate iterations) keeps reads whole:
            # covered-run threshold drops to 0.85*min_size (cbcns.c:200)
            min_run = (max(1, int(opts.min_size * 0.85))
                       if opts.full_consensus else None)
            if use_stream:
                from necat_tpu.consensus.backbone import compact_from_stream
                stream, cum_t, n_emit, cov8, hot = dl
                if int(np.asarray(n_emit).max(initial=0)) > stream.shape[1]:
                    from necat_tpu.utils.logging import logger
                    logger.warning("consensus stream overflow in a bucket; "
                                   "emitted bases beyond SL are dropped")
                overrides = _bucket_hot_overrides(store, b, tpls,
                                                  np.asarray(hot), tbatch_np)
                cuts = {r_: template_cuts[int(b.ids[r_])]
                        for r_ in range(b.n_real)
                        if template_cuts and int(b.ids[r_]) in template_cuts}
                pieces = compact_from_stream(
                    np.asarray(stream), np.asarray(cum_t), np.asarray(cov8),
                    b.tlens, tbatch_np, opts.min_cov, opts.min_size,
                    opts.raw_min_gap, overrides=overrides, cut_at=cuts)
            else:
                with timed("cns.download"):
                    main, kidx, svals, n_sp, flat_dev = dl
                    main_h = np.asarray(main)
                    n_sp_i = int(np.asarray(n_sp)[0])
                    if n_sp_i > kidx.shape[0]:
                        # sidecar overflow: fall back to the retained full
                        # int32 packing for this bucket (rare; NF//8 slots
                        # cover ~3x the typical insertion-site density)
                        packed_h = np.asarray(flat_dev)
                    else:
                        from necat_tpu.consensus.backbone import ins_pattern
                        packed_h = (np.int32(ins_pattern(D))
                                    | (main_h & 7).astype(np.int32))
                        ki = np.asarray(kidx)[:n_sp_i]
                        packed_h[ki] = np.asarray(svals)[:n_sp_i]
                pieces = compact_from_packed(packed_h, b.tlens,
                                             tbatch_np, opts.min_size,
                                             opts.raw_min_gap,
                                             max_delta=D, min_run=min_run,
                                             row_starts=b._flat_starts)
        records.extend(_emit_records(b, pieces, tbatch_np, opts))
    return records


def _bucket_hot_overrides(store, b: _Bucket, tpls, hot: np.ndarray,
                          tbatch_np: np.ndarray, pad: int = 60) -> dict:
    """Link-DP fallback for insertion hotspots (wide-delta/polish mode).

    Long insertion runs (a contig missing a chunk every read contains) split
    across co-optimal alignment phasings, so no single (t, delta) cell wins
    the majority vote. For each hotspot region: re-align the covering read
    segments against the local template ON THE HOST (one canonical aligner =
    consistent phasing), run the reference link DP (consensus_linkdp), and
    override the affected positions' emissions. Reference: ctg_cns u16-delta
    consensus (fc_correct_one_read.c) + cns_aux.c:127-217."""
    from necat_tpu.consensus.linkdp import (consensus_linkdp, host_edit_ops,
                                            tags_from_ops)
    overrides: dict = {}
    bi = getattr(b, "_index", None)
    for t_ in tpls:
        if t_.bucket != bi or not t_.accepted:
            continue
        row = t_.row
        n = t_.n
        hot_pos = np.flatnonzero(hot[row, :n])
        if len(hot_pos) == 0:
            continue
        # estimate the query surplus (a collapsed repeat's length) from the
        # accepted alignments' skew: the region window must extend further
        # than the surplus on each side, or every semiglobal alignment
        # PREFERS truncating the window (cost = remaining context) over
        # threading the insertion (cost = surplus) and the missing chunk
        # never reaches the reassembly
        surplus = 0
        for (qid, qdir, qo, qe, to, te, w) in t_.accepted:
            surplus = max(surplus, (qe - qo) - (te - to))
        rpad = pad + min(int(surplus * 3 // 2), 5000)
        gap_merge = max(50, rpad)
        # cluster hot positions into regions
        regions = []
        rs = re = int(hot_pos[0])
        for t in hot_pos[1:]:
            if t - re <= gap_merge:
                re = int(t)
            else:
                regions.append((rs, re + 1))
                rs = re = int(t)
        regions.append((rs, re + 1))
        row_ovr: dict = {}
        for (rs, re) in regions:
            lo, hi = max(0, rs - rpad), min(n, re + rpad)
            if hi - lo > 100000:
                # beyond structural scale even for the banded host DP
                from necat_tpu.utils.logging import logger
                logger.warning("hotspot region %d bp at row %d skipped "
                               "(>100 kb)", hi - lo, row)
                continue
            t_local = tbatch_np[row, lo:hi].astype(np.uint8)
            # 1. extract the read segments spanning the window (semiglobal
            # trim against the draft absorbs interpolation drift)
            segs = []
            for (qid, qdir, qo, qe, to, te, w) in t_.accepted:
                if to >= hi or te <= lo:
                    continue
                span_t = max(te - to, 1)
                drift = 60 + span_t // 100
                qs = qo + (qe - qo) * (lo - to) // span_t
                q2 = qo + (qe - qo) * (hi - to) // span_t
                qs = max(qo, qs - drift)
                q2 = min(qe, q2 + drift)
                if q2 - qs < (min(hi, te) - max(lo, to)) // 2:
                    continue
                seq = store.get(qid)
                if qdir:
                    seq = (3 - seq[::-1]).astype(np.uint8)
                qseg = np.asarray(seq[qs:q2], np.uint8)
                ops, q_start, q_end = host_edit_ops(qseg, t_local)
                if q_end - q_start < (hi - lo) // 2:
                    continue
                segs.append((qseg[q_start:q_end], float(w)))
            if len(segs) < 2:
                # the reference repairs collapsed repeats down to min_cov
                # (fc_correct_one_read.h u16 deltas at any coverage); two
                # concordant segments already outvote the draft's omission
                continue
            # 2. local reassembly: consensus of the segments against a MEDIAN
            # segment backbone. The backbone CONTAINS whatever the draft is
            # missing, so the segment alignments have no systematic insertion
            # runs and the link DP threads cleanly — draft-anchored tags
            # fragment across co-optimal phasings instead.
            segs.sort(key=lambda s: len(s[0]))
            backbone = segs[len(segs) // 2][0]
            all_tags = []
            for (sg, w) in segs:
                ops, q_start, _ = host_edit_ops(sg, backbone)
                tg = tags_from_ops(ops, len(ops), sg, qoff=q_start, toff=0,
                                   weight=w, max_delta=65535)
                if tg:
                    all_tags.extend(tg)
            S, cf, ct_ = consensus_linkdp(all_tags, len(backbone))
            if len(S) < (hi - lo) // 2:
                continue
            # 3. align the reassembled consensus back to the draft window:
            # its per-template-column emissions become the overrides
            ops2, _, _ = host_edit_ops(S, t_local)
            from necat_tpu.align.banded import OP_DEL, OP_DIAG, OP_INS
            per_t: dict = {}
            j = -1
            qp = 0
            for op in ops2:
                if op == OP_DIAG:
                    j += 1
                    per_t.setdefault(j, []).append(int(S[qp]))
                    qp += 1
                elif op == OP_DEL:
                    j += 1
                    per_t.setdefault(j, [])
                else:  # OP_INS: attach after column j's emissions
                    if j >= 0:
                        per_t.setdefault(j, []).append(int(S[qp]))
                    qp += 1
            for t in range(rs, re):
                if (t - lo) in per_t:
                    row_ovr[t] = np.array(per_t[t - lo], np.uint8)
        if row_ovr:
            overrides[row] = row_ovr
    return overrides


def _scatter_chunk(b: _Bucket, ch, row, w, tsz, at_abs, use_mm: bool):
    """Scatter one chunk's accepted alignments into the bucket tensors."""
    import os as _os
    o = ch.out
    row_j = jnp.asarray(row)
    w_j = jnp.asarray(w)
    tsz_j = jnp.asarray(tsz)
    at_j = jnp.asarray(at_abs)
    with timed("cns.scatter"):
        _sync = _os.environ.get("NECAT_TPU_SYNC_DISPATCH")
        if use_mm:
            # canonicalize the per-column arrays to Lt OUTSIDE the fused
            # scatter (eager pad ops compile trivially) so the scatter
            # program is keyed on (PB, Lt) only, not every chunk tier MC
            from necat_tpu.align.banded import OP_PAD as _PAD
            Lt = b.Lt
            pc = tags_mod.pad_cols_to

            def insb_tuple(side):
                words = [o[f"{side}_insb"]]
                w = 2
                while f"{side}_insb{w}" in o:
                    words.append(o[f"{side}_insb{w}"])
                    w += 1
                return tuple(pc(x, Lt, 0) for x in words)

            b.weights, b.covten = tags_mod.scatter_chunk_mm(
                b.weights, b.covten,
                pc(o["left_cols"], Lt, _PAD), insb_tuple("left"),
                o["left_lead"], o["left_leadb"], o["left_jc"],
                pc(o["right_cols"], Lt, _PAD), insb_tuple("right"),
                o["right_lead"], o["right_leadb"], o["right_jc"],
                at_j, row_j, w_j, tsz_j)
        else:
            args = (o["qbatch"], jnp.asarray(ch.aq), at_j, row_j, w_j, tsz_j)
            b.weights, b.covten = tags_mod.scatter_pass_cols(
                b.weights, b.covten, o["right_cols"], o["right_lead"],
                o["right_jc"], *args, reversed_part=False)
            b.weights, b.covten = tags_mod.scatter_pass_cols(
                b.weights, b.covten, o["left_cols"], o["left_lead"],
                o["left_jc"], *args, reversed_part=True)
        if _sync:
            with timed("cns.scatter_exec"):
                jax.block_until_ready(b.covten)


def _emit_records(b: _Bucket, pieces, tbatch_np, opts: CnsOptions) -> List[CnsRecord]:
    records = []
    for r_, (cns_p, raw_p) in enumerate(pieces):
        if r_ >= b.n_real:
            break
        tid = int(b.ids[r_])
        n = int(b.tlens[r_])
        if opts.full_consensus:
            # consensus_unbroken (src/tasc/cbcns.c:171-252): one whole read —
            # consensus fragments joined by the raw template between them
            if not cns_p:
                records.append(CnsRecord(tid=tid, left=0, right=n, org_size=n,
                                         seq=tbatch_np[r_, :n].astype(np.uint8),
                                         corrected=False))
                continue
            parts = []
            prev = 0
            for (s, e, seq) in cns_p:
                if s > prev:
                    parts.append(tbatch_np[r_, prev:s].astype(np.uint8))
                parts.append(seq)
                prev = e
            if prev < n:
                parts.append(tbatch_np[r_, prev:n].astype(np.uint8))
            whole = np.concatenate(parts)
            records.append(CnsRecord(tid=tid, left=0, right=n, org_size=n,
                                     seq=whole, corrected=True))
            continue
        for (s, e, seq) in cns_p:
            records.append(CnsRecord(tid=tid, left=s, right=e, org_size=n,
                                     seq=seq, corrected=True))
        for (s, e, seq) in raw_p:
            records.append(CnsRecord(tid=tid, left=s, right=e, org_size=n,
                                     seq=seq, corrected=False))
    return records
