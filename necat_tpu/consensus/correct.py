"""Read correction driver: candidates -> wave-based extension -> tag consensus.

Batched re-design of consensus_one_read (src/consensus/consensus_one_read.c:215-392):
templates are processed in length-bucketed batches; each wave extends up to
`wave_size` fresh candidates per template (the reference's waves of 50,
:317-372), skipping already-extended query reads and regions at max_cov. The
adaptive identity cutoff comes from the first good overlaps
(error_estimate.c:32-184). Accepted alignments scatter tags into the dense
consensus tensor; uncovered gaps >= raw_min_gap pass through uncorrected.

The oc2pcan shuffle (partition_candidates/pcan.c) is replaced by an in-memory
role-expansion + lexsort grouping of candidates by template id.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from necat_tpu.align.banded import extend_batch
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bucket_len(x: int) -> int:
    """Pad lengths to one of the global shape tiers (bounds recompiles)."""
    return shapes.length_tier(x)


def group_by_template(cands: Candidates, max_examined: int):
    """Sort candidates by (sid, score desc); return dict sid -> index array."""
    order = np.lexsort((-cands.score, cands.sid))
    sid_sorted = cands.sid[order]
    groups: Dict[int, np.ndarray] = {}
    if len(order) == 0:
        return groups
    bounds = np.flatnonzero(np.r_[True, sid_sorted[1:] != sid_sorted[:-1]])
    bounds = np.r_[bounds, len(order)]
    for i in range(len(bounds) - 1):
        s, e = bounds[i], bounds[i + 1]
        tid = int(sid_sorted[s])
        groups[tid] = order[s:min(e, s + max_examined)]
    return groups


# --------------------------------------------------------------------- driver

def correct_reads(
    store: ReadStore,
    cands: Candidates,
    opts: CnsOptions = CnsOptions(),
    min_cov_for_template: int | None = None,
    emit_uncorrected: bool = True,
    verbose: bool = False,
    template_ids=None,
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
    # one-time 2-bit upload; per-chunk pair batches are gathered ON DEVICE
    # (the tunnel-attached TPU link runs ~34 MB/s — raw uint8 re-uploads were
    # the dominant correction cost; see io/devstore.py)
    from necat_tpu.io.devstore import DeviceReadStore
    with timed("cns.devstore_init"):
        dev = DeviceReadStore(store) if len(tids_sorted) else None
    for bstart in range(0, len(tids_sorted), TB):
        tb_ids = tids_sorted[bstart:bstart + TB]
        recs = _correct_bucket(store, dev, cands, groups, tb_ids, opts, verbose)
        records.extend(recs)
    return records


def _correct_bucket(store, dev, cands, groups, tb_ids, opts: CnsOptions, verbose: bool):
    n_real_templates = len(tb_ids)
    TB = opts.templates_per_batch  # fixed batch shape; pad the tail bucket
    if n_real_templates < TB:
        tb_ids = np.concatenate([tb_ids, np.repeat(tb_ids[-1:], TB - n_real_templates)])
    Lt = _bucket_len(int(store.lengths[tb_ids].max()))
    with timed("cns.bucket_setup"):
        tbatch_np, tlens_np = store.padded_batch(tb_ids, pad_to=Lt, multiple=1)
    tlens_np = tlens_np.copy()
    tlens_np[n_real_templates:] = 0  # padding rows emit nothing
    D = opts.max_delta

    weights = jnp.zeros((TB + 1, D, 5, Lt), jnp.float32)
    covten = jnp.zeros((TB + 1, Lt), jnp.int32)
    cov_host = np.zeros((TB, Lt), np.int32)
    extended: List[set] = [set() for _ in range(TB)]
    cursor = np.zeros(TB, np.int64)
    cutoff = np.full(TB, np.nan)
    cand_idx = [groups[int(t)] if b < n_real_templates else np.zeros(0, np.int64)
                for b, t in enumerate(tb_ids)]

    round_id = 0
    from necat_tpu.utils.logging import timed as _timed
    if opts.use_fixed_ident_cutoff:
        cutoff[:] = 100.0 * (1.0 - opts.error)
        round_id = 1  # no estimation round (consensus_one_read.c:273-278)
    max_rounds = -(-opts.max_examined // opts.wave_size) + 1
    while round_id <= max_rounds:
        wave = (opts.n_ident + 10) if round_id == 0 else opts.wave_size
        # build pair list for this round
        _tb = __import__('time').perf_counter
        _t0 = _tb()
        rows, cidx = [], []
        for b in range(TB):
            idxs = cand_idx[b]
            if cursor[b] >= len(idxs):
                continue
            n = int(tlens_np[b])
            if round_id > 0 and np.all(cov_host[b, :n] >= opts.max_cov):
                cursor[b] = len(idxs)
                continue
            taken = 0
            while cursor[b] < len(idxs) and taken < wave:
                ci = idxs[cursor[b]]
                cursor[b] += 1
                qid = int(cands.qid[ci])
                if qid in extended[b]:
                    continue
                if round_id > 0:
                    sb, se = int(cands.sbeg[ci]), int(cands.send[ci])
                    if np.all(cov_host[b, sb:se] >= opts.max_cov):
                        continue
                extended[b].add(qid)
                rows.append(b)
                cidx.append(ci)
                taken += 1
        if not rows:
            if round_id == 0:
                round_id += 1
                continue
            break
        rows = np.array(rows)
        cidx = np.array(cidx)
        from necat_tpu.utils import logging as _lg
        _lg._TIMERS['cns.wave_build'] += _tb() - _t0; _lg._COUNTS['cns.wave_build'] += 1

        # extension in query-length-bucketed chunks
        with _timed('cns.extend_pairs_total'):
            results = _extend_pairs(store, dev, cands, tb_ids, tlens_np, rows,
                                    cidx, Lt, opts)

        # round 0: estimate identity cutoffs
        _t0 = _tb()
        if round_id == 0:
            for b in np.unique(rows):
                sel = rows == b
                r = results
                ql, qr = r["qoff"][sel], r["qend"][sel]
                tl, tr = r["toff"][sel], r["tend"][sel]
                qs = cands.qsize[cidx[sel]]
                ts = int(tlens_np[b])
                ok_align = r["n_cols"][sel] >= opts.min_align_size
                good = is_good_overlap(ql, qr, qs, tl, tr, ts, opts.good_end_margin) & ok_align
                idents = r["ident"][sel][good][:opts.n_ident]
                if len(idents) < opts.n_ident:
                    spans = (((qr - ql) >= 0.6 * qs) | ((tr - tl) >= 0.6 * ts)) & ok_align
                    idents = r["ident"][sel][spans][:opts.n_ident]
                cutoff[b] = estimate_ident_cutoff(np.asarray(idents))

        # acceptance
        qs = cands.qsize[cidx]
        ts = tlens_np[rows].astype(np.int64)
        ql, qr = results["qoff"], results["qend"]
        tl, tr = results["toff"], results["tend"]
        ident = results["ident"]
        cut = np.where(np.isnan(cutoff[rows]), 0.0, cutoff[rows])
        ok = results["n_cols"] >= opts.min_align_size
        ok &= check_mapping_range(ql, qr, qs, tl, tr, ts, opts.min_align_size, opts.mapping_ratio)
        pass_ident = ident >= cut
        if round_id > 0:
            pass_ident |= is_full_cov_ovlp(ql, qr, qs, tl, tr, ts, 5000, 100)
        ok &= pass_ident

        _lg._TIMERS['cns.accept'] += _tb() - _t0

        # scatter accepted tags
        with _timed('cns.scatter_round_total'):
            weights, covten = _scatter_round(results, rows, ok, weights, covten, tlens_np, TB)
        _t0 = _tb()
        for i in np.flatnonzero(ok):
            b = rows[i]
            cov_host[b, tl[i]:tr[i]] += 1
        _lg._TIMERS['cns.cov_host'] += _tb() - _t0
        round_id += 1

    # consensus call + bit-packed download (4 B/position) + host compaction
    with timed("cns.call_consensus"):
        packed = consensus_packed(weights[:TB], covten[:TB], opts.min_cov,
                                  opts.ins_frac, opts.ins_offset)
    with timed("cns.compact"):
        # full consensus (-f 1, intermediate iterations) keeps reads whole:
        # covered-run threshold drops to 0.85*min_size (cbcns.c:200) and the
        # fragments are stitched with raw template gaps below
        min_run = (max(1, int(opts.min_size * 0.85))
                   if opts.full_consensus else None)
        pieces = compact_from_packed(np.asarray(packed), tlens_np, tbatch_np,
                                     opts.min_size, opts.raw_min_gap,
                                     max_delta=D, min_run=min_run)
    records = []
    for b, (cns_p, raw_p) in enumerate(pieces):
        if b >= n_real_templates:
            break
        tid = int(tb_ids[b])
        n = int(tlens_np[b])
        if opts.full_consensus:
            # consensus_unbroken (src/tasc/cbcns.c:171-252): one whole read —
            # consensus fragments joined by the raw template between them
            if not cns_p:
                records.append(CnsRecord(tid=tid, left=0, right=n, org_size=n,
                                         seq=tbatch_np[b, :n].astype(np.uint8),
                                         corrected=False))
                continue
            parts = []
            prev = 0
            for (s, e, seq) in cns_p:
                if s > prev:
                    parts.append(tbatch_np[b, prev:s].astype(np.uint8))
                parts.append(seq)
                prev = e
            if prev < n:
                parts.append(tbatch_np[b, prev:n].astype(np.uint8))
            whole = np.concatenate(parts)
            records.append(CnsRecord(tid=tid, left=0, right=n, org_size=n,
                                     seq=whole, corrected=True))
            continue
        for (s, e, seq) in cns_p:
            records.append(CnsRecord(tid=tid, left=s, right=e, org_size=n, seq=seq, corrected=True))
        for (s, e, seq) in raw_p:
            records.append(CnsRecord(tid=tid, left=s, right=e, org_size=n, seq=seq, corrected=False))
    return records


def _extend_pairs(store, dev, cands, tb_ids, tlens_np, rows, cidx, Lt, opts: CnsOptions):
    """Extend all pairs of a round; returns host dict of per-pair results and keeps
    device-side ops under keys (chunked).

    Targets are gathered as WINDOWS around each candidate anchor (bounded by
    1.3x the query side, oc_aligner.c:127-131), so padded target size scales
    with read length even for huge templates (polish segments). Query rows and
    target windows are materialized on device from the 2-bit packed store
    (DeviceReadStore.gather) — the per-chunk h2d is only the row descriptors."""
    qsizes = cands.qsize[cidx]
    t_goff = dev.offsets[tb_ids]  # global base offset of each template row
    left_need = (cands.qbeg[cidx].astype(np.int64) * 13) // 10 + 600
    right_need = ((cands.qsize[cidx] - cands.qbeg[cidx]).astype(np.int64) * 13) // 10 + 600
    ws = np.maximum(cands.sbeg[cidx] - left_need, 0)
    we = np.minimum(cands.sbeg[cidx] + right_need, tlens_np[rows].astype(np.int64))
    wlen = we - ws
    out = {k: np.zeros(len(cidx), np.int64) for k in ("qoff", "qend", "toff", "tend", "n_cols")}
    out["ident"] = np.zeros(len(cidx), np.float64)
    out["chunks"] = []
    lane_of = {}

    def run_pass(pair_idx: np.ndarray, W: int, live_default: bool):
        tier = np.array([_bucket_len(int(max(qsizes[p], wlen[p]))) for p in pair_idx])
        order = pair_idx[np.lexsort((qsizes[pair_idx], tier))]
        tier_of = dict(zip(pair_idx.tolist(), tier.tolist()))
        # phase 1: build + dispatch every chunk (async) so the device pipelines
        # chunk k+1's transfer/compute under chunk k's execution; syncing after
        # each dispatch would serialize host build time with device time
        pending = []
        cs = 0
        while cs < len(order):
            L = tier_of[int(order[cs])]
            PBmax = min(shapes.pairs_per_chunk(L, W), opts.pairs_per_chunk)
            sel = order[cs:cs + PBmax]
            sel = sel[[tier_of[int(p)] == L for p in sel]]  # keep single-tier
            cs += len(sel)
            n_real = len(sel)
            # pair dim snapped to {128, 512}: two shapes bound the number of
            # compiled program variants (each extra PB value multiplies the
            # extension+scatter compile count by the number of length tiers)
            PB = min(PBmax, 128 if n_real <= 128 else 512)
            with timed("cns.chunk_build"):
                csel = cidx[sel]
                qg = np.zeros(PB, np.int64)
                qglen = np.zeros(PB, np.int64)
                qrc = np.zeros(PB, bool)
                tg = np.zeros(PB, np.int64)
                tglen = np.zeros(PB, np.int64)
                qlens = np.zeros(PB, np.int32)
                tlens = np.zeros(PB, np.int32)
                aq = np.zeros(PB, np.int32)
                at = np.zeros(PB, np.int32)
                qids = cands.qid[csel]
                qg[:n_real] = dev.offsets[qids]
                qglen[:n_real] = dev.offsets[qids + 1] - qg[:n_real]
                qrc[:n_real] = cands.qdir[csel].astype(bool)
                tg[:n_real] = t_goff[rows[sel]] + ws[sel]
                tglen[:n_real] = wlen[sel]
                qlens[:n_real] = cands.qsize[csel]
                tlens[:n_real] = wlen[sel]
                aq[:n_real] = cands.qbeg[csel]
                at[:n_real] = cands.sbeg[csel] - ws[sel]
            with timed("cns.extend_dispatch"):
                qb = dev.gather(qg, qglen, qrc, L)
                tb = dev.gather(tg, tglen, np.zeros(PB, bool), L)
                res = extend_batch(qb, jnp.asarray(qlens),
                                   tb, jnp.asarray(tlens),
                                   jnp.asarray(aq), jnp.asarray(at), W=W)
                try:  # start the d2h copy now; phase 2 reads without a sync
                    res.stats.copy_to_host_async()
                except Exception:
                    pass
            pending.append((sel, res, qb, n_real, aq, at))
        # phase 2: collect
        for sel, res, qb, n_real, aq, at in pending:
            with timed("cns.stats_sync"):
                st = np.asarray(res.stats)          # single host transfer: [6, PB]
            r = slice(0, n_real)
            # ident recomputed on host from the packed stats (n_match/n_cols)
            # to avoid a second device->host sync per chunk
            ident = np.where(st[4, r] > 0,
                             100.0 * st[5, r] / np.maximum(st[4, r], 1), 0.0)
            live = np.full(n_real, live_default)
            chunk_i = len(out["chunks"])
            if not live_default:
                # rescue pass: keep the wider result only where it aligned more
                better = st[4, r] >= out["n_cols"][sel]
                live[:] = better
                for j, (p, b) in enumerate(zip(sel, better)):
                    if b:
                        ci, k = lane_of[int(p)]
                        out["chunks"][ci][6][k] = False  # kill original lane
                        lane_of[int(p)] = (chunk_i, j)
                upd = sel[better]
                ur = np.flatnonzero(better)
                out["qoff"][upd] = st[0, ur]
                out["qend"][upd] = st[1, ur]
                out["toff"][upd] = st[2, ur] + ws[upd]
                out["tend"][upd] = st[3, ur] + ws[upd]
                out["n_cols"][upd] = st[4, ur]
                out["ident"][upd] = ident[ur]
            else:
                for k, p in enumerate(sel):
                    lane_of[int(p)] = (chunk_i, k)
                out["qoff"][sel] = st[0, r]
                out["qend"][sel] = st[1, r]
                out["toff"][sel] = st[2, r] + ws[sel]
                out["tend"][sel] = st[3, r] + ws[sel]
                out["n_cols"][sel] = st[4, r]
                out["ident"][sel] = ident
            out["chunks"].append([sel, res, qb, ws[sel],
                                  aq.copy(), at.copy(), live])

    run_pass(np.arange(len(cidx)), opts.band_width, True)
    if opts.rescue_long_indels and len(cidx):
        # cns_extension rescue trigger (consensus_aux.c:152-157): aligned query
        # range fell short of the chain-predicted range by > 200 bp
        lhang = np.maximum(out["qoff"] - cands.qbeg[cidx], 0)
        rhang = np.maximum(cands.qend[cidx] - out["qend"], 0)
        bad = np.flatnonzero((lhang + rhang) > 200)
        if len(bad):
            run_pass(bad, opts.band_width * opts.rescue_band_scale, False)
    return out


def _scatter_round(results, rows, ok, weights, covten, tlens_np, TB):
    use_mm = tags_mod.use_mm_scatter()
    for sel, res, qb, ws_sel, aq, at, live in results["chunks"]:
        PB = int(res.left_cols.shape[0])
        n_real = len(sel)
        pair_row = np.full(PB, TB, np.int32)           # padding rows -> trash row
        pair_row[:n_real] = np.where(ok[sel] & live, rows[sel], TB)
        w = np.zeros(PB, np.float32)
        w[:n_real] = tags_mod.calc_cns_weight(results["ident"][sel])
        tsz = np.zeros(PB, np.int32)
        tsz[:n_real] = tlens_np[rows[sel]]
        # window-local anchors; tags use ABSOLUTE template coords
        at_abs = at.astype(np.int64).copy()
        at_abs[:n_real] += ws_sel
        at_j = jnp.asarray(at_abs.astype(np.int32))
        row_j, w_j, tsz_j = (jnp.asarray(pair_row), jnp.asarray(w),
                             jnp.asarray(tsz))
        Lt = int(weights.shape[3])
        with timed("cns.scatter"):
            if use_mm:
                from necat_tpu.align.banded import OP_PAD as _PAD
                weights, covten = tags_mod.scatter_pass_cols_mm(
                    weights, covten,
                    tags_mod.pad_cols_to(res.right_cols, Lt, _PAD),
                    tags_mod.pad_cols_to(res.right_insb, Lt, 0),
                    res.right_lead, res.right_leadb, res.right_jc,
                    at_j, row_j, w_j, tsz_j, reversed_part=False)
                weights, covten = tags_mod.scatter_pass_cols_mm(
                    weights, covten,
                    tags_mod.pad_cols_to(res.left_cols, Lt, _PAD),
                    tags_mod.pad_cols_to(res.left_insb, Lt, 0),
                    res.left_lead, res.left_leadb, res.left_jc,
                    at_j, row_j, w_j, tsz_j, reversed_part=True)
            else:
                args = (qb, jnp.asarray(aq), at_j, row_j, w_j, tsz_j)
                weights, covten = tags_mod.scatter_pass_cols(
                    weights, covten, res.right_cols, res.right_lead,
                    res.right_jc, *args, reversed_part=False)
                weights, covten = tags_mod.scatter_pass_cols(
                    weights, covten, res.left_cols, res.left_lead,
                    res.left_jc, *args, reversed_part=True)
    return weights, covten
