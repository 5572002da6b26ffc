"""Overlap filtering before string-graph assembly.

Host-side rebuild of fsa_ol_filter (src/fsa/overlap_filter.{hpp,cpp}): the pass
pipeline StatLowQuality -> FilterLowQuality -> GroupAndFilterDuplicate ->
FilterContained -> FilterCoverage -> FilterBestN (overlap_filter.hpp:104-117),
with auto-selected identity/overhang thresholds from per-read statistics
(AutoSelectParams, :119-128). Overhang ends within the threshold are clamped to
the sequence ends (ModifyEnd) so the graph sees proper dovetails. NumPy
vectorized; the MT variants of the reference collapse into array passes.

Overlaps are in the A/B co-directional frame: A = query on its qdir strand
(qoff/qend), B = subject forward (soff/send).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from necat_tpu.overlap.m4 import M4Records


@dataclasses.dataclass(frozen=True)
class FilterOptions:
    min_identity: float = -1.0       # auto when < 0 (overlap_filter.hpp min_identity_)
    min_identity_raw: float = 70.0
    max_overhang: int = -1           # auto when < 0
    max_overhang_raw: int = 1000
    min_length: int = 2500
    min_aligned_length: int = 2500
    bestn: int = 10
    min_coverage: int = -1           # auto when < 0
    max_coverage: int = -1
    coverage_discard: float = 0.01
    identity_deviation: float = 6.0  # identity_global_deviation2_
    overhang_deviation: float = 6.0


@dataclasses.dataclass
class FilterResult:
    m4: M4Records
    min_identity: float
    max_overhang: int
    contained: np.ndarray   # read ids judged contained
    filtered_reads: np.ndarray


def _per_read_stats(m4: M4Records, n_reads: int):
    """Per-read median identity and overhang over its overlaps (CalcReadInfo)."""
    qoff_f, qend_f = m4.fwd_query_range()
    oh_q = np.minimum(qoff_f, m4.qsize - qend_f)
    oh_s = np.minimum(m4.soff, m4.ssize - m4.send)
    ident_sum = np.zeros(n_reads)
    oh_sum = np.zeros(n_reads)
    cnt = np.zeros(n_reads)
    for ids, ident, oh in ((m4.qid, m4.ident, oh_q), (m4.sid, m4.ident, oh_s)):
        np.add.at(ident_sum, ids, ident)
        np.add.at(oh_sum, ids, oh)
        np.add.at(cnt, ids, 1)
    with np.errstate(invalid="ignore"):
        mean_ident = np.where(cnt > 0, ident_sum / np.maximum(cnt, 1), np.nan)
        mean_oh = np.where(cnt > 0, oh_sum / np.maximum(cnt, 1), np.nan)
    return mean_ident, mean_oh, cnt


def auto_thresholds(m4: M4Records, n_reads: int, opts: FilterOptions) -> Tuple[float, int]:
    """AutoSelectParams (overlap_filter.cpp): identity threshold = mean - dev*std of
    per-read identities; overhang threshold from the typical dovetail hang.

    The overhang statistic uses the distribution of per-overlap min-hangs
    robustly (median of the dovetail-like population), because partial/repeat
    overlaps inflate a mean+dev estimate to the cap and everything then counts
    as contained."""
    mean_ident, mean_oh, cnt = _per_read_stats(m4, n_reads)
    have = cnt > 0
    if not have.any():
        return opts.min_identity_raw, opts.max_overhang_raw
    mi = mean_ident[have]
    ident_thr = float(np.clip(mi.mean() - opts.identity_deviation * mi.std(),
                              opts.min_identity_raw, 100.0))
    qoff_f, qend_f = m4.fwd_query_range()
    oh = np.minimum(np.minimum(qoff_f, m4.qsize - qend_f),
                    np.minimum(m4.soff, m4.ssize - m4.send))
    med = float(np.median(oh))
    mad = float(np.median(np.abs(oh - med))) + 1.0
    oh_thr = int(np.clip(med + opts.overhang_deviation * mad + 30, 50,
                         opts.max_overhang_raw))
    return ident_thr, oh_thr


def clamp_ends(m4: M4Records, maxoh: int) -> M4Records:
    """ModifyEnd: clamp overhangs <= maxoh onto the sequence ends so dovetails
    become exact."""
    qoff = np.where(m4.qoff <= maxoh, 0, m4.qoff)
    qend = np.where(m4.qsize - m4.qend <= maxoh, m4.qsize, m4.qend)
    soff = np.where(m4.soff <= maxoh, 0, m4.soff)
    send = np.where(m4.ssize - m4.send <= maxoh, m4.ssize, m4.send)
    out = M4Records(**{f: getattr(m4, f).copy() for f in
                       ("qid", "sid", "ident", "vscore", "qdir", "qoff", "qend",
                        "qsize", "sdir", "soff", "send", "ssize")})
    out.qoff, out.qend, out.soff, out.send = (qoff.astype(np.int32), qend.astype(np.int32),
                                              soff.astype(np.int32), send.astype(np.int32))
    return out


def classify(m4: M4Records):
    """Per overlap: is A contained / B contained / proper dovetail (after clamping).

    Containment/location semantics follow Overlap::Location (fsa/overlap.hpp:40-73).
    """
    a_l = m4.qoff
    a_r = m4.qsize - m4.qend
    b_l = m4.soff
    b_r = m4.ssize - m4.send
    a_contained = (a_l == 0) & (a_r == 0)
    b_contained = (b_l == 0) & (b_r == 0)
    # proper dovetail: at each end one of the reads is exhausted
    left_ok = (a_l == 0) | (b_l == 0)
    right_ok = (a_r == 0) | (b_r == 0)
    proper = left_ok & right_ok
    return a_contained, b_contained, proper


def filter_overlaps(m4: M4Records, n_reads: int, opts: FilterOptions = FilterOptions()) -> FilterResult:
    if len(m4) == 0:
        return FilterResult(m4, opts.min_identity_raw, opts.max_overhang_raw,
                            np.zeros(0, np.int64), np.zeros(0, np.int64))
    # --- auto params + low-quality pass
    min_ident = opts.min_identity
    max_oh = opts.max_overhang
    if min_ident < 0 or max_oh < 0:
        ai, ao = auto_thresholds(m4, n_reads, opts)
        if min_ident < 0:
            min_ident = ai
        if max_oh < 0:
            max_oh = ao
    keep = (m4.ident >= min_ident)
    keep &= (m4.qsize >= opts.min_length) & (m4.ssize >= opts.min_length)
    span = np.maximum(m4.qend - m4.qoff, m4.send - m4.soff)
    keep &= span >= opts.min_aligned_length
    m4 = m4.take(np.flatnonzero(keep))
    # classification uses end-clamped coords (ModifyEnd); the RETURNED records
    # keep original coordinates so the graph can trim true unaligned tails.
    cl = clamp_ends(m4, max_oh)
    a_c, b_c, proper = classify(cl)
    # overhang filter: non-proper, non-containment overlaps are local/repeat hits
    keep2 = np.flatnonzero(proper | a_c | b_c)
    m4, cl = m4.take(keep2), cl.take(keep2)

    # --- duplicate pass: keep best aligned length per (qid, sid) pair
    pair_lo = np.minimum(m4.qid, m4.sid).astype(np.int64)
    pair_hi = np.maximum(m4.qid, m4.sid).astype(np.int64)
    pair_key = pair_lo * (n_reads + 1) + pair_hi
    alen = np.maximum(m4.qend - m4.qoff, m4.send - m4.soff)
    order = np.lexsort((-alen, pair_key))
    first = np.sort(order[np.r_[True, pair_key[order][1:] != pair_key[order][:-1]]])
    m4, cl = m4.take(first), cl.take(first)
    a_c, b_c, proper = classify(cl)

    # --- contained reads
    contained = np.zeros(n_reads, bool)
    contained[m4.qid[a_c]] = True
    contained[m4.sid[b_c]] = True
    keep3 = np.flatnonzero(~(contained[m4.qid] | contained[m4.sid]))
    m4, cl = m4.take(keep3), cl.take(keep3)

    # --- coverage filter (FilterCoverage): per-read max depth of overlap intervals
    filtered_reads = np.zeros(n_reads, bool)
    if len(m4):
        max_covs = _per_read_max_cov(cl, n_reads)
        have = max_covs > 0
        if have.sum() >= 8:
            mc = max_covs[have]
            if opts.max_coverage < 0:
                p75 = np.percentile(mc, 75)
                cap = max(p75 * 4, 20)
            else:
                cap = opts.max_coverage
            bad = max_covs > cap
            filtered_reads = bad
            keep4 = np.flatnonzero(~(bad[m4.qid] | bad[m4.sid]))
            m4, cl = m4.take(keep4), cl.take(keep4)

    # --- best-N per read per end (side classification on clamped coords)
    if len(m4) and opts.bestn > 0:
        keep5 = _best_n_mask(cl, opts.bestn)
        m4 = m4.take(np.flatnonzero(keep5))

    return FilterResult(m4, min_ident, int(max_oh),
                        np.flatnonzero(contained), np.flatnonzero(filtered_reads))


def _per_read_max_cov(m4: M4Records, n_reads: int, bin_size: int = 500) -> np.ndarray:
    """Approximate per-read max overlap depth using bins."""
    max_cov = np.zeros(n_reads, np.int32)
    qoff_f, qend_f = m4.fwd_query_range()
    for ids, lo, hi, size in ((m4.qid, qoff_f, qend_f, m4.qsize),
                              (m4.sid, m4.soff, m4.send, m4.ssize)):
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        bounds = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
        bounds = np.r_[bounds, len(ids_s)]
        for i in range(len(bounds) - 1):
            s, e = bounds[i], bounds[i + 1]
            rid = int(ids_s[s])
            nb = int(size[order[s]]) // bin_size + 2
            acc = np.zeros(nb, np.int32)
            b0 = lo[order[s:e]] // bin_size
            b1 = hi[order[s:e]] // bin_size
            np.add.at(acc, b0, 1)
            np.add.at(acc, np.minimum(b1 + 1, nb - 1), -1)
            depth = np.cumsum(acc)
            max_cov[rid] = max(max_cov[rid], int(depth.max()))
    return max_cov


def _best_n_mask(cl: M4Records, bestn: int) -> np.ndarray:
    """FilterBestN: keep each read's best n overlaps per end (left/right),
    classified on end-clamped coords."""
    alen = np.maximum(cl.qend - cl.qoff, cl.send - cl.soff)
    qoff_f, qend_f = cl.fwd_query_range()
    # end of each overlap on each read: 0 = left (prefix), 1 = right (suffix)
    q_end_side = np.where(qoff_f == 0, 0, 1)
    s_end_side = np.where(cl.soff == 0, 0, 1)
    keep = np.zeros(len(cl), bool)
    for ids, side in ((cl.qid, q_end_side), (cl.sid, s_end_side)):
        key = ids.astype(np.int64) * 2 + side
        order = np.lexsort((-alen, key))
        key_s = key[order]
        newg = np.r_[True, key_s[1:] != key_s[:-1]]
        grp_first = np.flatnonzero(newg)
        gid = np.cumsum(newg) - 1
        rank = np.arange(len(order)) - grp_first[gid]
        keep[order[rank < bestn]] = True
    return keep
