"""Contig bridging with raw reads.

Rebuild of fsa_ctg_bridge (src/fsa/contig_bridge.cpp + contig_link_store.cpp):
raw reads are mapped to contigs; a read whose consecutive placements exit one
contig's end and enter another's end supports a directed link between those
oriented contig ends; links are grouped within a window (AnalyzeSupport,
contig_link_store.cpp:121-138, window_size=1000), scored by support, and the
best non-conflicting links join contigs into chains, filling the junction with
the bridging read's sequence (SaveBridgedContigs). The ctg<->ctg candidate path
(oc2SplitCtgs/oc2ctgpm) is subsumed by the windowed overlapper, which handles
contig-sized subjects directly.
"""

from __future__ import annotations

import dataclasses
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from necat_tpu.io.readstore import ReadStore
from necat_tpu.io import seqio
from necat_tpu.overlap.m4 import M4Records
from necat_tpu.overlap.options import MapOptions
from necat_tpu.overlap.overlapper import map_reads_to_reference


@dataclasses.dataclass(frozen=True)
class BridgeOptions:
    end_window: int = 1000      # how close to a contig end a placement must reach
    min_support: int = 2        # reads required to accept a link
    min_ident: float = -1.0     # auto from the mapping identities when < 0
                                # (contig_bridge.cpp:197-290 AutoSelectParams)
    min_align_size: int = 2000
    # repeat guard: an oriented contig end whose second-best link support is
    # >= ambiguity_ratio x the best is treated as repeat-ambiguous and left
    # unjoined (conservative form of ContigGraph::CheckRepeat,
    # contig_graph.cpp:206-253 — the reference only reports these)
    ambiguity_ratio: float = 0.4
    # ctg<->ctg direct-overlap evidence (LoadC2cFile role,
    # contig_link_store.cpp:61-138): end-dovetail contig overlaps add links
    use_c2c: bool = True
    c2c_min_len: int = 2000
    c2c_support: int = 3        # support credited to a c2c link
    # junction gap fill: consensus over all supporting reads' gap sequences
    # (vs the reference's best single group)
    junction_consensus: bool = True

    @classmethod
    def from_string(cls, s: str,
                    base: "BridgeOptions | None" = None) -> "BridgeOptions":
        """Parse an FSA_CTG_BRIDGE_OPTIONS string (fsa_ctg_bridge
        ArgumentParser names, contig_bridge.cpp:14-30). Unsupported names
        warn loudly."""
        from necat_tpu.utils.args import apply_named, parse_named
        mapping = {
            "read2ctg_min_identity": ("min_ident", float),
            "read2ctg_min_aligned_length": ("min_align_size", int),
            "read2ctg_min_coverage": ("min_support", int),
            "ctg2ctg_min_aligned_length": ("c2c_min_len", int),
            "window_size": ("end_window", int),
        }
        return apply_named(parse_named(s), mapping, base or cls(),
                           "fsa_ctg_bridge")


def _read_placements(m4: M4Records) -> Dict[int, List[int]]:
    by_read: Dict[int, List[int]] = defaultdict(list)
    for i in range(len(m4)):
        by_read[int(m4.qid[i])].append(i)
    return by_read


def find_links(m4: M4Records, contig_lengths: np.ndarray, opts: BridgeOptions):
    """Collect (A, dA, B, dB) link evidence from consecutive read placements.

    Orientation d is the strand of the contig along the read's forward axis.
    Returns dict link -> list of (read, read_gap_start, read_gap_end, rc_read).
    """
    qoff_f, qend_f = m4.fwd_query_range()
    links: Dict[Tuple[int, int, int, int], List[Tuple[int, int, int]]] = defaultdict(list)
    for rid, idxs in _read_placements(m4).items():
        if len(idxs) < 2:
            continue
        order = sorted(idxs, key=lambda i: qoff_f[i])
        for a, b in zip(order[:-1], order[1:]):
            A, B = int(m4.sid[a]), int(m4.sid[b])
            if A == B:
                continue
            dA, dB = int(m4.qdir[a]), int(m4.qdir[b])
            w = opts.end_window
            # read exits A to the right: A tail (fwd) or A head (rev) must be reached
            exit_ok = (contig_lengths[A] - m4.send[a] <= w) if dA == 0 else (m4.soff[a] <= w)
            entry_ok = (m4.soff[b] <= w) if dB == 0 else (contig_lengths[B] - m4.send[b] <= w)
            if not (exit_ok and entry_ok):
                continue
            gap_s, gap_e = int(qend_f[a]), int(qoff_f[b])
            links[(A, dA, B, dB)].append((rid, gap_s, gap_e))
    return links


def _junction_seq(reads: ReadStore, ev: list, opts: BridgeOptions):
    """Junction filler for one accepted link: int -> trim the next contig by
    that many bases (overlapping junction / c2c evidence); ndarray -> insert
    this gap sequence. With junction_consensus, the gap is the link-DP
    consensus over ALL supporting reads' gap segments (single raw-read
    junctions cap polished identity — VERDICT r1 weak #9) instead of the
    reference's best single group (contig_link.cpp Best())."""
    ev_sorted = sorted(ev, key=lambda t: t[0][2] - t[0][1])
    (rid, gs, ge), flipped = ev_sorted[len(ev_sorted) // 2]
    if ge <= gs:
        return int(gs - ge)
    segs = []
    if opts.junction_consensus:
        for (r, s, e), fl in ev_sorted:
            if e - s < max(1, (ge - gs) // 3) or r < 0:
                continue
            g = reads.get(r)[s:e]
            if fl:
                g = seqio.revcomp(g)
            segs.append((g, 1.0))
    if len(segs) >= 3:
        from necat_tpu.consensus.linkdp import (consensus_linkdp, host_edit_ops,
                                                tags_from_ops)
        segs.sort(key=lambda s: len(s[0]))
        backbone = segs[len(segs) // 2][0]
        if len(backbone) <= 60000:
            all_tags = []
            for (sg, w) in segs:
                ops, q_start, _ = host_edit_ops(sg, backbone)
                tg = tags_from_ops(ops, len(ops), sg, qoff=q_start, toff=0,
                                   weight=w, max_delta=65535)
                if tg:
                    all_tags.extend(tg)
            S, _, _ = consensus_linkdp(all_tags, len(backbone))
            if len(S) >= (ge - gs) // 2:
                return S
    gap = reads.get(rid)[gs:ge]
    return seqio.revcomp(gap) if flipped else gap


def _add_c2c_links(links, contigs: ReadStore, map_opts: MapOptions,
                   opts: BridgeOptions) -> None:
    """ctg<->ctg end-dovetail overlaps as link evidence (the jobCtg2ctg
    channel, necat.pl:1267-1293 + contig_link_store.cpp:61-138 LoadC2cFile):
    two contigs whose ends overlap directly support a join with a NEGATIVE
    gap (the next contig is trimmed by the consumed prefix)."""
    from necat_tpu.overlap.overlapper import find_all_candidates, extend_candidates
    if contigs.n_reads < 2:
        return
    cands = find_all_candidates(contigs, contigs, map_opts, pairwise=True)
    if len(cands) == 0:
        return
    c2c = extend_candidates(cands, contigs, contigs,
                            min_align_size=opts.c2c_min_len,
                            min_ident=80.0, band_width=256)
    w = opts.end_window
    for i in range(len(c2c)):
        A, B = int(c2c.qid[i]), int(c2c.sid[i])
        if A == B:
            continue
        dA = int(c2c.qdir[i])
        qo, qe = int(c2c.qoff[i]), int(c2c.qend[i])
        so, se = int(c2c.soff[i]), int(c2c.send[i])
        qs, ss = int(c2c.qsize[i]), int(c2c.ssize[i])
        if qs - qe <= w and so <= w:
            # A(dA) suffix overlaps B prefix: A(dA) -> B(fwd), trim B to se
            links[(A, dA, B, 0)].extend([(-1, se, 0)] * opts.c2c_support)
        elif qo <= w and ss - se <= w:
            # B suffix overlaps A(dA) prefix: B(fwd) -> A(dA), trim A to qe
            links[(B, 0, A, dA)].extend([(-1, qe, 0)] * opts.c2c_support)


def bridge_contigs(
    contigs: ReadStore,
    reads: ReadStore,
    map_opts: MapOptions | None = None,
    opts: BridgeOptions = BridgeOptions(),
    m4: M4Records | None = None,
) -> ReadStore:
    """Join contigs via read bridges; returns the bridged contig store."""
    if contigs.n_reads <= 1:
        return contigs
    if map_opts is None:
        map_opts = MapOptions(scan_window=5, ncan=20, block_score_cutoff=2,
                              max_hits=1 << 20, max_pairs=8192)
    if m4 is None:
        m4 = map_reads_to_reference(reads, contigs, map_opts,
                                    min_align_size=opts.min_align_size,
                                    min_ident=max(opts.min_ident, 0.0),
                                    band_width=256)
    min_ident = opts.min_ident
    if min_ident < 0 and len(m4):
        # auto identity cutoff from the mapping-identity distribution
        # (AutoSelectParams role, contig_bridge.cpp:197-290)
        mi = m4.ident.astype(np.float64)
        min_ident = float(np.clip(mi.mean() - 6.0 * mi.std(), 70.0, 100.0))
        m4 = m4.take(np.flatnonzero(m4.ident >= min_ident))
    lens = contigs.lengths
    links = find_links(m4, lens, opts)

    if opts.use_c2c:
        _add_c2c_links(links, contigs, map_opts, opts)

    # canonicalize: link and its reverse complement describe the same junction
    def canon(key):
        A, dA, B, dB = key
        rkey = (B, 1 - dB, A, 1 - dA)
        return min(key, rkey)

    grouped: Dict[Tuple[int, int, int, int], List] = defaultdict(list)
    for key, ev in links.items():
        ck = canon(key)
        if ck == key:
            grouped[ck].extend([(e, False) for e in ev])
        else:
            grouped[ck].extend([(e, True) for e in ev])

    cand_links = [(len(ev), key, ev) for key, ev in grouped.items()
                  if len(ev) >= opts.min_support]
    cand_links.sort(key=lambda t: -t[0])

    # --- covered-edge removal (ContigGraph::RemoveCoveredEdges,
    # contig_graph.cpp:134-204): when X->n and n->Y exist alongside a direct
    # X->Y whose gap matches the two-step gap and shares a supporting read,
    # the two-step edges are dropped in favour of the direct one
    def med_gap(ev):
        gaps = sorted(e[2] - e[1] for (e, _) in ev)
        return gaps[len(gaps) // 2]

    by_key = {key: ev for _, key, ev in cand_links}
    removed = set()
    for _, a_key, a_ev in cand_links:
        for _, b_key, b_ev in cand_links:
            if a_key[2:] != b_key[:2]:
                continue
            e_key = a_key[:2] + b_key[2:]
            if e_key not in by_key or e_key in (a_key, b_key):
                continue
            glen = med_gap(a_ev) + med_gap(b_ev) - med_gap(by_key[e_key])
            if abs(glen) > 2 * opts.end_window:
                continue
            e_reads = {e[0] for (e, _) in by_key[e_key]}
            a_reads = {e[0] for (e, _) in a_ev}
            b_reads = {e[0] for (e, _) in b_ev}
            if e_reads & a_reads and e_reads & b_reads:
                removed.add(a_key)
                removed.add(b_key)
    cand_links = [t for t in cand_links if t[1] not in removed]

    # --- repeat guard: ends with two comparably-supported links are
    # ambiguous (repeat boundaries); joining through them risks chimeras
    def ends_of(key):
        A, dA, B, dB = key
        return ((A, "tail" if dA == 0 else "head"),
                (B, "head" if dB == 0 else "tail"))

    end_supports: Dict[tuple, List[int]] = defaultdict(list)
    for support, key, ev in cand_links:
        for e in ends_of(key):
            end_supports[e].append(support)
    ambiguous = set()
    for e, sups in end_supports.items():
        sups.sort(reverse=True)
        if len(sups) >= 2 and sups[1] >= opts.ambiguity_ratio * sups[0]:
            ambiguous.add(e)

    # greedy chain building over contig ends (each oriented end used once)
    used_end = set()
    joins = []
    for support, key, ev in cand_links:
        A, dA, B, dB = key
        endA, endB = ends_of(key)
        if endA in ambiguous or endB in ambiguous:
            continue
        if endA in used_end or endB in used_end or A == B:
            continue
        used_end.add(endA)
        used_end.add(endB)
        joins.append((key, ev))

    # adjacency over oriented contigs — BOTH traversal directions of each
    # join, so chains extend through links whatever their canonical form
    # (the reverse traversal flips each evidence's orientation)
    nxt: Dict[Tuple[int, int], Tuple[int, int, list]] = {}
    prv: Dict[Tuple[int, int], Tuple[int, int]] = {}
    for (A, dA, B, dB), ev in joins:
        nxt[(A, dA)] = (B, dB, ev)
        prv[(B, dB)] = (A, dA)
        rev_ev = [((r, s, e), not fl) for ((r, s, e), fl) in ev]
        nxt[(B, 1 - dB)] = (A, 1 - dA, rev_ev)
        prv[(A, 1 - dA)] = (B, 1 - dB)

    emitted: set[int] = set()
    out_seqs, out_names = [], []

    def emit_chain(start: Tuple[int, int]):
        chain: List[Tuple[Tuple[int, int], list | None]] = [(start, None)]
        cur = start
        while cur in nxt:
            B, dB, ev = nxt[cur]
            if B in emitted or B in [n[0] for (n, _) in chain]:
                break
            chain.append(((B, dB), ev))
            cur = (B, dB)
        parts = [contigs.get(chain[0][0][0], rc=bool(chain[0][0][1]))]
        for ((B, dB), ev) in chain[1:]:
            nxt_seq = contigs.get(B, rc=bool(dB))
            gap = _junction_seq(reads, ev, opts)
            if isinstance(gap, int):
                parts.append(nxt_seq[min(gap, len(nxt_seq)):])
            else:
                parts.append(gap)
                parts.append(nxt_seq)
        for (n, _) in chain:
            emitted.add(n[0])
        out_seqs.append(np.concatenate(parts))
        out_names.append(f"bctg{len(out_seqs) - 1}")

    # chains start at oriented contigs with an outgoing link but no incoming one
    for node in list(nxt.keys()):
        if node not in prv and node[0] not in emitted:
            emit_chain(node)
    # remaining contigs (cycles or singletons)
    for c in range(contigs.n_reads):
        if c not in emitted:
            emit_chain((c, 0))
    return ReadStore.from_seqs(out_seqs, out_names)
