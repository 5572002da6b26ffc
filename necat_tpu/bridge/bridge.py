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
    min_ident: float = 70.0
    min_align_size: int = 2000


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
    if m4 is None:
        if map_opts is None:
            map_opts = MapOptions(scan_window=5, ncan=20, block_score_cutoff=2,
                                  max_hits=1 << 20, max_pairs=8192)
        m4 = map_reads_to_reference(reads, contigs, map_opts,
                                    min_align_size=opts.min_align_size,
                                    min_ident=opts.min_ident, band_width=256)
    lens = contigs.lengths
    links = find_links(m4, lens, opts)

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

    # greedy chain building over contig ends (each oriented end used once)
    used_end = set()
    joins = []
    for support, key, ev in cand_links:
        A, dA, B, dB = key
        endA = (A, "tail" if dA == 0 else "head")
        endB = (B, "head" if dB == 0 else "tail")
        if endA in used_end or endB in used_end or A == B:
            continue
        used_end.add(endA)
        used_end.add(endB)
        joins.append((key, ev))

    # adjacency over oriented contigs
    nxt: Dict[Tuple[int, int], Tuple[int, int, tuple]] = {}
    prv: Dict[Tuple[int, int], Tuple[int, int]] = {}
    for (A, dA, B, dB), ev in joins:
        # pick the median-gap evidence; remember whether it was observed flipped
        ev_sorted = sorted(ev, key=lambda t: t[0][2] - t[0][1])
        (rid, gs, ge), flipped = ev_sorted[len(ev_sorted) // 2]
        nxt[(A, dA)] = (B, dB, (rid, gs, ge, flipped))
        prv[(B, dB)] = (A, dA)

    emitted: set[int] = set()
    out_seqs, out_names = [], []

    def emit_chain(start: Tuple[int, int]):
        chain: List[Tuple[Tuple[int, int], tuple | None]] = [(start, None)]
        cur = start
        while cur in nxt:
            B, dB, spec = nxt[cur]
            if B in emitted or B in [n[0] for (n, _) in chain]:
                break
            chain.append(((B, dB), spec))
            cur = (B, dB)
        parts = [contigs.get(chain[0][0][0], rc=bool(chain[0][0][1]))]
        for ((B, dB), spec) in chain[1:]:
            rid, gs, ge, flipped = spec
            nxt_seq = contigs.get(B, rc=bool(dB))
            if ge > gs:
                gap = reads.get(rid)[gs:ge]
                if flipped:
                    gap = seqio.revcomp(gap)
                parts.append(gap)
                parts.append(nxt_seq)
            else:
                trim = min(gs - ge, len(nxt_seq))  # overlapping junction
                parts.append(nxt_seq[trim:])
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
