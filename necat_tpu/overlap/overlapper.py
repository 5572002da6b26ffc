"""End-to-end overlapper: read sets -> extended M4 overlaps.

This is the TPU equivalent of the oc2asmpm / oc2pmov(-j 1) / oc2rm binaries
(src/asm_pm/asmpm.c, src/pm_one_volume/pm_worker.c:28-82 extend_candidates,
src/reference_mapping/rm_worker.c): candidate detection (index + chain DP)
followed by banded extension to precise endpoints + identity. One code path
serves all of: trim-stage all-vs-all, assembly overlaps on trimmed reads,
read->contig mapping for bridging/polishing, and contig<->contig alignment.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from necat_tpu.align.banded import extend_batch
from necat_tpu.index.kmer_index import KmerIndex
from necat_tpu.io.readstore import ReadStore
from necat_tpu.overlap.candidates import Candidates, find_candidates_batch, top_n_per_query
from necat_tpu.overlap.m4 import M4Records
from necat_tpu.overlap.options import MapOptions
from necat_tpu.utils import shapes


def _bucket_len(x: int, lo: int = 2048) -> int:
    return shapes.length_tier(x)


def find_all_candidates(
    qstore: ReadStore,
    sstore: ReadStore,
    opts: MapOptions,
    pairwise: bool,
    query_batch_size: int = 256,
    index: Optional[KmerIndex] = None,
    progress: Optional[Callable[[str], None]] = None,
    subject_read_start: int = 0,
    query_ids: Optional[np.ndarray] = None,
) -> Candidates:
    """Candidates of qstore reads against sstore (one subject volume).

    pairwise=True means qstore is sstore (same id space) and self/duplicate
    hits are suppressed (each overlap reported once with sid < qid).
    subject_read_start: global read id of the volume's first read (oc2pmov's
    volume offset). query_ids restricts/labels the queries (global ids).
    """
    if index is None:
        index = KmerIndex.build(sstore.bases, sstore.offsets, k=opts.kmer_size,
                                occ_cutoff=opts.occ_cutoff)
    sub_off = jnp.asarray(sstore.offsets.astype(np.int32))
    sub_sizes = sstore.lengths.astype(np.int32)
    parts = []
    all_q = np.arange(qstore.n_reads) if query_ids is None else np.asarray(query_ids)
    order = all_q[np.argsort(qstore.lengths[all_q], kind="stable")]
    for bs in range(0, len(order), query_batch_size):
        qidx = order[bs:bs + query_batch_size]
        n_real = len(qidx)
        if n_real < query_batch_size:  # pad to a fixed batch shape
            qidx = np.concatenate([qidx, np.repeat(qidx[-1:], query_batch_size - n_real)])
        pad = _bucket_len(int(qstore.lengths[qidx].max()))
        for qdir in (0, 1):
            batch, lens = qstore.padded_batch(qidx, pad_to=pad, multiple=1, rc=bool(qdir))
            lens = lens.copy()
            lens[n_real:] = 0  # padding rows produce no k-mers, hence no hits
            parts.append(find_candidates_batch(
                index, sub_off, subject_read_start, batch, lens,
                qidx.astype(np.int32), qdir, sub_sizes, opts, pairwise=pairwise))
        if progress:
            progress(f"candidates: {min(bs + query_batch_size, len(order))}/{len(order)} queries")
    cands = Candidates.concat(parts)
    return top_n_per_query(cands, opts.ncan)


def subject_windows(cands: Candidates, margin: int = 600) -> tuple[np.ndarray, np.ndarray]:
    """Per-candidate subject window [ws, we) large enough for full extension.

    Extension from the anchor can consume at most 1.3x the query side + slack
    (get_next_sequence_block clamping, oc_aligner.c:127-131), so a window around
    the chain anchor bounds the padded target size by the READ length even when
    the subject is a multi-megabase contig."""
    left_need = (cands.qbeg.astype(np.int64) * 13) // 10 + margin
    right_need = ((cands.qsize - cands.qbeg).astype(np.int64) * 13) // 10 + margin
    ws = np.maximum(cands.sbeg - left_need, 0)
    we = np.minimum(cands.sbeg + right_need, cands.ssize)
    return ws.astype(np.int64), we.astype(np.int64)


def extend_candidates(
    cands: Candidates,
    qstore: ReadStore,
    sstore: ReadStore,
    min_align_size: int = 400,
    min_ident: float = 0.0,
    band_width: int = 128,
    pairs_per_chunk: int = 512,
    progress: Optional[Callable[[str], None]] = None,
) -> M4Records:
    """Banded-extend candidates into M4 records (endpoints + identity)."""
    n = len(cands)
    out_parts = []
    ws, we = subject_windows(cands)
    wlen = we - ws
    # one tier per pair: query and subject window share the padded length
    tier = np.array([_bucket_len(int(max(q, w))) for q, w in zip(cands.qsize, wlen)])
    order = np.lexsort((cands.qsize, tier))
    cs = 0
    while cs < n:
        L = int(tier[order[cs]])
        PB = min(shapes.pairs_per_chunk(L, band_width), pairs_per_chunk)
        sel = order[cs:cs + PB]
        sel = sel[tier[sel] == L]
        cs += len(sel)
        n_real = len(sel)
        qb = np.zeros((PB, L), np.uint8)
        tb = np.zeros((PB, L), np.uint8)
        qlens = np.zeros(PB, np.int32)
        tlens = np.zeros(PB, np.int32)
        aq = np.zeros(PB, np.int32)
        at = np.zeros(PB, np.int32)
        for k, c in enumerate(sel):
            qs = qstore.get(int(cands.qid[c]), rc=bool(cands.qdir[c]))
            qb[k, :len(qs)] = qs
            ts = sstore.get(int(cands.sid[c]))[ws[c]:we[c]]
            tb[k, :len(ts)] = ts
            qlens[k] = cands.qsize[c]
            tlens[k] = wlen[c]
            aq[k] = cands.qbeg[c]
            at[k] = cands.sbeg[c] - ws[c]
        res = extend_batch(jnp.asarray(qb), jnp.asarray(qlens),
                           jnp.asarray(tb), jnp.asarray(tlens),
                           jnp.asarray(aq), jnp.asarray(at), W=band_width)
        st = np.asarray(res.stats)          # single host transfer: [6, PB]
        ident = np.asarray(res.ident)[:n_real]
        n_cols = st[4, :n_real]
        keep = (n_cols >= min_align_size) & (ident >= min_ident)
        ki = np.flatnonzero(keep)
        c_sel = sel[ki]
        out_parts.append(M4Records(
            qid=cands.qid[c_sel], sid=cands.sid[c_sel],
            ident=ident[ki].astype(np.float32),
            vscore=cands.score[c_sel],
            qdir=cands.qdir[c_sel],
            qoff=st[0, ki].astype(np.int32),
            qend=st[1, ki].astype(np.int32),
            qsize=cands.qsize[c_sel],
            sdir=np.zeros(len(ki), np.int8),
            soff=(st[2, ki] + ws[c_sel]).astype(np.int32),
            send=(st[3, ki] + ws[c_sel]).astype(np.int32),
            ssize=cands.ssize[c_sel],
        ))
        if progress and (cs // pairs_per_chunk) % 20 == 0:
            progress(f"extend: {min(cs + pairs_per_chunk, n)}/{n} candidates")
    return M4Records.concat(out_parts)


def overlap_all_vs_all(
    store: ReadStore,
    opts: MapOptions,
    min_align_size: int = 400,
    min_ident: float = 0.0,
    band_width: int = 128,
    query_batch_size: int = 256,
    progress: Optional[Callable[[str], None]] = None,
    vol_size: int = 0,
) -> M4Records:
    """All-vs-all overlap detection of one read set.

    Each overlap is reported once (sid < qid); use .swap_roles() + concat for
    per-read coverage views (the pm4 duplication).

    vol_size > 0 splits the subject side into <= vol_size-base volumes and
    tiles volume i against query volumes >= i — the oc2pmov pattern
    (src/pm_one_volume/pm_worker.c:283-335) that bounds k-mer index memory on
    large read sets.
    """
    if vol_size <= 0:
        cands = find_all_candidates(store, store, opts, pairwise=True,
                                    query_batch_size=query_batch_size,
                                    progress=progress)
        return extend_candidates(cands, store, store, min_align_size=min_align_size,
                                 min_ident=min_ident, band_width=band_width,
                                 progress=progress)
    vols = store.volumes(vol_size)
    parts = []
    for vi, (slo, shi) in enumerate(vols):
        svol = ReadStore(
            bases=store.bases[store.offsets[slo]:store.offsets[shi]],
            offsets=(store.offsets[slo:shi + 1] - store.offsets[slo]),
            names=store.names[slo:shi])
        index = KmerIndex.build(svol.bases, svol.offsets, k=opts.kmer_size,
                                occ_cutoff=opts.occ_cutoff)
        # queries: all reads from volume vi onward (pairwise handles vol vi itself)
        qids = np.arange(slo, store.n_reads)
        cands = find_all_candidates(store, svol, opts, pairwise=True,
                                    query_batch_size=query_batch_size,
                                    index=index, progress=progress,
                                    subject_read_start=slo, query_ids=qids)
        parts.append(cands)
        if progress:
            progress(f"volume {vi + 1}/{len(vols)} done")
    cands = top_n_per_query(Candidates.concat(parts), opts.ncan)
    return extend_candidates(cands, store, store, min_align_size=min_align_size,
                             min_ident=min_ident, band_width=band_width,
                             progress=progress)


def map_reads_to_reference(
    qstore: ReadStore,
    refstore: ReadStore,
    opts: MapOptions,
    min_align_size: int = 400,
    min_ident: float = 0.0,
    band_width: int = 128,
    query_batch_size: int = 256,
    progress: Optional[Callable[[str], None]] = None,
) -> M4Records:
    """Map reads against a reference set (contigs) — oc2rm equivalent."""
    cands = find_all_candidates(qstore, refstore, opts, pairwise=False,
                                query_batch_size=query_batch_size, progress=progress)
    return extend_candidates(cands, qstore, refstore, min_align_size=min_align_size,
                             min_ident=min_ident, band_width=band_width,
                             progress=progress)
