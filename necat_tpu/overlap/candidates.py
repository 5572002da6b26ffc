"""Candidate detection: query k-mer sampling -> index hits -> (query, subject) pair
grouping -> batched chain DP -> gapped candidates.

TPU-native replacement for the reference candidate path (src/word_finder/
word_finder.c:363-412 find_candidates + src/pm_one_volume/pm_worker.c:84-198): the
ragged per-read seed lists become one flat hit tensor per batch, grouped by sorting
on (query, subject-position) and segmented with static caps. Self/duplicate
suppression keeps only subjects positioned before the query read in the volume
(word_finder.c:121-127 soff_max), so each overlap is found once and later duplicated
with roles swapped (the oc2pcan shuffle, src/partition_candidates/pcan.c:57-71).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from necat_tpu.index.kmer_index import KmerIndex, query_kmer_hashes
from necat_tpu.overlap.chain import chain_pairs
from necat_tpu.overlap.options import MapOptions


@dataclasses.dataclass
class Candidates:
    """SoA of gapped candidates (host). Mirrors GappedCandidate
    (src/common/gapped_candidate.h:9-19): subject dir is always FWD."""

    qid: np.ndarray      # int32 global query read id
    sid: np.ndarray      # int32 global subject read id
    qdir: np.ndarray     # int8, 0=FWD 1=REV (query strand)
    score: np.ndarray    # int32 chain score
    qbeg: np.ndarray     # int32 (coords on the qdir strand of the query)
    qend: np.ndarray
    sbeg: np.ndarray     # int32 (forward subject coords)
    send: np.ndarray
    qsize: np.ndarray    # int32
    ssize: np.ndarray    # int32

    def __len__(self) -> int:
        return len(self.qid)

    @staticmethod
    def concat(parts: list["Candidates"]) -> "Candidates":
        parts = [p for p in parts if len(p)]
        if not parts:
            z = np.zeros(0, np.int32)
            return Candidates(z, z, z.astype(np.int8), z, z, z, z, z, z, z)
        return Candidates(*[
            np.concatenate([getattr(p, f.name) for p in parts])
            for f in dataclasses.fields(Candidates)
        ])

    def take(self, idx: np.ndarray) -> "Candidates":
        return Candidates(*[getattr(self, f.name)[idx] for f in dataclasses.fields(Candidates)])

    def swap_roles(self) -> "Candidates":
        """Swap query/subject roles, normalizing subject dir to FWD.

        Mirrors change_pcan_roles + normalise_pcan_sdir
        (src/common/gapped_candidate.h:102-105): when the original qdir is REV, the
        swapped record flips both sequences' strands, so coordinates mirror.
        """
        rev = self.qdir == 1
        new_qbeg = np.where(rev, self.ssize - self.send, self.sbeg)
        new_qend = np.where(rev, self.ssize - self.sbeg, self.send)
        new_sbeg = np.where(rev, self.qsize - self.qend, self.qbeg)
        new_send = np.where(rev, self.qsize - self.qbeg, self.qend)
        return Candidates(
            qid=self.sid.copy(), sid=self.qid.copy(), qdir=self.qdir.copy(),
            score=self.score.copy(),
            qbeg=new_qbeg.astype(np.int32), qend=new_qend.astype(np.int32),
            sbeg=new_sbeg.astype(np.int32), send=new_send.astype(np.int32),
            qsize=self.ssize.copy(), ssize=self.qsize.copy(),
        )


@functools.partial(jax.jit, static_argnames=("max_hits",))
def _expand_hits(start, count, positions, soff_limit, max_hits: int):
    """Expand CSR (start, count) ranges into a flat hit list of static size.

    start/count: int32[B, S] per sampled query k-mer. soff_limit: int32[B]
    (hits at subject positions >= limit are dropped; pass INT32_MAX to disable).
    Returns (qrow, kmer_col, pos, valid, total_hits).

    Run ids propagate by scatter + running max: each nonempty k-mer scatters
    its index at its run's first slot, cummax fills the run. Two linear scans
    + three gathers over max_hits slots — the searchsorted formulation cost
    ~20 dependent gather steps per slot (466 ms/batch at a 2M cap)."""
    B, S = start.shape
    flat_count = count.reshape(-1)
    cum = jnp.cumsum(flat_count)
    total = cum[-1]
    cum_prev = cum - flat_count
    src = jnp.arange(B * S, dtype=jnp.int32)
    tgt = jnp.where(flat_count > 0, cum_prev, max_hits)   # empties dropped
    head = jnp.zeros(max_hits, jnp.int32).at[tgt].max(src, mode="drop")
    kmer_idx = jax.lax.cummax(head)
    slots = jnp.arange(max_hits, dtype=jnp.int32)
    within = slots - cum_prev[kmer_idx]
    pos = positions[start.reshape(-1)[kmer_idx] + within]
    valid = slots < total
    qrow = kmer_idx // S
    kcol = kmer_idx % S
    valid &= pos < soff_limit[qrow]
    return qrow, kcol, pos, valid, total


@functools.partial(jax.jit, static_argnames=("max_pairs", "max_chain",
                                             "max_seeds", "min_hits"))
def _group_pairs(qrow, qoff, pos, valid, sub_offsets, max_pairs: int,
                 max_chain: int, max_seeds: int, min_hits: int):
    """Sort hits by (qrow, pos); segment into (query, subject) pairs; compact
    pairs with >= min_hits hits to the front (pairs below the cutoff can
    never pass the post-chain seed filter — chaining them is pure waste, and
    they are ~3/4 of all pair segments at 40x coverage); gather up to
    max_seeds seeds per kept pair (even subsampling beyond, order kept)."""
    H = qrow.shape[0]
    i32 = jnp.int32
    B_sentinel = jnp.int32(1 << 29)
    key1 = jnp.where(valid, qrow, B_sentinel)
    key2 = jnp.where(valid, pos, B_sentinel)
    key3 = jnp.where(valid, qoff, B_sentinel)
    k1, k2, k3 = jax.lax.sort((key1, key2, key3), num_keys=3)
    sid = jnp.searchsorted(sub_offsets, k2, side="right").astype(i32) - 1
    svalid = k1 < B_sentinel
    prev_q = jnp.concatenate([jnp.full((1,), -1, i32), k1[:-1]])
    prev_sid = jnp.concatenate([jnp.full((1,), -1, i32), sid[:-1]])
    new_pair = svalid & ((k1 != prev_q) | (sid != prev_sid))
    pair_start = jnp.nonzero(new_pair, size=max_pairs, fill_value=H)[0].astype(i32)
    # count hits per pair
    n_pairs = new_pair.sum()
    pair_end = jnp.concatenate([pair_start[1:], jnp.full((1,), H, i32)])
    # last real pair's end = number of valid hits
    n_valid = svalid.sum().astype(i32)
    pair_end = jnp.minimum(pair_end, n_valid)
    pair_cnt = jnp.maximum(pair_end - pair_start, 0)
    pair_valid = pair_start < H

    # compact chain-worthy pairs to the front of the (smaller) chain buffer
    keep = pair_valid & (pair_cnt >= min_hits)
    n_kept = keep.sum()
    kidx = jnp.nonzero(keep, size=max_chain, fill_value=max_pairs - 1)[0]
    cvalid = jnp.arange(max_chain, dtype=i32) < n_kept
    c_start = jnp.where(cvalid, pair_start[kidx], H)
    c_cnt = jnp.where(cvalid, pair_cnt[kidx], 0)
    safe_start = jnp.minimum(c_start, H - 1)
    pair_qrow = k1[safe_start]
    pair_sid = sid[safe_start]

    # seed gather (kept pairs only)
    ar = jnp.arange(max_seeds, dtype=i32)
    idx_in = jnp.where(c_cnt[:, None] > max_seeds,
                       (ar[None, :] * c_cnt[:, None]) // max_seeds,
                       ar[None, :])
    gidx = jnp.minimum(safe_start[:, None] + idx_in, H - 1)
    seed_mask = (ar[None, :] < jnp.minimum(c_cnt, max_seeds)[:, None]) & cvalid[:, None]
    seed_q = k3[gidx]
    seed_s = k2[gidx] - sub_offsets[jnp.maximum(pair_sid, 0)][:, None]
    return dict(pair_qrow=pair_qrow, pair_sid=pair_sid, pair_cnt=c_cnt,
                pair_valid=cvalid, seed_q=seed_q, seed_s=seed_s,
                seed_mask=seed_mask, n_pairs=n_pairs, n_kept=n_kept)


def candidates_forward(sorted_hashes, sorted_positions, bucket_starts, sub_offsets,
                       batch, lens, soff_limit, run_end=None, *, k: int,
                       shift: int, occ_cutoff: int, scan_window: int,
                       opts: MapOptions, n_steps: int | None = None):
    """Pure fused candidate-detection step (hashing -> lookup -> hit expansion ->
    pair grouping -> chain DP). Used directly under jit and under shard_map
    (parallel/mesh.py). Returns dict of fixed-shape arrays including a packed
    int32 `stats` [8, P] for a single host transfer."""
    from necat_tpu.index.kmer_index import _lookup_ranges, query_kmer_hashes

    qh, qoffs, kvalid = query_kmer_hashes(batch, lens, k, scan_window)
    start, count = _lookup_ranges(sorted_hashes, bucket_starts, qh, shift,
                                  occ_cutoff, n_steps, run_end=run_end)
    count = jnp.where(kvalid, count, 0)
    qrow, kcol, pos, valid, total = _expand_hits(start, count, sorted_positions,
                                                 soff_limit, opts.max_hits)
    g = _group_pairs(qrow, qoffs[kcol], pos, valid, sub_offsets,
                     opts.max_pairs, opts.max_chain_pairs,
                     opts.max_seeds_per_pair,
                     max(opts.block_score_cutoff, 1))
    chains = [chain_pairs(g["seed_q"], g["seed_s"], g["seed_mask"],
                          opts.kmer_size, opts.chain_max_dist, opts.chain_bw)]
    for _ in range(1, opts.n_chains_per_pair):
        # secondary chains (word_finder emits one candidate per scoring
        # block, word_finder.c:183-359 — split alignments / chimeric reads
        # have two loci per pair): re-chain with the previous chain's
        # subject span masked out
        prev = chains[-1]
        in_prev = ((g["seed_s"] >= prev["sbeg"][:, None])
                   & (g["seed_s"] < prev["send"][:, None]))
        g["seed_mask"] = g["seed_mask"] & ~in_prev
        chains.append(chain_pairs(g["seed_q"], g["seed_s"], g["seed_mask"],
                                  opts.kmer_size, opts.chain_max_dist,
                                  opts.chain_bw))
    cat = lambda k: jnp.concatenate([c[k] for c in chains])
    pq = jnp.concatenate([g["pair_qrow"]] * len(chains))
    psid = jnp.concatenate([g["pair_sid"]] * len(chains))
    pv = jnp.concatenate([g["pair_valid"]] * len(chains))
    stats = jnp.stack([
        pq, psid, pv.astype(jnp.int32),
        cat("n_seeds"), cat("score"), cat("qbeg"), cat("qend"), cat("sbeg"),
        cat("send")], axis=0)
    return {
        "pair_qrow": pq, "pair_sid": psid,
        "pair_valid": pv, "n_seeds": cat("n_seeds"),
        "score": cat("score"), "qbeg": cat("qbeg"), "qend": cat("qend"),
        "sbeg": cat("sbeg"), "send": cat("send"),
        "n_hits": jnp.reshape(total, (1,)),
        "n_pairs": jnp.reshape(g["n_pairs"], (1,)),
        "n_kept": jnp.reshape(g["n_kept"], (1,)), "stats": stats,
    }


@functools.lru_cache(maxsize=None)
def _fused_candidates_jit(k, shift, occ_cutoff, scan_window, opts, n_steps=None):
    f = functools.partial(candidates_forward, k=k, shift=shift,
                          occ_cutoff=occ_cutoff, scan_window=scan_window,
                          opts=opts, n_steps=n_steps)
    return jax.jit(f)


def _norm_caps(hits_cap, opts: MapOptions) -> list:
    """Normalize the shared mutable caps list to 6 slots:
    [hits, pairs, chain, obs_hits, obs_pairs, obs_chain]."""
    if hits_cap is None:
        hits_cap = []
    defaults = [opts.max_hits, opts.max_pairs, opts.max_chain_pairs, 0, 0, 0]
    for i in range(len(hits_cap), 6):
        hits_cap.append(defaults[i])
    return hits_cap


def _dispatch_once(index: KmerIndex, sub_offsets, batch_j, lens_j, soff_limit,
                   opts: MapOptions, cap: int, pcap: int, ccap: int) -> dict:
    """One async fused candidate dispatch with the given buffer caps."""
    from necat_tpu.utils.device import tunnel_retry
    from necat_tpu.utils.logging import timed
    o = opts
    if (cap, pcap, ccap) != (opts.max_hits, opts.max_pairs,
                             opts.max_chain_pairs):
        o = dataclasses.replace(opts, max_hits=cap, max_pairs=pcap,
                                max_chain_pairs=ccap)
    fn = _fused_candidates_jit(index.k, 2 * index.k - index.n_bucket_bits,
                               index.occ_cutoff, opts.scan_window, o,
                               index.n_search_steps)
    with timed("cand.dispatch"):
        g = tunnel_retry(fn, index.sorted_hashes, index.sorted_positions,
                         index.bucket_starts, sub_offsets,
                         batch_j, lens_j, soff_limit, index.run_end)
        for k_ in ("stats", "n_hits", "n_pairs", "n_kept"):
            try:
                g[k_].copy_to_host_async()
            except Exception:
                pass
    import os as _os
    if _os.environ.get("NECAT_TPU_SYNC_DISPATCH"):
        with timed("cand.exec"):
            jax.block_until_ready(g["stats"])
    return g


def dispatch_candidates_batch(
    index: KmerIndex,
    sub_offsets: jax.Array,          # int32[NS+1] subject read offsets in the volume
    sub_vol_read_start: int,          # global read id of subject volume's first read
    batch: np.ndarray,                # uint8[B, L] padded queries (on qdir strand)
    lens: np.ndarray,                 # int32[B]
    qids: np.ndarray,                 # int32[B] global query read ids
    qdir: int,
    sub_sizes: np.ndarray,            # int32[NS] subject lengths (host)
    opts: MapOptions,
    pairwise: bool,
    sub_offsets_host: np.ndarray | None = None,  # host copy of sub_offsets
    hits_cap: list | None = None,  # mutable [cap, pcap]: shared escalation state
) -> dict:
    """Dispatch one fused candidate pass (async; NO host sync). Returns a
    handle for collect_candidates_batch. Several handles can be in flight —
    the device pipelines dispatch i+1 behind i's execution, which is the
    chip-level version of the reference's overlapped pm_worker thread groups
    (pm_worker.c:244-335). Escalation happens at collect time."""
    from necat_tpu.utils.logging import timed
    B, L = batch.shape
    with timed("cand.limits"):
        if pairwise:
            # suppress hits at subject positions >= start of the query read itself
            # (host offsets: a d2h of the device copy would serialize with the
            # queued candidate kernel through the tunnel — 13 s/call measured)
            off_h = (np.asarray(sub_offsets) if sub_offsets_host is None
                     else sub_offsets_host)
            local = qids - sub_vol_read_start
            # off_h is the UNpadded host copy; sub_offsets may be pow2-padded
            ns = len(off_h) - 1
            in_vol = (local >= 0) & (local < ns)
            limit_np = np.where(in_vol, off_h[np.clip(local, 0, ns - 1)],
                                np.int32(np.iinfo(np.int32).max))
            soff_limit = jnp.asarray(limit_np.astype(np.int32))
        else:
            soff_limit = jnp.full((B,), np.iinfo(np.int32).max, dtype=jnp.int32)

    hits_cap = _norm_caps(hits_cap, opts)
    cap, pcap, ccap = hits_cap[0], hits_cap[1], hits_cap[2]
    batch_j = jnp.asarray(batch)
    lens_j = jnp.asarray(lens)
    g = _dispatch_once(index, sub_offsets, batch_j, lens_j, soff_limit,
                       opts, cap, pcap, ccap)
    return dict(g=g, caps=(cap, pcap, ccap), index=index, sub_offsets=sub_offsets,
                batch_j=batch_j, lens_j=lens_j, soff_limit=soff_limit,
                qids=qids, lens=lens, qdir=qdir, sub_sizes=sub_sizes,
                sub_vol_read_start=sub_vol_read_start, hits_cap=hits_cap)


def collect_candidates_batch(h: dict, opts: MapOptions) -> Candidates:
    """Sync one dispatched candidate pass; if its buffers saturated, escalate
    the shared caps and re-run the pass (synchronously — escalation is rare,
    caps are learned and persisted across processes)."""
    from necat_tpu.utils.logging import logger, timed
    hits_cap = h["hits_cap"]
    cap, pcap, ccap = h["caps"]
    g = h["g"]
    while True:
        with timed("cand.stats_sync"):
            st = np.asarray(g["stats"])
        n_hits = int(np.asarray(g["n_hits"])[0])
        n_pairs = int(np.asarray(g["n_pairs"])[0])
        n_kept = int(np.asarray(g["n_kept"])[0])
        grow = False
        # saturated buffers: escalate and redo the pass (the reference has no
        # caps at all — silent loss is not acceptable)
        if n_hits >= cap and cap < opts.max_hits_ceiling:
            hits_cap[0] = max(hits_cap[0], min(cap * 4, opts.max_hits_ceiling))
            logger.info("hit buffer full (%d >= %d): escalating to %d",
                        n_hits, cap, hits_cap[0])
            grow = True
        if n_pairs >= pcap and pcap < (1 << 18):
            hits_cap[1] = max(hits_cap[1], min(pcap * 2, 1 << 18))
            logger.info("pair buffer full (%d >= %d): escalating to %d",
                        n_pairs, pcap, hits_cap[1])
            grow = True
        if n_kept >= ccap and ccap < (1 << 17):
            # x2: chain DP cost is linear in the chain cap
            hits_cap[2] = max(hits_cap[2], min(ccap * 2, 1 << 17))
            logger.info("chain buffer full (%d >= %d): escalating to %d",
                        n_kept, ccap, hits_cap[2])
            grow = True
        if not grow:
            break
        cap, pcap, ccap = hits_cap[0], hits_cap[1], hits_cap[2]
        g = _dispatch_once(h["index"], h["sub_offsets"], h["batch_j"],
                           h["lens_j"], h["soff_limit"], opts, cap, pcap,
                           ccap)
    # record the observed demand (slots 3-5 of the shared caps list): the
    # buffer rung the NEXT process starts from is sized to what this run
    # actually used, so caps that once escalated to the ceiling do not pin
    # every later run at ceiling-sized buffers (expand+sort cost scales with
    # the CAP, not the real hit count — 8M-slot buffers for 371k hits were
    # 25x the needed compute)
    hits_cap[3] = max(hits_cap[3], n_hits)
    hits_cap[4] = max(hits_cap[4], n_pairs)
    hits_cap[5] = max(hits_cap[5], n_kept)
    h["g"] = None                    # drop device refs promptly
    if n_hits >= opts.max_hits_ceiling:
        logger.warning(
            "k-mer hit buffer full at ceiling (%d >= %d): candidates beyond "
            "the cap are dropped — raise MapOptions.max_hits_ceiling or use "
            "volume tiling (overlap_all_vs_all(vol_size=...))",
            n_hits, opts.max_hits_ceiling)
    return stats_to_candidates(st, h["qids"], h["lens"], h["qdir"],
                               h["sub_sizes"], h["sub_vol_read_start"], opts)


def find_candidates_batch(
    index: KmerIndex,
    sub_offsets: jax.Array,
    sub_vol_read_start: int,
    batch: np.ndarray,
    lens: np.ndarray,
    qids: np.ndarray,
    qdir: int,
    sub_sizes: np.ndarray,
    opts: MapOptions,
    pairwise: bool,
    sub_offsets_host: np.ndarray | None = None,
    hits_cap: list | None = None,
) -> Candidates:
    """Run the full candidate pipeline for one padded query batch on one strand
    (one fused device dispatch + one stats transfer). Synchronous convenience
    wrapper over dispatch_candidates_batch + collect_candidates_batch."""
    h = dispatch_candidates_batch(
        index, sub_offsets, sub_vol_read_start, batch, lens, qids, qdir,
        sub_sizes, opts, pairwise, sub_offsets_host=sub_offsets_host,
        hits_cap=hits_cap)
    return collect_candidates_batch(h, opts)


def stats_to_candidates(st: np.ndarray, qids, lens, qdir, sub_sizes,
                        sub_vol_read_start: int, opts: MapOptions) -> Candidates:
    """Host-side filter/pack of one candidate pass's packed stats [9, P]
    (shared by the single-device and the mesh-sharded paths)."""
    pv = st[2].astype(bool)
    n_seeds = st[3]
    score = st[4]
    qbeg, qend, sbeg, send = st[5], st[6], st[7], st[8]
    keep = (pv & (n_seeds >= opts.block_score_cutoff)
            & (score >= opts.chain_min_score)
            & (((qend - qbeg) >= opts.align_size_cutoff)
               | ((send - sbeg) >= opts.align_size_cutoff)))
    idx = np.flatnonzero(keep)
    pq = st[0][idx]
    psid = st[1][idx]
    return Candidates(
        qid=qids[pq].astype(np.int32),
        sid=(psid + sub_vol_read_start).astype(np.int32),
        qdir=np.full(len(idx), qdir, dtype=np.int8),
        score=score[idx].astype(np.int32),
        qbeg=qbeg[idx].astype(np.int32), qend=qend[idx].astype(np.int32),
        sbeg=sbeg[idx].astype(np.int32), send=send[idx].astype(np.int32),
        qsize=lens[pq].astype(np.int32),
        ssize=sub_sizes[psid].astype(np.int32),
    )


def top_n_per_query(cands: Candidates, n: int) -> Candidates:
    """Keep the n best-scoring candidates per (qid) — pm_worker.c:163-186 ncan cap."""
    if len(cands) == 0:
        return cands
    order = np.lexsort((-cands.score, cands.qid))
    qid_sorted = cands.qid[order]
    # rank within query group
    new_grp = np.r_[True, qid_sorted[1:] != qid_sorted[:-1]]
    grp_id = np.cumsum(new_grp) - 1
    grp_first = np.flatnonzero(new_grp)
    rank = np.arange(len(order)) - grp_first[grp_id]
    keep = order[rank < n]
    return cands.take(np.sort(keep))
