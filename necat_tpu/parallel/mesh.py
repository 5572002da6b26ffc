"""Device-mesh sharding of the overlap pipeline.

Replaces the reference's cluster fan-out (per-volume grid jobs + `-mn node_id
num_nodes` partition striding, SURVEY.md §2.10) with a jax.sharding Mesh:

  * subject axis  — the read volume's k-mer index is sharded across devices
    (each device owns a contiguous subject range = the reference's "volume");
    queries are replicated and each device finds candidates against its shard
    (shard_map; the candidate merge is the all-gather that `cat pm_result_*`
    performed through the filesystem, necat.pl:218).
  * pair axis     — banded extension batches are data-parallel across devices
    (each device extends its slice of (query, subject) pairs — the fused
    gather+extend chunk runs per device under shard_map, so the Pallas kernels
    stay single-device while the chunk scales across the mesh).

The pipeline picks the mesh automatically when more than one device is
present (overlap.overlapper.find_all_candidates / align.engine.ExtendEngine).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from necat_tpu.align import banded
from necat_tpu.index import kmer_index
from necat_tpu.overlap import candidates as cand_mod
from necat_tpu.overlap.options import MapOptions


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def auto_mesh() -> Optional[Mesh]:
    """The pipeline's device mesh: all local devices, or None single-device.

    On the CPU backend a multi-device mesh only exists when virtual devices
    were forced for TESTING (xla_force_host_platform_device_count); picking it
    up implicitly made every CPU test run shard_map'ed dispatches, and long
    multi-test processes segfault inside the XLA CPU client under that load
    (order-dependent crash at ~90 tests, round-2 verdict). Production meshes
    are TPU; CPU meshes are opt-in via NECAT_TPU_CPU_MESH=1 or an explicit
    `mesh=` argument (tests/test_mesh.py passes one)."""
    import os
    if len(jax.devices()) <= 1:
        return None
    if (jax.default_backend() == "cpu"
            and os.environ.get("NECAT_TPU_CPU_MESH", "0") != "1"):
        return None
    return make_mesh()


# ------------------------------------------------------------------ pure steps

# the fused candidate step lives in overlap.candidates (single source of truth
# for both the single-chip jit path and the shard_map path here)
candidates_forward = cand_mod.candidates_forward


def extension_forward(qbatch, qlens, tbatch, tlens, anchor_q, anchor_t, *, W: int):
    """Pure banded-extension step over a pair batch; returns flat arrays."""
    res = banded.extend_batch(qbatch, qlens, tbatch, tlens, anchor_q, anchor_t, W=W)
    return (res.qoff, res.qend, res.toff, res.tend, res.n_cols, res.n_match, res.ident)


# -------------------------------------------------------------- sharded steps

@functools.lru_cache(maxsize=None)
def sharded_candidates_fn(mesh: Mesh, *, k: int, shift: int, occ_cutoff: int,
                          scan_window: int, opts: MapOptions, n_steps=None):
    """Build a shard_map'ed candidate step: subject index sharded over the mesh
    axis, query batch replicated, per-shard self-suppression limits sharded.
    Index/limit inputs carry a leading device axis."""
    axis = mesh.axis_names[0]
    f = functools.partial(candidates_forward, k=k, shift=shift,
                          occ_cutoff=occ_cutoff, scan_window=scan_window,
                          opts=opts, n_steps=n_steps)

    def per_shard(sh, sp, bs, so, batch, lens, lim, re):
        # shard_map passes arrays with the leading device axis sliced away
        return f(sh[0], sp[0], bs[0], so[0], batch, lens, lim[0],
                 run_end=re[0])

    shard = P(axis)
    repl = P()
    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(shard, shard, shard, shard, repl, repl, shard, shard),
        out_specs=shard,
        check_vma=False,  # scan carries inside chain DP start replicated
    )
    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def sharded_gather_extend_fn(mesh: Mesh, *, W: int, L: int, insb_words: int = 1):
    """shard_map'ed fused gather+extend chunk: descriptor rows sharded over
    the mesh, packed word buffers replicated. Each device runs the Pallas
    kernels on its PB/n_dev pair rows."""
    from necat_tpu.align.engine import gather_extend
    axis = mesh.axis_names[0]
    shard = P(axis)
    repl = P()
    row_sharded_keys = (
        "left_cols", "left_insb", "left_lead", "left_leadb", "left_jc",
        "right_cols", "right_insb", "right_lead", "right_leadb", "right_jc",
        "qoff", "qend", "toff", "tend", "n_cols", "n_match", "ident",
        "qbatch") + tuple(
            f"{side}_insb{w + 1}" for side in ("left", "right")
            for w in range(1, insb_words))

    def per_shard(wq, wt, desc):
        return gather_extend(wq, wt, desc, W=W, L=L, insb_words=insb_words)

    out_specs = {k_: shard for k_ in row_sharded_keys}
    out_specs["stats"] = P(None, axis)
    fn = jax.shard_map(per_shard, mesh=mesh,
                       in_specs=(repl, repl, shard), out_specs=out_specs,
                       check_vma=False)
    return jax.jit(fn)


def build_sharded_index(store_bases: np.ndarray, store_offsets: np.ndarray,
                        n_shards: int, k: int, occ_cutoff: int = 500,
                        n_bucket_bits: int = 12):
    """Split subjects into n_shards contiguous read ranges and build one padded
    k-mer index per shard (host). Returns stacked arrays with leading shard axis
    plus per-shard read-id starts."""
    n_reads = len(store_offsets) - 1
    per = -(-n_reads // n_shards)
    idxs, offs, starts = [], [], []
    for s in range(n_shards):
        lo = min(s * per, n_reads)
        hi = min(lo + per, n_reads)
        base_lo, base_hi = store_offsets[lo], store_offsets[hi]
        bases = store_bases[base_lo:base_hi]
        loc_off = (store_offsets[lo:hi + 1] - base_lo).astype(np.int64)
        idx = kmer_index.KmerIndex.build(bases, loc_off, k=k, occ_cutoff=occ_cutoff,
                                         n_bucket_bits=n_bucket_bits)
        idxs.append(idx)
        offs.append(loc_off)
        starts.append(lo)
    m_max = max(i.n_kmers for i in idxs)
    ns_max = max(len(o) for o in offs)
    D = n_shards
    sh = np.zeros((D, max(m_max, 1)), np.int32)
    sp = np.zeros((D, max(m_max, 1)), np.int32)
    re = np.zeros((D, max(m_max, 1)), np.int32)
    bs = np.zeros((D, idxs[0].bucket_starts.shape[0]), np.int32)
    so = np.full((D, ns_max), np.iinfo(np.int32).max, np.int32)
    for s, (idx, off) in enumerate(zip(idxs, offs)):
        m = idx.n_kmers
        sh[s, :m] = np.asarray(idx.sorted_hashes)
        sh[s, m:] = np.iinfo(np.int32).max  # padding never matches a query hash
        sp[s, :m] = np.asarray(idx.sorted_positions)
        re[s, :m] = np.asarray(idx.run_end)
        b = np.asarray(idx.bucket_starts)
        bs[s] = b
        so[s, :len(off)] = off
    meta = dict(starts=np.array(starts),
                n_steps=max(i.n_search_steps for i in idxs),
                offs=offs, k=k, occ_cutoff=occ_cutoff,
                n_bucket_bits=idxs[0].n_bucket_bits)
    return (jnp.asarray(sh), jnp.asarray(sp), jnp.asarray(bs), jnp.asarray(so),
            jnp.asarray(re), meta)


class ShardedIndex:
    """Per-device k-mer index shards of one subject store (the reference's
    per-volume lookup tables, one per thread group — pm_worker.c:283-335)."""

    def __init__(self, mesh: Mesh, sstore, k: int, occ_cutoff: int,
                 n_bucket_bits: int = 14):
        self.mesh = mesh
        self.n_shards = mesh.size
        sh, sp, bs, so, re, meta = build_sharded_index(
            sstore.bases, sstore.offsets, self.n_shards, k=k,
            occ_cutoff=occ_cutoff, n_bucket_bits=n_bucket_bits)
        ax = mesh.axis_names[0]
        shard = NamedSharding(mesh, P(ax))
        self.sh = jax.device_put(sh, shard)
        self.sp = jax.device_put(sp, shard)
        self.bs = jax.device_put(bs, shard)
        self.so = jax.device_put(so, shard)
        self.re = jax.device_put(re, shard)
        self.meta = meta
        self.k = k
        self.occ_cutoff = occ_cutoff
        self.shift = 2 * k - meta["n_bucket_bits"]
        # per-shard base offsets/sizes in the GLOBAL store
        self.read_starts = meta["starts"]
        self.local_sizes = [len(o) - 1 for o in meta["offs"]]


def _dispatch_sharded_once(index: "ShardedIndex", batch_j, lens_j, lim_j,
                           opts: MapOptions, cap: int, pcap: int, ccap: int):
    import dataclasses as _dc

    from necat_tpu.utils.logging import timed
    o = opts
    if (cap, pcap, ccap) != (opts.max_hits, opts.max_pairs,
                             opts.max_chain_pairs):
        o = _dc.replace(opts, max_hits=cap, max_pairs=pcap,
                        max_chain_pairs=ccap)
    fn = sharded_candidates_fn(index.mesh, k=index.k, shift=index.shift,
                               occ_cutoff=index.occ_cutoff,
                               scan_window=opts.scan_window, opts=o,
                               n_steps=index.meta["n_steps"])
    with timed("cand.dispatch"):
        g = fn(index.sh, index.sp, index.bs, index.so,
               batch_j, lens_j, lim_j, index.re)
        for k_ in ("stats", "n_hits", "n_pairs", "n_kept"):
            try:
                g[k_].copy_to_host_async()
            except Exception:
                pass
    return g


def dispatch_candidates_sharded(
    index: ShardedIndex,
    sstore,
    subject_read_start: int,
    batch, lens, qids, qdir: int,
    opts: MapOptions,
    pairwise: bool,
    hits_cap: list | None = None,
) -> dict:
    """Async half of the mesh-sharded candidate pass: ONE shard_map dispatch
    over the device mesh; each device searches its subject shard. Returns a
    handle for collect_candidates_sharded (no host sync here)."""
    B = batch.shape[0]
    D = index.n_shards
    starts = index.read_starts
    base_off = sstore.offsets[starts]          # flat-base offset of each shard
    INT32MAX = np.iinfo(np.int32).max
    if pairwise:
        # global self-suppression limit per query (hits at positions >= the
        # query's own start are left to later volumes), localized per shard
        local = np.asarray(qids) - subject_read_start
        ns = sstore.n_reads
        in_vol = (local >= 0) & (local < ns)
        lim_g = np.where(in_vol, sstore.offsets[np.clip(local, 0, ns - 1)],
                         np.int64(INT32MAX))
        lim = np.minimum(np.maximum(lim_g[None, :] - base_off[:, None], 0),
                         INT32MAX).astype(np.int32)
    else:
        lim = np.full((D, B), INT32MAX, np.int32)
    from necat_tpu.overlap.candidates import _norm_caps
    hits_cap = _norm_caps(hits_cap, opts)
    cap, pcap, ccap = hits_cap[0], hits_cap[1], hits_cap[2]
    batch_j, lens_j, lim_j = jnp.asarray(batch), jnp.asarray(lens), jnp.asarray(lim)
    g = _dispatch_sharded_once(index, batch_j, lens_j, lim_j, opts, cap, pcap,
                               ccap)
    return dict(g=g, caps=(cap, pcap, ccap), index=index, sstore=sstore,
                batch_j=batch_j, lens_j=lens_j, lim_j=lim_j,
                qids=np.asarray(qids), lens=np.asarray(lens), qdir=qdir,
                subject_read_start=subject_read_start, hits_cap=hits_cap)


def collect_candidates_sharded(h: dict, opts: MapOptions):
    """Sync one sharded candidate pass; escalate + re-dispatch on saturation."""
    from necat_tpu.overlap.candidates import stats_to_candidates
    from necat_tpu.utils.logging import timed
    index = h["index"]
    sstore = h["sstore"]
    D = index.n_shards
    starts = index.read_starts
    hits_cap = h["hits_cap"]
    cap, pcap, ccap = h["caps"]
    g = h["g"]
    while True:
        with timed("cand.stats_sync"):
            st_all = np.asarray(g["stats"]).reshape(D, 9, -1)
        n_hits = int(np.asarray(g["n_hits"]).max())
        n_pairs = int(np.asarray(g["n_pairs"]).max())
        n_kept = int(np.asarray(g["n_kept"]).max())
        grow = False
        if n_hits >= cap and cap < opts.max_hits_ceiling:
            hits_cap[0] = max(hits_cap[0], min(cap * 4, opts.max_hits_ceiling))
            grow = True
        if n_pairs >= pcap and pcap < (1 << 18):
            hits_cap[1] = max(hits_cap[1], min(pcap * 2, 1 << 18))
            grow = True
        if n_kept >= ccap and ccap < (1 << 17):
            hits_cap[2] = max(hits_cap[2], min(ccap * 2, 1 << 17))
            grow = True
        if not grow:
            break
        cap, pcap, ccap = hits_cap[0], hits_cap[1], hits_cap[2]
        g = _dispatch_sharded_once(index, h["batch_j"], h["lens_j"],
                                   h["lim_j"], opts, cap, pcap, ccap)
    hits_cap[3] = max(hits_cap[3], n_hits)   # observed demand
    hits_cap[4] = max(hits_cap[4], n_pairs)
    hits_cap[5] = max(hits_cap[5], n_kept)
    h["g"] = None
    parts = []
    for d in range(D):
        lo = int(starts[d])
        nloc = index.local_sizes[d]
        sub_sizes = sstore.lengths[lo:lo + nloc].astype(np.int32)
        parts.append(stats_to_candidates(
            st_all[d], h["qids"], h["lens"], h["qdir"], sub_sizes,
            h["subject_read_start"] + lo, opts))
    from necat_tpu.overlap.candidates import Candidates
    return Candidates.concat(parts)


def find_candidates_sharded(
    index: ShardedIndex,
    sstore,
    subject_read_start: int,
    batch, lens, qids, qdir: int,
    opts: MapOptions,
    pairwise: bool,
    hits_cap: list | None = None,
):
    """Mesh-sharded equivalent of find_candidates_batch (synchronous wrapper
    over dispatch_candidates_sharded + collect_candidates_sharded)."""
    h = dispatch_candidates_sharded(index, sstore, subject_read_start, batch,
                                    lens, qids, qdir, opts, pairwise,
                                    hits_cap=hits_cap)
    return collect_candidates_sharded(h, opts)
