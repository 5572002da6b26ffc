"""Device-mesh sharding of the overlap pipeline.

Replaces the reference's cluster fan-out (per-volume grid jobs + `-mn node_id
num_nodes` partition striding, SURVEY.md §2.10) with a jax.sharding Mesh:

  * subject axis  — the read volume's k-mer index is sharded across devices
    (each device owns a contiguous subject range = the reference's "volume");
    queries are replicated and each device finds candidates against its shard
    (shard_map; the candidate merge is the all-gather that `cat pm_result_*`
    performed through the filesystem, necat.pl:218).
  * pair axis     — banded extension batches are data-parallel across devices
    (each device extends its slice of (query, subject) pairs).

All functions here are pure over device arrays so they jit/shard_map cleanly.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from necat_tpu.align import banded
from necat_tpu.index import kmer_index
from necat_tpu.overlap import candidates as cand_mod
from necat_tpu.overlap.chain import chain_pairs
from necat_tpu.overlap.options import MapOptions


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


# ------------------------------------------------------------------ pure steps

# the fused candidate step lives in overlap.candidates (single source of truth
# for both the single-chip jit path and the shard_map path here)
candidates_forward = cand_mod.candidates_forward


def extension_forward(qbatch, qlens, tbatch, tlens, anchor_q, anchor_t, *, W: int):
    """Pure banded-extension step over a pair batch; returns flat arrays."""
    res = banded.extend_batch(qbatch, qlens, tbatch, tlens, anchor_q, anchor_t, W=W)
    return (res.qoff, res.qend, res.toff, res.tend, res.n_cols, res.n_match, res.ident)


# -------------------------------------------------------------- sharded steps

def sharded_candidates_fn(mesh: Mesh, *, k: int, shift: int, occ_cutoff: int,
                          scan_window: int, opts: MapOptions):
    """Build a shard_map'ed candidate step: subject index sharded over the mesh
    axis, query batch replicated. Inputs carry a leading device axis."""
    axis = mesh.axis_names[0]
    f = functools.partial(candidates_forward, k=k, shift=shift,
                          occ_cutoff=occ_cutoff, scan_window=scan_window, opts=opts)

    def per_shard(sh, sp, bs, so, batch, lens, lim):
        # shard_map passes arrays with the leading device axis sliced away
        return f(sh[0], sp[0], bs[0], so[0], batch, lens, lim)

    shard = P(axis)
    repl = P()
    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(shard, shard, shard, shard, repl, repl, repl),
        out_specs=shard,
        check_vma=False,  # scan carries inside chain DP start replicated
    )
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
    bs = np.zeros((D, idxs[0].bucket_starts.shape[0]), np.int32)
    so = np.full((D, ns_max), np.iinfo(np.int32).max, np.int32)
    for s, (idx, off) in enumerate(zip(idxs, offs)):
        m = idx.n_kmers
        sh[s, :m] = np.asarray(idx.sorted_hashes)
        sh[s, m:] = np.iinfo(np.int32).max  # padding never matches a query hash
        sp[s, :m] = np.asarray(idx.sorted_positions)
        b = np.asarray(idx.bucket_starts)
        bs[s] = b
        so[s, :len(off)] = off
    return (jnp.asarray(sh), jnp.asarray(sp), jnp.asarray(bs), jnp.asarray(so),
            np.array(starts), idxs[0])


def sharded_extension_fn(mesh: Mesh, *, W: int):
    """Data-parallel extension: pair batch sharded on its leading axis."""
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, in_shardings=(shard,) * 6)
    def fn(qb, ql, tb, tl, aq, at):
        return extension_forward(qb, ql, tb, tl, aq, at, W=W)

    return fn
