"""Batched seed chaining DP on device.

TPU-native replacement for the per-block DDF voting + chain DP of the reference
(src/word_finder/word_finder.c:140-359, src/word_finder/chain_dp.c:37-159): instead of
scoring 2000-bp subject blocks and chaining only around the best seed, we chain ALL
seeds of each (query, subject) pair at once, vectorized over thousands of pairs.
Scoring matches chain_dp.c:57-87 (minimap2-style): sc = min(min(dq,dr), k)
- floor(0.01*k*dd) - ilog2(dd)/2, gated by dq,dr in (0, max_dist] and |dq-dr| <= bw.
The max_skip pruning heuristic is dropped (full DP, better quality at equal cost on
the VPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -(1 << 28)


CHAIN_SLICE = 8192   # pairs per lax.map slice: the DP builds [P, S, S]
                     # transition tensors (~8 intermediates); unsliced at the
                     # escalated max_pairs=131072 cap that is ~15 GB of HBM
                     # traffic per op and stalls/OOMs the chip


@functools.partial(jax.jit, static_argnames=("kmer_size", "max_dist", "bw"))
def chain_pairs(qoff, soff, seed_mask, kmer_size: int, max_dist: int = 5000, bw: int = 500):
    """Chain seeds for a batch of pairs.

    Args:
      qoff, soff: int32[P, S] seed coordinates, sorted by (soff, qoff) ascending
        within each pair (padding at the end).
      seed_mask: bool[P, S] valid-seed mask.
      kmer_size/max_dist/bw: chain scoring constants.

    Returns dict with per-pair best chain:
      score int32[P], n_seeds int32[P], qbeg/qend/sbeg/send int32[P],
      anchor_q/anchor_s int32[P] (a seed near the middle of the chain).
    """
    P, S = qoff.shape
    if P > CHAIN_SLICE and P % CHAIN_SLICE == 0:
        n = P // CHAIN_SLICE

        def one(args):
            q, s, m = args
            return _chain_pairs_impl(q, s, m, kmer_size, max_dist, bw)

        outs = jax.lax.map(one, (qoff.reshape(n, CHAIN_SLICE, S),
                                 soff.reshape(n, CHAIN_SLICE, S),
                                 seed_mask.reshape(n, CHAIN_SLICE, S)))
        return {k: v.reshape(P) for k, v in outs.items()}
    return _chain_pairs_impl(qoff, soff, seed_mask, kmer_size, max_dist, bw)


def _chain_pairs_impl(qoff, soff, seed_mask, kmer_size: int, max_dist: int,
                      bw: int):
    P, S = qoff.shape
    i32 = jnp.int32
    q = qoff.astype(i32)
    s = soff.astype(i32)

    # Pairwise transition scores M[p, i, j]: j -> i (j strictly before i).
    dq = q[:, :, None] - q[:, None, :]
    dr = s[:, :, None] - s[:, None, :]
    dd = jnp.abs(dr - dq)
    ok = (dq > 0) & (dr > 0) & (dq <= max_dist) & (dr <= max_dist) & (dd <= bw)
    ok &= seed_mask[:, :, None] & seed_mask[:, None, :]
    min_d = jnp.minimum(dq, dr)
    sc = jnp.minimum(min_d, kmer_size)
    log_dd = jnp.where(dd > 0, jnp.floor(jnp.log2(jnp.maximum(dd, 1).astype(jnp.float32))), 0.0).astype(i32)
    sc = sc - (dd * (0.01 * kmer_size)).astype(i32) - (log_dd >> 1)
    M = jnp.where(ok, sc, NEG)  # [P, S, S]

    ltri = jnp.tril(jnp.ones((S, S), dtype=bool), k=-1)  # j < i
    M = jnp.where(ltri[None], M, NEG)

    # DP over seeds in order.
    def step(f_p, i):
        f, _ = f_p
        cand = f + M[:, i, :]                      # [P, S]
        best_j = jnp.argmax(cand, axis=1)          # [P]
        best_v = jnp.take_along_axis(cand, best_j[:, None], axis=1)[:, 0]
        fi = jnp.maximum(kmer_size, best_v)
        pi = jnp.where(best_v >= kmer_size, best_j, -1)
        f = f.at[:, i].set(jnp.where(seed_mask[:, i], fi, NEG))
        return (f, None), (fi, pi)

    f0 = jnp.full((P, S), NEG, dtype=i32)
    (f, _), (fs, ps) = jax.lax.scan(step, (f0, None), jnp.arange(S))
    # fs/ps come out [S, P] -> transpose
    parent = ps.T  # int32[P, S]

    # Best chain end per pair.
    end = jnp.argmax(f, axis=1)                                   # [P]
    score = jnp.take_along_axis(f, end[:, None], axis=1)[:, 0]

    # Walk parents to find chain start, length, and middle anchor.
    def walk(state, _):
        cur, n, beg = state
        nxt = jnp.take_along_axis(parent, cur[:, None], axis=1)[:, 0]
        has_next = nxt >= 0
        beg = jnp.where(has_next, nxt, beg)
        cur = jnp.where(has_next, nxt, cur)
        n = n + has_next.astype(i32)
        return (cur, n, beg), cur

    init = (end, jnp.ones((P,), i32), end)
    (final_cur, n_seeds, beg), visited = jax.lax.scan(walk, init, None, length=S)
    visited = visited.transpose(1, 0)  # [P, S] seed idx path end->start (saturating)

    mid_step = jnp.clip((n_seeds - 1) // 2, 0, S - 1)
    anchor_idx = jnp.take_along_axis(visited, mid_step[:, None] - 1, axis=1)[:, 0]
    anchor_idx = jnp.where(mid_step > 0, anchor_idx, end)

    take = lambda a, idx: jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
    out = {
        "score": score,
        "n_seeds": n_seeds,
        "qbeg": take(q, beg),
        "sbeg": take(s, beg),
        "qend": take(q, end) + kmer_size,
        "send": take(s, end) + kmer_size,
        "anchor_q": take(q, anchor_idx),
        "anchor_s": take(s, anchor_idx),
    }
    return out
