"""k-mer lookup table over a subject read volume — CSR over sorted k-mer hashes.

TPU-native replacement for the reference lookup table (src/lookup_table/
lookup_table.c:14-190): instead of a 4^k-entry offset table (8 GB at k=15), we keep
the (hash, position) pairs sorted by hash plus a small top-bits bucket directory, and
resolve queries with a bucket-narrowed binary search on device. Every subject position
is indexed (matching build_lookup_table); k-mers occurring more than `occ_cutoff`
times are disabled at query time (reference removes them from the table,
lookup_table.c:14-57 kmer_cnt_cutoff, default 500 = map_options.c:12-28).

K-mers spanning a read boundary are excluded (an improvement over the reference,
which indexes across PackedDB sequence boundaries).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


def kmer_hashes_flat(bases: np.ndarray, k: int) -> np.ndarray:
    """Hashes of all k-mers of a flat uint8 code array; length len(bases)-k+1.

    hash = base-4 big-endian value of the k bases (word_finder.c:65-82 semantics).
    NumPy host path (used at index build).
    """
    n = len(bases) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int32)
    h = np.zeros(n, dtype=np.int64)
    for j in range(k):
        h = (h << 2) | bases[j:j + n]
    return h.astype(np.int32) if k <= 15 else h


@dataclasses.dataclass
class KmerIndex:
    """Sorted k-mer position index of one subject volume (device-resident arrays)."""

    k: int
    occ_cutoff: int
    n_bucket_bits: int
    # sorted by (hash, position):
    sorted_hashes: jax.Array  # int32[M]
    sorted_positions: jax.Array  # int32[M], global offsets into the volume's flat bases
    bucket_starts: jax.Array  # int32[2^B + 1] — directory over hash top bits
    # binary-search step bound: ceil(log2(largest bucket)) + 1. The directory
    # narrows every query to one bucket, so searching log2(M) steps (25+ at
    # 30M k-mers) wasted ~2.5x of the lookup; buckets are ~M/2^B entries.
    n_search_steps: int = 32
    # run_end[i] = end of the equal-hash run containing i: one gather replaces
    # the second (right-bound) binary search of the lookup (device gathers are
    # the lookup's whole cost, ~45 M elem/s through XLA on this chip)
    run_end: jax.Array | None = None

    @property
    def n_kmers(self) -> int:
        return int(self.sorted_hashes.shape[0])

    @property
    def avg_multiplicity(self) -> float:
        """Mean positions per distinct k-mer (~ dataset coverage); used to
        pre-size the hit/pair buffers so the first batches don't walk the
        escalation ladder (each step recompiles the candidate program)."""
        if not hasattr(self, "_mult"):
            import numpy as _np
            sh = self.sorted_hashes
            distinct = int(_np.asarray(
                (sh[1:] != sh[:-1]).sum())) + 1 if self.n_kmers else 1
            object.__setattr__(self, "_mult",
                               self.n_kmers / max(distinct, 1))
        return self._mult

    @classmethod
    def build(
        cls,
        bases: np.ndarray,
        offsets: np.ndarray,
        k: int = 15,
        occ_cutoff: int = 500,
        n_bucket_bits: int = 22,
    ) -> "KmerIndex":
        """Build from the volume's flat bases + read offsets (host sort, device arrays).

        The reference's multi-threaded radix sort (hash_list_bucket_sort.c) is
        the native C++ path (necat_tpu.native.build_kmer_index, LSD radix);
        NumPy argsort is the fallback when the native library is unavailable.

        n_bucket_bits=22 (16 MB directory) keeps buckets to a handful of
        entries even at E. coli scale, so the per-query binary search is 3-4
        gather steps instead of 8.
        """
        assert k <= 15, "k must fit 30 bits (int32 device arrays)"
        n_bucket_bits = min(n_bucket_bits, 2 * k)
        shift = 2 * k - n_bucket_bits
        assert shift >= 0
        from necat_tpu import native
        nat = native.build_kmer_index(bases, offsets, k, n_bucket_bits)
        if nat is not None:
            sh, sp, bucket_starts = nat
            return cls(
                k=k,
                occ_cutoff=occ_cutoff,
                n_bucket_bits=n_bucket_bits,
                sorted_hashes=jnp.asarray(sh, dtype=jnp.int32),
                sorted_positions=jnp.asarray(sp, dtype=jnp.int32),
                bucket_starts=jnp.asarray(bucket_starts, dtype=jnp.int32),
                n_search_steps=_search_steps(bucket_starts),
                run_end=jnp.asarray(_run_ends(sh), dtype=jnp.int32),
            )
        hashes = kmer_hashes_flat(bases, k)
        n = len(hashes)
        # valid: k-mer must not span a read boundary.
        pos = np.arange(n, dtype=np.int64)
        read_end = offsets[np.searchsorted(offsets, pos, side="right")]
        valid = pos + k <= read_end
        hashes = hashes[valid]
        positions = pos[valid].astype(np.int32)
        order = np.argsort(hashes, kind="stable")  # stable => positions ascending per hash
        sh = hashes[order]
        sp = positions[order]
        # bucket directory over top bits
        nb = 1 << n_bucket_bits
        bucket = (sh >> shift).astype(np.int64)
        bucket_starts = np.zeros(nb + 1, dtype=np.int64)
        np.add.at(bucket_starts, bucket + 1, 1)
        np.cumsum(bucket_starts, out=bucket_starts)
        return cls(
            k=k,
            occ_cutoff=occ_cutoff,
            n_bucket_bits=n_bucket_bits,
            sorted_hashes=jnp.asarray(sh, dtype=jnp.int32),
            sorted_positions=jnp.asarray(sp, dtype=jnp.int32),
            bucket_starts=jnp.asarray(bucket_starts, dtype=jnp.int32),
            n_search_steps=_search_steps(bucket_starts),
            run_end=jnp.asarray(_run_ends(sh), dtype=jnp.int32),
        )

    @classmethod
    def build_on_device(
        cls,
        store,
        k: int = 15,
        occ_cutoff: int = 500,
        n_bucket_bits: int = 22,
        device=None,
    ) -> "KmerIndex":
        """Build the index ON the TPU from the 2-bit packed device store.

        The host build hashes + radix-sorts on 2 vCPUs and then uploads
        ~3 arrays x n_kmers through the ~34 MB/s tunnel (8 s per build, 55 s
        cumulative per E. coli bench). Here the packed words are already on
        device (get_devstore), so hashing is 15 shifted adds, the sort is one
        XLA sort, and nothing bulk crosses the link. The sorted arrays keep
        the word buffer's pow2-padded length (sentinel-hash padding), so
        downstream candidate executables are shared across stores of similar
        size instead of recompiling per store (VERDICT r5 #4)."""
        from necat_tpu.io.devstore import get_devstore
        assert k <= 15
        n_bucket_bits = min(n_bucket_bits, 2 * k)
        dev = get_devstore(store, device=device)
        total = int(store.total_bases)
        ends = jnp.asarray(store.offsets[1:].astype(np.int32))
        if device is not None:
            ends = jax.device_put(ends, device)
        sh, sp, bucket_starts, run_end, n_real, max_bucket = _build_index_device(
            dev.words, ends, jnp.int32(total), k=k,
            n_bucket_bits=n_bucket_bits)
        steps = int(np.asarray(max_bucket))
        return cls(
            k=k,
            occ_cutoff=occ_cutoff,
            n_bucket_bits=n_bucket_bits,
            sorted_hashes=sh,
            sorted_positions=sp,
            bucket_starts=bucket_starts,
            n_search_steps=_quantize_steps(
                int(np.ceil(np.log2(max(2, steps)))) + 1),
            run_end=run_end,
        )

    def lookup_ranges(self, query_hashes: jax.Array) -> tuple[jax.Array, jax.Array]:
        """For each query hash: (start, count) in the sorted position list.

        Counts above occ_cutoff are zeroed (repeat suppression). Fully on device;
        replaces extract_kmer_list (lookup_table.c:175-190).
        """
        return _lookup_ranges(
            self.sorted_hashes, self.bucket_starts, query_hashes,
            2 * self.k - self.n_bucket_bits, self.occ_cutoff,
            self.n_search_steps, run_end=self.run_end)


_HASH_SENTINEL = np.int32(1 << 30)   # > any 30-bit k-mer hash; pads sort last


@functools.partial(jax.jit, static_argnames=("k", "n_bucket_bits"))
def _build_index_device(words, ends, total, *, k: int, n_bucket_bits: int):
    """Device index build over the pow2-padded packed word buffer.

    words: u32[NW] (16 bases/word, base 0 in high bits — devstore layout);
    ends: i32[NS] read end offsets; total: i32 scalar (real base count).
    Returns (sorted_hashes, sorted_positions, bucket_starts, run_end,
    n_real_kmers, max_bucket_count); array lengths are 16*NW (pow2)."""
    NW = words.shape[0]
    N = NW * 16
    shift_dir = 2 * k - n_bucket_bits
    nb = 1 << n_bucket_bits
    # unpack 16 bases per word (base 0 in the two HIGH bits)
    sh_amt = (30 - 2 * jnp.arange(16, dtype=jnp.uint32))[None, :]
    bases = ((words[:, None] >> sh_amt) & 3).astype(jnp.uint8).reshape(N)
    # polynomial hash via k shifted adds (big-endian base-4, word_finder.c:65)
    bx = jnp.concatenate([bases, jnp.zeros(16, jnp.uint8)])
    h = jnp.zeros(N, jnp.int32)
    for j in range(k):
        h = h + (bx[j:j + N].astype(jnp.int32) << (2 * (k - 1 - j)))
    # invalidate k-mers spanning a read end (and everything past `total`):
    # positions [end-k+1, end) of every read, which may over-mark into an
    # adjacent short read only at positions that are invalid there too
    bad = (ends[None, :] - jnp.arange(1, k, dtype=jnp.int32)[:, None]).reshape(-1)
    bad = jnp.where(bad >= 0, bad, N)          # no negative-index wraparound
    mask = jnp.ones(N, bool).at[bad].set(False, mode="drop")
    mask &= jnp.arange(N, dtype=jnp.int32) < (total - (k - 1))
    hm = jnp.where(mask, h, _HASH_SENTINEL)
    sh_s, sp_s = jax.lax.sort((hm, jnp.arange(N, dtype=jnp.int32)),
                              num_keys=1, is_stable=True)
    n_real = mask.sum(dtype=jnp.int32)
    # bucket directory: first index of each top-bits bucket, empty buckets
    # fill from the right (reverse cummin); sentinel opens bucket `nb`
    bb = jnp.minimum(sh_s >> shift_dir, nb).astype(jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), bb[1:] != bb[:-1]])
    idx = jnp.arange(N, dtype=jnp.int32)
    starts = jnp.full(nb + 1, N, jnp.int32).at[
        jnp.where(first, bb, nb + 1)].min(idx, mode="drop")
    starts = jax.lax.cummin(starts, reverse=True)
    starts = jnp.minimum(starts, n_real)       # pads live past the last bucket
    # run_end[i] = one past the last index of the equal-hash run holding i
    change = jnp.concatenate([sh_s[1:] != sh_s[:-1], jnp.ones(1, bool)])
    run_end = jax.lax.cummin(jnp.where(change, idx + 1, N), reverse=True)
    counts = starts[1:] - starts[:-1]
    return sh_s, sp_s, starts, run_end, n_real, counts.max()


def _quantize_steps(steps: int) -> int:
    """Round the binary-search step bound up to a coarse rung ({8, 12, 16,
    24, 32}): n_steps is a static arg of the candidate executable, and exact
    per-store values made every store compile (and per process, load) its own
    program set."""
    for r in (8, 12, 16, 24, 32):
        if steps <= r:
            return r
    return 32


def _run_ends(sh: np.ndarray) -> np.ndarray:
    """run_end[i] = one past the last index of the equal-hash run holding i."""
    n = len(sh)
    if n == 0:
        return np.zeros(0, np.int32)
    change = np.r_[sh[1:] != sh[:-1], True]
    ends = np.flatnonzero(change) + 1            # end of each run, run-ordered
    run_id = np.cumsum(np.r_[False, change[:-1]])
    return ends[run_id].astype(np.int32)


def _search_steps(bucket_starts) -> int:
    counts = np.diff(np.asarray(bucket_starts))
    mx = int(counts.max()) if len(counts) else 1
    return _quantize_steps(int(np.ceil(np.log2(max(2, mx)))) + 1)


@functools.partial(jax.jit, static_argnames=("n_steps",))
def _lookup_ranges(sorted_hashes, bucket_starts, qh, shift, occ_cutoff,
                   n_steps: int | None = None, run_end=None):
    bucket = (qh >> shift).astype(jnp.int32)
    lo = bucket_starts[bucket]
    hi = bucket_starts[bucket + 1]
    # binary search for the left bound (first >= qh) within [lo, hi)
    if n_steps is None:
        n_steps = int(np.ceil(np.log2(max(2, sorted_hashes.shape[0])))) + 1
    M = sorted_hashes.shape[0]

    if run_end is not None:
        # single search + one run_end gather (the right-bound search is the
        # same number of gathers again; gathers are the whole lookup cost)
        def body(_, state):
            lo_l, hi_l = state
            mid = (lo_l + hi_l) // 2
            go_right = sorted_hashes[mid] < qh
            return (jnp.where(go_right, mid + 1, lo_l),
                    jnp.where(go_right, hi_l, mid))

        lo_l, _ = jax.lax.fori_loop(0, n_steps, body, (lo, hi))
        safe = jnp.clip(lo_l, 0, M - 1)
        hit = (lo_l < hi) & (sorted_hashes[safe] == qh)
        count = jnp.where(hit, run_end[safe] - lo_l, 0)
        count = jnp.where(count > occ_cutoff, 0, count)
        return lo_l, count

    def body(_, state):
        lo_l, hi_l, lo_r, hi_r = state
        # left bound: first index with sorted_hashes[idx] >= qh
        mid_l = (lo_l + hi_l) // 2
        go_right_l = sorted_hashes[mid_l] < qh
        lo_l = jnp.where(go_right_l, mid_l + 1, lo_l)
        hi_l = jnp.where(go_right_l, hi_l, mid_l)
        # right bound: first index with sorted_hashes[idx] > qh
        mid_r = (lo_r + hi_r) // 2
        go_right_r = sorted_hashes[mid_r] <= qh
        lo_r = jnp.where(go_right_r, mid_r + 1, lo_r)
        hi_r = jnp.where(go_right_r, hi_r, mid_r)
        return lo_l, hi_l, lo_r, hi_r

    lo_l, _, lo_r, _ = jax.lax.fori_loop(0, n_steps, body, (lo, hi, lo, hi))
    start = lo_l
    count = lo_r - lo_l
    count = jnp.where(count > occ_cutoff, 0, count)
    return start, count


def query_kmer_hashes(batch: jax.Array, lens: jax.Array, k: int, scan_window: int):
    """Sampled k-mer hashes for a padded query batch [B, L].

    Returns (hashes int32[B, S], qoffs int32[S], valid bool[B, S]) where S is the
    static number of sample positions (L - k) // scan_window + 1.
    Mirrors extract_hash_values (word_finder.c:65-82): positions 0, w, 2w, ...
    """
    B, L = batch.shape
    S = max(1, (L - k) // scan_window + 1)
    qoffs = (jnp.arange(S, dtype=jnp.int32) * scan_window)
    cols = jnp.minimum(qoffs[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :], L - 1)  # [S, k]
    sub = batch[:, cols].astype(jnp.int32)  # [B, S, k]
    weights = (1 << (2 * jnp.arange(k - 1, -1, -1, dtype=jnp.int32)))
    h = (sub * weights[None, None, :]).sum(-1)
    valid = (qoffs[None, :] + k) <= lens[:, None]
    return h, qoffs, valid
