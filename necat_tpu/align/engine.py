"""Chunked banded-extension engine: one fused device dispatch per chunk.

The single extension driver behind BOTH the overlapper (oc2asmpm/oc2rm role,
src/asm_pm/asm_pm_common.c:74-180) and the consensus corrector (cns_extension,
src/consensus/consensus_aux.c:123-215). Each chunk is ONE jit dispatch that
gathers the pair rows from the 2-bit packed device store and runs the banded
extension (forward + backtrack + clip/stats) — the host uploads a single packed
descriptor array per chunk, so a tunnel-attached TPU sees one h2d + one launch
per chunk and every chunk pipelines behind the previous one. Stats come back
asynchronously; `ExtChunk.stats()` is the only sync point.

Rescue (the reference's DALIGNER long-indel cascade) re-dispatches hanging
pairs with a wider band and splices the better result back by chunk lane.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from necat_tpu.align import banded
from necat_tpu.utils import shapes
from necat_tpu.utils.logging import timed

# descriptor columns (int32; DeviceReadStore guarantees offsets < 2^31)
DESC_COLS = ("qg", "qglen", "qrc", "tg", "tglen", "qlen", "tlen", "aq", "at")


@functools.partial(jax.jit, static_argnames=("W", "L", "tail_match",
                                             "insb_words"))
def gather_extend(words_q, words_t, desc, W: int, L: int,
                  tail_match: int = banded.TAIL_MATCH, insb_words: int = 1):
    """Fused device step: gather pair rows from packed word buffers + extend.

    desc: int32[PB, 9] with columns DESC_COLS. Returns the extend_batch output
    dict plus the gathered query rows (qbatch) for the CPU-oracle scatter path.
    """
    from necat_tpu.io.devstore import _gather_rows
    c = {k: desc[:, i] for i, k in enumerate(DESC_COLS)}
    PB = desc.shape[0]
    qb = _gather_rows(words_q, c["qg"], c["qglen"], c["qrc"].astype(bool), L)
    tb = _gather_rows(words_t, c["tg"], c["tglen"],
                      jnp.zeros((PB,), bool), L)
    out = banded._extend_batch_jit(qb, c["qlen"], tb, c["tlen"],
                                   c["aq"], c["at"], W=W, tail_match=tail_match,
                                   insb_words=insb_words)
    out["qbatch"] = qb
    return out


@dataclasses.dataclass
class ExtChunk:
    """One dispatched extension chunk (device refs + host metadata)."""

    out: dict                 # device arrays (stats, cols, insb, lead, ...)
    sel: np.ndarray           # global pair indices (caller's id space)
    n_real: int
    L: int
    W: int
    aq: np.ndarray            # int32[PB] host copies (window coords)
    at: np.ndarray
    ws: np.ndarray            # int64[n_real] window starts (absolute subject)
    live: np.ndarray          # bool[PB] lane liveness (rescue may kill lanes)
    group: int = 0            # caller grouping key (e.g. template bucket)
    _stats: Optional[np.ndarray] = None

    def stats(self) -> np.ndarray:
        """Host stats [6, PB]: qoff, qend, toff, tend, n_cols, n_match
        (toff/tend in WINDOW coords). Syncs on first call."""
        if self._stats is None:
            with timed("ext.stats_sync"):
                self._stats = np.asarray(self.out["stats"])
        return self._stats

    def release(self):
        self.out = {}


class ExtendEngine:
    """Dispatch pair batches as fused gather+extend chunks.

    qdev/sdev: DeviceReadStore of query/subject sequences. All submit() calls
    are async; read chunk.stats() to sync a chunk.
    """

    def __init__(self, qdev, sdev, pairs_per_chunk: int = 1024, mesh=None):
        from necat_tpu.parallel import mesh as pmesh
        self.qdev = qdev
        self.sdev = sdev
        self.cap = pairs_per_chunk
        self.mesh = pmesh.auto_mesh() if mesh is None else mesh
        # device the stores are pinned to (None = backend default); the
        # multi-device correction path runs one engine per device
        self.device = getattr(qdev, "device", None)

    def plan(
        self,
        sel: np.ndarray,        # global pair ids (for the caller's bookkeeping)
        qids: np.ndarray,       # per-pair query read id (into qdev)
        qdir: np.ndarray,       # per-pair query strand
        qsize: np.ndarray,      # query lengths
        tg_base: np.ndarray,    # absolute base offset of each pair's subject
        tsize: np.ndarray,      # subject (or window source) lengths
        aq: np.ndarray,         # anchor on query (qdir-strand coords)
        at_abs: np.ndarray,     # anchor on subject (absolute coords)
        W: int,
        groups: Optional[np.ndarray] = None,   # chunk-purity key per pair
        window_margin: int = 600,
        extra_cols: Optional[Dict[str, np.ndarray]] = None,
    ) -> List[dict]:
        """Window + tier + chunk the pair set WITHOUT dispatching.

        Returns per-chunk dicts: desc int32[PB, 9+len(extra)], take (indices
        into the input arrays), ws, L, n_real, group. Extra per-pair columns
        (name -> int32 array) are appended to desc after the 9 DESC_COLS in
        dict order; padding lanes get -1 in every extra column.

        Subject windows are computed around the anchor (bounded by 1.3x the
        query side + margin, oc_aligner.c:127-131) so padded target size
        scales with the query length even for huge subjects."""
        sel = np.asarray(sel)
        if len(sel) == 0:
            return []
        qids = np.asarray(qids)
        left_need = (np.asarray(aq).astype(np.int64) * 13) // 10 + window_margin
        right_need = ((qsize - aq).astype(np.int64) * 13) // 10 + window_margin
        ws = np.maximum(at_abs - left_need, 0)
        we = np.minimum(at_abs + right_need, tsize.astype(np.int64))
        wlen = we - ws
        tier = np.array([shapes.length_tier(int(max(qsize[i], wlen[i])))
                         for i in range(len(sel))])
        gkey = np.zeros(len(sel), np.int64) if groups is None else np.asarray(groups)
        # chunking: within a group, largest tiers first; a chunk absorbs
        # same-group pairs of ANY lower tier — tiers are pow2-spaced, so an
        # absorbed pair wastes at most the columns a DEAD lane would waste
        # anyway, and it leaves a later chunk entirely (26% of all extension
        # lanes were padding with tier-floor cuts, VERDICT r4 weak #5)
        order = np.lexsort((qsize, -tier, gkey))
        planned: List[dict] = []
        n_extra = len(extra_cols) if extra_cols else 0
        cs = 0
        n = len(order)
        while cs < n:
            i0 = order[cs]
            L = int(tier[i0])
            g = gkey[i0]
            PBmax = min(shapes.pairs_per_chunk(L, W), self.cap)
            take = order[cs:cs + PBmax]
            keep = gkey[take] == g
            if not keep.all():          # order is gkey-sorted:
                take = take[:np.argmin(keep)]  # cut at the group boundary
            cs += len(take)
            n_real = len(take)
            # On TPU: ALWAYS the tier's full chunk capacity — a per-chunk PB
            # (next pow2 >= n_real) multiplied the executable count by ~7,
            # and each distinct executable costs seconds of device load time
            # through the tunnel, far more than the padded dead lanes cost.
            # On CPU (tests) compiles are cheap and padded lanes are real
            # compute: size the chunk to the work.
            if jax.default_backend() == "cpu":
                PB = max(8, 1 << (n_real - 1).bit_length())
            else:
                PB = PBmax
            with timed("ext.chunk_build"):
                desc = np.zeros((PB, len(DESC_COLS) + n_extra), np.int32)
                qi = qids[take]
                desc[:n_real, 0] = self.qdev.offsets[qi]
                desc[:n_real, 1] = self.qdev.offsets[qi + 1] - self.qdev.offsets[qi]
                desc[:n_real, 2] = qdir[take]
                desc[:n_real, 3] = tg_base[take] + ws[take]
                desc[:n_real, 4] = wlen[take]
                desc[:n_real, 5] = qsize[take]
                desc[:n_real, 6] = wlen[take]
                desc[:n_real, 7] = aq[take]
                desc[:n_real, 8] = at_abs[take] - ws[take]
                if extra_cols:
                    desc[:, len(DESC_COLS):] = -1
                    for ci, arr in enumerate(extra_cols.values()):
                        desc[:n_real, len(DESC_COLS) + ci] = \
                            np.asarray(arr)[take]
            planned.append(dict(desc=desc, take=take, ws=ws[take].copy(),
                                L=L, n_real=n_real, group=int(g), PB=PB))
        return planned

    def submit(
        self,
        sel: np.ndarray,
        qids: np.ndarray,
        qdir: np.ndarray,
        qsize: np.ndarray,
        tg_base: np.ndarray,
        tsize: np.ndarray,
        aq: np.ndarray,
        at_abs: np.ndarray,
        W: int,
        groups: Optional[np.ndarray] = None,
        window_margin: int = 600,
        insb_words: int = 1,
    ) -> List[ExtChunk]:
        """Dispatch all pairs as fused gather+extend chunks (async)."""
        sel = np.asarray(sel)
        planned = self.plan(sel, qids, qdir, qsize, tg_base, tsize, aq, at_abs,
                            W, groups=groups, window_margin=window_margin)
        chunks: List[ExtChunk] = []
        for p in planned:
            desc, take, L, PB, n_real = (p["desc"], p["take"], p["L"], p["PB"],
                                         p["n_real"])
            with timed("ext.dispatch"):
                with timed("ext.desc_upload"):
                    desc_j = jnp.asarray(desc)
                with timed("ext.enqueue"):
                    from necat_tpu.utils.device import tunnel_retry
                    if self.mesh is not None and PB % self.mesh.size == 0:
                        # pair rows data-parallel over the chip mesh
                        from necat_tpu.parallel.mesh import sharded_gather_extend_fn
                        fn = sharded_gather_extend_fn(self.mesh, W=W, L=L,
                                                      insb_words=insb_words)
                        out = tunnel_retry(fn, self.qdev.words,
                                           self.sdev.words, desc_j)
                    else:
                        out = tunnel_retry(gather_extend, self.qdev.words,
                                           self.sdev.words, desc_j, W=W, L=L,
                                           insb_words=insb_words)
                with timed("ext.stats_copy_issue"):
                    try:
                        out["stats"].copy_to_host_async()
                    except Exception:
                        pass
                import os as _os
                if _os.environ.get("NECAT_TPU_SYNC_DISPATCH"):
                    with timed("ext.device_exec"):
                        jax.block_until_ready(out["left_cols"])
                        jax.block_until_ready(out["stats"])
            from necat_tpu.utils import logging as _lg
            _lg._TIMERS["ext.lanes"] += PB
            _lg._TIMERS["ext.real_lanes"] += n_real
            _lg._TIMERS["ext.cell_Mlanes"] += PB * L / 1e6
            chunks.append(ExtChunk(
                out=out, sel=sel[take], n_real=n_real, L=L, W=W,
                aq=desc[:, 7].copy(), at=desc[:, 8].copy(),
                ws=p["ws"], live=np.ones(PB, bool), group=p["group"]))
        return chunks

def collect_stats(chunks: List[ExtChunk], stats: dict, base_ci: int = 0) -> None:
    """Merge chunk stats into the flat per-pair arrays of `stats`
    (toff/tend absolute; stats arrays are indexed by global pair id).

    stats must hold qoff/qend/toff/tend/n_cols/ident arrays plus a `lane`
    dict (pair id -> (chunk index, lane))."""
    for ci, ch in enumerate(chunks, start=base_ci):
        st = ch.stats()
        r = slice(0, ch.n_real)
        idx = ch.sel
        stats["qoff"][idx] = st[0, r]
        stats["qend"][idx] = st[1, r]
        stats["toff"][idx] = st[2, r] + ch.ws
        stats["tend"][idx] = st[3, r] + ch.ws
        stats["n_cols"][idx] = st[4, r]
        stats["ident"][idx] = np.where(
            st[4, r] > 0, 100.0 * st[5, r] / np.maximum(st[4, r], 1), 0.0)
        for k, p in enumerate(idx):
            stats["lane"][int(p)] = (ci, k)


def new_stats(n_pairs: int) -> dict:
    out = {k: np.zeros(n_pairs, np.int64)
           for k in ("qoff", "qend", "toff", "tend", "n_cols")}
    out["ident"] = np.zeros(n_pairs, np.float64)
    out["lane"] = {}
    return out


def splice_rescue(all_chunks: List[ExtChunk], rescue_chunks: List[ExtChunk],
                  stats: dict) -> int:
    """Keep each rescued pair's wider-band result only where it aligned more
    columns (the reference falls back to the small-edlib result otherwise,
    consensus_aux.c:203-213). Kills the losing lane; returns #improved."""
    improved = 0
    base_ci = len(all_chunks)
    for ci, ch in enumerate(rescue_chunks, start=base_ci):
        st = ch.stats()
        r = slice(0, ch.n_real)
        idx = ch.sel
        better = st[4, r] >= stats["n_cols"][idx]
        for k, (p, b) in enumerate(zip(idx, better)):
            if b:
                oci, ok_ = stats["lane"][int(p)]
                all_chunks[oci].live[ok_] = False
                stats["lane"][int(p)] = (ci, k)
            else:
                ch.live[k] = False
        upd = idx[better]
        ur = np.flatnonzero(better)
        stats["qoff"][upd] = st[0, ur]
        stats["qend"][upd] = st[1, ur]
        stats["toff"][upd] = st[2, ur] + ch.ws[ur]
        stats["tend"][upd] = st[3, ur] + ch.ws[ur]
        stats["n_cols"][upd] = st[4, ur]
        stats["ident"][upd] = np.where(
            st[4, ur] > 0, 100.0 * st[5, ur] / np.maximum(st[4, ur], 1), 0.0)
        improved += int(better.sum())
    all_chunks.extend(rescue_chunks)
    return improved
