"""Single-dispatch correction chunks: gather -> extend -> accept -> scatter.

The legacy flow runs TWO device programs per chunk (extend, then tag scatter)
with the per-column alignment encodings crossing the program boundary as
~100 MB device buffers, and decides acceptance on the HOST between them. On a
tunnel-attached TPU every extra dispatch, cross-program buffer and host sync
costs round trips that dwarf the compute, so this module fuses the whole
per-chunk pipeline into ONE jit program:

    gather pair rows (2-bit packed store) -> banded extension -> acceptance
    (identity cutoff / mapping range / full-coverage exception, on device)
    -> weighted tag scatter into the donated consensus tensors

and returns only an [8, PB] stats array. The adaptive identity cutoff
(error_estimate.c:32-64) is ALSO computed on device: a round-0 identity pass
scatters per-template ident/good/span flags into a small buffer, and
`cutoff_from_idents` reduces it to per-template cutoffs that stay on device —
the host never syncs inside a wave.

Long-indel rescue (cns_extension cascade, consensus_aux.c:152-213) works by
DEFERRAL: when `rescue_defer` is set, lanes whose extension leaves > 200 bp of
candidate hang scatter nothing and raise the `deferred` stats flag; the host
re-dispatches them at a wider band with `cols_guard` (scatter only if the wide
result aligns >= the original column count), and finally replays still-losing
lanes at the original band. The sequence reproduces the legacy splice_rescue
outcome exactly (extension is deterministic).

Acceptance semantics mirror consensus_one_read.c:215-392 +
consensus_aux.c:93-122 exactly; correct.py's legacy two-program path remains
the oracle (tests force both paths on CPU and require identical records).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from necat_tpu.align import banded
from necat_tpu.align.engine import DESC_COLS
from necat_tpu.utils.logging import timed

# extra desc columns appended after the 9 DESC_COLS (engine.plan extra_cols)
#   row   — template row within its bucket (TB = dead lane)
#   tsfull— full template length (window coords otherwise)
#   ws    — window start on the template (absolute)
#   slot  — round-0 ident-buffer slot (sequential per template)
#   qe    — candidate query end (rescue hang check, consensus_aux.c:152-157)
#   nc0   — prior n_cols guard (rescue wide pass keeps only >= results)
FUSED_EXTRA = ("row", "tsfull", "ws", "slot", "qe", "nc0")
_C = {k: i for i, k in enumerate(DESC_COLS + FUSED_EXTRA)}

IDENT_SLOTS = 32        # round-0 ident buffer slots per template (>= n_ident+10)


# ------------------------------------------------------------- predicates
# Pure arithmetic - used with numpy arrays (legacy host path) and jnp traced
# values (fused device path) alike.

def is_good_overlap(ql, qr, qs, tl, tr, ts, margin=200):
    """error_estimate.c:7-30 — overlap ends near sequence ends on paired sides."""
    qlh, qrh, tlh, trh = ql, qs - qr, tl, ts - tr
    m = margin
    return ((qlh <= m) & (qrh <= m)) | ((tlh <= m) & (trh <= m)) | \
           ((qrh <= m) & (tlh <= m)) | ((trh <= m) & (qlh <= m))


def check_mapping_range(ql, qr, qs, tl, tr, ts, min_size, ratio):
    """consensus_aux.c:115-122."""
    return ((qr - ql) >= min_size) | ((tr - tl) >= min_size) | \
           ((qr - ql) >= qs * ratio) | ((tr - tl) >= ts * ratio)


def is_full_cov_ovlp(ql, qr, qs, tl, tr, ts, ovlp_size, tail):
    """consensus_aux.c:93-112 — query or template nearly fully covered."""
    r = ((ql <= tail) & (qs - qr <= tail)) | ((tl <= tail) & (ts - tr <= tail))
    r |= (qs - qr <= tail) & (tl <= tail) & ((qr - ql) >= ovlp_size)
    r |= (ts - tr <= tail) & (ql <= tail) & ((qr - ql) >= ovlp_size)
    return r


def calc_cns_weight_jnp(ident_perc):
    """jnp twin of tags.calc_cns_weight (consensus_one_read.c:11-16)."""
    e = (100.0 - ident_perc) / 100.0 / 2.0
    w = (1.0 - e) * (1.0 - e) + e * e / 3.0
    return jnp.where(100.0 - ident_perc <= 1e-6, 1.0, w).astype(jnp.float32)


# ------------------------------------------------------------- fused programs

def _gather_pair(words_q, words_t, c, L):
    from necat_tpu.io.devstore import _gather_rows
    PB = c["qg"].shape[0]
    qb = _gather_rows(words_q, c["qg"], c["qglen"], c["qrc"].astype(bool), L)
    tb = _gather_rows(words_t, c["tg"], c["tglen"], jnp.zeros((PB,), bool), L)
    return qb, tb


def _extend(words_q, words_t, desc, W, L, tail_match, insb_words):
    c = {k: desc[:, i] for k, i in _C.items() if i < desc.shape[1]}
    qb, tb = _gather_pair(words_q, words_t, c, L)
    out = banded._extend_batch_jit(qb, c["qlen"], tb, c["tlen"], c["aq"],
                                   c["at"], W=W, tail_match=tail_match,
                                   insb_words=insb_words)
    return c, out


@functools.partial(
    jax.jit,
    static_argnames=("W", "L", "tail_match", "insb_words"),
    donate_argnames=("weights", "coverage"))
def extend_scatter(words_q, words_t, desc, cutoff, weights, coverage,
                   min_align_size, mapping_ratio, allow_fullcov,
                   rescue_defer, cols_guard, *,
                   W: int, L: int, tail_match: int, insb_words: int):
    """One whole correction chunk in one dispatch.

    desc: int32[PB, 15] (DESC_COLS + FUSED_EXTRA). cutoff: f32[TB+1]
    per-template identity cutoffs (device-resident). Returns (weights,
    coverage, stats) with stats int32[8, PB] =
    qoff, qend, toff(window), tend(window), n_cols, n_match, accepted,
    deferred. Deferred lanes scatter nothing (see module docstring).

    min_align_size/mapping_ratio and the three mode flags are TRACED scalars
    (not statics): on the tunnel-attached TPU every distinct executable costs
    seconds of per-process device load, so the executable key must be
    (PB, L, Lt, W, insb_words) only."""
    from necat_tpu.consensus import tags as tags_mod
    c, out = _extend(words_q, words_t, desc, W, L, tail_match, insb_words)
    TBp1 = weights.shape[0]
    TB = TBp1 - 1
    ql, qr = out["qoff"], out["qend"]
    tl = out["toff"] + c["ws"]
    tr = out["tend"] + c["ws"]
    qs = c["qlen"]
    ts = c["tsfull"]
    ident = out["ident"]
    cut = cutoff[jnp.clip(c["row"], 0, TB)]
    ok = out["n_cols"] >= min_align_size
    ok &= check_mapping_range(ql, qr, qs, tl, tr, ts, min_align_size,
                              mapping_ratio)
    pass_ident = ident >= cut
    pass_ident |= allow_fullcov & is_full_cov_ovlp(ql, qr, qs, tl, tr, ts,
                                                   5000, 100)
    ok &= pass_ident
    ok &= (c["row"] >= 0) & (c["row"] < TB)

    hang = jnp.maximum(ql - c["aq"], 0) + jnp.maximum(c["qe"] - qr, 0)
    deferred = rescue_defer & (hang > 200) & (c["row"] >= 0)
    deferred |= cols_guard & (out["n_cols"] < c["nc0"]) & (c["row"] >= 0)
    ok &= ~deferred

    w = jnp.where(ok, calc_cns_weight_jnp(ident), 0.0)
    row_eff = jnp.where(ok, c["row"], TB).astype(jnp.int32)
    at_abs = (c["at"] + c["ws"]).astype(jnp.int32)

    def insb_tuple(side):
        words = [out[f"{side}_insb"]]
        wn = 2
        while f"{side}_insb{wn}" in out:
            words.append(out[f"{side}_insb{wn}"])
            wn += 1
        return tuple(words)

    weights, coverage = tags_mod.scatter_chunk_mm(
        weights, coverage,
        out["left_cols"], insb_tuple("left"), out["left_lead"],
        out["left_leadb"], out["left_jc"],
        out["right_cols"], insb_tuple("right"), out["right_lead"],
        out["right_leadb"], out["right_jc"],
        at_abs, row_eff, w, ts.astype(jnp.int32))
    stats = jnp.concatenate([out["stats"], ok.astype(jnp.int32)[None, :],
                             deferred.astype(jnp.int32)[None, :]], axis=0)
    return weights, coverage, stats


@functools.partial(
    jax.jit,
    static_argnames=("W", "L", "tail_match"),
    donate_argnames=("ibuf",))
def ident_pass(words_q, words_t, desc, ibuf, min_align_size,
               good_end_margin, cols_guard, *, W: int, L: int,
               tail_match: int):
    """Round-0 identity estimation pass: extend and record per-template
    (ident, good, span) triples into ibuf f32[TB+1, IDENT_SLOTS, 3] at
    (row, slot). Returns (ibuf, stats int32[6, PB]) — the stats feed the
    rescue hang check; no other host output. With cols_guard, a lane only
    overwrites its slot when it aligned >= nc0 columns (rescue wide re-pass
    keeps the original entry for losing lanes). Thresholds/flags are traced
    (see extend_scatter)."""
    c, out = _extend(words_q, words_t, desc, W, L, tail_match, 1)
    TBp1 = ibuf.shape[0]
    S = ibuf.shape[1]
    ql, qr = out["qoff"], out["qend"]
    tl = out["toff"] + c["ws"]
    tr = out["tend"] + c["ws"]
    qs = c["qlen"]
    ts = c["tsfull"]
    ident = out["ident"].astype(jnp.float32)
    ok_align = out["n_cols"] >= min_align_size
    good = is_good_overlap(ql, qr, qs, tl, tr, ts, good_end_margin) & ok_align
    span = (((qr - ql) >= 0.6 * qs) | ((tr - tl) >= 0.6 * ts)) & ok_align
    valid = (c["row"] >= 0) & (c["row"] < TBp1 - 1) & (c["slot"] >= 0) \
        & (c["slot"] < S)
    valid &= (~cols_guard) | (out["n_cols"] >= c["nc0"])
    row = jnp.where(valid, c["row"], TBp1 - 1)
    slot = jnp.where(valid, c["slot"], S - 1)
    lin = row * S + slot
    flat = ibuf.reshape(-1, 3)
    flat = flat.at[lin, 0].set(jnp.where(valid, ident, 0.0))
    flat = flat.at[lin, 1].set(jnp.where(valid, good, False).astype(jnp.float32))
    flat = flat.at[lin, 2].set(jnp.where(valid, span, False).astype(jnp.float32))
    # the per-column encodings stay device-resident so accept_scatter can
    # scatter this chunk after the cutoffs are known WITHOUT re-extending
    # (round 0 was ~37% of all extension lanes at E. coli scale)
    bufs = {k_: out[k_] for k_ in
            ("left_cols", "left_insb", "left_lead", "left_leadb", "left_jc",
             "right_cols", "right_insb", "right_lead", "right_leadb",
             "right_jc")}
    return flat.reshape(ibuf.shape), out["stats"], bufs


@functools.partial(
    jax.jit,
    static_argnames=(),
    donate_argnames=("weights", "coverage"))
def accept_scatter(desc, stats6, cutoff, weights, coverage,
                   left_cols, left_insb, left_lead, left_leadb, left_jc,
                   right_cols, right_insb, right_lead, right_leadb, right_jc,
                   min_align_size, mapping_ratio):
    """Round-0 acceptance + tag scatter over an ident_pass chunk's RETAINED
    buffers (no re-extension; allow_fullcov is always False in round 0,
    consensus_one_read.c:273-278). Returns (weights, coverage, stats8)."""
    from necat_tpu.consensus import tags as tags_mod
    c = {k: desc[:, i] for k, i in _C.items() if i < desc.shape[1]}
    TBp1 = weights.shape[0]
    TB = TBp1 - 1
    ql, qr = stats6[0], stats6[1]
    tl = stats6[2] + c["ws"]
    tr = stats6[3] + c["ws"]
    n_cols, n_match = stats6[4], stats6[5]
    qs = c["qlen"]
    ts = c["tsfull"]
    ident = jnp.where(n_cols > 0,
                      100.0 * n_match / jnp.maximum(n_cols, 1), 0.0)
    cut = cutoff[jnp.clip(c["row"], 0, TB)]
    ok = n_cols >= min_align_size
    ok &= check_mapping_range(ql, qr, qs, tl, tr, ts, min_align_size,
                              mapping_ratio)
    ok &= ident >= cut
    ok &= (c["row"] >= 0) & (c["row"] < TB)
    w = jnp.where(ok, calc_cns_weight_jnp(ident), 0.0)
    row_eff = jnp.where(ok, c["row"], TB).astype(jnp.int32)
    at_abs = (c["at"] + c["ws"]).astype(jnp.int32)
    weights, coverage = tags_mod.scatter_chunk_mm(
        weights, coverage,
        left_cols, (left_insb,), left_lead, left_leadb, left_jc,
        right_cols, (right_insb,), right_lead, right_leadb, right_jc,
        at_abs, row_eff, w, ts.astype(jnp.int32))
    stats = jnp.concatenate([stats6, ok.astype(jnp.int32)[None, :],
                             jnp.zeros((1, ok.shape[0]), jnp.int32)], axis=0)
    return weights, coverage, stats


@functools.partial(jax.jit, static_argnames=("n_ident",))
def cutoff_from_idents(ibuf, *, n_ident: int):
    """Device twin of estimate_ident_cutoff + the good/span selection of the
    legacy round 0 (correct.py): per template take the first n_ident GOOD
    overlaps' idents (falling back to the first n_ident SPANNING overlaps
    when good ones are scarce), then mean - 5*stddev over the top 70 %
    (top 100 % when n < 8), 0 when n < 5. Returns f32[TB+1]."""
    ident = ibuf[:, :, 0]
    good = ibuf[:, :, 1] > 0.5
    span = ibuf[:, :, 2] > 0.5
    csum_g = jnp.cumsum(good, axis=1)
    csum_s = jnp.cumsum(span, axis=1)
    sel_g = good & (csum_g <= n_ident)
    sel_s = span & (csum_s <= n_ident)
    n_good = csum_g[:, -1]
    use_span = jnp.minimum(n_good, n_ident) < n_ident
    sel = jnp.where(use_span[:, None], sel_s, sel_g)
    vals = jnp.where(sel, ident, -jnp.inf)
    vals = jnp.sort(vals, axis=1)[:, ::-1]          # desc
    n = sel.sum(axis=1)
    n_use = jnp.where(n >= 8, (n * 7) // 10, n)
    S = vals.shape[1]
    idx = jnp.arange(S)[None, :]
    m = idx < n_use[:, None]
    v = jnp.where(m, vals, 0.0)
    nu = jnp.maximum(n_use, 1).astype(jnp.float32)
    mean = v.sum(axis=1) / nu
    # two-pass (shifted) variance: E[x^2]-mean^2 near ident~100 loses ~7
    # decimal digits to cancellation in f32 and can flip borderline accepts
    dv = jnp.where(m, vals - mean[:, None], 0.0)
    var = (dv * dv).sum(axis=1) / nu
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    return jnp.where(n >= 5, mean - 5.0 * std, 0.0).astype(jnp.float32)


# ------------------------------------------------------------- host driver

def dispatch_wave(engine, *, qids, qdir, qsize, tg_base, tsize_full, aq,
                  at_abs, rows, groups, cutoffs: dict, tensors: dict,
                  W: int, insb_words: int, min_align_size: int,
                  mapping_ratio: float, allow_fullcov: bool,
                  slots=None, ibufs: dict | None = None,
                  qend_cand=None, nc0=None,
                  rescue_defer: bool = False, cols_guard: bool = False,
                  good_end_margin: int = 200,
                  tail_match: int = banded.TAIL_MATCH):
    """Dispatch one wave of pairs as fused chunks.

    engine: one ExtendEngine, or a LIST of them (one per device) — chunks of
    bucket g then run on engines[g % n] with the bucket's tensors pinned to
    that engine's device (multi-chip correction: buckets are independent, so
    this is pure data parallelism with no collectives).
    cutoffs: group -> f32[TB+1] device cutoff vector.
    tensors: group -> (weights, coverage); updated in place (donated through).
    When ibufs is given (round 0), ONLY the ident_pass runs for every chunk
    (donating ibufs[group]); `slots` (sequential per-template ident slots) is
    then REQUIRED — an all-zeros default would collapse every pair onto slot
    0 and silently disable cutoff estimation. The caller reduces ibufs into
    cutoffs via cutoff_from_idents, then calls again without ibufs.
    Returns list of FusedChunk (empty for an ident pass)."""
    engines = engine if isinstance(engine, (list, tuple)) else [engine]
    npairs = len(qids)
    if ibufs is not None and slots is None:
        raise ValueError("dispatch_wave(ibufs=...) requires per-pair slots")
    zeros = np.zeros(npairs, np.int64)
    extra = dict(row=rows, tsfull=tsize_full, ws=zeros,
                 slot=(slots if slots is not None else zeros),
                 qe=(qend_cand if qend_cand is not None else zeros),
                 nc0=(nc0 if nc0 is not None else zeros))
    planned = engines[0].plan(np.arange(npairs), qids, qdir, qsize, tg_base,
                              tsize_full, aq, at_abs, W, groups=groups,
                              extra_cols=extra)
    out_chunks = []
    for p in planned:
        desc = p["desc"]
        # the ws column must reflect THIS chunk's window starts
        desc[:p["n_real"], _C["ws"]] = p["ws"]
        g = p["group"]
        eng = engines[g % len(engines)]
        with timed("cns.fused_dispatch"):
            with timed("cns.fused_desc_up"):
                if eng.device is not None:
                    desc_j = jax.device_put(desc, eng.device)
                else:
                    desc_j = jnp.asarray(desc)
            from necat_tpu.utils.device import tunnel_retry
            bufs = None
            with timed("cns.fused_call"):
                if ibufs is not None:
                    ibufs[g], stats, bufs = tunnel_retry(
                        ident_pass,
                        eng.qdev.words, eng.sdev.words, desc_j, ibufs[g],
                        np.int32(min_align_size),
                        np.int32(good_end_margin), np.bool_(cols_guard),
                        W=W, L=p["L"], tail_match=tail_match)
                else:
                    wts, cov = tensors[g]
                    wts, cov, stats = tunnel_retry(
                        extend_scatter,
                        eng.qdev.words, eng.sdev.words, desc_j, cutoffs[g],
                        wts, cov, np.int32(min_align_size),
                        np.float32(mapping_ratio), np.bool_(allow_fullcov),
                        np.bool_(rescue_defer), np.bool_(cols_guard),
                        W=W, L=p["L"], tail_match=tail_match,
                        insb_words=insb_words)
                    tensors[g] = (wts, cov)
            with timed("cns.fused_stats_issue"):
                try:
                    stats.copy_to_host_async()
                except Exception:
                    pass
            import os as _os
            if _os.environ.get("NECAT_TPU_SYNC_DISPATCH"):
                with timed(f"cns.fused_exec_L{p['L']}_PB{p['PB']}"):
                    jax.block_until_ready(stats)
        from necat_tpu.utils import logging as _lg
        _lg._TIMERS["ext.lanes"] += p["PB"]
        _lg._TIMERS["ext.real_lanes"] += p["n_real"]
        _lg._TIMERS["ext.cell_Mlanes"] += p["PB"] * p["L"] / 1e6
        out_chunks.append(FusedChunk(stats, p["take"], p["n_real"], p["ws"],
                                     g, bufs=bufs, desc_dev=desc_j))
    return out_chunks


_BUF_ORDER = ("left_cols", "left_insb", "left_lead", "left_leadb", "left_jc",
              "right_cols", "right_insb", "right_lead", "right_leadb",
              "right_jc")


def scatter_round0(engine, chunks, cutoffs: dict, tensors: dict,
                   min_align_size: int, mapping_ratio: float) -> None:
    """Scatter round-0 ident chunks from their RETAINED buffers once the
    device cutoffs exist (no re-extension, no host sync; non-rescue path).
    Updates tensors in place and swaps each chunk's stats for the 8-row form
    (with the accepted flag)."""
    from necat_tpu.utils.device import tunnel_retry
    engines = engine if isinstance(engine, (list, tuple)) else [engine]
    for ch in chunks:
        g = ch.group
        eng = engines[g % len(engines)]
        del eng  # placement follows the committed buffers
        wts, cov = tensors[g]
        with timed("cns.fused_dispatch"):
            with timed("cns.fused_call"):
                wts, cov, st = tunnel_retry(
                    accept_scatter, ch.desc_dev, ch.stats_dev, cutoffs[g],
                    wts, cov, *[ch.bufs[k] for k in _BUF_ORDER],
                    np.int32(min_align_size), np.float32(mapping_ratio))
            tensors[g] = (wts, cov)
            ch.stats_dev = st
            ch.bufs = None
            ch.desc_dev = None
            try:
                st.copy_to_host_async()
            except Exception:
                pass


def release_bufs(chunks) -> None:
    for ch in chunks:
        ch.bufs = None
        ch.desc_dev = None


class FusedChunk:
    """Stats handle of one fused dispatch (same collect interface role as
    ExtChunk). Ident-pass chunks also retain their per-column buffers until
    scatter_round0 consumes them."""

    __slots__ = ("stats_dev", "sel", "n_real", "ws", "group", "bufs",
                 "desc_dev")

    def __init__(self, stats_dev, sel, n_real, ws, group, bufs=None,
                 desc_dev=None):
        self.stats_dev = stats_dev
        self.sel = sel
        self.n_real = n_real
        self.ws = ws
        self.group = group
        self.bufs = bufs
        self.desc_dev = desc_dev


def new_fused_stats(n_pairs: int) -> dict:
    out = {k: np.zeros(n_pairs, np.int64)
           for k in ("qoff", "qend", "toff", "tend", "n_cols")}
    out["ident"] = np.zeros(n_pairs, np.float64)
    out["ok"] = np.zeros(n_pairs, bool)
    out["deferred"] = np.zeros(n_pairs, bool)
    return out


def collect_fused(chunks, stats: dict, sel=None) -> None:
    """Merge fused-chunk stats into flat per-pair arrays (one sync per chunk;
    toff/tend converted to absolute template coords). `sel` remaps chunk
    pair ids into the caller's id space (rescue re-dispatch subsets)."""
    for ch in chunks:
        with timed("ext.stats_sync"):
            st = np.asarray(ch.stats_dev)
        r = slice(0, ch.n_real)
        idx = ch.sel if sel is None else np.asarray(sel)[ch.sel]
        stats["qoff"][idx] = st[0, r]
        stats["qend"][idx] = st[1, r]
        stats["toff"][idx] = st[2, r] + ch.ws
        stats["tend"][idx] = st[3, r] + ch.ws
        stats["n_cols"][idx] = st[4, r]
        stats["ident"][idx] = np.where(
            st[4, r] > 0, 100.0 * st[5, r] / np.maximum(st[4, r], 1), 0.0)
        if st.shape[0] > 6:          # ident-pass chunks carry only 6 rows
            stats["ok"][idx] = st[6, r].astype(bool)
            stats["deferred"][idx] = st[7, r].astype(bool)
