"""Pallas TPU kernel for the banded-alignment forward DP.

The lax.scan formulation (banded.banded_forward) pays per-column dispatch
overhead (~1 ms/column on TPU); this kernel runs the column loop inside one
Mosaic program. Key trick: DIAGONAL coordinates with a STATIC band schedule.
Lane l of column j holds query row i = j + l - ctr(j) with

    ctr(j) = W/2 - (j * (la - lb)) // lb

i.e. the band follows the rescaled diagonal from (0,0) to (la,lb); the true
path endpoints are pinned to lane W/2, and its interior deviates from the
straight line only by the error bridge (~sqrt(L)/2 * indel_rate), well inside
W=128 for read-scale alignments. Moves become lane-local:

    diag (i-1,j-1)->(i,j): lane l-dc of the previous column
    left (i,j-1)->(i,j):   lane l+1-dc of the previous column
    up   (i-1,j)->(i,j):   lane l-1, same column -> forward cummin

where dc = ctr(j)-ctr(j-1) in {-1,0,1} is per pair, applied by selecting among
three statically shifted copies — pure vector ops, no unaligned VMEM slices
(Mosaic requires 128-multiple dynamic offsets). The query is pre-diagonalized
in XLA: DQ[p, j-1, l] = a[p, j + l - ctr(j) - 1], so the kernel's per-column
fetch is an aligned block row.

Emits the same (dirs, offs) encoding as banded.banded_forward, so traceback
and tail clipping are shared. The adaptive scan version remains the CPU
fallback and the correctness oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from necat_tpu.align.banded import OP_DEL, OP_DIAG, OP_INS, OP_PAD

INF = 1 << 20    # python int: jnp scalars would be captured as kernel constants
SUB_MAX = 256    # pairs per grid step (sublane dim): bigger batches per column
                 # step amortize Mosaic per-instruction overhead (measured 229 ms
                 # -> 60 ms per 256x8192 chunk going SUB 8 -> 256)
PAD_BASE = 127   # query padding value (never matches a target base 0..3)


def _pick_sub(PB: int) -> int:
    s = 8
    while s * 2 <= min(PB, SUB_MAX) and PB % (s * 2) == 0:
        s *= 2
    return s


def _pick_cblk(SUB: int, W: int) -> int:
    """Columns per grid block, sized so the in+out blocks (SUB*CBLK*W bytes
    each, double-buffered) fit the 16 MB VMEM scoped limit."""
    cblk = 128
    while SUB * cblk * W * 4 > (12 << 20) and cblk > 8:
        cblk //= 2
    return cblk


def _forward_kernel(sub_ref, la_ref, lb_ref, dirs_ref, cost_ref,
                    state_ref, *, W: int, SUB: int, CBLK: int):
    """Grid: (PB//SUB, max_cols//CBLK). sub_ref [SUB, CBLK*W] holds the
    precomputed diagonal-coordinate mismatch costs; state carries D."""
    jb = pl.program_id(1)
    n_jb = pl.num_programs(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 1)
    la = la_ref[:, :1]
    lb = lb_ref[:, :1]
    lbs = jnp.maximum(lb, 1)

    ctr = W // 2 - (la - lb) // 2   # constant per pair ([SUB,1]); extension
                                    # clamps |la-lb| <= W/4 so both endpoints
                                    # sit near the middle lane

    @pl.when(jb == 0)
    def _init():
        i0 = lane - ctr             # column 0
        state_ref[:, :] = jnp.where((i0 >= 0) & (i0 <= la), i0, INF).astype(jnp.int32)

    j0 = jb * CBLK

    def col_step(jl, D):
        j = j0 + jl + 1
        i_of_lane = (j - ctr) + lane

        d_p1 = jnp.concatenate([D[:, 1:], jnp.full((SUB, 1), INF, jnp.int32)], axis=1)

        enc = sub_ref[:, pl.ds(pl.multiple_of(jl * W, 128), W)].astype(jnp.int32)
        sub = enc & 1                       # mismatch bit; bits 1-2 = query base

        diag = D + sub
        left = d_p1 + 1
        A = jnp.minimum(diag, left)
        A = jnp.where(i_of_lane == 0, j, A)       # row 0: all-deletion path
        A = jnp.where((i_of_lane < 0) | (i_of_lane > la), INF, A)
        # up chain (lane l-1 -> l): forward cummin via log-step shifted mins
        x = A - lane
        s = 1
        while s < W:
            shifted = jnp.concatenate(
                [jnp.full((SUB, s), INF, jnp.int32), x[:, :W - s]], axis=1)
            x = jnp.minimum(x, shifted)
            s *= 2
        Dn = jnp.minimum(x + lane, INF)
        Dn = jnp.where((i_of_lane < 0) | (i_of_lane > la), INF, Dn)

        upv = jnp.concatenate([jnp.full((SUB, 1), INF, jnp.int32), Dn[:, :-1]],
                              axis=1) + 1
        d_out = jnp.where(Dn == diag, OP_DIAG,
                          jnp.where(Dn == upv, OP_INS,
                                    jnp.where(Dn == left, OP_DEL, OP_PAD)))
        # enriched dirs byte: op:2 | mismatch:1 | query base:2 — the backtrack
        # kernel re-emits match flags and inserted bases so no consumer ever
        # needs a query gather again
        d_out = (d_out | (enc << 2)).astype(jnp.uint8)
        active = j <= lb
        dirs_ref[:, pl.ds(pl.multiple_of(jl * W, 128), W)] = \
            jnp.where(active, d_out, jnp.uint8(OP_PAD))
        return jnp.where(active, Dn, D)

    # skip column blocks beyond every pair's lb (D carries through unchanged)
    run = (j0 + 1) <= jnp.max(lb)

    @pl.when(run)
    def _active():
        D = jax.lax.fori_loop(0, CBLK, col_step, state_ref[:, :])
        state_ref[:, :] = D

    @pl.when(jnp.logical_not(run))
    def _dead():
        dirs_ref[:, :] = jnp.full((SUB, CBLK * W), OP_PAD, jnp.uint8)

    @pl.when(jb == n_jb - 1)
    def _final():
        D = state_ref[:, :]
        l_end = jnp.clip((la - lb + ctr)[:, 0], 0, W - 1)
        costs = jnp.min(jnp.where(lane == l_end[:, None], D, INF), axis=1)
        cost_ref[:, :] = jnp.broadcast_to(costs[:, None], (SUB, 128))


def _diag_kernel(*refs, W: int, SUB: int, CBLK: int, NIN: int):
    """ENC builder in Mosaic: per output column jl (STATIC unrolled python
    loop, so every VMEM slice is static), enc = mismatch | qbase<<1 from a
    sliding [SUB, W] window of the shifted query. Replaces the XLA Hankel
    stack (W strided slices + stack ran ~6 GB/s; this writes the 1-byte/cell
    tensor at near memory bandwidth)."""
    a_refs = refs[:NIN]
    t_ref, out_ref = refs[NIN], refs[NIN + 1]
    ab = jnp.concatenate([r[:, :] for r in a_refs], axis=1)  # [SUB, NIN*CBLK]
    t = t_ref[:, :]
    for jl in range(CBLK):
        dq = ab[:, jl:jl + W].astype(jnp.int32)       # u8 compare unsupported
        tc = t[:, jl:jl + 1].astype(jnp.int32)        # static: jl is python
        enc = jnp.where(dq != tc, 1, 0) | ((dq & 3) << 1)
        out_ref[:, jl * W:(jl + 1) * W] = enc.astype(jnp.uint8)


def _pick_sub_diag(PB: int, W: int, CBLK: int) -> int:
    s = 8
    while (s * 2 <= min(PB, SUB_MAX) and PB % (s * 2) == 0
           and (s * 2) * CBLK * W <= (4 << 20)):
        s *= 2
    return s


@functools.partial(jax.jit, static_argnames=("W", "MC", "CBLK", "interpret"))
def _diag_sub_matrix_pallas(a, b, la, lb, W: int, MC: int, CBLK: int,
                            interpret: bool = False):
    """Pallas path of _diag_sub_matrix: same ENC layout [PB, MC, W]."""
    from necat_tpu.consensus.tags import _row_shift
    PB, L = a.shape
    la_ = la.astype(jnp.int32)[:, None]
    lb_ = lb.astype(jnp.int32)[:, None]
    ctr = (W // 2 - (la_ - lb_) // 2)[:, 0]
    NIN = 1 + -(-W // CBLK)
    S = MC * 1 + NIN * CBLK            # padded so blocks jb..jb+NIN-1 exist
    n_jb = MC // CBLK
    # a_shift[p, x] = a[p, x - ctr_p], PAD_BASE outside — block-shift of a+1
    # (0 marks out-of-range, mapped to PAD_BASE)
    a1 = jnp.concatenate([a.astype(jnp.int32) + 1,
                          jnp.zeros((PB, S - L), jnp.int32)], axis=1) \
        if S > L else (a.astype(jnp.int32) + 1)[:, :S]
    sh = _row_shift(a1, ctr)
    a_shift = jnp.where(sh == 0, PAD_BASE, sh - 1).astype(jnp.uint8)
    mc = min(MC, b.shape[1])
    tcol = jnp.full((PB, MC), 255, jnp.uint8)
    tcol = tcol.at[:, :mc].set(b[:, :mc].astype(jnp.uint8))

    SUB = _pick_sub_diag(PB, W, CBLK)
    kern = functools.partial(_diag_kernel, W=W, SUB=SUB, CBLK=CBLK, NIN=NIN)
    in_specs = [pl.BlockSpec((SUB, CBLK),
                             (lambda pb, jb, _d=d: (pb, jb + _d)))
                for d in range(NIN)]
    in_specs.append(pl.BlockSpec((SUB, CBLK), lambda pb, jb: (pb, jb)))
    enc = pl.pallas_call(
        kern,
        grid=(PB // SUB, n_jb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((SUB, CBLK * W), lambda pb, jb: (pb, jb)),
        out_shape=jax.ShapeDtypeStruct((PB, MC * W), jnp.uint8),
        interpret=interpret,
    )(*([a_shift] * NIN), tcol)
    return enc.reshape(PB, MC, W)


@functools.partial(jax.jit, static_argnames=("W", "MC"))
def _diag_sub_matrix(a, b, la, lb, W: int, MC: int):
    """ENC[p, jc, l] = mismatch | (qbase << 1) where mismatch =
    (a[p, j+l-ctr_p-1] != b[p, j-1]) and qbase = a[p, j+l-ctr_p-1] & 3,
    for j = jc+1, with the CONSTANT per-pair band center
    ctr_p = W/2 - (la-lb)//2.

    Built without large gathers: one tiny per-pair-constant shift of `a`
    (gather of PB*(MC+W) elements), then W static shifted slices (a Hankel
    stack) — XLA handles both at memory bandwidth."""
    PB, L = a.shape
    la_ = la.astype(jnp.int32)[:, None]
    lb_ = lb.astype(jnp.int32)[:, None]
    ctr = W // 2 - (la_ - lb_) // 2                              # [PB,1]
    # a_shift[p, x] = a[p, x - ctr_p] with out-of-range -> PAD_BASE, so that
    # dq[p, jc, l] = a_shift[p, jc + l] (j = jc+1 -> query index j+l-ctr-1)
    # kept uint8 end-to-end so the [PB, MC, W] intermediate stays 1 byte/cell
    S = MC + W
    x = jnp.arange(S, dtype=jnp.int32)[None, :]
    src = x - ctr
    ok = (src >= 0) & (src < L)
    a_shift = jnp.where(ok, jnp.take_along_axis(
        a.astype(jnp.uint8), jnp.clip(src, 0, L - 1), axis=1), jnp.uint8(PAD_BASE))
    dq = jnp.stack([a_shift[:, l:l + MC] for l in range(W)], axis=2)  # [PB, MC, W]
    mc = min(MC, b.shape[1])
    tcol = jnp.full((PB, MC), 255, jnp.uint8)
    tcol = tcol.at[:, :mc].set(b[:, :mc].astype(jnp.uint8))
    mism = (dq != tcol[:, :, None]).astype(jnp.uint8)
    return mism | ((dq & 3) << 1)


def banded_forward_pallas(a, b, la, lb, W: int, max_cols: int,
                          interpret: bool = False):
    """Drop-in replacement for banded.banded_forward: returns
    (dirs, offs, None, cost) with identical conventions."""
    PB, L = a.shape
    Lb = b.shape[1]
    SUB = _pick_sub(PB)
    CBLK = _pick_cblk(SUB, W)
    n_jb = pl.cdiv(max_cols, CBLK)
    MC = n_jb * CBLK

    la = jnp.asarray(la, jnp.int32)
    lb = jnp.asarray(lb, jnp.int32)
    if interpret:  # CPU/test path: the XLA Hankel-stack oracle
        subm = _diag_sub_matrix(jnp.asarray(a), jnp.asarray(b), la, lb, W, MC)
    else:
        # Mosaic blocks need a 128-multiple lane dim; MC is a 2048-multiple
        # tier so a fixed 128-column diagonalizer block always tiles it
        subm = _diag_sub_matrix_pallas(jnp.asarray(a), jnp.asarray(b), la, lb,
                                       W, MC, CBLK=128)
    subm = subm.reshape(PB, MC * W)
    la_v = jnp.broadcast_to(la[:, None], (PB, 128))
    lb_v = jnp.broadcast_to(lb[:, None], (PB, 128))

    kern = functools.partial(_forward_kernel, W=W, SUB=SUB, CBLK=CBLK)
    dirs, cost = pl.pallas_call(
        kern,
        grid=(PB // SUB, n_jb),
        in_specs=[
            pl.BlockSpec((SUB, CBLK * W), lambda pb, jb: (pb, jb)),
            pl.BlockSpec((SUB, 128), lambda pb, jb: (pb, 0)),
            pl.BlockSpec((SUB, 128), lambda pb, jb: (pb, 0)),
        ],
        out_specs=(
            pl.BlockSpec((SUB, CBLK * W), lambda pb, jb: (pb, jb)),
            pl.BlockSpec((SUB, 128), lambda pb, jb: (pb, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((PB, MC * W), jnp.uint8),
            jax.ShapeDtypeStruct((PB, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, W), jnp.int32),
        ],
        interpret=interpret,
    )(subm, la_v, lb_v)
    dirs = dirs.reshape(PB, MC, W)

    # offs is a closed formula of the static band schedule: offs[p, j] = j - ctr_p
    j = jnp.arange(0, MC + 1, dtype=jnp.int32)[None, :]
    ctr = W // 2 - (la[:, None] - lb[:, None]) // 2
    offs_full = (j - ctr).astype(jnp.int32)
    return dirs[:, :max_cols], offs_full[:, :max_cols + 1], None, cost[:, 0]


# --------------------------------------------------------------- backtrack

CBLK_BT = 128    # columns per backtrack grid block (lane dim of the cols output)


def _pick_cblk_bt(SUB: int, W: int) -> int:
    """Columns per backtrack grid block: the dirs in-block (SUB*cblk*W bytes,
    double-buffered) must fit scoped VMEM even at rescue-ladder widths
    (W=8192 with the fixed 128-column block overflowed the 16 MB limit)."""
    cblk = CBLK_BT
    while SUB * cblk * W * 2 > (10 << 20) and cblk > 8:
        cblk //= 2
    return cblk


def _pick_sub_bt(PB: int, W: int) -> int:
    """Pair batch per backtrack grid step: dirs blocks (SUB*CBLK_BT*W bytes,
    double-buffered) must fit VMEM."""
    s = 8
    while (s * 2 <= min(PB, SUB_MAX) and PB % (s * 2) == 0
           and (s * 2) * CBLK_BT * W * 2 <= (10 << 20)):
        s *= 2
    return s


N_INSB = 7       # inserted bases emitted per column end (= max_delta - 1)


def _backtrack_kernel(dirs_ref, la_ref, lb_ref, *out_refs, W: int, SUB: int,
                      WORDS: int, CBLK: int = CBLK_BT):
    """Walk the optimal path backward from (la, lb), one TARGET COLUMN per
    step (insertion runs within a column are collapsed via a lane scan).
    Grid: (PB//SUB, n_jb) with blocks visited high column -> low (reversed
    index maps). Replaces the sequential op-at-a-time traceback
    (banded.banded_traceback), whose per-step gather made it ~40x slower
    than the forward DP.

    Emits per column j:
      cols:  op:2 | match:1 | consumed-query-base:2 | k (insertion count):25+
      insb:  first N_INSB inserted bases (bits 2(d-1), extension order) |
             last  N_INSB inserted bases (bits 14+2(d-1), counted backward) —
             the forward tag pass reads the first run, the reversed pass the
             last (insertion deltas flip under reversal).
      WORDS > 1 emits additional insb words covering runs up to 7*WORDS
      inserted bases (word w holds run ranks 7(w-1)+1..7w) — the polish
      stage's u16-delta capacity (ctg_cns fc_correct_one_read.h:17-19).
    """
    cols_ref = out_refs[0]
    insb_refs = out_refs[1:1 + WORDS]
    fslot_ref = out_refs[1 + WORDS]
    cur_ref = out_refs[2 + WORDS]
    jb = pl.program_id(1)
    n_jb = pl.num_programs(1)
    ob = n_jb - 1 - jb                       # original column block index
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 1)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (SUB, CBLK), 1)
    la = la_ref[:, :1]
    lb = lb_ref[:, :1]
    ctr = W // 2 - (la - lb) // 2

    @pl.when(jb == 0)
    def _init():
        end_slot = jnp.clip(la - lb + ctr, 0, W - 1)       # slot of (la, lb)
        cur_ref[:, :] = jnp.broadcast_to(end_slot, (SUB, W))

    j0 = ob * CBLK

    def col_step(t, carry):
        cur, acc, acc_i = carry
        jl = CBLK - 1 - t                                   # reverse within block
        j = j0 + jl + 1
        active = j <= lb                                    # [SUB, 1]
        vcol = dirs_ref[:, pl.ds(pl.multiple_of(jl * W, 128), W)].astype(jnp.int32)
        opcol = vcol & 3
        qb_lane = (vcol >> 3) & 3
        is_ins = opcol == OP_INS
        # r[l] = length of the consecutive-INS run ending at lane l
        x = jnp.where(is_ins, -1, lane)
        s = 1
        while s < W:
            shifted = jnp.concatenate(
                [jnp.full((SUB, s), -1, jnp.int32), x[:, :W - s]], axis=1)
            x = jnp.maximum(x, shifted)
            s *= 2
        r = lane - x
        curc = cur[:, :1]
        k = jnp.sum(jnp.where(lane == curc, r, 0), axis=1, keepdims=True)
        sel = curc - k                                      # slot of the consumer op
        vsel = jnp.sum(jnp.where(lane == sel, vcol, 0), axis=1, keepdims=True)
        o = vsel & 3
        row_sel = (j - ctr) + sel
        o = jnp.where(row_sel <= 0, OP_DEL, o)              # row 0: all-del border
        match = jnp.where(o == OP_DIAG, 1 - ((vsel >> 2) & 1), 0)
        qbase = jnp.where(o == OP_DIAG, (vsel >> 3) & 3, 0)
        # inserted bases of the run (lanes sel+1..curc): word w records run
        # ranks 7w+1..7w+7 — first at bits 2(d-1-7w), last at bits
        # 14+2(d_b-7w) counted backward — ONE positionally-weighted masked
        # sum per word replaces 2*N_INSB lane reductions
        kc = jnp.minimum(k, N_INSB * WORDS)
        d_f = lane - sel                                    # 1-based run rank
        d_b = curc - lane                                   # 0-based from the end
        val = jnp.where(active, (k << 5) | (qbase << 3) | (match << 2) | o, OP_PAD)
        acc = jnp.where(lane_c == jl, val, acc)
        acc_i_new = []
        for w in range(WORDS):
            d0 = N_INSB * w
            in_f = (d_f >= d0 + 1) & (d_f <= jnp.minimum(kc, d0 + N_INSB))
            in_b = (d_b >= d0) & (d_b < jnp.minimum(kc, d0 + N_INSB))
            terms = jnp.where(in_f, qb_lane << jnp.clip(2 * (d_f - 1 - d0), 0, 30), 0) \
                + jnp.where(in_b, qb_lane << jnp.clip(14 + 2 * (d_b - d0), 0, 30), 0)
            insv = jnp.sum(terms, axis=1, keepdims=True)
            acc_i_new.append(jnp.where(
                lane_c == jl, jnp.where(active, insv, 0), acc_i[w]))
        acc_i = acc_i_new
        # diag consumes a query row; slot is preserved under the static
        # schedule (offs[j] - offs[j-1] = 1): diag -> sel, del -> sel + 1
        cur_new = jnp.clip(jnp.where(o == OP_DIAG, sel, sel + 1), 0, W - 1)
        cur = jnp.where(active, jnp.broadcast_to(cur_new, (SUB, W)), cur)
        return cur, acc, tuple(acc_i)

    # skip blocks whose columns are beyond every pair's lb (pure padding):
    # the walk state is untouched there, so the whole column loop is dead
    run = (j0 + 1) <= jnp.max(lb)

    @pl.when(run)
    def _active():
        acc0 = jnp.full((SUB, CBLK), OP_PAD, jnp.int32)
        acc_i0 = tuple(jnp.zeros((SUB, CBLK), jnp.int32) for _ in range(WORDS))
        cur, acc, acc_i = jax.lax.fori_loop(0, CBLK, col_step,
                                            (cur_ref[:, :], acc0, acc_i0))
        cur_ref[:, :] = cur
        cols_ref[:, :] = acc
        for w in range(WORDS):
            insb_refs[w][:, :] = acc_i[w]

    @pl.when(jnp.logical_not(run))
    def _dead():
        cols_ref[:, :] = jnp.full((SUB, CBLK), OP_PAD, jnp.int32)
        for w in range(WORDS):
            insb_refs[w][:, :] = jnp.zeros((SUB, CBLK), jnp.int32)

    @pl.when(jb == n_jb - 1)
    def _final():
        fslot_ref[:, :] = jnp.broadcast_to(cur_ref[:, :1], (SUB, 128))


def banded_backtrack_cols(dirs, la, lb, W: int, max_cols: int,
                          interpret: bool = False, words: int = 1):
    """dirs [PB, MC, W] (static-schedule forward, enriched bytes) -> the
    per-column encoding (cols, insb tuple, lead) defined by banded.ops_to_cols.
    Requires the static band schedule of banded_forward_pallas. `words` insb
    words extend the recoverable insertion-run length to 7*words."""
    PB, MC, Wd = dirs.shape
    SUB = _pick_sub_bt(PB, W)
    cblk = _pick_cblk_bt(SUB, W)
    assert Wd == W and MC % cblk == 0 and MC >= max_cols
    n_jb = MC // cblk
    la = jnp.asarray(la, jnp.int32)
    lb = jnp.asarray(lb, jnp.int32)
    la_v = jnp.broadcast_to(la[:, None], (PB, 128))
    lb_v = jnp.broadcast_to(lb[:, None], (PB, 128))
    rev = lambda pb, jb: (pb, n_jb - 1 - jb)
    kern = functools.partial(_backtrack_kernel, W=W, SUB=SUB, WORDS=words,
                             CBLK=cblk)
    out = pl.pallas_call(
        kern,
        grid=(PB // SUB, n_jb),
        in_specs=[
            pl.BlockSpec((SUB, cblk * W), rev),
            pl.BlockSpec((SUB, 128), lambda pb, jb: (pb, 0)),
            pl.BlockSpec((SUB, 128), lambda pb, jb: (pb, 0)),
        ],
        out_specs=(
            (pl.BlockSpec((SUB, cblk), rev),)
            + (pl.BlockSpec((SUB, cblk), rev),) * words
            + (pl.BlockSpec((SUB, 128), lambda pb, jb: (pb, 0)),)
        ),
        out_shape=(
            (jax.ShapeDtypeStruct((PB, MC), jnp.int32),)
            + (jax.ShapeDtypeStruct((PB, MC), jnp.int32),) * words
            + (jax.ShapeDtypeStruct((PB, 128), jnp.int32),)
        ),
        scratch_shapes=[
            pltpu.VMEM((SUB, W), jnp.int32),
        ],
        interpret=interpret,
    )(dirs.reshape(PB, MC * W), la_v, lb_v)
    cols, insbs, fslot = out[0], out[1:1 + words], out[1 + words]
    ctr = W // 2 - (la - lb) // 2
    lead = jnp.clip(fslot[:, 0] - ctr, 0, la)
    return (cols[:, :max_cols], tuple(i[:, :max_cols] for i in insbs),
            lead.astype(jnp.int32))
