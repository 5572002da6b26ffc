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

        sub = sub_ref[:, pl.ds(pl.multiple_of(jl * W, 128), W)].astype(jnp.int32)

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
                                    jnp.where(Dn == left, OP_DEL, OP_PAD))).astype(jnp.uint8)
        active = j <= lb
        dirs_ref[:, pl.ds(pl.multiple_of(jl * W, 128), W)] = \
            jnp.where(active, d_out, jnp.uint8(OP_PAD))
        return jnp.where(active, Dn, D)

    D = jax.lax.fori_loop(0, CBLK, col_step, state_ref[:, :])
    state_ref[:, :] = D

    @pl.when(jb == n_jb - 1)
    def _final():
        l_end = jnp.clip((la - lb + ctr)[:, 0], 0, W - 1)
        costs = jnp.min(jnp.where(lane == l_end[:, None], D, INF), axis=1)
        cost_ref[:, :] = jnp.broadcast_to(costs[:, None], (SUB, 128))


@functools.partial(jax.jit, static_argnames=("W", "MC"))
def _diag_sub_matrix(a, b, la, lb, W: int, MC: int):
    """SUB[p, jc, l] = (a[p, j+l-ctr_p-1] != b[p, j-1]) for j = jc+1, with the
    CONSTANT per-pair band center ctr_p = W/2 - (la-lb)//2.

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
    return (dq != tcol[:, :, None]).astype(jnp.uint8)


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
    subm = _diag_sub_matrix(jnp.asarray(a), jnp.asarray(b), la, lb, W, MC)
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
