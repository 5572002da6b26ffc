#!/usr/bin/env python
"""Diagnostic: quantify device-majority vs exact link-DP consensus divergence.

Feeds IDENTICAL alignments (real banded-extension ops) to both consensus
engines at the bench error profile and coverage regime, and reports each one's
identity to the true template plus their mutual agreement. This localizes how
much of the corrected-read identity gap (PARITY: 99.41 vs reference 99.8) is
the thresholded-majority approximation (VERDICT r4 missing #3).

Usage: python scripts/diag_consensus.py [n_trials] [coverage]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from necat_tpu.align.banded import (banded_forward, banded_traceback,  # noqa: E402
                                    clip_tail, ops_to_cols, cols_clip_stats)
from necat_tpu.consensus import tags as tags_mod  # noqa: E402
from necat_tpu.consensus.backbone import call_consensus  # noqa: E402
from necat_tpu.consensus.linkdp import consensus_linkdp, tags_from_ops  # noqa: E402
from necat_tpu.io import simulate  # noqa: E402


def edits_to(a, b):
    """(n_errors, n_cols) of a vs b via host DP."""
    from necat_tpu.consensus.linkdp import host_edit_ops
    from necat_tpu.align.banded import OP_DIAG
    ops, qs, qe = host_edit_ops(a, b)
    # count matches
    i, j, match = qs, 0, 0
    for op in ops:
        if op == OP_DIAG:
            if a[i] == b[j]:
                match += 1
            i += 1
            j += 1
        elif op == 1:  # DEL consumes template
            j += 1
        else:
            i += 1
    ncols = len(ops)
    return ncols - match, ncols


def one_trial(rng, G, cov, W, D, err):
    template = simulate.random_genome(G, seed=int(rng.integers(1 << 30)))
    em = simulate.ErrorModel(sub=err, ins=err, dele=err)
    L = 1 << max(G - 1, 1).bit_length() if G > 1024 else 2048
    L = max(L, int(G * 1.4) + 64)
    L = 1 << (L - 1).bit_length()
    n_reads = cov
    a = np.zeros((n_reads, L), np.uint8)
    la = np.zeros(n_reads, np.int32)
    for i in range(n_reads):
        q = simulate.mutate(template, em, rng)
        a[i, :len(q)] = q[:L]
        la[i] = min(len(q), L)
    b = np.zeros((n_reads, L), np.uint8)
    b[:, :G] = template
    lb = np.full(n_reads, G, np.int32)

    aj, bj = jnp.asarray(a), jnp.asarray(b)
    laj, lbj = jnp.asarray(la), jnp.asarray(lb)
    dirs, offs, _, _ = banded_forward(aj, bj, laj, lbj, W, max_cols=2 * L)
    ops, n_ops = banded_traceback(dirs, offs, laj, lbj, max_ops=2 * L)
    n_clip, _ = clip_tail(ops, n_ops, aj, bj)
    ops_np, n_np = np.asarray(ops), np.asarray(n_clip)

    # identity weights like production (calc_cns_weight)
    idents = []
    for i in range(n_reads):
        nc = int(n_np[i])
        m = 0
        ti = 0
        qi = 0
        for k in range(nc):
            op = int(ops_np[i, k])
            if op == 0:
                if a[i, qi] == template[min(ti, G - 1)]:
                    m += 1
                qi += 1
                ti += 1
            elif op == 1:
                ti += 1
            else:
                qi += 1
        idents.append(100.0 * m / max(nc, 1))
    w_pair = np.asarray(tags_mod.calc_cns_weight(jnp.asarray(
        np.array(idents, np.float32))))

    all_tags = []
    for i in range(n_reads):
        t = tags_from_ops(ops_np[i], int(n_np[i]), a[i], qoff=0, toff=0,
                          weight=float(w_pair[i]))
        if t is not None:
            all_tags.extend(t)
    seq_dp, f, to = consensus_linkdp(all_tags, G)

    Lt = 1 << (G + 63 - 1).bit_length()
    cols, insb, lead = ops_to_cols(ops, n_clip, aj, bj, MC=2 * L)
    st = cols_clip_stats(cols, lead, aj, bj)
    w0 = jnp.zeros((2, D, 5, Lt), jnp.float32)
    c0 = jnp.zeros((2, Lt), jnp.int32)
    w, c = tags_mod.scatter_pass_cols(
        w0, c0, cols, lead, st["jc"],
        aj, jnp.zeros(n_reads, jnp.int32), jnp.zeros(n_reads, jnp.int32),
        jnp.zeros(n_reads, jnp.int32), jnp.asarray(w_pair, jnp.float32),
        jnp.full(n_reads, G, jnp.int32), reversed_part=False)
    emit, base = call_consensus(w[:1], c[:1], 4, 0.2, 1.0)
    emit, base = np.asarray(emit), np.asarray(base)
    seq_mv = base[0][emit[0]]

    e_dp = edits_to(seq_dp, template)
    e_mv = edits_to(seq_mv, template)
    return e_dp, e_mv


def main():
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cov = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    err = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    rng = np.random.default_rng(11)
    G, W, D = 1500, 128, 8
    tot_dp = np.zeros(2, np.int64)
    tot_mv = np.zeros(2, np.int64)
    for _ in range(n_trials):
        e_dp, e_mv = one_trial(rng, G, cov, W, D, err)
        tot_dp += e_dp
        tot_mv += e_mv
    print(f"trials={n_trials} cov={cov} err={err} G={G}")
    print(f"link-DP : errors {tot_dp[0]:6d} / {tot_dp[1]} cols  "
          f"identity {100 * (1 - tot_dp[0] / tot_dp[1]):.3f}%")
    print(f"majority: errors {tot_mv[0]:6d} / {tot_mv[1]} cols  "
          f"identity {100 * (1 - tot_mv[0] / tot_mv[1]):.3f}%")


if __name__ == "__main__":
    main()
