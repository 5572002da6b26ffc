import numpy as np
import jax.numpy as jnp
import pytest

from necat_tpu.align.banded import (OP_DEL, OP_DIAG, OP_INS, OP_PAD,
                                    banded_forward, banded_traceback, clip_tail,
                                    extend_batch)
from necat_tpu.io import simulate


def full_edit_dp(a, b):
    """Oracle: unbanded edit distance."""
    n, m = len(a), len(b)
    dp = np.zeros((n + 1, m + 1), np.int64)
    dp[:, 0] = np.arange(n + 1)
    dp[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i, j] = min(dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                           dp[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return int(dp[n, m])


def ops_are_valid_alignment(ops, n_ops, a, la, b, lb):
    """Check ops consume exactly la query and lb target symbols."""
    ops = ops[:n_ops]
    q = int(np.sum(ops != OP_DEL))
    t = int(np.sum(ops != OP_INS))
    return q == la and t == lb


def ops_cost(ops, n_ops, a, b):
    q = t = cost = 0
    for op in ops[:n_ops]:
        if op == OP_DIAG:
            cost += int(a[q] != b[t]); q += 1; t += 1
        elif op == OP_DEL:
            cost += 1; t += 1
        elif op == OP_INS:
            cost += 1; q += 1
    return cost


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_banded_matches_full_dp(seed):
    rng = np.random.default_rng(seed)
    em = simulate.ErrorModel(sub=0.05, ins=0.05, dele=0.05)
    B = 4
    LA = LB = 512
    a_np = np.zeros((B, LA), np.uint8)
    b_np = np.zeros((B, LB), np.uint8)
    la = np.zeros(B, np.int32)
    lb = np.zeros(B, np.int32)
    seqs = []
    for i in range(B):
        t = rng.integers(0, 4, size=int(rng.integers(200, 400))).astype(np.uint8)
        q = simulate.mutate(t, em, rng)
        a_np[i, :len(q)] = q; la[i] = len(q)
        b_np[i, :len(t)] = t; lb[i] = len(t)
        seqs.append((q, t))
    dirs, offs, S_fin, cost = banded_forward(jnp.asarray(a_np), jnp.asarray(b_np),
                                             jnp.asarray(la), jnp.asarray(lb), W=64, max_cols=LB)
    cost = np.asarray(cost)
    ops, n_ops = banded_traceback(dirs, offs, jnp.asarray(la), jnp.asarray(lb), max_ops=LA + LB)
    ops, n_ops = np.asarray(ops), np.asarray(n_ops)
    for i in range(B):
        q, t = seqs[i]
        oracle = full_edit_dp(q, t)
        assert cost[i] == oracle, f"pair {i}: banded {cost[i]} vs full {oracle}"
        assert ops_are_valid_alignment(ops[i], n_ops[i], q, la[i], t, lb[i])
        assert ops_cost(ops[i], n_ops[i], q, t) == oracle


def test_banded_identical_sequences():
    a = np.tile(np.array([0, 1, 2, 3], np.uint8), 32)[None, :]
    la = np.array([128], np.int32)
    dirs, offs, _, cost = banded_forward(jnp.asarray(a), jnp.asarray(a),
                                         jnp.asarray(la), jnp.asarray(la), W=32, max_cols=128)
    assert int(cost[0]) == 0
    ops, n_ops = banded_traceback(dirs, offs, jnp.asarray(la), jnp.asarray(la), max_ops=256)
    assert int(n_ops[0]) == 128
    assert np.all(np.asarray(ops)[0, :128] == OP_DIAG)


def test_adaptive_band_tracks_indel_drift():
    """A systematic deletion bias (net drift ~ 10% of length) must stay in band."""
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 3000).astype(np.uint8)
    em = simulate.ErrorModel(sub=0.02, ins=0.01, dele=0.10)  # strong drift
    q = simulate.mutate(t, em, rng)
    LA = LB = 3072
    a = np.zeros((1, LA), np.uint8); a[0, :len(q)] = q
    b = np.zeros((1, LB), np.uint8); b[0, :len(t)] = t
    la = np.array([len(q)], np.int32); lb = np.array([len(t)], np.int32)
    dirs, offs, _, cost = banded_forward(jnp.asarray(a), jnp.asarray(b),
                                         jnp.asarray(la), jnp.asarray(lb), W=64, max_cols=LB)
    oracle = full_edit_dp(q, t)
    # W=64 covers local fluctuation; adaptive offset must absorb the ~300-base drift
    assert int(cost[0]) <= oracle * 1.05 + 5


def test_extend_batch_with_junk_tails():
    rng = np.random.default_rng(4)
    em = simulate.ErrorModel()
    t = simulate.random_genome(3000, seed=9)
    q_core = simulate.mutate(t, em, rng)
    junk = rng.integers(0, 4, 500).astype(np.uint8)
    q = np.concatenate([junk, q_core])
    LQ, LT = 4096, 3072
    qb = np.zeros((1, LQ), np.uint8); qb[0, :len(q)] = q
    tb = np.zeros((1, LT), np.uint8); tb[0, :len(t)] = t
    res = extend_batch(qb, np.array([len(q)], np.int32), tb, np.array([len(t)], np.int32),
                       np.array([500 + 1500], np.int32), np.array([1500], np.int32), W=64)
    qoff, qend = int(res.qoff[0]), int(res.qend[0])
    toff, tend = int(res.toff[0]), int(res.tend[0])
    assert abs(qoff - 500) < 80          # clipped at the junk junction
    assert toff < 80                      # reaches target start
    assert tend > len(t) - 80
    assert float(res.ident[0]) > 80.0


def test_pallas_kernel_matches_oracle_interpret():
    """The Pallas forward kernel (interpret mode) must match the unbanded oracle
    and produce traceback-consistent dirs."""
    import jax
    from necat_tpu.align.pallas_banded import banded_forward_pallas
    from necat_tpu.align.banded import banded_traceback

    rng = np.random.default_rng(7)
    em = simulate.ErrorModel(sub=0.05, ins=0.05, dele=0.05)
    PB, L, W = 8, 512, 64
    a = np.zeros((PB, L), np.uint8)
    b = np.zeros((PB, L), np.uint8)
    la = np.zeros(PB, np.int32)
    lb = np.zeros(PB, np.int32)
    for i in range(PB):
        t = rng.integers(0, 4, int(rng.integers(250, 480))).astype(np.uint8)
        q = simulate.mutate(t, em, rng)[:L]
        a[i, :len(q)] = q; la[i] = len(q)
        b[i, :len(t)] = t; lb[i] = len(t)
    dirs, offs, _, cost = banded_forward_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la), jnp.asarray(lb),
        W, L, interpret=True)
    ops, n_ops = banded_traceback(dirs, offs, jnp.asarray(la), jnp.asarray(lb), 2 * L)
    ops, n_ops = np.asarray(ops), np.asarray(n_ops)
    for i in range(PB):
        oracle = full_edit_dp(a[i, :la[i]], b[i, :lb[i]])
        assert int(cost[i]) == oracle, f"pair {i}"
        assert ops_are_valid_alignment(ops[i], n_ops[i], a[i], la[i], b[i], lb[i])
        assert ops_cost(ops[i], n_ops[i], a[i], b[i]) == oracle


def test_backtrack_cols_matches_ops_to_cols():
    """The Pallas backtrack kernel (interpret) must emit exactly the
    per-column encoding produced by banded_traceback + ops_to_cols."""
    from necat_tpu.align.banded import ops_to_cols
    from necat_tpu.align.pallas_banded import (banded_backtrack_cols,
                                               banded_forward_pallas)

    rng = np.random.default_rng(11)
    em = simulate.ErrorModel(sub=0.05, ins=0.06, dele=0.05)
    PB, L, W = 8, 512, 64
    a = np.zeros((PB, L), np.uint8)
    b = np.zeros((PB, L), np.uint8)
    la = np.zeros(PB, np.int32)
    lb = np.zeros(PB, np.int32)
    for i in range(PB):
        t = rng.integers(0, 4, int(rng.integers(250, 480))).astype(np.uint8)
        q = simulate.mutate(t, em, rng)[:L]
        a[i, :len(q)] = q; la[i] = len(q)
        b[i, :len(t)] = t; lb[i] = len(t)
    # pair 0: leading query overhang (la > lb + path) to exercise `lead`
    dirs, offs, _, _ = banded_forward_pallas(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(la), jnp.asarray(lb),
        W, L, interpret=True)
    ops, n_ops = banded_traceback(dirs, offs, jnp.asarray(la), jnp.asarray(lb), 2 * L)
    cols0, insb0, lead0 = ops_to_cols(ops, n_ops, jnp.asarray(a), jnp.asarray(b), MC=L)
    cols1, insb1, lead1 = banded_backtrack_cols(
        dirs, jnp.asarray(la), jnp.asarray(lb), W, max_cols=L, interpret=True)
    np.testing.assert_array_equal(np.asarray(lead0), np.asarray(lead1))
    np.testing.assert_array_equal(np.asarray(cols0), np.asarray(cols1))
    np.testing.assert_array_equal(np.asarray(insb0), np.asarray(insb1))


def test_diag_sub_matrix_pallas_matches_xla():
    """The Mosaic ENC builder must reproduce the XLA Hankel-stack oracle."""
    from necat_tpu.align.pallas_banded import (_diag_sub_matrix,
                                               _diag_sub_matrix_pallas)
    rng = np.random.default_rng(6)
    PB, L, W, CBLK = 16, 512, 64, 128
    MC = 512
    a = rng.integers(0, 4, (PB, L)).astype(np.uint8)
    b = rng.integers(0, 4, (PB, L)).astype(np.uint8)
    la = rng.integers(100, L, PB).astype(np.int32)
    lb = rng.integers(100, L, PB).astype(np.int32)
    ref = _diag_sub_matrix(jnp.asarray(a), jnp.asarray(b),
                           jnp.asarray(la), jnp.asarray(lb), W, MC)
    out = _diag_sub_matrix_pallas(jnp.asarray(a), jnp.asarray(b),
                                  jnp.asarray(la), jnp.asarray(lb), W, MC,
                                  CBLK, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
