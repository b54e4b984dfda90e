"""Chip-partitioned GROUPED (subtree-local) streams: the sharded form
of the deferred-determinant decomposition (tpu/schedule_subtree.py with
p set; executed by parallel/factor_fused_shard.py).

Correctness anchors, fast to slow:
  * an exact Python-int replay of the sharded superstep semantics —
    per-chip local tables, owner-masked diag/B psums, replicated
    heads — must reproduce the oracle bit-for-bit at every chip count
    (including p=3, which no power-of-two mesh ever exercises);
  * the real kernels (interpret mode on the virtual CPU mesh) must
    match the oracle end to end through the sharded driver.

Reference behavior reproduced: SLIP_LU_factorize.c's k-loop +
SLIP_LU_solve.c, decomposed into independent subtrees and distributed
block-row (SURVEY §2.10, §7 steps 4-5).
"""

from fractions import Fraction

import numpy as np
import pytest

import jax

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options, Ordering
from slip_lu_tpu.parallel import make_mesh
from slip_lu_tpu.parallel.driver_fused import (
    factorize_solve_fused_sharded)
from slip_lu_tpu.solve import check_solution
from slip_lu_tpu.tpu.schedule import _permute_cols
from slip_lu_tpu.tpu.schedule_native import build_schedule_best
from slip_lu_tpu.tpu.schedule_subtree import (build_event_stream_grouped,
                                              dependency_forest,
                                              partition_groups)

from conftest import random_sparse_int


def _exact_div(a, d):
    q, r2 = divmod(a, d)
    assert r2 == 0, "sharded stream division not exact"
    return q


def replay_sharded(ses, avals, b_rows, n):
    """Phase-accurate Python-int replay of the chip-partitioned grouped
    stream: mirrors fused_sharded_solve chunk for chunk (psum#1 ->
    replicated heads -> local pass 1 -> psum#2 -> local pass 2)."""
    p = ses.p
    Lp = ses.Lp
    val = [[0] * Lp for _ in range(p)]
    for chip, lloc, v in zip(ses.init_chip, ses.init_loc, avals):
        val[int(chip)][int(lloc)] = int(v)
    if ses.extra_chip is not None:
        for chip, lloc, v in zip(ses.extra_chip, ses.extra_loc,
                                 ses.extra_vals):
            val[int(chip)][int(lloc)] = int(v)
    R = n if ses.ndet is None else ses.ndet
    SMT = [0] * (R + 2)
    SMT[0] = 1
    sing = False
    f = ses.factor
    H = f.h_step.shape[1]
    dummy = Lp - 1
    for ci in range(f.nchunks):
        diag = []
        for t in range(H):
            tot = 0
            for c in range(p):
                tot += (val[c][int(ses.h_slot_loc[c, ci, t])]
                        * int(f.mine_diag[c, ci, t]))
            diag.append(tot)
        for t in range(H):
            k = int(f.h_step[ci, t])
            if k < 0:
                continue
            d = int(f.h_div[ci, t])
            rho = diag[t] if d == k else _exact_div(
                diag[t] * SMT[k], SMT[d])
            if rho == 0:
                sing = True
                rho = 1
            SMT[k + 1] = rho
            for c in range(p):
                if int(f.mine_diag[c, ci, t]):
                    val[c][int(ses.h_slot_loc[c, ci, t])] = rho
        for c in range(p):
            outs = []
            for e in range(int(f.counts[c, ci, 1])):
                t_, m, d, _a, _b = (int(x) for x in f.ev1[c, ci, e])
                outs.append((t_, _exact_div(val[c][t_] * SMT[m],
                                            SMT[d])))
            for t_, v in outs:
                val[c][t_] = v
            val[c][dummy] = 0
        CB = f.bc_idx.shape[1]
        bc = []
        for t in range(CB):
            tot = 0
            for c in range(p):
                tot += (val[c][int(ses.bc_loc[c, ci, t])]
                        * int(f.mine_bc[c, ci, t]))
            bc.append(tot)
        for c in range(p):
            outs = []
            for e in range(int(f.counts[c, ci, 2])):
                t_, m, d, a, bb = (int(x) for x in f.ev2[c, ci, e])
                num = val[c][t_] * SMT[m] - val[c][a] * bc[bb]
                outs.append((t_, _exact_div(num, SMT[d])))
            for t_, v in outs:
                val[c][t_] = v
            val[c][dummy] = 0
    det = SMT[R]

    s = ses.solve
    nrhs = len(b_rows[0])
    XT = [[list(r2) for r2 in b_rows]
          + [[0] * nrhs for _ in range(1 + ses.nxx)] for _ in range(p)]
    CBs = s.bc_idx.shape[1]
    for ci in range(s.nchunks):
        for c in range(p):
            X = XT[c]
            outs = []
            for e in range(int(s.counts[c, ci, 1])):
                t_, m, d, _a, _b = (int(x) for x in s.ev1[c, ci, e])
                outs.append((t_, [_exact_div(X[t_][r2] * SMT[m], SMT[d])
                                  for r2 in range(nrhs)]))
            for t_, v in outs:
                X[t_] = v
            X[n] = [0] * nrhs
        bc = []
        for t in range(CBs):
            tot = [0] * nrhs
            idx = int(s.bc_idx[ci, t])
            for c in range(p):
                m = int(s.mine_bc[c, ci, t])
                if m:
                    for r2 in range(nrhs):
                        tot[r2] += XT[c][idx][r2] * m
            bc.append(tot)
        for c in range(p):
            X = XT[c]
            for t in range(int(s.bc_cnt[ci])):
                X[int(s.bc_idx[ci, t])] = list(bc[t])
            outs = []
            for e in range(int(s.counts[c, ci, 2])):
                t_, m, d, a, bb = (int(x) for x in s.ev2[c, ci, e])
                outs.append((t_, [_exact_div(
                    X[t_][r2] * SMT[m] - val[c][a] * X[bb][r2], SMT[d])
                    for r2 in range(nrhs)]))
            for t_, v in outs:
                X[t_] = v
            X[n] = [0] * nrhs
    xout = [XT[i % p][i] for i in range(n)]
    return xout, det, sing


def _system(n, nrhs=1, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 10)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    return A, b


def _banded(n, seed=0, halfband=2):
    rng = np.random.default_rng(seed)
    dense = np.zeros((n, n), dtype=object)
    for i in range(n):
        dense[i, i] = int(rng.integers(3, 9))
        for d in range(1, halfband + 1):
            if i + d < n:
                if rng.random() < 0.7:
                    dense[i + d, i] = int(rng.integers(-3, 4)) or 1
                if rng.random() < 0.7:
                    dense[i, i + d] = int(rng.integers(-3, 4)) or 1
    return matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                       Kind.CSC, Type.MPZ)


def _grouped_sharded(A, opts, p, nrhs_b):
    """Build the sharded grouped stream for A (native forest or a
    dissection candidate), or None."""
    from slip_lu_tpu.tpu.backslash_fused import _dissect_candidate
    ana = analyze(A, opts)
    q = np.asarray(ana.q, np.int64)
    sched, r2 = build_schedule_best(A, q, None)
    gr = (partition_groups(dependency_forest(sched))
          or partition_groups(dependency_forest(sched), n_groups=4))
    if gr is None:
        cand = _dissect_candidate(A, ana, opts)
        if cand is None:
            return None
        q, _fr, sched, r2, _Wx = cand
        gr = partition_groups(dependency_forest(sched))
        if gr is None:
            return None
    ses = build_event_stream_grouped(sched, gr, 8, 64, 128, p=p)
    return ses, q, r2


@pytest.mark.parametrize("n,density,nrhs,seed,p", [
    (24, 0.15, 1, 1, 2), (40, 0.10, 1, 2, 3), (40, 0.10, 2, 5, 4),
    (64, 0.06, 1, 3, 8),
])
def test_sharded_grouped_replay_matches_oracle(n, density, nrhs, seed,
                                               p):
    A, b = _system(n, nrhs=nrhs, density=density, seed=seed)
    opts = Options()
    built = _grouped_sharded(A, opts, p, b)
    if built is None:
        pytest.skip("no decomposition for this pattern")
    ses, q, r2 = built
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    b_rows = [[int(b.x[int(r2[k]), c2]) for c2 in range(nrhs)]
              for k in range(n)]
    xout, det, sing = replay_sharded(ses, avals, b_rows, n)
    assert not sing
    x_host = backslash(A, b, Type.MPQ, opts)
    for k in range(n):
        for c2 in range(nrhs):
            assert Fraction(xout[k][c2], det) == x_host.x[int(q[k]), c2]


@pytest.mark.parametrize("p", [1, 2, 5, 8])
def test_sharded_grouped_replay_banded_dissect(p):
    """Banded chain forest -> dissection candidate -> grouped sharded
    stream, exact at every chip count (pinned rows included)."""
    n = 120
    A = _banded(n, seed=2)
    opts = Options(order=Ordering.NONE)
    rng = np.random.default_rng(1)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6))] for _ in range(n)],
                 dtype=object), Type.MPZ)
    built = _grouped_sharded(A, opts, p, b)
    assert built is not None, "banded matrix must yield a dissection"
    ses, q, r2 = built
    assert ses.ndet is not None and ses.p == p
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    b_rows = [[int(b.x[int(r2[k]), 0])] for k in range(n)]
    xout, det, sing = replay_sharded(ses, avals, b_rows, n)
    assert not sing
    x_host = backslash(A, b, Type.MPQ, opts)
    for k in range(n):
        assert Fraction(xout[k][0], det) == x_host.x[int(q[k]), 0], k


def test_sharded_grouped_capacity_scaling():
    """The point of the sharded grouped form: per-chip capacity binds,
    so more chips shorten the serial chunk scan (ungrouped streams
    hazard-cut far below capacity and cannot scale)."""
    n = 200
    A = _banded(n, seed=3)
    opts = Options(order=Ordering.NONE)
    from slip_lu_tpu.tpu.backslash_fused import _dissect_candidate
    ana = analyze(A, opts)
    cand = _dissect_candidate(A, ana, opts)
    assert cand is not None
    sched = cand[2]
    gr = partition_groups(dependency_forest(sched))
    nc = {}
    for p in (1, 8):
        # tiny capacities so the event volume binds even at this n
        ses = build_event_stream_grouped(sched, gr, 8, 8, 16, p=p)
        nc[p] = ses.factor.nchunks + ses.solve.nchunks
    assert nc[8] < 0.55 * nc[1], nc


@pytest.mark.parametrize("ndev", [
    2, pytest.param(8, marks=pytest.mark.slow)])
def test_sharded_grouped_kernel_parity(monkeypatch, ndev):
    """End to end through the driver + real (interpret-mode) kernels:
    forced grouped adoption, exact oracle parity."""
    monkeypatch.setenv("SLIP_FUSED_SUBTREE", "force")
    A, b = _system(40, nrhs=1, density=0.10, seed=2)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    ana = analyze(A, opts)
    mesh = make_mesh(jax.devices()[:ndev])
    x = factorize_solve_fused_sharded(A, ana, b, mesh, opts,
                                      heads_per_chunk=2,
                                      pass1_events=8, pass2_events=16)
    cache = getattr(ana, "fused_shard_cache", None)
    assert cache is not None
    ses = cache[1][2]
    assert ses.ndet is not None, "grouped stream must be adopted"
    check_solution(A, x, b)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i
