"""Subtree-local (grouped) streams: deferred determinant scaling.

Correctness anchor: the exact Python-int replay of the grouped chunk
streams must reproduce the oracle solution bit for bit (the same
phase-accurate replay that pins the ungrouped stream encoding,
tests/test_stream.py), and the dependency forest must satisfy the
ancestor-closure property the whole decomposition rests on
(tpu/schedule_subtree.py module docstring)."""

from fractions import Fraction

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.tpu.schedule import _permute_cols
from slip_lu_tpu.tpu.schedule_native import build_schedule_best
from slip_lu_tpu.tpu.schedule_stream import build_event_stream
from slip_lu_tpu.tpu.schedule_subtree import (
    Grouping, build_event_stream_grouped, dependency_forest,
    partition_groups)

from conftest import random_sparse_int
from test_stream import replay_stream


def _system(n, nrhs=1, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 10)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    return A, b


def _sched(A, opts=None):
    opts = opts or Options()
    ana = analyze(A, opts)
    q = np.asarray(ana.q, np.int64)
    sched, r = build_schedule_best(A, q, None)
    return sched, q, r


def test_forest_closure():
    """Every dependency of a step is one of its forest ancestors."""
    A, _ = _system(40, density=0.15, seed=7)
    sched, _, _ = _sched(A)
    parent = dependency_forest(sched)
    n, E = sched.n, sched.nnz
    for k in range(n):
        anc = set()
        a = k
        while parent[a] >= 0:
            a = int(parent[a])
            anc.add(a)
        nbrs = set()
        for s in sched.col_pos[k]:
            if s < E:
                nbrs.add(int(sched.row_of[s]))
        for s in sched.row_pos[k]:
            if s < E:
                nbrs.add(int(sched.col_of[s]))
        nbrs.discard(k)
        assert nbrs <= anc, (k, nbrs - anc)


def test_partition_groups_disjoint_and_closed():
    A, _ = _system(60, density=0.08, seed=3)
    sched, _, _ = _sched(A)
    parent = dependency_forest(sched)
    gr = partition_groups(parent, n_groups=4)
    if gr is None:
        pytest.skip("forest offers no decomposition for this pattern")
    seen = set()
    for g in gr.groups:
        assert not (set(map(int, g)) & seen)
        seen |= set(map(int, g))
        # groups are unions of full subtrees: a member's parent is in
        # the same group or the top
        for k in g:
            p = int(parent[k])
            if p >= 0:
                assert int(gr.group_of[p]) in (int(gr.group_of[k]), -1)
    assert seen | set(map(int, gr.top)) == set(range(sched.n))


def _grouped_es(sched, n_groups=4, H=8, C1=16, C2=64):
    parent = dependency_forest(sched)
    gr = partition_groups(parent, n_groups=n_groups)
    if gr is None:
        return None
    return build_event_stream_grouped(sched, gr, H, C1, C2)


@pytest.mark.parametrize("n,density,nrhs,seed", [
    (24, 0.15, 1, 1), (40, 0.10, 1, 2), (40, 0.10, 2, 5),
    (64, 0.06, 1, 3), (96, 0.05, 1, 4),
])
def test_grouped_replay_matches_oracle(n, density, nrhs, seed):
    A, b = _system(n, nrhs=nrhs, density=density, seed=seed)
    opts = Options()
    sched, q, r = _sched(A, opts)
    es = _grouped_es(sched)
    if es is None:
        pytest.skip("no decomposition")
    assert len(es.grouped.groups) >= 2
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    b_rows = [[int(b.x[int(r[k]), c2]) for c2 in range(nrhs)]
              for k in range(n)]
    val, X, det, sing = replay_stream(es, avals, b_rows, n)
    assert not sing
    x_host = backslash(A, b, Type.MPQ, opts)
    for k in range(n):
        oc = int(q[k])
        for c2 in range(nrhs):
            assert Fraction(X[k][c2], det) == x_host.x[oc, c2], (k, c2)


def test_grouped_banded_with_forced_groups():
    """Tridiagonal natural order is a pure chain: no decomposition."""
    n = 40
    dense = np.zeros((n, n), dtype=object)
    for i in range(n):
        dense[i, i] = 3
        if i:
            dense[i, i - 1] = 1
            dense[i - 1, i] = -2
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    opts = Options()
    from slip_lu_tpu.options import Ordering
    sched, q, r = _sched(A, Options(order=Ordering.NONE))
    parent = dependency_forest(sched)
    assert partition_groups(parent) is None


def test_grouped_chunk_count_drops():
    """The whole point: grouped streams pack several independent steps
    per chunk, cutting the serial scan well below the ungrouped one on
    a decomposable pattern (block-diagonal-ish with a dense tail)."""
    rng = np.random.default_rng(11)
    n, blk = 96, 12
    dense = np.zeros((n, n), dtype=object)
    nb = (n - blk) // blk
    for bi in range(nb):
        lo = bi * blk
        for i in range(lo, lo + blk):
            for j in range(lo, lo + blk):
                if i == j:
                    dense[i, j] = int(rng.integers(2, 9))
                elif rng.random() < 0.3:
                    dense[i, j] = int(rng.integers(-4, 5))
    for i in range(n - blk, n):            # coupling tail rows/cols
        dense[i, i] = int(rng.integers(2, 9))
        for j in range(n):
            if j != i and rng.random() < 0.15:
                dense[i, j] = int(rng.integers(-3, 4))
                dense[j, i] = int(rng.integers(-3, 4))
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[1]] * n, dtype=object), Type.MPZ)
    from slip_lu_tpu.options import Ordering
    opts = Options(order=Ordering.NONE)
    sched, q, r = _sched(A, opts)
    es_u = build_event_stream(sched, 8, 32, 128)
    es_g = _grouped_es(sched, n_groups=8, C1=32, C2=128)
    assert es_g is not None
    # the driver's adoption criterion: total scan shortens (dense
    # blocks keep the factor stream capacity-bound; the solve stream
    # is where this pattern wins)
    assert (es_g.factor.nchunks + es_g.solve.nchunks
            < 0.85 * (es_u.factor.nchunks + es_u.solve.nchunks)), (
        es_g.factor.nchunks, es_g.solve.nchunks,
        es_u.factor.nchunks, es_u.solve.nchunks)
    # and it still replays to the exact oracle solution
    Aq = _permute_cols(A, q)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    b_rows = [[int(b.x[int(r[k]), 0])] for k in range(n)]
    val, X, det, sing = replay_stream(es_g, avals, b_rows, n)
    assert not sing
    x_host = backslash(A, b, Type.MPQ, opts)
    for k in range(n):
        assert Fraction(X[k][0], det) == x_host.x[int(q[k]), 0], k


def test_grouped_fused_device_parity(monkeypatch):
    """Forced-grouped fused solve (interpret-mode Pallas) is bit-exact
    vs the oracle — heads hazard rules, ndet/nxx plumbing, extra-slot
    packing all exercised on the real kernel."""
    monkeypatch.setenv("SLIP_FUSED_SUBTREE", "force")
    from slip_lu_tpu.solve import check_solution
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
    A, b = _system(40, density=0.10, seed=2)
    opts = Options()
    ana = analyze(A, opts)
    x = factorize_solve_tpu_fused(A, ana, b, opts)
    check_solution(A, x, b)
    xo = backslash(A, b, Type.MPQ, opts)
    for k in range(A.n):
        assert x.x[k, 0] == xo.x[k, 0], k
    es = ana.fused_cache[1][2]
    assert es.grouped is not None and len(es.grouped.groups) >= 2


@pytest.mark.slow
def test_grouped_fused_device_parity_multirhs(monkeypatch):
    monkeypatch.setenv("SLIP_FUSED_SUBTREE", "force")
    from slip_lu_tpu.solve import check_solution
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
    A, b = _system(64, density=0.06, seed=3, nrhs=2)
    opts = Options()
    ana = analyze(A, opts)
    x = factorize_solve_tpu_fused(A, ana, b, opts)
    check_solution(A, x, b)
    xo = backslash(A, b, Type.MPQ, opts)
    for k in range(A.n):
        for c in range(2):
            assert x.x[k, c] == xo.x[k, c], (k, c)
    assert ana.fused_cache[1][2].grouped is not None


def test_dissect_order_is_permutation_and_decomposes():
    """Banded chain matrix: dissection manufactures subtrees."""
    n = 220
    rng = np.random.default_rng(5)
    dense = np.zeros((n, n), dtype=object)
    for i in range(n):
        dense[i, i] = 1          # unimodular-ish band, corpus style
        for d in (1, 2, 3):
            if i + d < n:
                dense[i, i + d] = int(rng.integers(-3, 4))
                dense[i + d, i] = int(rng.integers(-3, 4))
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    from slip_lu_tpu.tpu.schedule_subtree import (dissect_order,
                                                  try_build_grouped)
    q_nd = dissect_order(A, 8)
    assert sorted(map(int, q_nd)) == list(range(n))
    # reordered pivot values are arbitrary: repair cancellations with
    # per-group block pivoting, exactly like the driver
    # (_maybe_dissect -> pin_rows_per_group)
    from slip_lu_tpu.options import Ordering
    from slip_lu_tpu.tpu.schedule_subtree import (dependency_forest,
                                                  partition_groups,
                                                  pin_rows_per_group)
    sched_u, r_u = build_schedule_best(A, q_nd, None)
    gr0 = partition_groups(dependency_forest(sched_u))
    assert gr0 is not None
    fixed_r = pin_rows_per_group(A, q_nd, r_u, gr0)
    assert fixed_r is not None
    sched_nd, r_nd = build_schedule_best(A, q_nd, fixed_r)
    es_g = try_build_grouped(sched_nd, 8, 64, 128)
    assert es_g is not None and len(es_g.grouped.groups) >= 4
    # natural order is a chain: the grouped scan must be much shorter
    sched0, _ = _sched(A, Options(order=Ordering.NONE))[0::2]
    es_u = build_event_stream(sched0, 2, 32, 128)
    assert es_g.factor.nchunks < 0.6 * es_u.factor.nchunks, (
        es_g.factor.nchunks, es_u.factor.nchunks)
    # and the dissected grouped stream replays bit-exact
    b = SlipMatrix.from_dense(np.array([[1]] * n, dtype=object),
                              Type.MPZ)
    Aq = _permute_cols(A, q_nd)
    avals = [int(Aq.x[idx]) for c in range(n)
             for idx in range(int(Aq.p[c]), int(Aq.p[c + 1]))]
    b_rows = [[int(b.x[int(r_nd[k]), 0])] for k in range(n)]
    val, X, det, sing = replay_stream(es_g, avals, b_rows, n)
    assert not sing
    x_host = backslash(A, b, Type.MPQ, Options(order=Ordering.NONE))
    for k in range(n):
        assert Fraction(X[k][0], det) == x_host.x[int(q_nd[k]), 0], k


@pytest.mark.slow
def test_dissect_driver_end_to_end(monkeypatch):
    """Driver-level dissection: banded chain matrix, full fused solve
    through _dissect_candidate + per-group pinning + grouped streams
    (interpret-mode kernels), exact parity with the oracle."""
    monkeypatch.setenv("SLIP_FUSED_SUBTREE", "force")
    n = 220
    rng = np.random.default_rng(5)
    dense = np.zeros((n, n), dtype=object)
    for i in range(n):
        dense[i, i] = 1
        for d in (1, 2, 3):
            if i + d < n:
                dense[i, i + d] = int(rng.integers(-3, 4))
                dense[i + d, i] = int(rng.integers(-3, 4))
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6))] for _ in range(n)],
                 dtype=object), Type.MPZ)
    from slip_lu_tpu.options import Ordering
    from slip_lu_tpu.solve import check_solution
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
    opts = Options(order=Ordering.NONE)
    ana = analyze(A, opts)
    x = factorize_solve_tpu_fused(A, ana, b, opts)
    check_solution(A, x, b)
    xo = backslash(A, b, Type.MPQ, opts)
    for k in range(n):
        assert x.x[k, 0] == xo.x[k, 0], k
    es = ana.fused_cache[1][2]
    assert es.grouped is not None          # dissection was committed
    assert ana.sparse_fixed_r is not None  # with per-group pinning
