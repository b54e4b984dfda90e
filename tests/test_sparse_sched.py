"""Static-schedule sparse device path: parity, fill, fallback.

SURVEY.md §4 carry-overs for the scheduled path: every solve bit-exact
vs the host oracle (unique exact solution), symbolic fill covers the
numeric pattern, exact-cancellation pivots fall back to full pivoting,
limb overflow widens and retries — never a wrong answer.
"""

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.errors import SlipSingularError
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options, Ordering
from slip_lu_tpu.tpu.backslash_sparse import factorize_solve_tpu_sparse
from slip_lu_tpu.tpu.schedule import build_schedule, max_transversal

from conftest import random_sparse_int


def _system(n, nrhs=1, density=0.3, seed=0, lo=-9, hi=9):
    rng = np.random.default_rng(seed)
    A = random_sparse_int(n, density=density, rng=rng, lo=lo, hi=hi)
    A = matrix_copy(A, Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    return A, b


def _assert_equal(x1, x2):
    for i in range(x1.m):
        for j in range(x1.n):
            assert x1.x[i, j] == x2.x[i, j], (i, j)


@pytest.mark.parametrize("n,density,seed", [
    (5, 0.5, 1), (12, 0.3, 2), (20, 0.2, 3), (33, 0.15, 4),
])
def test_sparse_matches_oracle(n, density, seed):
    A, b = _system(n, density=density, seed=seed)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    x_sp = factorize_solve_tpu_sparse(A, analyze(A, opts), b, opts)
    _assert_equal(x_host, x_sp)


def test_sparse_multirhs():
    A, b = _system(14, nrhs=3, seed=7)
    opts = Options()
    _assert_equal(backslash(A, b, Type.MPQ, opts),
                  factorize_solve_tpu_sparse(A, analyze(A, opts), b, opts))


@pytest.mark.parametrize("order", [Ordering.NONE, Ordering.COLAMD,
                                   Ordering.AMD])
def test_sparse_orderings(order):
    A, b = _system(16, seed=9)
    opts = Options(order=order)
    _assert_equal(backslash(A, b, Type.MPQ, opts),
                  factorize_solve_tpu_sparse(A, analyze(A, opts), b, opts))


def test_sparse_big_entries():
    A, b = _system(10, seed=11, lo=-10**12, hi=10**12)
    opts = Options()
    _assert_equal(backslash(A, b, Type.MPQ, opts),
                  factorize_solve_tpu_sparse(A, analyze(A, opts), b, opts))


def test_sparse_backend_via_backslash():
    A, b = _system(11, seed=13)
    opts = Options(check=True)  # internal exact oracle runs too
    x = backslash(A, b, Type.MPQ, opts, backend="tpu-sparse")
    _assert_equal(backslash(A, b, Type.MPQ, opts), x)


def test_cancellation_falls_back_to_full_pivoting():
    # diagonal pivot sequence hits an exact zero at step 1, but the matrix
    # is nonsingular: the sparse path must fall back and still solve
    dense = np.array([[1, 1, 0],
                      [1, 1, 1],
                      [0, 1, 1]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[1], [2], [3]], dtype=object),
                              Type.MPZ)
    opts = Options(order=Ordering.NONE)
    x_sp = factorize_solve_tpu_sparse(A, analyze(A, opts), b, opts)
    _assert_equal(backslash(A, b, Type.MPQ, opts), x_sp)


def test_structurally_singular_raises():
    dense = np.array([[1, 0], [2, 0]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    with pytest.raises(SlipSingularError):
        max_transversal(A)
    b = SlipMatrix.from_dense(np.array([[1], [1]], dtype=object), Type.MPZ)
    opts = Options(order=Ordering.NONE)
    with pytest.raises(SlipSingularError):
        factorize_solve_tpu_sparse(A, analyze(A, opts), b, opts)


def test_schedule_fill_superset_and_counts():
    A, _ = _system(18, seed=21)
    q = analyze(A, Options()).q
    sched, r = build_schedule(A, q)
    n = A.n
    # diagonal of B is inside the pattern; slots are unique coordinates
    coords = set(zip(sched.row_of.tolist(), sched.col_of.tolist()))
    assert len(coords) == sched.nnz
    for k in range(n):
        assert (k, k) in coords
    # lnz/unz count the L and U patterns including the diagonal
    assert sched.lnz + sched.unz - n >= sched.nnz
    # transversal is a permutation
    assert sorted(int(v) for v in r) == list(range(n))


def test_sparse_corpus_files():
    import os
    data = os.path.join(os.path.dirname(__file__), "..", "data",
                        "ExampleMats")
    from slip_lu_tpu.io import read_dense, read_triplet
    for name in ["dense10", "arrow25", "grid8"]:
        A = matrix_copy(read_triplet(os.path.join(data, f"{name}_mat.txt")),
                        Kind.CSC, Type.MPZ)
        b = read_dense(os.path.join(data, f"{name}_v.txt"))
        opts = Options()
        _assert_equal(
            backslash(A, b, Type.MPQ, opts),
            factorize_solve_tpu_sparse(A, analyze(A, opts), b, opts))
