"""End-to-end exact-solve tests for the host oracle.

Test strategy after the reference's (SURVEY.md section 4): the rational
check A*x == b (slip_check_solution.c) is a perfect oracle with no
tolerances; we run it across pivot schemes, orderings, entry types, and
random matrices, plus singular/bad-input paths.
"""

from fractions import Fraction

import numpy as np
import pytest

from slip_lu_tpu import (Kind, Options, Ordering, Pivot, SlipMatrix, Type,
                         analyze, backslash, check_solution, factorize,
                         matrix_copy, solve)
from slip_lu_tpu.errors import (SlipIncorrectError, SlipIncorrectInputError,
                                SlipSingularError)
from tests.conftest import random_sparse_int


def _dense_fraction_solve(A: SlipMatrix, b: SlipMatrix):
    """Independent oracle: Gaussian elimination over Fractions via numpy obj."""
    from slip_lu_tpu.convert import to_fraction
    n = A.n
    Ad = matrix_copy(A, Kind.DENSE, Type.MPQ)
    bd = matrix_copy(b, Kind.DENSE, Type.MPQ)
    M = [[to_fraction(Ad.x[r, c], Type.MPQ) / Ad.scale for c in range(n)]
         for r in range(n)]
    rhs = [to_fraction(bd.x[r, 0], Type.MPQ) / bd.scale for r in range(n)]
    # partial-pivot rational GE
    for k in range(n):
        p = next(r for r in range(k, n) if M[r][k] != 0)
        M[k], M[p] = M[p], M[k]
        rhs[k], rhs[p] = rhs[p], rhs[k]
        for r in range(k + 1, n):
            if M[r][k]:
                f = M[r][k] / M[k][k]
                for c in range(k, n):
                    M[r][c] -= f * M[k][c]
                rhs[r] -= f * rhs[k]
    x = [Fraction(0)] * n
    for k in range(n - 1, -1, -1):
        s = rhs[k] - sum(M[k][c] * x[c] for c in range(k + 1, n))
        x[k] = s / M[k][k]
    return x


def test_2x2_hand_checked():
    A = SlipMatrix.from_dense([[2, 1], [1, 3]], Type.MPZ)
    b = SlipMatrix.from_dense([[5], [10]], Type.MPZ)
    x = backslash(A, b, Type.MPQ, Options(order=Ordering.NONE, check=True))
    assert x.x[0, 0] == Fraction(1) and x.x[1, 0] == Fraction(3)


def test_rational_result():
    A = SlipMatrix.from_dense([[3, 0], [0, 7]], Type.MPZ)
    b = SlipMatrix.from_dense([[1], [1]], Type.MPZ)
    x = backslash(A, b, Type.MPQ, Options(check=True))
    assert x.x[0, 0] == Fraction(1, 3) and x.x[1, 0] == Fraction(1, 7)


@pytest.mark.parametrize("pivot", list(Pivot))
@pytest.mark.parametrize("order", list(Ordering))
def test_all_pivots_all_orderings(pivot, order, rng):
    A = random_sparse_int(8, density=0.5, rng=rng)
    b = SlipMatrix.from_dense(np.array([[int(rng.integers(-5, 6))] for _ in range(8)],
                                       dtype=object), Type.MPZ)
    opt = Options(pivot=pivot, order=order, check=True)
    x = backslash(A, b, Type.MPQ, opt)
    want = _dense_fraction_solve(A, b)
    got = [x.x[r, 0] for r in range(8)]
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 5, 12, 25])
def test_random_sizes_vs_fraction_oracle(n, rng):
    for trial in range(3):
        A = random_sparse_int(n, density=0.4, rng=rng)
        b = SlipMatrix.from_dense(
            np.array([[int(rng.integers(-9, 10))] for _ in range(n)], dtype=object),
            Type.MPZ)
        try:
            x = backslash(A, b, Type.MPQ, Options(check=True))
        except SlipSingularError:
            continue
        want = _dense_fraction_solve(A, b)
        assert [x.x[r, 0] for r in range(n)] == want


def test_multiple_rhs(rng):
    n, nrhs = 6, 3
    A = random_sparse_int(n, density=0.6, rng=rng)
    B = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6)) for _ in range(nrhs)] for _ in range(n)],
                 dtype=object), Type.MPZ)
    x = backslash(A, B, Type.MPQ, Options(check=True))
    assert x.shape == (n, nrhs)


def test_rational_input_matrix(rng):
    n = 5
    vals = np.array([[Fraction(int(rng.integers(-6, 7)), int(rng.integers(1, 5)))
                      for _ in range(n)] for _ in range(n)], dtype=object)
    for d in range(n):
        if vals[d, d] == 0:
            vals[d, d] = Fraction(1)
    A = SlipMatrix.from_dense(vals, Type.MPQ)
    b = SlipMatrix.from_dense(np.array([[Fraction(1, 3)] for _ in range(n)],
                                       dtype=object), Type.MPQ)
    x = backslash(A, b, Type.MPQ, Options(check=True))
    check_solution(A, x, b)


def test_fp64_input_exact_dyadic():
    A = SlipMatrix.from_dense(np.array([[0.5, 0.25], [0.125, 1.0]]), Type.FP64)
    b = SlipMatrix.from_dense(np.array([[1.0], [2.0]]), Type.FP64)
    x = backslash(A, b, Type.MPQ, Options(check=True))
    check_solution(A, x, b)


def test_scaled_b(rng):
    """b with a nontrivial integerization scale is undone correctly."""
    A = SlipMatrix.from_dense([[2, 0], [0, 4]], Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[Fraction(1, 2)], [Fraction(3, 4)]],
                                       dtype=object), Type.MPQ)
    x = backslash(A, b, Type.MPQ, Options(check=True))
    assert x.x[0, 0] == Fraction(1, 4) and x.x[1, 0] == Fraction(3, 16)


def test_singular_raises():
    A = SlipMatrix.from_dense([[1, 2], [2, 4]], Type.MPZ)
    b = SlipMatrix.from_dense([[1], [1]], Type.MPZ)
    with pytest.raises(SlipSingularError):
        backslash(A, b)


def test_zero_column_singular():
    A = SlipMatrix.from_dense([[1, 0], [1, 0]], Type.MPZ)
    b = SlipMatrix.from_dense([[1], [1]], Type.MPZ)
    with pytest.raises(SlipSingularError):
        backslash(A, b, options=Options(order=Ordering.NONE))


def test_rectangular_rejected():
    A = SlipMatrix.from_dense([[1, 2, 3], [4, 5, 6]], Type.MPZ)
    b = SlipMatrix.from_dense([[1], [1]], Type.MPZ)
    with pytest.raises(SlipIncorrectInputError):
        backslash(A, b)


def test_wrong_rhs_size_rejected():
    A = SlipMatrix.from_dense([[1, 0], [0, 1]], Type.MPZ)
    b = SlipMatrix.from_dense([[1], [1], [1]], Type.MPZ)
    with pytest.raises(SlipIncorrectInputError):
        backslash(A, b)


def test_check_solution_catches_wrong_x():
    A = SlipMatrix.from_dense([[2, 0], [0, 2]], Type.MPZ)
    b = SlipMatrix.from_dense([[2], [2]], Type.MPZ)
    bad_x = SlipMatrix.from_dense(np.array([[Fraction(2)], [Fraction(1)]],
                                           dtype=object), Type.MPQ)
    with pytest.raises(SlipIncorrectError):
        check_solution(A, bad_x, b)


def test_output_types():
    A = SlipMatrix.from_dense([[4, 0], [0, 2]], Type.MPZ)
    b = SlipMatrix.from_dense([[2], [5]], Type.MPZ)
    x64 = backslash(A, b, Type.FP64)
    assert x64.x[0, 0] == 0.5 and x64.x[1, 0] == 2.5
    xf = backslash(A, b, Type.MPFR)
    assert xf.x[0, 0].to_fraction() == Fraction(1, 2)


def test_det_and_factors_consistency(rng):
    """PAQ == L diag(1/(rho_{k-1} rho_k)) U exactly (REF LU identity)."""
    n = 7
    A = random_sparse_int(n, density=0.5, rng=rng)
    A2 = matrix_copy(A, Kind.CSC, Type.MPZ)
    an = analyze(A2, Options())
    F = factorize(A2, an, Options())
    # reconstruct PAQ entrywise as Fractions
    L = F.L_matrix()
    U = F.U_matrix_pivot_rows()
    Lf = [[Fraction(0)] * n for _ in range(n)]
    for col in range(n):
        for idx in range(int(L.p[col]), int(L.p[col + 1])):
            Lf[int(F.pinv[int(L.i[idx])])][col] = Fraction(int(L.x[idx]))
    Uf = [[Fraction(0)] * n for _ in range(n)]
    for col in range(n):
        for idx in range(int(U.p[col]), int(U.p[col + 1])):
            Uf[int(U.i[idx])][col] = Fraction(int(U.x[idx]))
    Ad = matrix_copy(A2, Kind.DENSE, Type.MPZ)
    for r in range(n):
        for c in range(n):
            want = Fraction(int(Ad.x[int(F.row_perm[r]), int(F.q[c])]))
            got = sum(Lf[r][k] * Uf[k][c] / (Fraction(F.rho(k - 1)) * F.rho(k))
                      for k in range(n))
            assert got == want, (r, c)
