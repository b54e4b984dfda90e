"""Bit-exact parity: device limb REF LU vs the host Python-int oracle.

SURVEY.md section 4 carry-over (a): every TPU solve must verify exactly
against the host oracle on the same matrix, entry-for-entry. Device runs on
the CPU backend here (same kernels jit elsewhere on real TPU).
"""

from fractions import Fraction

import numpy as np
import pytest

from slip_lu_tpu import (Kind, Options, Ordering, Pivot, SlipMatrix, Type,
                         analyze, backslash, check_solution, factorize,
                         matrix_copy)
from slip_lu_tpu.errors import SlipLimbOverflowError, SlipSingularError
from slip_lu_tpu.tpu.backslash_tpu import factor_tpu, factorize_solve_tpu
from slip_lu_tpu.tpu.bounds import factor_width, hadamard_bits
from tests.conftest import random_sparse_int


def _as_dicts(cols):
    return [dict(c) for c in cols]


def _assert_factor_parity(F_host, F_dev):
    assert F_host.rhos == F_dev.rhos
    assert list(F_host.pinv) == list(F_dev.pinv)
    assert list(F_host.row_perm) == list(F_dev.row_perm)
    assert _as_dicts(F_host.Lcols) == _as_dicts(F_dev.Lcols)
    assert _as_dicts(F_host.Ucols) == _as_dicts(F_dev.Ucols)


@pytest.mark.parametrize("pivot", list(Pivot))
def test_factor_parity_all_pivots(pivot, rng):
    n = 6
    A = random_sparse_int(n, density=0.5, rng=rng)
    A2 = matrix_copy(A, Kind.CSC, Type.MPZ)
    opt = Options(pivot=pivot, order=Ordering.NONE)
    an = analyze(A2, opt)
    F_host = factorize(A2, an, opt)
    F_dev = factor_tpu(A2, an, opt)
    _assert_factor_parity(F_host, F_dev)


@pytest.mark.parametrize("order", [Ordering.NONE, Ordering.COLAMD, Ordering.AMD])
def test_factor_parity_orderings(order, rng):
    n = 7
    A = random_sparse_int(n, density=0.4, rng=rng)
    A2 = matrix_copy(A, Kind.CSC, Type.MPZ)
    opt = Options(order=order)
    an = analyze(A2, opt)
    _assert_factor_parity(factorize(A2, an, opt), factor_tpu(A2, an, opt))


def test_full_tpu_solve_vs_host(rng):
    n = 8
    A = random_sparse_int(n, density=0.5, rng=rng)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 10))] for _ in range(n)], dtype=object),
        Type.MPZ)
    x_host = backslash(A, b, Type.MPQ)
    x_dev = backslash(A, b, Type.MPQ, backend="tpu")
    for r in range(n):
        assert x_dev.x[r, 0] == x_host.x[r, 0]
    check_solution(A, x_dev, b)


def test_tpu_solve_multiple_rhs(rng):
    n, nrhs = 5, 3
    A = random_sparse_int(n, density=0.6, rng=rng)
    B = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    x_host = backslash(A, B, Type.MPQ)
    x_dev = backslash(A, B, Type.MPQ, backend="tpu")
    assert all(x_dev.x[r, c] == x_host.x[r, c]
               for r in range(n) for c in range(nrhs))


def test_tpu_rational_input():
    A = SlipMatrix.from_dense(
        np.array([[Fraction(1, 2), Fraction(1, 3)],
                  [Fraction(1, 5), Fraction(2, 1)]], dtype=object), Type.MPQ)
    b = SlipMatrix.from_dense(np.array([[Fraction(7, 11)], [Fraction(1)]],
                                       dtype=object), Type.MPQ)
    x_host = backslash(A, b, Type.MPQ)
    x_dev = backslash(A, b, Type.MPQ, backend="tpu")
    assert x_dev.x[0, 0] == x_host.x[0, 0] and x_dev.x[1, 0] == x_host.x[1, 0]


def test_tpu_singular_raises(rng):
    A = SlipMatrix.from_dense([[1, 2], [2, 4]], Type.MPZ)
    b = SlipMatrix.from_dense([[1], [1]], Type.MPZ)
    with pytest.raises(SlipSingularError):
        backslash(A, b, backend="tpu")


def test_tpu_large_values_bit_growth(rng):
    """Entries ~2^40: forces multi-limb arithmetic through every op."""
    n = 5
    d = np.zeros((n, n), dtype=object)
    for r in range(n):
        for c in range(n):
            if rng.random() < 0.7 or r == c:
                d[r, c] = int(rng.integers(-2 ** 40, 2 ** 40)) or 1
    A = SlipMatrix.from_dense(d, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[2 ** 30]] * n, dtype=object), Type.MPZ)
    x_host = backslash(A, b, Type.MPQ)
    x_dev = backslash(A, b, Type.MPQ, backend="tpu")
    assert all(x_dev.x[r, 0] == x_host.x[r, 0] for r in range(n))


def test_widen_and_retry_on_tight_budget(rng):
    """max_limbs caps W below the bound; overflow must either retry to a
    correct answer or raise SlipLimbOverflowError - never a wrong answer."""
    n = 6
    A = random_sparse_int(n, density=0.8, lo=-999, hi=999, rng=rng)
    b = SlipMatrix.from_dense(np.array([[1]] * n, dtype=object), Type.MPZ)
    opt = Options(max_limbs=2)
    x_host = backslash(A, b, Type.MPQ)
    try:
        x_dev = backslash(A, b, Type.MPQ, opt, backend="tpu")
    except SlipLimbOverflowError:
        return  # clean failure is acceptable
    assert all(x_dev.x[r, 0] == x_host.x[r, 0] for r in range(n))


def test_hadamard_bound_is_sound(rng):
    for _ in range(3):
        n = 6
        A = random_sparse_int(n, density=0.6, rng=rng)
        A2 = matrix_copy(A, Kind.CSC, Type.MPZ)
        an = analyze(A2, Options(order=Ordering.NONE))
        F = factorize(A2, an, Options(order=Ordering.NONE))
        H = hadamard_bits(A2)
        maxbits = max(abs(v).bit_length()
                      for col in F.Lcols + F.Ucols for _, v in col)
        assert maxbits <= H


def test_1x1_tpu():
    A = SlipMatrix.from_dense([[7]], Type.MPZ)
    b = SlipMatrix.from_dense([[3]], Type.MPZ)
    x = backslash(A, b, Type.MPQ, backend="tpu")
    assert x.x[0, 0] == Fraction(3, 7)
