"""scipy/numpy interop tests (MATLAB-bridge parity, SURVEY.md §2.7)."""

from fractions import Fraction

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from slip_lu_tpu.interop import backslash_scipy, from_scipy, to_scipy
from slip_lu_tpu.matrix import Kind, Type


def _spd_like(n=12, seed=3):
    rng = np.random.default_rng(seed)
    d = np.zeros((n, n))
    for r in range(n):
        for c in range(n):
            if rng.random() < 0.3:
                d[r, c] = float(rng.integers(-9, 10))
        d[r, r] = float(rng.integers(1, 10))
    return scipy_sparse.csc_matrix(d)


def test_from_scipy_roundtrip():
    A = _spd_like()
    S = from_scipy(A)
    assert S.kind == Kind.CSC
    back = to_scipy(S)
    assert (back != A).nnz == 0


def test_from_scipy_integer_dtype():
    A = scipy_sparse.csr_matrix(np.array([[2, 0], [1, 3]], dtype=np.int64))
    S = from_scipy(A)
    assert S.type == Type.MPZ


def test_backslash_scipy_exact():
    A = _spd_like(10, seed=7)
    rng = np.random.default_rng(0)
    b = rng.integers(-5, 6, 10).astype(np.int64)
    x = backslash_scipy(A, b)
    assert isinstance(x[0], Fraction)
    # exact residual in rationals
    Ad = A.toarray()
    for i in range(10):
        s = sum(Fraction(Ad[i, j]) * x[j] for j in range(10))
        assert s == b[i]


def test_backslash_scipy_fp64_and_dense_input():
    A = np.array([[3, 1], [1, 2]], dtype=np.int64)
    b = np.array([9.0, 8.0])
    x = backslash_scipy(A, b, out="fp64")
    assert np.allclose(A @ x, b)


def test_backslash_scipy_multirhs_shape():
    A = _spd_like(6, seed=9)
    B = np.ones((6, 2), dtype=np.int64)
    x = backslash_scipy(A, B)
    assert x.shape == (6, 2)
