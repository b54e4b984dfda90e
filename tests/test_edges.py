"""Edge sizes and output types across every backend (Tcov-style)."""

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.bigfloat import BigFloat
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.tpu.backslash_sparse import (factorize_solve_tpu_events,
                                              factorize_solve_tpu_sparse)
from slip_lu_tpu.tpu.backslash_tpu import factorize_solve_tpu

BACKENDS = ["host", "tpu", "tpu-sparse"]


def _sys1x1(v=7, rhs=3):
    A = matrix_copy(SlipMatrix.from_dense(
        np.array([[v]], dtype=object), Type.MPZ), Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[rhs]], dtype=object), Type.MPZ)
    return A, b


@pytest.mark.parametrize("backend", BACKENDS)
def test_1x1(backend):
    A, b = _sys1x1()
    x = backslash(A, b, Type.MPQ, Options(), backend=backend)
    from fractions import Fraction
    assert x.x[0, 0] == Fraction(3, 7)


@pytest.mark.parametrize("backend", BACKENDS)
def test_0x0(backend):
    A = SlipMatrix.allocate(Kind.CSC, Type.MPZ, 0, 0)
    b = SlipMatrix.allocate(Kind.DENSE, Type.MPZ, 0, 1)
    x = backslash(A, b, Type.MPQ, Options(), backend=backend)
    assert x.m == 0


def test_events_1x1():
    A, b = _sys1x1(v=-5, rhs=10)
    x = factorize_solve_tpu_events(A, analyze(A, Options()), b, Options())
    from fractions import Fraction
    assert x.x[0, 0] == Fraction(-2)


@pytest.mark.parametrize("backend", BACKENDS)
def test_negative_diagonal(backend):
    # transversal / pivoting must handle all-negative diagonals
    dense = np.array([[-4, 1], [2, -5]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[1], [1]], dtype=object), Type.MPZ)
    x = backslash(A, b, Type.MPQ, Options(check=True), backend=backend)
    x_host = backslash(A, b, Type.MPQ, Options())
    assert x.x[0, 0] == x_host.x[0, 0]
    assert x.x[1, 0] == x_host.x[1, 0]


def test_mpfr_output_via_device_backend():
    rng = np.random.default_rng(2)
    from conftest import random_sparse_int
    A = matrix_copy(random_sparse_int(7, density=0.5, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6))] for _ in range(7)],
                 dtype=object), Type.MPZ)
    x = backslash(A, b, Type.MPFR, Options(prec=192), backend="tpu-sparse")
    assert isinstance(x.x[0, 0], BigFloat)
    # parity with the host path at the same precision
    y = backslash(A, b, Type.MPFR, Options(prec=192))
    for i in range(7):
        assert x.x[i, 0] == y.x[i, 0]


@pytest.mark.parametrize("fn", [factorize_solve_tpu,
                                factorize_solve_tpu_sparse])
def test_device_paths_reject_rhs_mismatch(fn):
    A, _ = _sys1x1()
    bad_b = SlipMatrix.from_dense(np.array([[1], [2]], dtype=object),
                                  Type.MPZ)
    from slip_lu_tpu.errors import SlipIncorrectInputError
    with pytest.raises(SlipIncorrectInputError):
        fn(A, analyze(A, Options()), bad_b, Options())
