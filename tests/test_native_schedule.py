"""Native C++ schedule builder vs the Python oracle — bit-identical.

Every array of the emitted schedule (slots, histories, substitution
schedules, transversal) must match exactly, so either builder drives the
device kernel to the same computation.
"""

import dataclasses

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.errors import SlipSingularError
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options, Ordering
from slip_lu_tpu.ordering.native import native_available
from slip_lu_tpu.tpu.schedule import build_schedule
from slip_lu_tpu.tpu.schedule_native import build_schedule_native

from conftest import random_sparse_int

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library not built")


@pytest.mark.parametrize("n,density,order", [
    (6, 0.5, Ordering.COLAMD), (21, 0.25, Ordering.COLAMD),
    (34, 0.12, Ordering.AMD), (34, 0.12, Ordering.NONE),
])
def test_native_schedule_identical(n, density, order):
    rng = np.random.default_rng(n)
    A = matrix_copy(random_sparse_int(n, density=density, rng=rng),
                    Kind.CSC, Type.MPZ)
    q = analyze(A, Options(order=order)).q
    s_py, r_py = build_schedule(A, q)
    out = build_schedule_native(A, q)
    assert out is not None
    s_nat, r_nat = out
    assert np.array_equal(r_py, r_nat)
    for f in dataclasses.fields(s_py):
        a, b = getattr(s_py, f.name), getattr(s_nat, f.name)
        if isinstance(a, np.ndarray):
            assert np.array_equal(a, b), f.name
        else:
            assert a == b, f.name


def test_native_schedule_structurally_singular():
    dense = np.array([[1, 0], [3, 0]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    with pytest.raises(SlipSingularError):
        build_schedule_native(A, np.arange(2))


def test_native_schedule_explicit_zero_entry():
    # numerically-zero stored entries must not be transversal candidates
    A = SlipMatrix.allocate(Kind.CSC, Type.MPZ, 2, 2, nzmax=3)
    A.p[:] = [0, 2, 3]
    A.i[:3] = [0, 1, 1]
    A.x[0], A.x[1], A.x[2] = 5, 0, 7   # A[1,0] stored but zero
    A.nz = 3
    s_py, r_py = build_schedule(A, np.arange(2))
    out = build_schedule_native(A, np.arange(2))
    s_nat, r_nat = out
    assert np.array_equal(r_py, r_nat)
    assert np.array_equal(s_py.col_pos, s_nat.col_pos)
