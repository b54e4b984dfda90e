"""Exhaustive kind x type conversion tests (reference: SLIP_matrix_copy.c's
15x15 matrix; test style after Tcov's combinatorial coverage, SURVEY.md §4)."""

from fractions import Fraction

import numpy as np
import pytest

from slip_lu_tpu import Kind, Options, SlipMatrix, Type, matrix_copy
from slip_lu_tpu.bigfloat import BigFloat
from slip_lu_tpu.convert import to_fraction

ALL_KINDS = list(Kind)
ALL_TYPES = list(Type)


def _base_matrix(t: Type) -> SlipMatrix:
    """A 3x3 matrix with representative values for entry type t."""
    if t == Type.MPZ:
        vals = [[6, 0, -3], [0, 5, 0], [2, 0, 9]]
    elif t == Type.INT64:
        vals = [[6, 0, -3], [0, 5, 0], [2, 0, 9]]
    elif t == Type.MPQ:
        # dyadic values so even FP64/MPFR targets are exact
        vals = [[Fraction(1, 2), 0, Fraction(-3, 4)],
                [0, Fraction(5, 8), 0],
                [Fraction(2), 0, Fraction(9, 16)]]
    elif t == Type.MPFR:
        vals = [[BigFloat.from_float(0.5), BigFloat(0, 0), BigFloat.from_float(-0.75)],
                [BigFloat(0, 0), BigFloat.from_float(1.25), BigFloat(0, 0)],
                [BigFloat.from_int(2), BigFloat(0, 0), BigFloat.from_float(2.5)]]
    else:
        vals = [[0.5, 0.0, -0.75], [0.0, 1.25, 0.0], [2.0, 0.0, 2.5]]
    return SlipMatrix.from_dense(np.array(vals, dtype=object), t)


def _represented(A: SlipMatrix):
    """Exact represented values as a dense Fraction array."""
    D = matrix_copy(A, Kind.DENSE, A.type)
    inv = 1 / D.scale
    return [[to_fraction(D.x[r, c], D.type) * inv for c in range(D.n)]
            for r in range(D.m)]


@pytest.mark.parametrize("src_t", ALL_TYPES)
@pytest.mark.parametrize("src_k", ALL_KINDS)
@pytest.mark.parametrize("dst_t", ALL_TYPES)
@pytest.mark.parametrize("dst_k", ALL_KINDS)
def test_all_225_conversions_preserve_values(src_k, src_t, dst_k, dst_t):
    A0 = _base_matrix(src_t)
    A = matrix_copy(A0, src_k, src_t)       # put into source kind
    B = matrix_copy(A, dst_k, dst_t)        # the conversion under test
    assert B.kind == dst_k and B.type == dst_t
    want = _represented(A0)
    if dst_t == Type.INT64 and src_t not in (Type.MPZ, Type.INT64):
        # INT64 is a rounding target (reference: slip_cast_array int64 path)
        from slip_lu_tpu.convert import round_fraction_to_int
        from slip_lu_tpu.options import RoundMode
        want = [[Fraction(round_fraction_to_int(v, RoundMode.NEAREST)) for v in row]
                for row in want]
    got = _represented(B)
    # values are chosen dyadic so FP64 and MPFR targets are exact
    assert got == want, f"{src_k.name}x{src_t.name} -> {dst_k.name}x{dst_t.name}"


def test_integerization_records_scale():
    A = SlipMatrix.from_dense(np.array([[Fraction(1, 2), Fraction(1, 3)]], dtype=object),
                              Type.MPQ)
    B = matrix_copy(A, Kind.DENSE, Type.MPZ)
    assert B.scale == 6
    assert B.x[0, 0] == 3 and B.x[0, 1] == 2


def test_double_integerization_is_exact_dyadic():
    A = SlipMatrix.from_dense(np.array([[0.1, 2.0]]), Type.FP64)
    B = matrix_copy(A, Kind.DENSE, Type.MPZ)
    # 0.1 as a double is 3602879701896397 / 2**55; exactness check:
    assert Fraction(B.x[0, 0]) / B.scale == Fraction(0.1)
    assert Fraction(B.x[0, 1]) / B.scale == 2


def test_triplet_duplicates_are_summed():
    A = SlipMatrix.from_triplet(2, 2, i=[0, 0, 1], j=[0, 0, 1], x=[3, 4, 5],
                                type_=Type.MPZ)
    B = matrix_copy(A, Kind.CSC, Type.MPZ)
    assert B.nnz() == 2
    assert B.x[0] == 7


def test_dense_to_csc_drops_zeros():
    A = SlipMatrix.from_dense([[1, 0], [0, 2]], Type.MPZ)
    B = matrix_copy(A, Kind.CSC, Type.MPZ)
    assert B.nnz() == 2


def test_int64_overflow_raises():
    from slip_lu_tpu.errors import SlipIncorrectInputError
    A = SlipMatrix.from_dense(np.array([[2 ** 70]], dtype=object), Type.MPZ)
    with pytest.raises(SlipIncorrectInputError):
        matrix_copy(A, Kind.DENSE, Type.INT64)


def test_mpfr_rounding_at_prec():
    opt = Options(prec=8)
    A = SlipMatrix.from_dense(np.array([[Fraction(1, 3)]], dtype=object), Type.MPQ)
    B = matrix_copy(A, Kind.DENSE, Type.MPFR, opt)
    f = B.x[0, 0].to_fraction()
    assert abs(f - Fraction(1, 3)) <= Fraction(1, 3) / 2 ** 8
    assert f != Fraction(1, 3)  # 1/3 is not dyadic


def test_copy_is_deep():
    A = _base_matrix(Type.MPZ)
    B = matrix_copy(A, Kind.DENSE, Type.MPZ)
    B.x[0, 0] = 999
    assert A.x[0, 0] == 6
