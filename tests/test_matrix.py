"""Tests for SlipMatrix structure + validation (reference: SLIP_matrix_check.c)."""

from fractions import Fraction

import numpy as np
import pytest

from slip_lu_tpu import Kind, SlipMatrix, Type
from slip_lu_tpu.errors import SlipIncorrectInputError


def test_allocate_all_kinds_types():
    for kind in Kind:
        for t in Type:
            A = SlipMatrix.allocate(kind, t, 4, 3, nzmax=5)
            A.check()
            assert A.shape == (4, 3)


def test_csc_roundtrip():
    A = SlipMatrix.from_csc(3, 3, p=[0, 2, 3, 4], i=[0, 2, 1, 2],
                            x=[5, -1, 7, 2], type_=Type.MPZ)
    assert A.nnz() == 4
    assert A.x[1] == -1


def test_triplet_and_dense():
    T = SlipMatrix.from_triplet(2, 2, i=[0, 1], j=[0, 1], x=[3, 4], type_=Type.MPZ)
    assert T.nnz() == 2
    D = SlipMatrix.from_dense([[1, 2], [3, 4]], Type.INT64)
    assert D.nnz() == 4 and D.kind == Kind.DENSE


def test_check_rejects_bad_pointers():
    with pytest.raises(SlipIncorrectInputError):
        SlipMatrix.from_csc(2, 2, p=[1, 1, 2], i=[0, 1], x=[1, 1], type_=Type.MPZ)
    with pytest.raises(SlipIncorrectInputError):
        SlipMatrix.from_csc(2, 2, p=[0, 2, 1], i=[0, 1], x=[1, 1], type_=Type.MPZ)


def test_check_rejects_out_of_range_index():
    with pytest.raises(SlipIncorrectInputError):
        SlipMatrix.from_csc(2, 2, p=[0, 1, 2], i=[0, 5], x=[1, 1], type_=Type.MPZ)
    with pytest.raises(SlipIncorrectInputError):
        SlipMatrix.from_triplet(2, 2, i=[0, 2], j=[0, 1], x=[1, 1], type_=Type.MPZ)


def test_check_rejects_wrong_value_class():
    with pytest.raises(SlipIncorrectInputError):
        SlipMatrix.from_csc(1, 1, p=[0, 1], i=[0], x=[1.5], type_=Type.MPZ)


def test_scale_must_be_positive():
    A = SlipMatrix.from_dense([[1]], Type.MPZ)
    A.scale = Fraction(-1)
    with pytest.raises(SlipIncorrectInputError):
        A.check()


def test_pretty_print_levels():
    A = SlipMatrix.from_csc(2, 2, p=[0, 1, 2], i=[0, 1], x=[1, 2], type_=Type.MPZ)
    assert "CSC" in A.pretty(1)
    assert "(0,0)" in A.pretty(2)


def test_nnz_per_kind():
    A = SlipMatrix.from_csc(2, 2, p=[0, 1, 2], i=[0, 1], x=[1, 2], type_=Type.MPZ)
    assert A.nnz() == 2
    D = SlipMatrix.from_dense([[1, 0], [0, 1]], Type.MPZ)
    assert D.nnz() == 4  # dense counts all entries, like the reference
