"""Triplet/dense text I/O tests (reference format: ExampleMats, Demo readers)."""

import io
from fractions import Fraction

import numpy as np
import pytest

from slip_lu_tpu import (Kind, Options, SlipMatrix, Type, backslash,
                         matrix_copy, read_dense, read_triplet, write_dense,
                         write_triplet)
from slip_lu_tpu.errors import SlipIncorrectInputError


TRIPLET_1BASED = """3 3 4
1 1 5
3 1 -2
2 2 7
3 3 4
"""

DENSE_TXT = """3 1
1
-2
3
"""


def test_read_triplet_one_based():
    A = read_triplet(io.StringIO(TRIPLET_1BASED))
    assert A.kind == Kind.CSC and A.type == Type.MPZ
    assert A.shape == (3, 3) and A.nnz() == 4
    D = matrix_copy(A, Kind.DENSE, Type.MPZ)
    assert D.x[0, 0] == 5 and D.x[2, 0] == -2 and D.x[1, 1] == 7


def test_read_triplet_zero_based_autodetect():
    txt = "2 2 2\n0 0 4\n1 1 6\n"
    A = read_triplet(io.StringIO(txt))
    D = matrix_copy(A, Kind.DENSE, Type.MPZ)
    assert D.x[0, 0] == 4 and D.x[1, 1] == 6


def test_read_dense():
    b = read_dense(io.StringIO(DENSE_TXT))
    assert b.shape == (3, 1)
    assert b.x[1, 0] == -2


def test_read_rational_values():
    txt = "1 1 1\n1 1 3/7\n"
    A = read_triplet(io.StringIO(txt))
    assert A.type == Type.MPQ
    assert A.x[0] == Fraction(3, 7)


def test_read_float_values():
    txt = "1 1 1\n1 1 2.5\n"
    A = read_triplet(io.StringIO(txt))
    assert A.type == Type.FP64


def test_roundtrip_files(tmp_path):
    A = SlipMatrix.from_dense([[3, 0], [1, 9]], Type.MPZ)
    b = SlipMatrix.from_dense([[1], [2]], Type.MPZ)
    write_triplet(A, str(tmp_path / "a.txt"))
    write_dense(b, str(tmp_path / "b.txt"))
    A2 = read_triplet(str(tmp_path / "a.txt"))
    b2 = read_dense(str(tmp_path / "b.txt"))
    x = backslash(A2, b2, Type.MPQ, Options(check=True))
    assert x.x[0, 0] == Fraction(1, 3)


def test_bad_header_raises():
    with pytest.raises(SlipIncorrectInputError):
        read_triplet(io.StringIO("3 3\n"))
    with pytest.raises(SlipIncorrectInputError):
        read_dense(io.StringIO(""))


def test_truncated_body_raises():
    with pytest.raises(SlipIncorrectInputError):
        read_triplet(io.StringIO("2 2 3\n1 1 1\n"))
