"""Native C++ symbolic library vs the pure-Python oracles.

The C++ implementations (native/slip_symbolic.cpp) must produce the exact
permutation the Python fallbacks produce — same greedy minimum-degree
semantics, same tie-breaks — so either backend yields the same pivots and
factors downstream.
"""

import ctypes

import numpy as np
import pytest

from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, Type
from slip_lu_tpu.ordering.amd import amd_order
from slip_lu_tpu.ordering.colamd import colamd_order
from slip_lu_tpu.ordering.native import (_load, amd_order_best,
                                         colamd_order_best, native_available)

from conftest import random_sparse_int

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native library not built")


def _mats(count=6, nmax=40):
    rng = np.random.default_rng(77)
    out = []
    for t in range(count):
        n = int(rng.integers(2, nmax))
        A = random_sparse_int(n, density=float(rng.uniform(0.05, 0.5)),
                              rng=rng)
        out.append(matrix_copy(A, Kind.CSC, Type.MPZ))
    return out


def test_native_amd_matches_python():
    # the LEGACY exact-degree greedy entry point stays bit-identical to
    # the Python oracle (the default amd_order_best now dispatches to
    # the approximate-minimum-degree engine, tested separately in
    # test_ordering_approx.py)
    from slip_lu_tpu.ordering.native import _call_native
    for A in _mats():
        q_native = _call_native("slip_amd_order", A)
        q_py = amd_order(A)
        assert np.array_equal(q_native, q_py), A.n


def test_native_colamd_matches_python():
    from slip_lu_tpu.ordering.native import _call_native
    for A in _mats():
        q_native = _call_native("slip_colamd_order", A)
        q_py = colamd_order(A)
        assert np.array_equal(q_native, q_py), A.n


def test_native_orders_are_permutations():
    for A in _mats(3):
        for q in (amd_order_best(A), colamd_order_best(A)):
            assert sorted(int(v) for v in q) == list(range(A.n))


def test_native_etree_postorder():
    lib = _load()
    lib.slip_col_etree.restype = ctypes.c_int
    lib.slip_postorder.restype = ctypes.c_int
    for A in _mats(4):
        n = A.n
        p = np.ascontiguousarray(A.p, dtype=np.int64)
        i = np.ascontiguousarray(A.i[: int(A.p[n])], dtype=np.int64)
        parent = np.zeros(n, dtype=np.int64)
        rc = lib.slip_col_etree(
            ctypes.c_int64(A.m), ctypes.c_int64(n),
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        assert rc == 0
        # parent is a forest: parent[j] > j or -1
        for j in range(n):
            assert parent[j] == -1 or parent[j] > j
        post = np.zeros(n, dtype=np.int64)
        rc = lib.slip_postorder(
            ctypes.c_int64(n),
            parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            post.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        assert rc == 0
        assert sorted(int(v) for v in post) == list(range(n))
        # children precede parents in a postorder
        pos = np.empty(n, dtype=np.int64)
        pos[post] = np.arange(n)
        for j in range(n):
            if parent[j] != -1:
                assert pos[j] < pos[parent[j]]
