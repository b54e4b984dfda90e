"""Cross-topology parity tests for the block-row sharded path.

SURVEY.md §4 carry-over (d): the same corpus must produce bit-identical
exact solutions on 1, 2, 4, 8 (virtual) devices. Integer arithmetic is
associative, so parity is achievable by construction — these tests guard
the implementation, not the math.
"""

import numpy as np
import pytest

import jax

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options, Ordering, Pivot
from slip_lu_tpu.parallel import make_mesh, pad_to_multiple
from slip_lu_tpu.parallel.driver import factorize_solve_sharded

from conftest import random_sparse_int


def _random_system(n, nrhs=1, density=0.4, seed=0):
    rng = np.random.default_rng(seed)
    A = random_sparse_int(n, density=density, rng=rng)
    A = matrix_copy(A, Kind.CSC, Type.MPZ)
    bdense = np.array([[int(rng.integers(-5, 6)) for _ in range(nrhs)]
                       for _ in range(n)], dtype=object)
    b = SlipMatrix.from_dense(bdense, Type.MPZ)
    return A, b


def _assert_equal(x1, x2):
    assert x1.m == x2.m and x1.n == x2.n
    for i in range(x1.m):
        for j in range(x1.n):
            assert x1.x[i, j] == x2.x[i, j], (i, j)


@pytest.mark.parametrize("ndev", [
    1, 2, pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow)])
def test_sharded_matches_host_oracle(ndev):
    A, b = _random_system(11, seed=3)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:ndev])
    x_shard = factorize_solve_sharded(A, analyze(A, opts), b, mesh, opts)
    _assert_equal(x_host, x_shard)


@pytest.mark.parametrize("pivot", [
    p if p.name in ("SMALLEST", "DIAGONAL")
    else pytest.param(p, marks=pytest.mark.slow) for p in Pivot])
def test_sharded_all_pivot_schemes(pivot):
    A, b = _random_system(9, seed=11)
    opts = Options(pivot=pivot)
    x_host = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:4])
    x_shard = factorize_solve_sharded(A, analyze(A, opts), b, mesh, opts)
    _assert_equal(x_host, x_shard)


@pytest.mark.parametrize("order", [Ordering.NONE, Ordering.COLAMD,
                                   Ordering.AMD])
def test_sharded_orderings(order):
    A, b = _random_system(10, seed=5)
    opts = Options(order=order)
    x_host = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:8])
    x_shard = factorize_solve_sharded(A, analyze(A, opts), b, mesh, opts)
    _assert_equal(x_host, x_shard)


def test_sharded_multirhs():
    A, b = _random_system(8, nrhs=3, seed=9)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:8])
    x_shard = factorize_solve_sharded(A, analyze(A, opts), b, mesh, opts)
    _assert_equal(x_host, x_shard)


def test_sharded_exact_divisible_n():
    # n == multiple of device count: no padding path
    A, b = _random_system(8, seed=21)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:4])
    x_shard = factorize_solve_sharded(A, analyze(A, opts), b, mesh, opts)
    _assert_equal(x_host, x_shard)


def test_pad_to_multiple_identity_block():
    S = np.array([[1, -1], [0, 1]], dtype=np.int32)
    M = np.zeros((2, 2, 2), dtype=np.int32)
    M[S != 0, 0] = 1
    q = np.arange(2, dtype=np.int32)
    S2, M2, q2, n_pad = pad_to_multiple(S, M, q, 8)
    assert n_pad == 8
    assert S2.shape == (8, 8) and M2.shape == (8, 8, 2)
    # identity block on the diagonal of the extension
    for t in range(2, 8):
        assert S2[t, t] == 1 and M2[t, t, 0] == 1
        assert S2[t, :2].sum() == 0 == S2[:2, t].sum()
    assert list(q2) == [0, 1, 2, 3, 4, 5, 6, 7]
