"""Sharded scheduled-sparse path: cross-topology bit parity.

The cyclic block-row sharded sparse kernel must produce the identical
exact solution as the host oracle and the single-chip sparse path on
1/2/4/8 (virtual) devices — SURVEY.md §4(d) for the sparse pipeline.
"""

import numpy as np
import pytest

import jax

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options, Ordering
from slip_lu_tpu.parallel import make_mesh, make_mesh_2d
from slip_lu_tpu.parallel.driver_sparse import factorize_solve_sharded_sparse
from slip_lu_tpu.parallel.schedule_shard import shard_schedule
from slip_lu_tpu.tpu.schedule import build_schedule

from conftest import random_sparse_int


def _system(n, nrhs=1, density=0.3, seed=0):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    return A, b


def _assert_equal(x1, x2):
    for i in range(x1.m):
        for j in range(x1.n):
            assert x1.x[i, j] == x2.x[i, j], (i, j)


@pytest.mark.parametrize("ndev", [
    1, 2, pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow)])
def test_sharded_sparse_matches_oracle(ndev):
    A, b = _system(17, seed=2)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:ndev])
    x_sh = factorize_solve_sharded_sparse(A, analyze(A, opts), b, mesh,
                                          opts)
    _assert_equal(x_host, x_sh)


def test_sharded_sparse_multirhs_amd():
    A, b = _system(12, nrhs=3, seed=7)
    opts = Options(order=Ordering.AMD)
    x_host = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:4])
    _assert_equal(x_host,
                  factorize_solve_sharded_sparse(A, analyze(A, opts), b,
                                                 mesh, opts))


def test_sharded_sparse_cancellation_fallback():
    dense = np.array([[1, 1, 0], [1, 1, 1], [0, 1, 1]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[1], [2], [3]], dtype=object),
                              Type.MPZ)
    opts = Options(order=Ordering.NONE)
    mesh = make_mesh(jax.devices()[:2])
    x = factorize_solve_sharded_sparse(A, analyze(A, opts), b, mesh, opts)
    _assert_equal(backslash(A, b, Type.MPQ, opts), x)


@pytest.mark.parametrize("hosts", [
    2, pytest.param(4, marks=pytest.mark.slow)])
def test_sharded_sparse_dcn_mesh_parity(hosts):
    """2-D (dcn, rows) mesh is bit-identical to 1-D with same device count.

    Models the multi-host topology (SURVEY.md §2.10 / BASELINE config 5):
    the leading 'dcn' axis stands in for the inter-host dimension; row
    ownership is cyclic over the flattened device index, so only the
    collective routing differs from the 1-D mesh.
    """
    A, b = _system(17, seed=2)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh_2d(jax.devices()[:8], hosts=hosts)
    x_sh = factorize_solve_sharded_sparse(A, analyze(A, opts), b, mesh,
                                          opts)
    _assert_equal(x_host, x_sh)


def test_shard_schedule_invariants():
    A, _ = _system(20, seed=9)
    q = analyze(A, Options()).q
    sched, r = build_schedule(A, q)
    for p in (1, 3, 8):
        ss = shard_schedule(sched, p)
        # every slot lives with its row's chip, cyclically
        for t in range(sched.nnz):
            assert ss.slot_chip[t] == int(sched.row_of[t]) % p
        # local slot numbering is dense per chip
        for c in range(p):
            locals_ = sorted(int(ss.slot_local[t])
                             for t in range(sched.nnz)
                             if ss.slot_chip[t] == c)
            assert locals_ == list(range(len(locals_)))
            assert len(locals_) <= ss.e_loc
