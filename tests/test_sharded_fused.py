"""Sharded FUSED exact solve (the flagship path, multi-chip form).

Runs the chip-partitioned chunk streams + sharded superstep scan on the
virtual CPU mesh (conftest forces 8 host devices) and asserts exact
parity with the host oracle — and bit-identical solutions across device
counts (integer collectives; SURVEY §4 carry-over (d)).
"""

import numpy as np
import pytest

import jax

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.parallel import make_mesh
from slip_lu_tpu.parallel.driver_fused import (
    factorize_solve_fused_sharded)
from slip_lu_tpu.solve import check_solution

from conftest import random_sparse_int


# small chunk capacities keep the interpret-mode kernel traces (the
# dominant cost of these tests) an order of magnitude smaller
CAPS = dict(heads_per_chunk=2, pass1_events=8, pass2_events=16)


def _sys(n, seed, density=0.35, lohi=9, nrhs=1):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, lo=-lohi,
                                      hi=lohi, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-lohi, lohi + 1))
                   for _ in range(nrhs)] for _ in range(n)],
                 dtype=object), Type.MPZ)
    return A, b


@pytest.mark.parametrize("ndev", [
    1, 2, pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow)])
def test_sharded_fused_matches_oracle(ndev):
    A, b = _sys(14, seed=5)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:ndev])
    x = factorize_solve_fused_sharded(A, analyze(A, opts), b, mesh,
                                      opts, **CAPS)
    check_solution(A, x, b)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i


def test_sharded_fused_bit_identical_across_topologies():
    A, b = _sys(16, seed=11, nrhs=2)
    opts = Options()
    sols = []
    for ndev in (1, 3):
        mesh = make_mesh(jax.devices()[:ndev])
        x = factorize_solve_fused_sharded(A, analyze(A, opts), b,
                                          mesh, opts, **CAPS)
        sols.append(x)
    x_ref = backslash(A, b, Type.MPQ, opts)
    for x in sols:
        for i in range(A.n):
            for c in range(2):
                assert x.x[i, c] == x_ref.x[i, c], (i, c)


@pytest.mark.slow
def test_sharded_fused_wide_entries_ladder():
    """10^9-scale entries force the widen-and-retry ladder through the
    sharded program."""
    A, b = _sys(12, seed=3, lohi=10**9)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:2])
    x = factorize_solve_fused_sharded(A, analyze(A, opts), b, mesh,
                                      opts, **CAPS)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i


def test_sharded_fused_cancellation_falls_back():
    """A matrix whose transversal-diagonal pivot cancels exactly must
    still solve exactly (single-chip replan fallback)."""
    dense = np.array([[2, 1, 0, 3],
                      [4, 2, 1, 0],   # 2x2 leading minor = 0
                      [0, 1, 5, 1],
                      [3, 0, 1, 4]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[1], [2], [3], [4]],
                                       dtype=object), Type.MPZ)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:2])
    x = factorize_solve_fused_sharded(A, analyze(A, opts), b, mesh,
                                      opts, **CAPS)
    for i in range(4):
        assert x.x[i, 0] == x_ref.x[i, 0], i


def test_sharded_fused_runs_sharded_not_fallback():
    """Regression guard: the sharded program must produce its result
    itself — garbage flags (e.g. an event-layout mismatch) would
    silently reroute every solve through the single-chip fallback and
    still pass parity."""
    from slip_lu_tpu.stats import last_stats
    A, b = _sys(12, seed=9)
    opts = Options()
    mesh = make_mesh(jax.devices()[:2])
    x = factorize_solve_fused_sharded(A, analyze(A, opts), b, mesh,
                                      opts, **CAPS)
    st = last_stats()
    assert st.backend == "tpu-fused-sharded", st.backend
    assert not st.fallback
    check_solution(A, x, b)


def test_sharded_fused_midsize_parity_2dev():
    """Mid-size fast-tier guard (round-4 verdict weak #7): a system
    large enough for real broadcast-capacity pressure (bc_capacity an
    order of magnitude above the n=16 cases), 2 devices, exact oracle
    parity. Catches partition/broadcast-capacity regressions the toy
    sizes cannot."""
    A, b = _sys(100, seed=23, density=0.06)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:2])
    x = factorize_solve_fused_sharded(
        A, analyze(A, opts), b, mesh, opts,
        heads_per_chunk=4, pass1_events=32, pass2_events=64)
    check_solution(A, x, b)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i


@pytest.mark.slow
def test_sharded_fused_wide_ladder_4dev():
    """Widen-and-retry on 4 devices (round-4 verdict: the ladder was
    only exercised at 2)."""
    A, b = _sys(20, seed=31, lohi=10**9)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:4])
    x = factorize_solve_fused_sharded(A, analyze(A, opts), b, mesh,
                                      opts, **CAPS)
    check_solution(A, x, b)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i
