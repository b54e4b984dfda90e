"""pivot_exact: reference pivot-scheme semantics on the SCHEDULED
device paths.

With Options(pivot_exact=True) the fused / sparse / sharded backends
run the reference pivot search once on host (slip_get_pivot.c dispatch
inside factorize) and pin the chosen row sequence into the static
schedule — so options.pivot (all 6 schemes) is honored exactly where
it was previously a documented no-op (USERGUIDE "Pivoting semantics by
backend").
"""

import numpy as np
import pytest

import jax

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.factorize import factorize
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options, Pivot
from slip_lu_tpu.solve import check_solution

from conftest import random_sparse_int


def _sys(n, seed, density=0.25, nrhs=1):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 10)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    return A, b


@pytest.mark.parametrize("scheme", [
    Pivot.SMALLEST, Pivot.LARGEST, Pivot.FIRST_NONZERO])
def test_fused_pivot_exact_pins_scheme_rows(scheme):
    """The pinned sequence IS the host scheme's row_perm, and the
    fused solve is bit-exact."""
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
    A, b = _sys(18, seed=3)
    opts = Options(pivot=scheme, pivot_exact=True)
    ana = analyze(A, opts)
    F = factorize(A, ana, opts)
    x = factorize_solve_tpu_fused(A, ana, b, opts)
    assert ana.sparse_fixed_r is not None
    assert list(map(int, ana.sparse_fixed_r)) == \
        list(map(int, F.row_perm))
    check_solution(A, x, b)
    x_ref = backslash(A, b, Type.MPQ, opts)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i


def test_pivot_exact_differs_from_transversal():
    """On a matrix where LARGEST picks different rows than the
    zero-free transversal, pivot_exact actually changes the pinned
    sequence (guards against the hook silently not firing)."""
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
    found = False
    for seed in range(12):
        A, b = _sys(16, seed=seed)
        o_l = Options(pivot=Pivot.LARGEST, pivot_exact=True)
        ana_l = analyze(A, o_l)
        try:
            factorize_solve_tpu_fused(A, ana_l, b, o_l)
        except Exception:
            continue
        ana_t = analyze(A, Options())
        factorize_solve_tpu_fused(A, ana_t, b, Options())
        pinned = list(map(int, ana_l.sparse_fixed_r))
        if ana_t.sparse_fixed_r is None \
                or list(map(int, ana_t.sparse_fixed_r)) != pinned:
            found = True
            break
    assert found, "LARGEST never deviated from the transversal"


def test_pivot_exact_retags_on_scheme_change():
    """Same Analysis, new scheme: the pin must be recomputed."""
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused
    A, b = _sys(16, seed=4)
    ana = analyze(A, Options())
    o1 = Options(pivot=Pivot.SMALLEST, pivot_exact=True)
    x1 = factorize_solve_tpu_fused(A, ana, b, o1)
    pin1 = list(map(int, ana.sparse_fixed_r))
    F1 = factorize(A, ana, o1)
    assert pin1 == list(map(int, F1.row_perm))
    o2 = Options(pivot=Pivot.LARGEST, pivot_exact=True)
    x2 = factorize_solve_tpu_fused(A, ana, b, o2)
    F2 = factorize(A, ana, o2)
    assert list(map(int, ana.sparse_fixed_r)) == \
        list(map(int, F2.row_perm))
    for i in range(A.n):
        assert x1.x[i, 0] == x2.x[i, 0], i   # same exact solution


def test_sparse_pivot_exact_parity():
    from slip_lu_tpu.tpu.backslash_sparse import (
        factorize_solve_tpu_sparse)
    A, b = _sys(14, seed=6)
    opts = Options(pivot=Pivot.LARGEST, pivot_exact=True)
    ana = analyze(A, opts)
    x = factorize_solve_tpu_sparse(A, ana, b, opts)
    check_solution(A, x, b)
    x_ref = backslash(A, b, Type.MPQ, opts)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i


def test_sharded_fused_pivot_exact_parity():
    from slip_lu_tpu.parallel import make_mesh
    from slip_lu_tpu.parallel.driver_fused import (
        factorize_solve_fused_sharded)
    A, b = _sys(14, seed=5)
    opts = Options(pivot=Pivot.SMALLEST, pivot_exact=True)
    ana = analyze(A, opts)
    mesh = make_mesh(jax.devices()[:2])
    x = factorize_solve_fused_sharded(A, ana, b, mesh, opts,
                                      heads_per_chunk=2,
                                      pass1_events=8, pass2_events=16)
    assert ana.sparse_fixed_r is not None
    check_solution(A, x, b)
    x_ref = backslash(A, b, Type.MPQ, opts)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i
