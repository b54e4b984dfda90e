"""Scale-regime tests (BASELINE config 3: ~100K-1M nnz).

The 1M-nnz corpus member is too big to commit (13MB of text); the slow
tier regenerates it deterministically (tools/gen_large_mats.emit_1m) and
solves it with the host oracle, verifying with the exact rational check
(the reference's slip_check_solution.c — A @ x == b term by term, no
tolerances). The fused-path 1M timing runs on real hardware via
`python tools/time_fused.py uni1m fused` and is recorded in ROADMAP.md.
"""

import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


@pytest.mark.slow
def test_uni1m_exact_solve_host():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from gen_large_mats import OUT, emit_1m
    emit_1m()

    from slip_lu_tpu import (Kind, Options, Type, analyze, factorize,
                             matrix_copy, read_dense, read_triplet,
                             solve)
    from slip_lu_tpu.options import Ordering
    from slip_lu_tpu.solve import check_solution

    A = matrix_copy(read_triplet(os.path.join(OUT, "uni1m_mat.txt")),
                    Kind.CSC, Type.MPZ)
    b = read_dense(os.path.join(OUT, "uni1m_v.txt"))
    assert int(A.p[A.n]) >= 900_000, "corpus member must be ~1M nnz"
    # the member is BUILT for the natural order (every pivot exactly 1,
    # banded fill — gen_large_mats docstring); fill-reducing orderings
    # destroy that structure and push the solve to hours
    opts = Options(order=Ordering.NONE)
    F = factorize(A, analyze(A, opts), opts)
    x = solve(F, b, opts)
    check_solution(A, x, b)
