"""Fused Pallas sparse path: exact parity with the host oracle.

Runs in interpreter mode on CPU (the kernels compile to Mosaic on real
TPU; bit-parity there is asserted by the bench/driver runs).
"""

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.errors import SlipSingularError
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options, Ordering
from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused

from conftest import random_sparse_int


def _system(n, nrhs=1, density=0.3, seed=0, lo=-9, hi=10):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(lo, hi)) for _ in range(nrhs)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    return A, b


@pytest.mark.parametrize("n,H,C1,C2,nrhs,seed", [
    (7, 2, 4, 8, 1, 1),
    (15, 4, 8, 16, 1, 2),
    pytest.param(24, 8, 16, 32, 2, 3, marks=pytest.mark.slow),
    pytest.param(40, 8, 32, 64, 1, 4, marks=pytest.mark.slow),
])
def test_fused_matches_oracle(n, H, C1, C2, nrhs, seed):
    A, b = _system(n, nrhs=nrhs, seed=seed)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    x_f = factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                    heads_per_chunk=H, pass1_events=C1,
                                    pass2_events=C2)
    for i in range(n):
        for c in range(nrhs):
            assert x_f.x[i, c] == x_host.x[i, c], (i, c)


@pytest.mark.slow
def test_fused_widen_retry_with_clamp():
    """max_limbs clamps below the true width: the widen ladder must
    converge to the exact answer (overflow flags, never wrong bits)."""
    A, b = _system(10, seed=5, lo=-10**6, hi=10**6)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    xs = factorize_solve_tpu_fused(A, analyze(A, Options(max_limbs=2)), b,
                                   Options(max_limbs=2),
                                   heads_per_chunk=4,
                                   pass1_events=8, pass2_events=16)
    for i in range(10):
        assert xs.x[i, 0] == x_host.x[i, 0], i


def test_fused_cancellation_falls_back():
    """Exact cancellation of a scheduled pivot falls back cleanly."""
    dense = np.array([[1, 1, 0], [1, 1, 1], [0, 1, 1]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[1], [2], [3]], dtype=object),
                              Type.MPZ)
    opts = Options(order=Ordering.NONE)
    x = factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                  heads_per_chunk=2, pass1_events=4,
                                  pass2_events=8)
    x_host = backslash(A, b, Type.MPQ, opts)
    for i in range(3):
        assert x.x[i, 0] == x_host.x[i, 0]


def test_fused_singular_raises():
    dense = np.array([[1, 2], [2, 4]], dtype=object)
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(np.array([[1], [1]], dtype=object),
                              Type.MPZ)
    opts = Options()
    with pytest.raises(SlipSingularError):
        factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                  heads_per_chunk=2, pass1_events=4,
                                  pass2_events=8)


@pytest.mark.slow
def test_fused_corpus_grid8():
    from slip_lu_tpu.io import read_dense, read_triplet
    A = matrix_copy(read_triplet("data/ExampleMats/grid8_mat.txt"),
                    Kind.CSC, Type.MPZ)
    b = read_dense("data/ExampleMats/grid8_v.txt")
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    x_f = factorize_solve_tpu_fused(A, analyze(A, opts), b, opts)
    for i in range(A.n):
        assert x_f.x[i, 0] == x_host.x[i, 0], i


def test_fused_2adically_deep_pivots_climb_not_sing():
    """Pivot sequences divisible by huge powers of two have residues
    that are EXACTLY ZERO at narrow limb widths for many consecutive
    rungs (diag(3*2^16): rho_k = 3^k * 2^(16k)). The ladder must treat
    sing-with-overflow as inconclusive and climb to a width where the
    residues are faithful — never declare singular, never fall back
    (regression: a 'sing that survives two rungs is genuine' shortcut
    mis-solved tri1000 into the dense fallback)."""
    from slip_lu_tpu.stats import last_stats
    n = 12
    dense = np.zeros((n, n), dtype=object)
    for i in range(n):
        dense[i, i] = 3 * 2**16
    A = matrix_copy(SlipMatrix.from_dense(dense, Type.MPZ),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[i + 1] for i in range(n)], dtype=object), Type.MPZ)
    opts = Options()
    x = factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                  heads_per_chunk=4, pass1_events=8,
                                  pass2_events=16)
    st = last_stats()
    assert st.backend == "tpu-fused" and not st.fallback
    assert st.retries >= 1
    x_host = backslash(A, b, Type.MPQ, opts)
    for i in range(n):
        assert x.x[i, 0] == x_host.x[i, 0], i


def test_fused_packed_tables_matches_oracle(monkeypatch, rng):
    """Packed-tables mode (one [n8, 128] rho table — the large-n path
    that fits 100K-row tables in VMEM) forced via SLIP_TPK_BUDGET on a
    small system: exact parity with the host oracle, single-segment."""
    monkeypatch.setenv("SLIP_TPK_BUDGET", "1000")
    n = 14
    A = matrix_copy(random_sparse_int(n, density=0.4, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 10))] for _ in range(n)],
                 dtype=object), Type.MPZ)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    x = factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                  heads_per_chunk=2, pass1_events=8,
                                  pass2_events=16)
    for i in range(n):
        assert x.x[i, 0] == x_host.x[i, 0], i


def test_fused_packed_tables_multirhs_and_widths(monkeypatch, rng):
    """Packed mode with several RHS columns (sequential, rhs-lane
    batching is disabled there) and 10^6-scale entries (wider W8/WI8
    still fitting one packed row)."""
    monkeypatch.setenv("SLIP_TPK_BUDGET", "1000")
    n = 8
    A = matrix_copy(random_sparse_int(n, density=0.5, lo=-10**4,
                                      hi=10**4, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 10)) for _ in range(2)]
                  for _ in range(n)], dtype=object), Type.MPZ)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    x = factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                  heads_per_chunk=2, pass1_events=8,
                                  pass2_events=16)
    for i in range(n):
        for c in range(2):
            assert x.x[i, c] == x_host.x[i, c], (i, c)
