"""Tcov-style overflow-injection sweep (SURVEY.md §4 carry-over (c)).

The reference's Tcov harness fails the Nth allocation for every N and
asserts every failure path returns SLIP_OUT_OF_MEMORY cleanly. The
TPU analogue: clamp the limb budget (Options.max_limbs) to every value
from "certainly too small" upward, across every device backend, and
assert each run either converges to the bit-exact answer through the
widen-and-retry ladder or raises a clean SlipLimbOverflowError — NEVER
a wrong answer. The clamp forces the overflow flag at every pipeline
stage the ladder passes through, so all overflow-detection sites fire.

The fused backend runs Pallas kernels in interpreter mode on CPU, which
is orders of magnitude slower than the XLA paths — its sweep uses the
smallest systems that still overflow at every clamp.

Reference behavior anchored: SLIP_LU/Tcov malloc_count brutal test
(SURVEY.md §2.8), SLIP_gmp.c setjmp/longjmp recovery (§2.1).
"""

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.errors import SlipLimbOverflowError
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options

from conftest import random_sparse_int


def _system(n, seed, lo, hi, density=0.5):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=density, lo=lo, hi=hi,
                                      rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(lo, hi))] for _ in range(n)],
                 dtype=object), Type.MPZ)
    return A, b


def _assert_exact_or_clean(backend, max_limbs, A, b, x_ref):
    opts = Options(max_limbs=max_limbs)
    try:
        x = backslash(A, b, Type.MPQ, opts, backend=backend)
    except SlipLimbOverflowError:
        return  # clean refusal is an allowed outcome — never wrong bits
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], (backend, max_limbs, i)


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["tpu", "tpu-sparse"])
@pytest.mark.parametrize("max_limbs", [2, 3, 4, 6])
def test_overflow_injection_sweep_xla(backend, max_limbs):
    """XLA device paths: every clamp level must be exact or refuse."""
    A, b = _system(9, seed=31, lo=-10**7, hi=10**7)
    x_ref = backslash(A, b, Type.MPQ, Options())
    _assert_exact_or_clean(backend, max_limbs, A, b, x_ref)


@pytest.mark.slow
@pytest.mark.parametrize("max_limbs", [2, 4])
def test_overflow_injection_sweep_fused(max_limbs):
    """Fused Pallas path (interpreter on CPU): small system, same law."""
    A, b = _system(5, seed=13, lo=-10**5, hi=10**5)
    x_ref = backslash(A, b, Type.MPQ, Options())
    _assert_exact_or_clean("tpu-fused", max_limbs, A, b, x_ref)


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["tpu", "tpu-sparse"])
def test_overflow_injection_huge_entries(backend):
    """10^15-scale entries with a tight clamp: the ladder must cross
    several overflow-flag generations and still land bit-exact."""
    A, b = _system(6, seed=77, lo=-10**15, hi=10**15)
    x_ref = backslash(A, b, Type.MPQ, Options())
    _assert_exact_or_clean(backend, 4, A, b, x_ref)


def test_optimistic_width_ladder_fused():
    """No clamp: the fused path's optimistic start must converge via
    widen-and-retry and cache the converged widths on the Analysis."""
    from slip_lu_tpu.stats import last_stats
    from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused

    A, b = _system(6, seed=5, lo=-10**6, hi=10**6)
    opts = Options()
    ana = analyze(A, opts)
    x_ref = backslash(A, b, Type.MPQ, opts)
    x = factorize_solve_tpu_fused(A, ana, b, opts)
    assert all(x.x[i, 0] == x_ref.x[i, 0] for i in range(A.n))
    assert getattr(ana, "fused_width_cache", None) is not None
    x2 = factorize_solve_tpu_fused(A, ana, b, opts)
    assert last_stats().retries == 0  # warm solve pays zero retries
    assert all(x2.x[i, 0] == x_ref.x[i, 0] for i in range(A.n))


def test_overflow_injection_quick():
    """Fast default-gate version of the sweep: one clamp, one backend."""
    A, b = _system(7, seed=31, lo=-10**5, hi=10**5)
    x_ref = backslash(A, b, Type.MPQ, Options())
    _assert_exact_or_clean("tpu-sparse", 3, A, b, x_ref)
