"""Batched pattern-sharing solves (the data-parallel axis, SURVEY §2.10)."""

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.errors import SlipIncorrectInputError
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.tpu.backslash_sparse import factorize_solve_tpu_sparse_many


def _family(nb=4, n=10, seed=3):
    """nb matrices sharing one pattern, different values, plus RHS."""
    rng = np.random.default_rng(seed)
    pattern = np.zeros((n, n), dtype=bool)
    for r in range(n):
        for c in range(n):
            if rng.random() < 0.3:
                pattern[r, c] = True
        pattern[r, r] = True
    As, bs = [], []
    for t in range(nb):
        d = np.zeros((n, n), dtype=object)
        for r in range(n):
            for c in range(n):
                if pattern[r, c]:
                    # nonzero everywhere so the CSC pattern is identical
                    d[r, c] = int(rng.integers(1, 10)) * \
                        (1 if rng.random() < 0.5 else -1)
        As.append(matrix_copy(SlipMatrix.from_dense(d, Type.MPZ),
                              Kind.CSC, Type.MPZ))
        bs.append(SlipMatrix.from_dense(
            np.array([[int(rng.integers(-5, 6))] for _ in range(n)],
                     dtype=object), Type.MPZ))
    return As, bs


def test_batch_matches_individual_solves():
    As, bs = _family()
    opts = Options()
    ana = analyze(As[0], opts)
    xs = factorize_solve_tpu_sparse_many(As, ana, bs, opts)
    for A, b, x in zip(As, bs, xs):
        x_host = backslash(A, b, Type.MPQ, opts)
        for i in range(A.n):
            assert x.x[i, 0] == x_host.x[i, 0]


def test_batch_member_with_zero_pivot_falls_back():
    As, bs = _family(nb=3, n=6, seed=11)
    # zero one member's stored entries (pattern unchanged) while keeping
    # it nonsingular — the batch must still produce its exact solution
    # (via the per-member solo fallback if a scheduled pivot cancels)
    from slip_lu_tpu.factorize import factorize
    n = 6
    A2 = As[1]
    nz = int(A2.p[n])
    opts = Options()
    for t in range(nz):
        old = A2.x[t]
        if old == 0:
            continue
        A2.x[t] = 0
        try:
            factorize(A2, analyze(A2, opts), opts)
        except Exception:
            A2.x[t] = old          # keep the member nonsingular
    ana = analyze(As[0], opts)
    xs = factorize_solve_tpu_sparse_many(As, ana, bs, opts)
    for A, b, x in zip(As, bs, xs):
        x_host = backslash(A, b, Type.MPQ, opts)
        for i in range(n):
            assert x.x[i, 0] == x_host.x[i, 0]


def test_batch_rejects_mismatched_patterns():
    As, bs = _family(nb=2, n=5, seed=5)
    Bs, _ = _family(nb=1, n=5, seed=6)
    with pytest.raises(SlipIncorrectInputError):
        factorize_solve_tpu_sparse_many([As[0], Bs[0]],
                                        analyze(As[0], Options()),
                                        bs, Options())


# ---------------------- fused-path batching -------------------------------

from slip_lu_tpu.tpu.backslash_fused import factorize_solve_tpu_fused_many


def test_fused_batch_matches_individual_solves():
    As, bs = _family(nb=3, n=8, seed=4)
    opts = Options()
    ana = analyze(As[0], opts)
    xs = factorize_solve_tpu_fused_many(As, ana, bs, opts,
                                        heads_per_chunk=2,
                                        pass1_events=8, pass2_events=16)
    for A, b, x in zip(As, bs, xs):
        x_host = backslash(A, b, Type.MPQ, opts)
        for i in range(A.n):
            assert x.x[i, 0] == x_host.x[i, 0]


@pytest.mark.slow
def test_fused_batch_multi_rhs_and_widths():
    """Members with very different magnitudes share one (max) width."""
    As, bs = _family(nb=3, n=8, seed=9)
    n = 8
    rng = np.random.default_rng(1)
    for t in range(int(As[2].p[n])):
        if As[2].x[t] != 0:
            As[2].x[t] = int(As[2].x[t]) * 10**6
    bs = [SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6)) for _ in range(2)]
                  for _ in range(n)], dtype=object), Type.MPZ)
        for _ in range(3)]
    opts = Options()
    ana = analyze(As[0], opts)
    xs = factorize_solve_tpu_fused_many(As, ana, bs, opts,
                                        heads_per_chunk=2,
                                        pass1_events=8, pass2_events=16)
    for A, b, x in zip(As, bs, xs):
        x_host = backslash(A, b, Type.MPQ, opts)
        for i in range(n):
            for c in range(2):
                assert x.x[i, c] == x_host.x[i, c]


@pytest.mark.slow
def test_fused_batch_member_with_zero_pivot_falls_back():
    As, bs = _family(nb=3, n=6, seed=11)
    from slip_lu_tpu.factorize import factorize
    n = 6
    A2 = As[1]
    opts = Options()
    for t in range(int(A2.p[n])):
        old = A2.x[t]
        if old == 0:
            continue
        A2.x[t] = 0
        try:
            factorize(A2, analyze(A2, opts), opts)
        except Exception:
            A2.x[t] = old
    ana = analyze(As[0], opts)
    xs = factorize_solve_tpu_fused_many(As, ana, bs, opts,
                                        heads_per_chunk=2,
                                        pass1_events=8, pass2_events=16)
    for A, b, x in zip(As, bs, xs):
        x_host = backslash(A, b, Type.MPQ, opts)
        for i in range(n):
            assert x.x[i, 0] == x_host.x[i, 0]


def test_fused_batch_rejects_mismatched_patterns():
    As, bs = _family(nb=2, n=5, seed=5)
    Bs, _ = _family(nb=1, n=5, seed=6)
    with pytest.raises(SlipIncorrectInputError):
        factorize_solve_tpu_fused_many([As[0], Bs[0]],
                                       analyze(As[0], Options()),
                                       bs, Options())


def test_fused_batch_groups_and_padding(monkeypatch):
    """A family larger than the lane-group budget splits into groups
    (member-lane batching pads each group to a multiple of 8)."""
    monkeypatch.setenv("SLIP_FUSED_GMAX", "8")
    As, bs = _family(nb=10, n=6, seed=21)
    opts = Options()
    ana = analyze(As[0], opts)
    xs = factorize_solve_tpu_fused_many(As, ana, bs, opts,
                                        heads_per_chunk=2,
                                        pass1_events=8, pass2_events=16)
    for A, b, x in zip(As, bs, xs):
        x_host = backslash(A, b, Type.MPQ, opts)
        for i in range(A.n):
            assert x.x[i, 0] == x_host.x[i, 0]


def test_fused_batch_hbm_family_falls_back_sequential(monkeypatch):
    """Member-lane batching is all-VMEM: a family whose G-member value
    table would need HBM residency must fall back to per-member solves
    (still exact)."""
    from slip_lu_tpu.tpu import backslash_fused as bf
    monkeypatch.setattr(bf, "val_table_in_hbm", lambda E8, W8: True)
    As, bs = _family(nb=2, n=6, seed=31)
    opts = Options()
    ana = analyze(As[0], opts)
    xs = factorize_solve_tpu_fused_many(As, ana, bs, opts,
                                        heads_per_chunk=2,
                                        pass1_events=8, pass2_events=16)
    for A, b, x in zip(As, bs, xs):
        x_host = backslash(A, b, Type.MPQ, opts)
        for i in range(A.n):
            assert x.x[i, 0] == x_host.x[i, 0]
