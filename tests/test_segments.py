"""Adaptive-width segments of the fused factor stream.

The planner only segments above real-size thresholds (W >= 32 limbs,
nc >= 16 chunks), so these tests force multi-segment plans on small
matrices by patching plan_segments — exercising the boundary glue
(value/SMT sign-extension, GT Hensel re-lift) and the per-segment
widen-and-retry ladder in interpreter mode.
"""

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.backslash import backslash
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.tpu import backslash_fused as bf

from conftest import random_sparse_int


def _force_split(parts):
    """plan_segments replacement: split chunks into `parts` equal ranges
    with widths climbing to the full W8 (first ranges intentionally
    narrow, so the per-segment ladder must widen them if undersized)."""
    def plan(max_level, n, W, Wmin):
        nc = len(max_level)
        W8 = bf._r8(W)
        if nc < parts:
            return [[0, nc, W8]]
        segs = []
        for s in range(parts):
            lo = nc * s // parts
            hi = nc * (s + 1) // parts
            w = max(bf._r8(max(Wmin, W8 * (s + 1) // parts)), 8)
            segs.append([lo, hi, min(w, W8)])
        segs[-1][2] = W8
        return segs
    return plan


@pytest.mark.parametrize("n,parts,seed,lohi", [
    (12, 2, 3, 9),
    # wide entries: the boundary relift does real work
    pytest.param(16, 3, 7, 10**6, marks=pytest.mark.slow),
    pytest.param(24, 4, 11, 10**9, marks=pytest.mark.slow),
])
def test_forced_segments_match_oracle(monkeypatch, n, parts, seed, lohi):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=0.4, lo=-lohi,
                                      hi=lohi, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-lohi, lohi))] for _ in range(n)],
                 dtype=object), Type.MPZ)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    monkeypatch.setattr(bf, "plan_segments", _force_split(parts))
    x = bf.factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                     heads_per_chunk=2, pass1_events=8,
                                     pass2_events=16)
    for i in range(n):
        assert x.x[i, 0] == x_host.x[i, 0], i


@pytest.mark.slow
def test_forced_segments_undersized_inner(monkeypatch):
    """Inner segment starts at the 8-limb floor with 10^6-scale entries:
    the first segment MUST overflow and the per-segment ladder must
    converge to the exact answer (never wrong bits)."""
    n = 10
    rng = np.random.default_rng(21)
    A = matrix_copy(random_sparse_int(n, density=0.6, lo=-10**6,
                                      hi=10**6, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[1] for _ in range(n)], dtype=object), Type.MPZ)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)

    def plan(max_level, n_, W, Wmin):
        nc = len(max_level)
        W8 = bf._r8(W)
        mid = max(1, nc // 2)
        return [[0, mid, bf._r8(Wmin)], [mid, nc, W8]]

    monkeypatch.setattr(bf, "plan_segments", plan)
    x = bf.factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                     heads_per_chunk=2, pass1_events=8,
                                     pass2_events=16)
    for i in range(n):
        assert x.x[i, 0] == x_host.x[i, 0], i


@pytest.mark.slow
@pytest.mark.parametrize("rule", ["always", "wide-only"])
def test_forced_segments_hbm_layouts(monkeypatch, rule):
    """Segment boundaries across value-table layouts: all-HBM (KR-plane
    widening) and VMEM->HBM mode switches, in interpreter mode."""
    from slip_lu_tpu.tpu import factor_fused as ff
    n = 12
    rng = np.random.default_rng(31)
    A = matrix_copy(random_sparse_int(n, density=0.4, lo=-10**6,
                                      hi=10**6, rng=rng),
                    Kind.CSC, Type.MPZ)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-9, 9))] for _ in range(n)],
                 dtype=object), Type.MPZ)
    opts = Options()
    x_host = backslash(A, b, Type.MPQ, opts)
    if rule == "always":
        hbm = lambda E8, W8: True
    else:
        hbm = lambda E8, W8: W8 > 8
    monkeypatch.setattr(ff, "val_table_in_hbm", hbm)
    monkeypatch.setattr(bf, "val_table_in_hbm", hbm)
    monkeypatch.setattr(bf, "plan_segments", _force_split(2))
    x = bf.factorize_solve_tpu_fused(A, analyze(A, opts), b, opts,
                                     heads_per_chunk=2, pass1_events=8,
                                     pass2_events=16)
    for i in range(n):
        assert x.x[i, 0] == x_host.x[i, 0], i


def test_plan_segments_shape():
    """Planner invariants: contiguous cover, nondecreasing widths,
    last width = _r8(W), no segmentation below thresholds."""
    n = 1000
    nc = 200
    max_level = np.minimum(np.arange(nc) * 5 + 4, n - 1).astype(np.int32)
    segs = bf.plan_segments(max_level, n, 176, 2)
    assert segs[0][0] == 0 and segs[-1][1] == nc
    for (a, b_, w), (c, d, w2) in zip(segs, segs[1:]):
        assert b_ == c and w <= w2
    assert segs[-1][2] == bf._r8(176)
    assert len(segs) >= 2
    assert bf.plan_segments(max_level, n, 16, 2) == [[0, nc, 16]]
    assert bf.plan_segments(max_level[:8], n, 176, 2) == [[0, 8, 176]]
