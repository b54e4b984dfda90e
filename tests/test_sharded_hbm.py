"""Sharded fused solve with per-chip HBM-resident value tables.

The partitioned value table normally sits in VMEM per chip; at scale
(val_table_in_hbm at the PER-CHIP row count) it moves to ANY/HBM
memory as [Lp8*KR, 128] packed planes and the kernels gather/scatter
rows by async DMA (parallel/factor_fused_shard.py). These tests force
that layout on small systems (interpret-mode CPU mesh) and assert
exact oracle parity — the layout must be bit-invisible.

Reference anchor: the factor k-loop of SLIP_LU_factorize.c at scale
(SURVEY §7 steps 4-5); the single-chip analogue is exercised by
tests/test_segments.py's forced-HBM layouts.
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
from slip_lu_tpu.tpu import factor_fused as ff

from conftest import random_sparse_int

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


def _force_hbm(monkeypatch):
    monkeypatch.setattr(ff, "val_table_in_hbm",
                        lambda E8, W8: True)


def test_sharded_hbm_val_matches_oracle(monkeypatch):
    _force_hbm(monkeypatch)
    A, b = _sys(14, seed=5)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:2])
    x = factorize_solve_fused_sharded(A, analyze(A, opts), b, mesh,
                                      opts, **CAPS)
    check_solution(A, x, b)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i


def test_sharded_hbm_multirhs_no_fallback(monkeypatch):
    """HBM layout with 2 RHS; the sharded program must produce the
    result itself (no silent single-chip fallback)."""
    from slip_lu_tpu.stats import last_stats
    _force_hbm(monkeypatch)
    A, b = _sys(16, seed=11, nrhs=2)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:3])
    x = factorize_solve_fused_sharded(A, analyze(A, opts), b, mesh,
                                      opts, **CAPS)
    st = last_stats()
    assert st.backend == "tpu-fused-sharded", st.backend
    assert not st.fallback
    for i in range(A.n):
        for c in range(2):
            assert x.x[i, c] == x_ref.x[i, c], (i, c)


@pytest.mark.slow
def test_sharded_hbm_wide_entries_ladder(monkeypatch):
    """10^9-scale entries push the widen-and-retry ladder through the
    HBM-packed program (hbm->hbm repack at each rung)."""
    _force_hbm(monkeypatch)
    A, b = _sys(12, seed=3, lohi=10**9)
    opts = Options()
    x_ref = backslash(A, b, Type.MPQ, opts)
    mesh = make_mesh(jax.devices()[:2])
    x = factorize_solve_fused_sharded(A, analyze(A, opts), b, mesh,
                                      opts, **CAPS)
    for i in range(A.n):
        assert x.x[i, 0] == x_ref.x[i, 0], i
