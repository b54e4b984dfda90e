"""Checkpoint/resume: exact roundtrip, solve-after-load parity."""

import numpy as np
import pytest

from slip_lu_tpu.analyze import analyze
from slip_lu_tpu.checkpoint import load_factorization, save_factorization
from slip_lu_tpu.convert import matrix_copy
from slip_lu_tpu.errors import SlipIncorrectInputError
from slip_lu_tpu.factorize import factorize
from slip_lu_tpu.matrix import Kind, SlipMatrix, Type
from slip_lu_tpu.options import Options
from slip_lu_tpu.solve import solve

from conftest import random_sparse_int


def _fact(n=13, seed=3):
    rng = np.random.default_rng(seed)
    A = matrix_copy(random_sparse_int(n, density=0.35, rng=rng),
                    Kind.CSC, Type.MPZ)
    opts = Options()
    return A, factorize(A, analyze(A, opts), opts), opts, rng


def test_roundtrip_identical(tmp_path):
    _, F, _, _ = _fact()
    p = str(tmp_path / "f.npz")
    save_factorization(F, p)
    G = load_factorization(p)
    assert G.n == F.n
    assert G.rhos == F.rhos
    assert G.Lcols == F.Lcols
    assert G.Ucols == F.Ucols
    assert np.array_equal(G.pinv, F.pinv)
    assert np.array_equal(G.row_perm, F.row_perm)
    assert np.array_equal(G.q, F.q)
    assert G.scale == F.scale


def test_solve_after_load(tmp_path):
    A, F, opts, rng = _fact(17, seed=9)
    b = SlipMatrix.from_dense(
        np.array([[int(rng.integers(-5, 6))] for _ in range(17)],
                 dtype=object), Type.MPZ)
    p = str(tmp_path / "f.npz")
    save_factorization(F, p)
    G = load_factorization(p)
    x1 = solve(F, b, opts)
    x2 = solve(G, b, opts)
    for i in range(17):
        assert x1.x[i, 0] == x2.x[i, 0]


def test_huge_values_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    A = matrix_copy(random_sparse_int(8, density=0.6, rng=rng,
                                      lo=-10**15, hi=10**15),
                    Kind.CSC, Type.MPZ)
    opts = Options()
    F = factorize(A, analyze(A, opts), opts)
    p = str(tmp_path / "f.npz")
    save_factorization(F, p)
    G = load_factorization(p)
    assert G.rhos == F.rhos


def test_scaled_input_roundtrip(tmp_path):
    # float input -> nontrivial scale factor must survive the checkpoint
    dense = np.array([[0.5, 0.25], [0.0, 1.5]])
    A = matrix_copy(SlipMatrix.from_dense(dense.astype(object), Type.FP64),
                    Kind.CSC, Type.MPZ)
    opts = Options()
    F = factorize(A, analyze(A, opts), opts)
    assert F.scale != 1
    p = str(tmp_path / "f.npz")
    save_factorization(F, p)
    assert load_factorization(p).scale == F.scale


def test_version_check(tmp_path):
    _, F, _, _ = _fact(5)
    p = str(tmp_path / "f.npz")
    save_factorization(F, p)
    z = dict(np.load(p))
    z["version"] = np.int64(99)
    np.savez(p, **z)
    with pytest.raises(SlipIncorrectInputError):
        load_factorization(p)
