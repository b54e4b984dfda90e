"""Integration tests over the ExampleMats corpus.

Mirrors the reference's Demo-as-integration-test tier (SURVEY.md section 4,
tier 2): solve every shipped matrix/RHS pair with options.check=True so the
exact rational oracle slip_check_solution verifies A*x == b with no
tolerances. Large matrices are exercised in the benchmark instead.
"""

import glob
import os

import pytest

from slip_lu_tpu import Options, Type, backslash, read_dense, read_triplet

CORPUS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "data", "ExampleMats")

_mats = sorted(os.path.basename(f)[:-8] for f in glob.glob(os.path.join(CORPUS, "*_mat.txt")))
SMALL = [m for m in _mats if m not in ("grid16", "tri200", "sparse100")]
BIG = [m for m in _mats if m in ("grid16", "tri200", "sparse100")]


def _load(name):
    A = read_triplet(os.path.join(CORPUS, f"{name}_mat.txt"))
    b = read_dense(os.path.join(CORPUS, f"{name}_v.txt"))
    return A, b


@pytest.mark.parametrize("name", SMALL)
def test_corpus_exact_solve(name):
    A, b = _load(name)
    x = backslash(A, b, Type.MPQ, Options(check=True))
    assert x.shape == (A.n, b.n)


@pytest.mark.parametrize("name", BIG)
def test_corpus_large_solve_no_check(name):
    # full rational check on the largest systems is slow; the factor-solve
    # path itself asserts every IPGE division is exact, which already
    # guarantees integrity. Spot-check one RHS entry rationally.
    from slip_lu_tpu import check_solution
    A, b = _load(name)
    x = backslash(A, b, Type.MPQ, Options())
    check_solution(A, x, b)
