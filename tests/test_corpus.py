"""Integration tests over the ExampleMats corpus.

Mirrors the reference's Demo-as-integration-test tier (SURVEY.md section 4,
tier 2): solve every shipped matrix/RHS pair with the exact rational oracle
slip_check_solution verifying A*x == b with no tolerances.

Tiering is by ACTUAL cost: members whose host-oracle solve is cheap run in
the fast gate with the full rational check; the large members (uni10k,
uni100k, tri1000, grid24 — seconds-to-minutes of host-oracle work each)
run under `-m slow`, and the fast tier covers them with a cheap smoke
instead (read + analyze + structural sanity, no O(n * fill) arithmetic).
"""

import glob
import os

import pytest

from slip_lu_tpu import Options, Type, backslash, read_dense, read_triplet

CORPUS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "data", "ExampleMats")

_mats = sorted(os.path.basename(f)[:-8]
               for f in glob.glob(os.path.join(CORPUS, "*_mat.txt")))
# host-oracle full-check cost is driven by n * fill * limb-width; these
# four dominate the old fast tier (together minutes of oracle work).
# uni1m (1M nnz, generated on demand, not committed) is excluded here
# entirely — tests/test_scale.py covers it with the natural ordering
# it is built for; a COLAMD-ordered oracle solve of it takes hours.
BIG = [m for m in _mats if m in ("uni10k", "uni100k", "tri1000", "grid24")]
SMALL = [m for m in _mats if m not in BIG and m != "uni1m"]


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
def test_corpus_large_smoke(name):
    """Fast-tier coverage of the large members: parse + analyze +
    invariants, without the O(n * fill) host-oracle arithmetic."""
    from slip_lu_tpu import Kind, analyze, matrix_copy
    A, b = _load(name)
    assert b.m == A.n
    A2 = matrix_copy(A, Kind.CSC, Type.MPZ)
    ana = analyze(A2)
    assert sorted(int(v) for v in ana.q) == list(range(A.n))
    assert ana.lnz >= int(A2.p[A2.n] - A2.n)  # estimate >= strict A fill


@pytest.mark.slow
@pytest.mark.parametrize("name", BIG)
def test_corpus_large_exact_solve(name):
    A, b = _load(name)
    x = backslash(A, b, Type.MPQ, Options(check=True))
    assert x.shape == (A.n, b.n)
