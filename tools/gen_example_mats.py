"""Generate the framework's test-matrix corpus (ExampleMats equivalent).

The reference ships ~20 paired triplet/RHS text files in
SLIP_LU/ExampleMats/ used by its demos as integration tests (SURVEY.md
section 2.6). The reference mount is empty in this environment, so we
generate our own corpus in the same file format with comparable structure:
small dense-ish integer systems, banded systems, LP-like rectangular-ish
patterns made square, an arrowhead, a rational-valued system, and a couple
of larger sparse systems for benchmarking. Deterministic (fixed seeds).

Run: python tools/gen_example_mats.py   (writes into data/ExampleMats/)
"""

import os
import sys

import numpy as np

try:  # prefer the installed package (pip install -e .)
    import slip_lu_tpu  # noqa: F401
except ImportError:  # bare checkout: fall back to the repo root
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fractions import Fraction

from slip_lu_tpu import SlipMatrix, Type, write_dense, write_triplet
from slip_lu_tpu.convert import dense_to_csc

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "ExampleMats")


def tridiag(n, rng):
    d = np.zeros((n, n), dtype=object)
    for i in range(n):
        d[i, i] = int(rng.integers(2, 10))
        if i > 0:
            d[i, i - 1] = int(rng.integers(-5, 6))
        if i + 1 < n:
            d[i, i + 1] = int(rng.integers(-5, 6))
    return d


def random_sparse(n, density, rng, lo=-9, hi=9):
    d = np.zeros((n, n), dtype=object)
    for r in range(n):
        for c in range(n):
            if rng.random() < density:
                d[r, c] = int(rng.integers(lo, hi + 1))
        if d[r, r] == 0:
            d[r, r] = int(rng.integers(1, hi + 1))
    return d


def arrowhead(n, rng):
    d = np.zeros((n, n), dtype=object)
    for i in range(n):
        d[i, i] = int(rng.integers(1, 10))
        d[0, i] = int(rng.integers(-4, 5)) or 1
        d[i, 0] = int(rng.integers(-4, 5)) or 1
    return d


def grid2d(k, rng):
    """5-point Laplacian-like integer grid matrix, n = k*k."""
    n = k * k
    d = np.zeros((n, n), dtype=object)
    for r in range(k):
        for c in range(k):
            u = r * k + c
            d[u, u] = 4 + int(rng.integers(0, 3))
            for (rr, cc) in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                if 0 <= rr < k and 0 <= cc < k:
                    d[u, rr * k + cc] = -1
    return d


def rational(n, rng):
    d = np.zeros((n, n), dtype=object)
    for r in range(n):
        for c in range(n):
            if rng.random() < 0.4 or r == c:
                num = int(rng.integers(-8, 9))
                den = int(rng.integers(1, 6))
                d[r, c] = Fraction(num if (num or r == c) else 1, den)
    return d


def rhs(n, rng, nrhs=1):
    return np.array([[int(rng.integers(-9, 10)) for _ in range(nrhs)]
                     for _ in range(n)], dtype=object)


def emit(name, dense, rng, type_=Type.MPZ, nrhs=1):
    A = dense_to_csc(SlipMatrix.from_dense(dense, type_))
    b = SlipMatrix.from_dense(rhs(A.n, rng, nrhs), Type.MPZ)
    write_triplet(A, os.path.join(OUT, f"{name}_mat.txt"))
    write_dense(b, os.path.join(OUT, f"{name}_v.txt"))
    print(f"  {name}: {A.m}x{A.n} nnz={A.nnz()}")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260816)
    emit("tiny4", random_sparse(4, 0.6, rng), rng)
    emit("dense10", random_sparse(10, 0.95, rng), rng)
    emit("tri20", tridiag(20, rng), rng)
    emit("sparse30", random_sparse(30, 0.15, rng), rng)
    emit("arrow25", arrowhead(25, rng), rng)
    emit("grid8", grid2d(8, rng), rng)       # n=64
    emit("sparse100", random_sparse(100, 0.05, rng), rng)
    emit("tri200", tridiag(200, rng), rng)
    emit("grid16", grid2d(16, rng), rng)     # n=256
    emit("rat12", rational(12, rng), rng, type_=Type.MPQ)
    emit("multirhs15", random_sparse(15, 0.3, rng), rng, nrhs=4)
    emit("wide_range", random_sparse(12, 0.5, rng, lo=-10**6, hi=10**6), rng)
    emit("grid24", grid2d(24, rng), rng)     # n=576
    emit("tri1000", tridiag(1000, rng), rng)
    print("done ->", OUT)


if __name__ == "__main__":
    main()
