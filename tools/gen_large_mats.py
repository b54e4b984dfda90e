"""Generate the large-scale corpus members (10K / 100K nnz).

The reference handles matrices at this scale with O(fill) work and
GMP's adaptive precision (reference: SLIP_LU_factorize.c left-looking
loop); the TPU framework's event/fused sparse paths are its O(fill)
equivalent, with the widen-and-retry ladder playing GMP's role. These
matrices are constructed as A = L*U with unit-triangular sparse L, U
and off-diagonal entries in {-1, +1}:

  * every leading principal minor of A is 1, so with the natural
    ordering every REF pivot rho_k = 1 and IPGE bit growth stays small
    — the factor width is set by the entries, not by n;
  * b = A*y for a small random y, so the exact solution (and the
    forward-substitution intermediates, which are rows of U*y scaled
    by pivots) stays small too.

That makes them the scale-regime probe (BASELINE config 3): they reach
100K+ nnz while keeping limb widths in the few-limb range where VMEM
can hold the whole value table. Deterministic (fixed seed).

Run: python tools/gen_large_mats.py    (writes into data/ExampleMats/)
"""

import os
import sys

import numpy as np
import scipy.sparse as sp

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "data", "ExampleMats")


def unit_tri(n, per_col, rng, lower=True):
    """Unit-triangular sparse matrix with +-1 off-diagonal entries."""
    rows = [np.arange(n)]
    cols = [np.arange(n)]
    vals = [np.ones(n, dtype=np.int64)]
    for j in range(n):
        lo, hi = (j + 1, n) if lower else (0, j)
        space = hi - lo
        if space <= 0:
            continue
        k = min(per_col, space)
        r = rng.choice(space, size=k, replace=False) + lo
        rows.append(r)
        cols.append(np.full(k, j, dtype=np.int64))
        vals.append(rng.choice(np.array([-1, 1], dtype=np.int64), size=k))
    return sp.csc_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n), dtype=np.int64)


def write_triplet_file(A, path):
    A = A.tocoo()
    with open(path, "w") as f:
        f.write(f"{A.shape[0]} {A.shape[1]} {A.nnz}\n")
        for i, j, v in zip(A.row, A.col, A.data):
            f.write(f"{i + 1} {j + 1} {v}\n")


def write_rhs_file(b, path):
    with open(path, "w") as f:
        f.write(f"{len(b)} 1\n")
        for v in b:
            f.write(f"{v}\n")


def emit(name, n, per_col, rng):
    L = unit_tri(n, per_col, rng, lower=True)
    U = unit_tri(n, per_col, rng, lower=False)
    A = (L @ U).tocsc()
    A.eliminate_zeros()
    y = rng.integers(-9, 10, size=n).astype(np.int64)
    b = A @ y
    write_triplet_file(A, os.path.join(OUT, f"{name}_mat.txt"))
    write_rhs_file(b, os.path.join(OUT, f"{name}_v.txt"))
    print(f"  {name}: {n}x{n} nnz={A.nnz} "
          f"|A|max={int(abs(A).max())} |b|max={int(np.abs(b).max())}")


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260817)
    emit("uni10k", 2000, 2, rng)      # ~10-15K nnz
    emit("uni100k", 20000, 2, rng)    # ~100-150K nnz
    print("done ->", OUT)


if __name__ == "__main__":
    main()
