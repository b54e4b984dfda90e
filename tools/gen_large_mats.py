"""Generate the large-scale corpus members (10K / 100K nnz).

The reference handles matrices at this scale with O(fill) work and
GMP's adaptive precision (reference: SLIP_LU_factorize.c left-looking
loop); the TPU framework's event/fused sparse paths are its O(fill)
equivalent, with the widen-and-retry ladder playing GMP's role. These
matrices are constructed as A = L*U with unit-triangular BANDED sparse
L, U and off-diagonal entries in {-1, +1}, where L's row supports and
U's column supports are kept disjoint so that every diagonal entry is
EXACTLY 1:

  * every leading principal minor of A is 1, so with the natural
    ordering every REF pivot rho_k = 1 and IPGE bit growth stays small
    — the factor width is set by the entries, not by n;
  * the guaranteed-1 diagonal means the transversal is the identity
    (no row displacement);
  * supports live within a fixed band, so the elimination closure (and
    with it schedule memory) stays O(n * bandwidth) instead of the
    near-dense fill a random support pattern produces under the
    natural ordering;
  * b = A*y for a small random y, so the exact solution (and the
    forward-substitution intermediates) stays small too.

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


def unit_lu_pair(n, per, band, rng):
    """(L, U) unit-triangular banded +-1 with A[i,i] == 1 for A=L*U.

    L is built by row (row i gets `per` entries in columns
    [i-band, i)), U by column (column j gets `per` entries in rows
    [j-band, j) disjoint from L's row-j support) — the disjointness
    kills every diagonal cross term, the band caps elimination fill.
    """
    lrows, lcols = [np.arange(n)], [np.arange(n)]
    lvals = [np.ones(n, dtype=np.int64)]
    lsup = [()] * n
    for i in range(1, n):
        lo = max(0, i - band)
        k = min(per, i - lo)
        c = rng.choice(i - lo, size=k, replace=False) + lo
        lsup[i] = set(int(v) for v in c)
        lrows.append(np.full(k, i, dtype=np.int64))
        lcols.append(c)
        lvals.append(rng.choice(np.array([-1, 1], dtype=np.int64), size=k))
    urows, ucols = [np.arange(n)], [np.arange(n)]
    uvals = [np.ones(n, dtype=np.int64)]
    for j in range(1, n):
        lo = max(0, j - band)
        pool = np.array([r for r in range(lo, j) if r not in lsup[j]],
                        dtype=np.int64)
        if len(pool) == 0:
            continue
        k = min(per, len(pool))
        r = rng.choice(pool, size=k, replace=False)
        urows.append(r)
        ucols.append(np.full(k, j, dtype=np.int64))
        uvals.append(rng.choice(np.array([-1, 1], dtype=np.int64), size=k))
    L = sp.csc_matrix((np.concatenate(lvals),
                       (np.concatenate(lrows), np.concatenate(lcols))),
                      shape=(n, n), dtype=np.int64)
    U = sp.csc_matrix((np.concatenate(uvals),
                       (np.concatenate(urows), np.concatenate(ucols))),
                      shape=(n, n), dtype=np.int64)
    return L, U


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


def emit(name, n, per, band, rng):
    L, U = unit_lu_pair(n, per, band, rng)
    A = (L @ U).tocsc()
    A.eliminate_zeros()
    d = A.diagonal()
    assert (d == 1).all(), "diagonal must be exactly 1 by construction"
    y = rng.integers(-9, 10, size=n).astype(np.int64)
    b = A @ y
    write_triplet_file(A, os.path.join(OUT, f"{name}_mat.txt"))
    write_rhs_file(b, os.path.join(OUT, f"{name}_v.txt"))
    print(f"  {name}: {n}x{n} nnz={A.nnz} "
          f"|A|max={int(abs(A).max())} |b|max={int(np.abs(b).max())}")


def emit_1m():
    """Generate the ~1M-nnz member (idempotent: skips if present)."""
    if os.path.exists(os.path.join(OUT, "uni1m_mat.txt")):
        return
    os.makedirs(OUT, exist_ok=True)
    rng1m = np.random.default_rng(20260819)
    emit("uni1m", 130000, 2, 12, rng1m)


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260817)
    emit("uni10k", 1400, 2, 12, rng)      # ~10-13K nnz
    emit("uni100k", 13000, 2, 12, rng)    # ~100-125K nnz
    if "--with-1m" in sys.argv:
        # ~1M nnz (BASELINE config 3 top end). Deterministic, but NOT
        # committed to the repo (13MB of text): regenerate on demand
        # with this flag — tests/test_scale.py (slow tier) and the 1M
        # bench entry (ROADMAP) call emit_1m() below to do the same.
        emit_1m()
    print("done ->", OUT)


if __name__ == "__main__":
    main()
